"""mst_tpu — a TPU-native (JAX/XLA/Pallas) music style transfer framework.

A from-scratch rebuild of the capabilities of marcinp7/music-style-transfer
(reference layout: ``style/`` package + ``train-model.py``), redesigned for TPU:

- ``mst_tpu.io``      — Standard MIDI File codec (native C++ + pure-Python), replaces
                        the reference's mido dependency (``style/midi.py``).
- ``mst_tpu.theory``  — music theory core: modes, Krumhansl key profiles, vectorized
                        24-candidate scale detection (``style/scales.py``).
- ``mst_tpu.ops``     — compiled compute substrate: event-stream processing, grid
                        quantization, scatter-max rasterization (numpy + Pallas),
                        fused lax.scan LSTMs, masked pooling, the loss stack
                        (``style/midi_conversion.py``, ``style/model.py`` losses).
- ``mst_tpu.models``  — the nine encoder/decoder modules and the composite
                        StyleTransferModel as flax.linen modules (``style/model.py``).
- ``mst_tpu.data``    — instrument taxonomy + host data pipeline with prefetch and
                        bucketing (``style/data.py``).
- ``mst_tpu.parallel``— device mesh / sharding layer (new capability; the reference
                        is single-device).
- ``mst_tpu.runtime`` — train step, optimizer, metrics, checkpointing
                        (``train-model.py``).
- ``mst_tpu.transfer``— style transfer driver (``style/style_transfer.py``).
"""

__version__ = "0.1.0"

from mst_tpu.exceptions import MidiFormatError  # noqa: F401
