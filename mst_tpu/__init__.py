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


def _enable_persistent_compile_cache():
    """Cache compiled executables on disk, shared across processes.

    On a remote-attached TPU every fresh process pays 10-300 s per program
    to compile through the tunnel, and the server-side cache is evicted
    under load (measured: a repeat 5000-iteration campaign re-compiled every
    shape bucket). JAX's persistent compilation cache serializes executables
    to disk so a program compiles once per MACHINE, not once per process:
    measured 21.7 s -> 9.8 s for a fresh process's first K=16-scan train
    dispatch. Also caches CPU-backend compiles (test suite, dryruns).

    Opt out with MST_TPU_NO_COMPILE_CACHE=1; relocate with
    MST_TPU_COMPILE_CACHE=<dir>; a user-set jax_compilation_cache_dir wins.
    """
    import os
    if os.environ.get("MST_TPU_NO_COMPILE_CACHE"):
        return
    import jax
    if jax.config.jax_compilation_cache_dir:
        return
    path = os.environ.get("MST_TPU_COMPILE_CACHE",
                          os.path.expanduser("~/.cache/mst_tpu/jax"))
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return  # unwritable cache location: run uncached rather than fail
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_persistent_compile_cache()

from mst_tpu.exceptions import MidiFormatError  # noqa: F401
