"""Typed configuration tree for the whole framework.

The reference scatters configuration over module-level constants
(train-model.py:33-60, style/model.py:11-28, style/midi_conversion.py:349-369,
style/data.py:19-31). Here everything lives in frozen dataclasses so configs are
hashable (usable as jit static args) and explicit.
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class RepresentationConfig:
    """Constants of the piano-roll representation.

    Parity: style/model.py:13-19 (n_beat_fractions=10, n_pitched_features=5,
    n_unpitched_features=2, n_octaves=8, n_scale_degrees=7, n_unpitched_notes=47)
    and style/midi_conversion.py:350-369 (beat_divisors=(8,3), percussion 35..81).
    """

    beat_divisors: Tuple[int, ...] = (8, 3)
    n_octaves: int = 8
    n_scale_degrees: int = 7
    min_percussion: int = 35
    max_percussion: int = 81
    n_pitched_features: int = 5   # duration, velocity, flat, natural, sharp
    n_unpitched_features: int = 2  # duration, velocity

    @property
    def beat_fractions(self) -> Tuple[Fraction, ...]:
        """Sorted distinct onset fractions within a beat (midi_conversion.py:358-362)."""
        return tuple(sorted({
            Fraction(i, d) for d in self.beat_divisors for i in range(d)
        }))

    @property
    def n_beat_fractions(self) -> int:
        return len(self.beat_fractions)

    @property
    def n_pitched_notes(self) -> int:
        return self.n_octaves * self.n_scale_degrees

    @property
    def n_unpitched_notes(self) -> int:
        return self.max_percussion - self.min_percussion + 1


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model hyperparameters (parity: train-model.py:54-60, style/model.py:20-27)."""

    beat_size: int = 64
    bar_size: int = 128
    n_rhythm_features: int = 8
    style_size: int = 256
    melody_size: int = 8
    rhythm_size: int = 32

    n_modes: int = 2
    min_bpm: float = 50.0
    max_bpm: float = 200.0
    mean_type: str = "quadratic"

    # numeric policy (TPU): params stay float32; with "bfloat16",
    # every matmul/conv OPERAND is cast to bf16 with fp32 accumulation
    # (mst_tpu.ops.precision — ~2x MXU throughput on v5e; measured neutral
    # for this HBM-bound family). Consumed by the train step
    # (runtime/train.py) and every transfer dispatch (transfer.ModelBundle).
    compute_dtype: str = "float32"
    # with "bfloat16", grid-scale ACTIVATION buffers (post-leaky_relu
    # tensors, applier outputs, the raster fed to model+losses) materialize
    # to HBM at half width; params/grads/optimizer state/LSTM carries/loss
    # reductions stay float32. This attacks the measured bottleneck — the
    # committed profile shows the train step HBM-bound moving ~10.8 GB of
    # fp32 activations. Training only; the transfer path keeps float32
    # (its packed wire formats are proven bit-identical against fp32).
    storage_dtype: str = "float32"

    @property
    def bpm_range(self) -> float:
        return self.max_bpm - self.min_bpm


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop configuration (parity: train-model.py:33-41,89-90,97-160)."""

    n_iterations: int = 5000
    iter_size: int = 2             # gradient-accumulation span (summed, not averaged)
    remat: bool = False            # rematerialize the forward in backward
    #   (jax.checkpoint). NOTE: measured on the v5e, this does NOT lower the
    #   peak for this model — the per-note broadcast chains make the forward
    #   transient working set the HBM peak, which recompute cannot shrink
    #   (the (8,8,256,4) and (8,2,1024,4) buckets OOM identically with and
    #   without it). batch_cell_budget is the effective memory lever; the
    #   flag remains for configs where saved residuals dominate.
    learning_rate: float = 1e-2
    lr_decay_every: int = 200      # optimizer steps between decays (StepLR step_size)
    lr_decay_gamma: float = 0.9
    seed: int = 108
    max_total_bars: int = 800      # max_n_bars = max_total_bars // n_channels
    save_interval: int = 100
    min_n_messages: int = 100      # channel filter (style/data.py:51)

    # TPU-native additions (absent in the single-song-per-step reference)
    batch_size: int = 1            # songs per device-step (data-parallel global batch)
    prefetch_depth: int = 2        # host->HBM double buffering depth
    bar_buckets: Tuple[int, ...] = (64, 128, 256, 512, 800)
    channel_buckets: Tuple[int, ...] = (1, 2, 4, 8, 16)
    # batched training only: cap B*C_bucket*R_bucket*T so one padded batch's
    # activations fit HBM (8 songs x 8 channels x 128 bars x 4 beats — the
    # measured-good v5e shape; (8,8,256,4) OOMs a 16 GB chip). Songs beyond
    # the cap truncate, consistent with the reference's max_total_bars rule.
    batch_cell_budget: int = 8 * 8 * 128 * 4


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. ``data`` shards the song batch (gradient psum over ICI);
    ``seq`` shards the bar axis of long songs (LSTM carry handed over via ppermute).
    The reference has no equivalent (single device, SURVEY.md §2.4)."""

    data_axis: str = "data"
    seq_axis: str = "seq"
    data_parallel: int = -1  # -1: use all devices on the data axis
    seq_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    rep: RepresentationConfig = dataclasses.field(default_factory=RepresentationConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


DEFAULT_CONFIG = Config()
