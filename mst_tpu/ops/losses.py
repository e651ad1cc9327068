"""The loss stack: smooth-F1 notes loss, masked regression losses, and the
quadratic-mean hierarchical combination.

Parity target: style/model.py:818-997 + style/utils/pytorch.py:68-94. All
functions are pure jnp and jit/grad-safe (the reference's value-dependent
branches — safe_sqrt's ``if x == 0``, safe_div's ``if |d| < eps`` — become
``jnp.where`` with identical values and well-defined gradients).

Batched generalization: the reference trains one song per step; these losses
reduce over the whole batch jointly (global sums), which is identical at
batch=1. ``pad_mask`` zeroes padded (channel, bar) cells out of every
reduction, including the model's own predictions at padded positions (which the
unpadded reference never produces).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

EPSILON = 1e-7  # parity: style/model.py:11
MAX_DURATION = 6.0
BPM_RANGE = 150.0  # max_bpm - min_bpm (style/model.py:22-25)


def safe_sqrt(x):
    """sqrt with value 0 and gradient 0 at x == 0 (parity: utils/pytorch.py:68-71).

    NaN inputs stay NaN (``NaN > 0`` is False, so a plain where would silently
    map a blown-up loss component to 0.0 and hide it from the NaN guard)."""
    safe = jnp.where(x > 0, x, 1.0)
    out = jnp.where(x > 0, jnp.sqrt(safe), 0.0)
    return jnp.where(jnp.isnan(x), x, out)


def safe_div(num, denom):
    """Parity: style/model.py:854-860 — nudge near-zero denominators by eps."""
    small = jnp.abs(denom) < EPSILON
    denom = jnp.where(small, jnp.where(denom < 0, denom - EPSILON,
                                       denom + EPSILON), denom)
    return num / denom


def get_mean(tensors, weights=None, mean_type: str = "arithmetic"):
    """Weighted arithmetic/harmonic/geometric/quadratic mean of scalars
    (parity: utils/pytorch.py:74-94). ``weights`` may be traced values (the
    notes/velocity blend uses the notes loss itself as a weight)."""
    n = len(tensors)
    if weights is None:
        weights = [1.0 / n] * n
    if mean_type == "arithmetic":
        out = sum(w * t for t, w in zip(tensors, weights))
    elif mean_type == "harmonic":
        out = 1.0 / get_mean([1.0 / t for t in tensors], weights=weights)
    elif mean_type == "geometric":
        prod = tensors[0]
        for t in tensors[1:]:
            prod = prod * t
        out = prod ** (1.0 / n)
    elif mean_type == "quadratic":
        out = safe_sqrt(get_mean([t * t for t in tensors], weights=weights))
    else:
        raise ValueError(f"Unsupported mean type: {mean_type}")
    return out


# --- channel-tensor losses (dense (B, C, bar, beat, frac, note, feat) inputs)

def get_duration(x):
    return x[..., 0]


def get_velocity(x):
    return x[..., 1]


def get_accidentals(x):
    return x[..., 2:]


def smooth_f_score(pred, target, beta: float = 1.0):
    """Differentiable F-score on velocity mass (parity: model.py:863-878)."""
    tp = jnp.minimum(pred, target).sum()
    fp = jnp.maximum(pred - target, 0.0).sum()
    fn = jnp.maximum(target - pred, 0.0).sum()
    precision = safe_div(tp, tp + fp)
    recall = safe_div(tp, tp + fn)
    beta2 = beta * beta
    f = (1 + beta2) * safe_div(precision * recall, beta2 * precision + recall)
    return f, precision, recall


def notes_loss_fn(pred_velocity, target_velocity, beta: float = 1.0):
    return 1.0 - smooth_f_score(pred_velocity, target_velocity, beta)[0]


def velocity_loss_fn(pred, target, mask):
    x = (target - pred) ** 2 * mask
    return x.sum() / mask.sum()


def duration_loss_fn(pred, target, mask):
    x = ((pred - jnp.minimum(target, MAX_DURATION)) / MAX_DURATION) ** 2 * mask
    return x.sum() / mask.sum()


def accidentals_loss_fn(pred, target, mask):
    """Per-note BCE on accidental probabilities (parity: model.py:892-896)."""
    p = jnp.clip(pred, EPSILON, 1.0 - EPSILON)
    bce = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
    bce = bce * mask[..., None]
    return bce.sum() / (mask.sum() * 3.0)


def channels_losses(pred, target, pitched: bool = True,
                    pad_mask: Optional[jnp.ndarray] = None):
    """(notes, velocity, duration[, accidentals]) losses for one channel group
    (parity: model.py:909-921). ``pad_mask``: (B, C, bar) validity of each
    (channel, bar) — zeroes padded cells out of every reduction, including the
    model's own predictions there."""
    # reductions always run in float32: under a bfloat16 storage dtype the
    # prediction/target rasters arrive half-width, and the global velocity-
    # mass sums (smooth-F1 over ~10^7 cells) need the full mantissa. The
    # upcasts fuse into the elementwise ops — HBM reads stay half-width.
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    target_velocity = get_velocity(target)
    pred_velocity = get_velocity(pred)
    if pad_mask is not None:
        m = pad_mask[:, :, :, None, None, None].astype(pred.dtype)
        target_velocity = target_velocity * m
        pred_velocity = pred_velocity * m
    mask = (target_velocity > 0).astype(pred.dtype)
    notes = notes_loss_fn(pred_velocity, target_velocity)
    velocity = velocity_loss_fn(pred_velocity, target_velocity, mask)
    duration = duration_loss_fn(get_duration(pred), get_duration(target), mask)
    if pitched:
        accidentals = accidentals_loss_fn(
            get_accidentals(pred), get_accidentals(target), mask)
        return notes, velocity, duration, accidentals
    return notes, velocity, duration


def combine_channel_losses(notes, velocity, duration, accidentals=None,
                           mean_type: str = "quadratic"):
    """"First learn the right notes, then the right velocities"
    (parity: model.py:924-932)."""
    notes = get_mean([notes, velocity], [notes, 1.0 - notes],
                     mean_type=mean_type)
    if accidentals is not None:
        return get_mean([duration, accidentals, notes], mean_type=mean_type)
    return get_mean([duration, notes], mean_type=mean_type)


# --- song-info losses

def bce_with_logits(logits, target):
    """Mean BCE-with-logits (parity: F.binary_cross_entropy_with_logits)."""
    x = jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return x.mean()


def cross_entropy_logits(logits, target_index):
    logz = jnp.log(jnp.sum(jnp.exp(logits - logits.max(-1, keepdims=True)),
                           axis=-1)) + logits.max(-1)
    picked = jnp.take_along_axis(logits, target_index[:, None], axis=-1)[:, 0]
    return (logz - picked).mean()


def song_info_losses(instruments_pred, instruments_target, mode_pred,
                     mode_target, bpm_pred, bpm_target):
    """Parity: model.py:899-906 (mean over batch matches torch defaults)."""
    instruments = bce_with_logits(instruments_pred, instruments_target)
    mode = cross_entropy_logits(mode_pred, jnp.argmax(mode_target, axis=1))
    bpm = (((bpm_pred - bpm_target) / BPM_RANGE) ** 2).mean()
    return instruments, mode, bpm


class LossDict(NamedTuple):
    """Flat loss record mirroring the reference's nested dict
    (model.py:935-997); ``total`` is the training objective."""

    total: jnp.ndarray
    channels_total: jnp.ndarray
    pitched_total: jnp.ndarray
    pitched_notes: jnp.ndarray
    pitched_velocity: jnp.ndarray
    pitched_duration: jnp.ndarray
    pitched_accidentals: jnp.ndarray
    unpitched_total: jnp.ndarray
    unpitched_notes: jnp.ndarray
    unpitched_velocity: jnp.ndarray
    unpitched_duration: jnp.ndarray
    song_info_total: jnp.ndarray
    instruments: jnp.ndarray
    mode: jnp.ndarray
    bpm: jnp.ndarray

    def as_nested_dict(self) -> dict:
        """The reference's nested structure for logging/CSV parity."""
        unpitched = None
        if not bool(jnp.isnan(self.unpitched_total)):
            unpitched = {
                "total": self.unpitched_total,
                "notes_loss": self.unpitched_notes,
                "velocity_loss": self.unpitched_velocity,
                "duration_loss": self.unpitched_duration,
            }
        return {
            "total": self.total,
            "channels_loss": {
                "total": self.channels_total,
                "pitched": {
                    "total": self.pitched_total,
                    "notes_loss": self.pitched_notes,
                    "velocity_loss": self.pitched_velocity,
                    "duration_loss": self.pitched_duration,
                    "accidentals_loss": self.pitched_accidentals,
                },
                "unpitched": unpitched,
            },
            "song_info_loss": {
                "total": self.song_info_total,
                "instruments_loss": self.instruments,
                "mode_loss": self.mode,
                "bpm_loss": self.bpm,
            },
        }


def total_loss(instruments_pred, instruments_target, mode_pred, mode_target,
               bpm_pred, bpm_target, pitched_pred, pitched_target,
               unpitched_pred=None, unpitched_target=None,
               normalize: bool = False, mean_type: str = "quadratic",
               pitched_pad_mask=None, unpitched_pad_mask=None) -> LossDict:
    """The full hierarchical loss (parity: get_total_loss, model.py:935-997).

    The reference's public signature takes (inst, mode, bpm) but its only call
    site passes (inst, bpm, mode) and the inner unpacking swaps them back
    (SURVEY.md §2.1 quirk); this function uses the unambiguous order.
    """
    nan = jnp.float32(jnp.nan)
    notes, velocity, duration, accidentals = channels_losses(
        pitched_pred, pitched_target, pitched=True, pad_mask=pitched_pad_mask)
    if normalize:
        accidentals = jnp.tanh(accidentals)
    pitched_total = combine_channel_losses(notes, velocity, duration,
                                           accidentals, mean_type)

    if unpitched_target is not None:
        u_notes, u_velocity, u_duration = channels_losses(
            unpitched_pred, unpitched_target, pitched=False,
            pad_mask=unpitched_pad_mask)
        unpitched_total = combine_channel_losses(u_notes, u_velocity,
                                                 u_duration, None, mean_type)
        channels_total = get_mean([pitched_total, unpitched_total],
                                  mean_type=mean_type)
    else:
        u_notes = u_velocity = u_duration = unpitched_total = nan
        channels_total = pitched_total

    instruments, mode, bpm = song_info_losses(
        instruments_pred, instruments_target, mode_pred, mode_target,
        bpm_pred, bpm_target)
    if normalize:
        instruments = jnp.tanh(instruments)
        mode = jnp.tanh(mode)
    song_info_total = get_mean([instruments, mode, bpm], mean_type=mean_type)

    total = get_mean([channels_total, song_info_total], mean_type=mean_type)
    return LossDict(
        total=total, channels_total=channels_total,
        pitched_total=pitched_total, pitched_notes=notes,
        pitched_velocity=velocity, pitched_duration=duration,
        pitched_accidentals=accidentals, unpitched_total=unpitched_total,
        unpitched_notes=u_notes, unpitched_velocity=u_velocity,
        unpitched_duration=u_duration, song_info_total=song_info_total,
        instruments=instruments, mode=mode, bpm=bpm,
    )


def hard_output(x):
    """Inference thresholding (parity: model.py:818-832): tiny velocities
    zeroed; accidentals -> one-hot at the argmax, gated at 0.1."""
    duration = x[..., :1]
    velocity = x[..., 1:2]
    velocity = velocity * (velocity > 0.01).astype(x.dtype)
    if x.shape[-1] > 2:
        acc = x[..., 2:]
        is_max = acc == acc.max(axis=-1, keepdims=True)
        hard = (is_max & (acc > 0.1)).astype(x.dtype)
        return jnp.concatenate([duration, velocity, hard], axis=-1)
    return jnp.concatenate([duration, velocity], axis=-1)
