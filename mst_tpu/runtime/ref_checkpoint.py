"""Import reference torch checkpoints into mst_tpu flax parameter trees.

The reference pickles its whole torch model every 100 iterations
(``torch.save(model, snapshots/{i}.pkl)`` — train-model.py:156-160). This
module maps such a model's ``state_dict()`` onto the flax parameter tree of
:class:`mst_tpu.models.StyleTransferModel`, leaf for leaf, so reference
training runs can be resumed / evaluated inside this framework — and so the
parity suite (tests/test_reference_parity.py) can assert tensor-level output
agreement against the reference's own executable modules rather than a
re-written oracle.

Layout rules (both frameworks use the same module/parameter names by design):

- ``nn.Linear.weight`` is (out, in); flax ``Dense``/``ConcatDense``/
  ``DenseParams`` kernels are (in, out) -> transpose. Biases map directly.
- ``nn.Conv1d.weight`` is (out, in, k); flax ``Conv1d`` kernels use the same
  (out, in, k) layout -> direct.
- ``nn.LSTM`` weights are (4H, in)/(4H, H) with gate order (i, f, g, o);
  the flax ``LSTMCellParams`` are transposed, same gate order. The torch
  parameter suffix ``_l0``/``_l0_reverse`` corresponds to the flax subtree
  ``cell`` (unidirectional) / ``fwd``+``bwd`` (bidirectional).
- The reference wraps some submodules in ``Distributed`` (a shape adapter,
  utils/pytorch.py:28-51) which inserts ``.module`` into torch names; flax has
  no wrapper, so both name variants are tried.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

_LSTM_LEAVES = {
    "w_ih": "weight_ih_l0",
    "w_hh": "weight_hh_l0",
    "b_ih": "bias_ih_l0",
    "b_hh": "bias_hh_l0",
}
_LSTM_SUBTREES = {"cell": "", "fwd": "", "bwd": "_reverse"}


def _as_numpy(value) -> np.ndarray:
    if hasattr(value, "detach"):  # torch tensor without importing torch
        value = value.detach().cpu().numpy()
    return np.asarray(value, dtype=np.float32)


def flax_params_from_torch_state_dict(
        state_dict: Mapping[str, object],
        flax_params: Mapping[str, object],
) -> Tuple[Dict[str, object], set]:
    """Build a flax parameter tree shaped like ``flax_params`` from a
    reference ``state_dict``.

    Returns ``(new_params, unused_torch_keys)``. Raises ``KeyError`` if any
    flax leaf has no torch counterpart and ``ValueError`` on shape mismatch —
    a non-empty ``unused_torch_keys`` set means the torch model carries
    parameters this tree does not (callers should treat that as an error for
    full-model imports).
    """
    used = set()

    def lookup(*candidates):
        for key in candidates:
            if key in state_dict:
                used.add(key)
                return _as_numpy(state_dict[key])
        raise KeyError(f"no torch parameter among {candidates}")

    def with_module(prefix: str, leaf: str):
        return (f"{prefix}.{leaf}", f"{prefix}.module.{leaf}")

    def convert(tree, path):
        out = {}
        for name, value in tree.items():
            p = path + (name,)
            if isinstance(value, Mapping):
                out[name] = convert(value, p)
                continue
            if name in _LSTM_LEAVES and len(p) >= 2 and p[-2] in _LSTM_SUBTREES:
                prefix = ".".join(p[:-2])
                leaf = _LSTM_LEAVES[name] + _LSTM_SUBTREES[p[-2]]
                w = lookup(*with_module(prefix, leaf))
                if name.startswith("w"):
                    w = w.T
            elif name == "kernel":
                prefix = ".".join(p[:-1])
                w = lookup(*with_module(prefix, "weight"))
                if w.ndim == 2:  # Linear; Conv1d (out,in,k) maps directly
                    w = w.T
            elif name == "bias":
                prefix = ".".join(p[:-1])
                w = lookup(*with_module(prefix, "bias"))
            else:
                raise KeyError(f"unrecognized flax leaf {'/'.join(p)}")
            if tuple(w.shape) != tuple(value.shape):
                raise ValueError(
                    f"{'/'.join(p)}: torch shape {w.shape} != flax "
                    f"{tuple(value.shape)}")
            out[name] = w.astype(np.float32)
        return out

    new_params = convert(flax_params, ())
    unused = set(state_dict) - used
    return new_params, unused


def load_reference_snapshot(path: str, reference_root: str,
                            flax_params: Mapping[str, object]):
    """Load a reference ``snapshots/{i}.pkl`` (a whole-model torch pickle,
    train-model.py:156-160) and convert it to a flax parameter tree.

    ``reference_root`` must contain the ``style`` package — whole-model torch
    pickles can only be deserialized with the defining module importable.
    Returns the converted tree; raises if any parameter is unmapped in either
    direction.
    """
    import sys

    import torch

    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)
    model = torch.load(path, map_location="cpu", weights_only=False)
    params, unused = flax_params_from_torch_state_dict(model.state_dict(),
                                                       flax_params)
    if unused:
        raise ValueError(f"torch parameters with no flax counterpart: "
                         f"{sorted(unused)}")
    return params
