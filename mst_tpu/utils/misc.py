"""Generic utilities (parity: style/utils/__init__.py + style/utils/misc.py).

The shape/tensor helpers of the reference's utils live in mst_tpu.ops.shapes
(squash_dims, cat_with_broadcast), mst_tpu.ops.lstm (LSTM / the Distributed
pattern) and mst_tpu.ops.losses (get_mean); the progress/CSV machinery in
mst_tpu.runtime.metrics; the prefetcher in mst_tpu.data.prefetch. This module
keeps the remaining small generic helpers.
"""

from __future__ import annotations

import glob
import itertools
import os
from collections import defaultdict


def freeze(obj):
    """Hashable view of (nested) lists/sets (parity: utils/__init__.py:5-10)."""
    if isinstance(obj, (list, tuple)):
        return tuple(map(freeze, obj))
    if isinstance(obj, set):
        return frozenset(obj)
    return obj


def group_by(data, key=None, attr=None, func=None, save_indices=False):
    """Insertion-ordered grouping by key-callable/dict-key/attribute with an
    optional per-group aggregation (parity: utils/__init__.py:13-33)."""
    if not callable(key):
        if key:
            key_name = key

            def key(x):
                return x[key_name]
        elif attr:
            def key(x):
                return getattr(x, attr)
        else:
            key = None

    grouped = defaultdict(list)
    for i, item in enumerate(data):
        k = freeze(key(item)) if key is not None else item
        grouped[k].append(i if save_indices else item)
    if func:
        return {k: func(v) for k, v in grouped.items()}
    return dict(grouped)


def flatten(items):
    """Parity: utils/__init__.py:36-37."""
    return list(itertools.chain(*items))


def dict_map(func, d, recursive=False):
    """Parity: utils/misc.py:120-125."""
    if not recursive:
        return {k: func(v) for k, v in d.items()}
    if isinstance(d, dict):
        return {k: dict_map(func, v, recursive) for k, v in d.items()}
    return func(d)


def iter_all_files(path, pattern="**/*"):
    """Parity: utils/misc.py:10-14."""
    full = os.path.join(path, pattern)
    yield from (x for x in glob.iglob(full, recursive=True)
                if os.path.isfile(x))


def make_dirs(path):
    os.makedirs(path or ".", exist_ok=True)


def assert_dir(path):
    make_dirs(os.path.dirname(path))
