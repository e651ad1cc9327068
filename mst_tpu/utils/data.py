"""Record/table helpers (parity: style/utils/data.py)."""

from __future__ import annotations

import csv
import os
from functools import partial


def _flatten_dict(d, reducer="path", prefix=""):
    out = {}
    sep = "/" if reducer == "path" else "_"
    for key, value in d.items():
        name = f"{prefix}{sep}{key}" if prefix else str(key)
        if isinstance(value, dict):
            out.update(_flatten_dict(value, reducer, name))
        else:
            out[name] = value
    return out


def list2df(records, flatten=False, recursive=(), columns=(),
            include_all_columns=False):
    """records -> pandas DataFrame with optional dict flattening and nested
    record columns (parity: utils/data.py:11-24)."""
    import pandas as pd
    if flatten:
        records = [_flatten_dict(d) for d in records]
    df = pd.DataFrame.from_records(records)
    for col in recursive:
        df[col] = df[col].map(partial(list2df, flatten=flatten))
    if columns:
        columns = list(columns)
        if include_all_columns:
            columns += [c for c in df.columns if c not in columns]
        df = df[columns]
    return df


def save_to_csv(path, data=(), fieldnames=None, when_exists="append", **row):
    """Append-mode dict-row CSV with header-on-create
    (parity: utils/data.py:27-46)."""
    fieldnames = fieldnames or list(row.keys())
    if when_exists == "append":
        mode = "at"
        write_header = not os.path.isfile(path)
    elif when_exists == "overwrite":
        mode = "wt"
        write_header = True
    else:
        raise ValueError(f"Unknown option: {when_exists}")
    directory = os.path.dirname(path)
    if directory:
        os.makedirs(directory, exist_ok=True)
    with open(path, mode, encoding="utf-8", newline="") as f:
        writer = csv.DictWriter(f, fieldnames)
        if write_header:
            writer.writeheader()
        if row:
            writer.writerow(row)
        for d in data:
            writer.writerow(d)
