"""Hash-bucketed wide-aggregation helpers.

Ray Data's named-column ``groupby().aggregate()`` and per-key ``map_groups``
carry engine overhead PROPORTIONAL TO GROUP COUNT (measured: a 38k-group
sliding-window aggregate at sf0.1 runs ~10x faster through this path — 7-9.5s
native vs 0.7-0.8s bucketed; a 22k-group pair dedup went 54s → sub-second).

The fix is one level of indirection: hash the real key into ``num_buckets``
coarse buckets, let Ray shuffle/group ONLY the bucket id, and do the real
per-key reduction vectorized in pandas inside each bucket. All rows of one
key meet in one bucket, so results are exact; it is one shuffle either way.
``num_buckets`` bounds Ray-visible group count and sets reduce parallelism —
at cluster scale it should be a small multiple of total cores.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable

import numpy as np
import pandas as pd
import ray.data as rd

_MULT = np.uint64(1_000_003)

# ~64 MB compressed parquet per bucket (~256 MB in heap after decode): the
# per-bucket map_groups task materializes ONE whole bucket as a pandas
# frame, so bucket count — not a fixed 32 — is what bounds task memory at
# 100-TB inputs. Same data-sizing philosophy as read_parquet_clean's
# override_num_blocks.
_TARGET_BUCKET_BYTES = 64 * 1024 * 1024


def auto_buckets(
    ds: rd.Dataset, floor: int = 32, target_bytes: int = _TARGET_BUCKET_BYTES
) -> int:
    """Derive a bucket count from the dataset's INPUT bytes: per-bucket
    memory = input/num_buckets, so the count must grow with the data.
    Falls back to ``floor`` (the bench-tuned small-scale value, so sf0.1
    board times are unchanged) when input size is unknowable (in-memory
    datasets, synthetic sources)."""
    total = 0
    try:
        for f in ds.input_files() or []:
            p = f[7:] if f.startswith("file://") else f
            if os.path.exists(p):
                total += os.path.getsize(p)
    except Exception:
        total = 0
    if total <= 0:
        return floor
    return max(floor, math.ceil(total / target_bytes))


def add_pkey(df: pd.DataFrame, keys: list[str], num_buckets: int) -> pd.DataFrame:
    """Append a ``_pkey`` bucket column = hash(keys) % num_buckets."""
    h = np.zeros(len(df), dtype=np.uint64)
    for k in keys:
        h = h * _MULT + pd.util.hash_array(np.asarray(df[k]))
    out = df.copy()
    out["_pkey"] = (h % np.uint64(num_buckets)).astype(np.int64)
    return out


def bucketed_group_agg(
    ds: rd.Dataset,
    keys: list[str],
    agg_kwargs: dict[str, tuple[str, Any]],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """groupby(keys).agg(**agg_kwargs), bucketed.

    Exact for decomposable aggregates over (usually pre-aggregated partial)
    rows: sum/min/max/size-of-partials all combine per key inside a bucket.

    ``num_buckets=None`` (default) sizes the count to the input data with a
    16x damping factor: group_agg inputs are map-side-REDUCED partials, so
    shuffle volume is far below source bytes — sizing at full source bytes
    would spray millions of near-empty groups (the exact overhead bucketing
    exists to avoid). Callers whose partials don't reduce should pass
    ``auto_buckets(ds)`` explicitly.
    """
    if num_buckets is None:
        num_buckets = auto_buckets(ds, target_bytes=16 * _TARGET_BUCKET_BYTES)

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        return add_pkey(df, keys, num_buckets)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, as_index=False).agg(**agg_kwargs)

    return (
        ds.map_batches(_bucket, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(_final, batch_format="pandas")
    )


def bucketed_apply(
    ds: rd.Dataset,
    keys: list[str],
    bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Apply ``bucket_fn`` to each hash bucket (a union of COMPLETE key
    groups — every row of a key lands in one bucket). ``bucket_fn`` sees the
    bucket without the ``_pkey`` column and handles many keys at once,
    vectorized (or looping per key where the logic demands it).
    ``num_buckets=None`` (default) sizes the count to the input data."""
    if num_buckets is None:
        num_buckets = auto_buckets(ds)

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        return add_pkey(df, keys, num_buckets)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(g.drop(columns=["_pkey"]))

    return (
        ds.map_batches(_bucket, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(_final, batch_format="pandas")
    )
