"""Resumable partitioned Parquet output for BATCH pipelines.

The streaming engine already writes resumable output (per-epoch manifests,
2PC commit — ``sinks/exactly_once.py``); this is the batch counterpart for
one-shot dataset materialization at 100-TB scale, where "rerun the whole
job because one task died at 97%" is not acceptable:

- output is split into ``num_buckets`` hash partitions of a key column
  (``part=<i>/`` directories — never one giant file);
- a partition is COMMITTED only when its ``part=<i>/_DONE`` marker exists;
  the marker is written after the partition's parquet files are fully on
  disk, so a crash mid-write leaves an uncommitted partition;
- on rerun, committed partitions are SKIPPED (their rows are filtered out
  right after the scan — the write moves only missing partitions), and any
  uncommitted partial partition directory is removed and rewritten.

Readers must treat only ``_DONE``-marked partitions as output (``read_back``
below does). This mirrors the manifest discipline of the streaming sink in
the simplest form that batch jobs need.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _part_dir(out_dir: str, i: int) -> str:
    return os.path.join(out_dir, f"part={i}")


def _done_path(out_dir: str, i: int) -> str:
    return os.path.join(_part_dir(out_dir, i), "_DONE")


def committed_parts(out_dir: str, num_buckets: int) -> set[int]:
    return {i for i in range(num_buckets) if os.path.exists(_done_path(out_dir, i))}


def write_partitioned(
    ds: rd.Dataset,
    out_dir: str,
    key: str,
    num_buckets: int = 32,
) -> dict:
    """Write ``ds`` to ``out_dir`` hash-partitioned on ``key``; resumable.

    Returns ``{"written": [...], "skipped": [...]}`` partition ids. The
    partition function is the same ``pd.util.hash_array`` used by the
    engine's bucket helpers, so a rerun (or a downstream bucketed consumer)
    sees a stable row→partition mapping."""
    os.makedirs(out_dir, exist_ok=True)
    done = committed_parts(out_dir, num_buckets)
    todo = [i for i in range(num_buckets) if i not in done]
    if not todo:
        return {"written": [], "skipped": sorted(done)}

    # clear uncommitted partials from a previous crashed run
    for i in todo:
        if os.path.isdir(_part_dir(out_dir, i)):
            shutil.rmtree(_part_dir(out_dir, i))

    todo_set = frozenset(todo)

    def tag_and_prune(b: pd.DataFrame) -> pd.DataFrame:
        part = (
            pd.util.hash_array(np.asarray(b[key])) % np.uint64(num_buckets)
        ).astype(np.int64)
        b = b.assign(_part=part)
        return b[b["_part"].isin(todo_set)]

    pruned = ds.map_batches(tag_and_prune, batch_format="pandas")
    # Ray writes each partition under part=<i>/ (hive-style); blocks stream
    # straight to files — nothing materializes on the driver.
    pruned.write_parquet(out_dir, partition_cols=["_part"])
    written = []
    for i in todo:
        pdir = _part_dir_hive(out_dir, i)
        if pdir is not None:
            with open(os.path.join(pdir, "_DONE"), "w") as f:
                f.write("ok\n")
            written.append(i)
        else:
            # partition had no rows — commit an empty marker dir so a rerun
            # does not rescan for it
            os.makedirs(_part_dir(out_dir, i), exist_ok=True)
            with open(_done_path(out_dir, i), "w") as f:
                f.write("empty\n")
            written.append(i)
    return {"written": written, "skipped": sorted(done)}


def _part_dir_hive(out_dir: str, i: int) -> str | None:
    """Ray's hive-style layout writes ``_part=<i>``; normalize to the
    ``part=<i>`` convention by renaming once, idempotently."""
    hive = os.path.join(out_dir, f"_part={i}")
    want = _part_dir(out_dir, i)
    if os.path.isdir(hive) and not os.path.isdir(want):
        os.rename(hive, want)
    return want if os.path.isdir(want) else None


def read_back(out_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Read only COMMITTED partitions (``_DONE`` present)."""
    from ..schema import read_parquet_clean

    paths: list[str] = []
    for i in sorted(committed_parts(out_dir, num_buckets)):
        pdir = _part_dir(out_dir, i)
        paths.extend(
            os.path.join(pdir, f)
            for f in sorted(os.listdir(pdir))
            if f.endswith(".parquet")
        )
    if not paths:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    import pyarrow.parquet as pq

    # round-trip schema fidelity: drop the hive partition column Ray infers
    # from the part=<i>/ path (the files themselves carry the real columns)
    cols = pq.read_schema(paths[0]).names
    return read_parquet_clean(paths).select_columns(cols)
