"""Streaming Parquet source ("the topic").

The input is an ordered list of Parquet files; file order = arrival order.
Offsets are ``(epoch = file index, row index)`` — the engine's analog of the
reference's Kafka ``(topic, partition, offset)`` checkpoint token
(``/root/reference/api/proto/v1/frame.proto:9-13``); ``start_from``/resume is
an epoch index (reference: ``driver_sarama.go:57-62``).

Watermarks are **precomputed from Parquet footer statistics** — no data read:
``wm_e = max(ts over epochs <= e) - allowed_lateness``. This is identical to
the oracle's definition because a late row (ts < wm at arrival) can never be
the running maximum, so max-over-all-rows == max-over-on-time-rows. Footer
stats make watermark generation O(#files) metadata reads on the driver,
which is what lets every epoch's watermark be known before dispatch and the
whole epoch pipeline run concurrently under bounded in-flight control.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def list_epoch_files(paths_or_dir: str | list[str] | tuple[str, ...]) -> list[str]:
    """Ordered epoch file list. A directory is expanded to its sorted
    ``*.parquet`` entries (lexicographic = epoch order by construction)."""
    if isinstance(paths_or_dir, (list, tuple)):
        out: list[str] = []
        for p in paths_or_dir:
            out.extend(list_epoch_files(p))
        return out
    if os.path.isdir(paths_or_dir):
        return sorted(
            os.path.join(paths_or_dir, f)
            for f in os.listdir(paths_or_dir)
            if f.endswith(".parquet")
        )
    if not os.path.exists(paths_or_dir):
        raise FileNotFoundError(f"source path does not exist: {paths_or_dir}")
    return [paths_or_dir]


def epoch_max_ts_us(path: str, ts_col: str = "ts") -> int:
    """Max ts of a file from row-group footer statistics (no data read)."""
    md = pq.read_metadata(path)
    idx = md.schema.names.index(ts_col)
    mx = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:  # fall back to reading the column
            col = pq.read_table(path, columns=[ts_col]).column(0)
            import pyarrow.compute as pc

            return pc.max(col).cast(pa.int64()).as_py()
        # use the raw physical value (int64 epoch-us for timestamp[us]);
        # st.max is a naive datetime whose .timestamp() would apply the
        # local timezone — never use it for semantics
        v_us = int(st.max_raw)
        mx = v_us if mx is None else max(mx, v_us)
    if mx is None:
        return -(1 << 62)
    return mx


def precompute_watermarks(
    files: list[str], allowed_lateness_us: int
) -> tuple[list[int], list[int]]:
    """Returns (prefix_max_ts[e], wm[e]) for every epoch e."""
    prefix: list[int] = []
    cur = -(1 << 62)
    for f in files:
        cur = max(cur, epoch_max_ts_us(f))
        prefix.append(cur)
    wms = [m - allowed_lateness_us if m > -(1 << 61) else -(1 << 62) for m in prefix]
    return prefix, wms


def plan_fragments(path: str, target_rows: int) -> list[tuple[int, int, int]]:
    """Split an epoch file into map fragments on row-group boundaries.

    Returns ``[(rg_lo, rg_hi, row_offset), ...]`` where ``row_offset`` is the
    file-global row index of the fragment's first row (the lineage offset
    base). Greedy: row groups accumulate until ``target_rows``. A file
    written as one giant row group yields a single fragment — splitting
    below row-group granularity would re-read the whole group per task.
    Metadata-only (no data read), like the watermark precompute."""
    md = pq.read_metadata(path)
    frags: list[tuple[int, int, int]] = []
    lo = 0
    off = 0
    acc = 0
    frag_off = 0
    for rg in range(md.num_row_groups):
        n = md.row_group(rg).num_rows
        acc += n
        off += n
        if acc >= target_rows:
            frags.append((lo, rg + 1, frag_off))
            lo = rg + 1
            frag_off = off
            acc = 0
    if lo < md.num_row_groups or not frags:
        frags.append((lo, md.num_row_groups, frag_off))
    return frags


# Source driver registry (reference analog: ``source/kafka/registry.go:5-18``;
# the reference registers one real driver, "sarama", and keeps empty
# placeholders as the extension surface).
SOURCE_REGISTRY = {"parquet-stream": list_epoch_files}
