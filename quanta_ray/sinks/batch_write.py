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


# --- sharded JSONL export (training-data handoff) -----------------------------


def _shard_dir(out_dir: str, i: int) -> str:
    return os.path.join(out_dir, f"shard={i}")


def _shard_done(out_dir: str, i: int) -> str:
    return os.path.join(_shard_dir(out_dir, i), "_DONE")


def export_jsonl_shards(
    ds: rd.Dataset,
    out_dir: str,
    key: str,
    num_shards: int = 8,
    sort_cols: list[str] | None = None,
    compress: bool = True,
) -> pa.Table:
    """Export ``ds`` as ``num_shards`` hash-sharded JSONL(.gz) files — the
    dataloader-handoff format at the end of a curation pipeline — resumable
    and byte-deterministic.

    - Each shard is written BY ITS OWN map task (the shard's rows are
      co-located by a ``groupby(_shard)``), sorted on ``sort_cols``
      (default: the shard key) so the file bytes are independent of block
      arrival order; gzip uses ``mtime=0`` so reruns produce identical
      bytes.
    - A shard is COMMITTED by writing the file under a temp name, then
      renaming and dropping a ``_DONE`` marker that CARRIES the shard's
      manifest row (rows, bytes, sha256). On rerun, committed shards are
      pruned right after the scan and their manifest rows are read back
      from the markers — the returned manifest is identical whether the
      run wrote 0 or all shards.

    Returns the full manifest as an Arrow table sorted by shard id."""
    import gzip
    import hashlib
    import json as _json

    sort_cols = sort_cols or [key]
    os.makedirs(out_dir, exist_ok=True)
    done = {
        i for i in range(num_shards) if os.path.exists(_shard_done(out_dir, i))
    }
    todo = frozenset(range(num_shards)) - done
    for i in todo:  # clear uncommitted partials from a crashed run
        if os.path.isdir(_shard_dir(out_dir, i)):
            shutil.rmtree(_shard_dir(out_dir, i))

    ext = "jsonl.gz" if compress else "jsonl"
    manifest_rows: list[dict] = []
    if todo:
        def tag_and_prune(b: pd.DataFrame) -> pd.DataFrame:
            shard = (
                pd.util.hash_array(np.asarray(b[key])) % np.uint64(num_shards)
            ).astype(np.int64)
            b = b.assign(_shard=shard)
            return b[b["_shard"].isin(todo)]

        def write_shard(g: pd.DataFrame) -> pd.DataFrame:
            i = int(g["_shard"].iloc[0])
            g = g.drop(columns=["_shard"]).sort_values(
                sort_cols, kind="mergesort"
            )
            payload = (
                g.to_json(orient="records", lines=True, force_ascii=True)
                .encode("utf-8")
            )
            if compress:
                payload = gzip.compress(payload, compresslevel=6, mtime=0)
            sdir = _shard_dir(out_dir, i)
            os.makedirs(sdir, exist_ok=True)
            tmp = os.path.join(sdir, f".tmp-data.{ext}")
            with open(tmp, "wb") as f:
                f.write(payload)
            os.rename(tmp, os.path.join(sdir, f"data.{ext}"))
            row = {
                "shard": i,
                "n_rows": len(g),
                "n_bytes": len(payload),
                "sha256": hashlib.sha256(payload).hexdigest(),
            }
            with open(_shard_done(out_dir, i), "w") as f:
                f.write(_json.dumps(row) + "\n")
            return pd.DataFrame([row])

        written = _collect(
            ds.map_batches(tag_and_prune, batch_format="pandas")
            .groupby("_shard")
            .map_groups(write_shard, batch_format="pandas")
        )
        manifest_rows.extend(written.to_pylist())
        written_ids = {r["shard"] for r in manifest_rows}
        for i in todo - written_ids:  # empty shard: commit an empty marker
            os.makedirs(_shard_dir(out_dir, i), exist_ok=True)
            row = {"shard": i, "n_rows": 0, "n_bytes": 0, "sha256": ""}
            with open(_shard_done(out_dir, i), "w") as f:
                f.write(_json.dumps(row) + "\n")
            manifest_rows.append(row)

    for i in sorted(done):  # manifest rows of already-committed shards
        with open(_shard_done(out_dir, i)) as f:
            manifest_rows.append(_json.loads(f.readline()))

    manifest_rows.sort(key=lambda r: r["shard"])
    return pa.table(
        {
            "shard": pa.array([r["shard"] for r in manifest_rows], pa.int64()),
            "n_rows": pa.array([r["n_rows"] for r in manifest_rows], pa.int64()),
            "n_bytes": pa.array([r["n_bytes"] for r in manifest_rows], pa.int64()),
            "sha256": pa.array([r["sha256"] for r in manifest_rows], pa.string()),
        }
    )


def _collect(ds: rd.Dataset) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table(
            {"shard": pa.array([], pa.int64()), "n_rows": pa.array([], pa.int64()),
             "n_bytes": pa.array([], pa.int64()), "sha256": pa.array([], pa.string())}
        )
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


def read_jsonl_shards(out_dir: str, num_shards: int = 8) -> pd.DataFrame:
    """Read back COMMITTED shards into one DataFrame (test/verification
    helper; a dataloader would stream shard files directly)."""
    import gzip

    frames = []
    for i in range(num_shards):
        if not os.path.exists(_shard_done(out_dir, i)):
            continue
        sdir = _shard_dir(out_dir, i)
        for name in sorted(os.listdir(sdir)):
            if name.startswith("data.jsonl"):
                path = os.path.join(sdir, name)
                if name.endswith(".gz"):
                    with gzip.open(path, "rt", encoding="utf-8") as f:
                        frames.append(pd.read_json(f, lines=True))
                else:
                    frames.append(pd.read_json(path, lines=True))
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)
