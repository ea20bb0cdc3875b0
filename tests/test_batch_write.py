"""Resumable partitioned batch output: crash-partition rewrite, committed-
only read-back, idempotent rerun."""
import os
import shutil

import pandas as pd
import pytest
import ray.data as rd

from quanta_ray.sinks.batch_write import committed_parts, read_back, write_partitioned


def test_write_partitioned_resume(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bw"))
    df = pd.DataFrame({"k": range(500), "v": [i * 2 for i in range(500)]})
    ds = rd.from_pandas(df)

    r1 = write_partitioned(ds, d, "k", num_buckets=8)
    assert sorted(r1["written"]) == list(range(8)) and r1["skipped"] == []
    back = read_back(d, 8).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(back.columns) == ["k", "v"]  # hive part col not leaked
    assert back.equals(df)

    # crashed partition: directory (and marker) gone -> only it is rewritten
    shutil.rmtree(os.path.join(d, "part=3"))
    mtimes = {
        i: os.path.getmtime(os.path.join(d, f"part={i}", "_DONE"))
        for i in range(8)
        if i != 3
    }
    r2 = write_partitioned(ds, d, "k", num_buckets=8)
    assert r2["written"] == [3] and r2["skipped"] == [0, 1, 2, 4, 5, 6, 7]
    for i, m in mtimes.items():  # untouched partitions really untouched
        assert os.path.getmtime(os.path.join(d, f"part={i}", "_DONE")) == m
    back2 = read_back(d, 8).to_pandas().sort_values("k").reset_index(drop=True)
    assert back2.equals(df)

    # uncommitted partial (files but no marker) is cleared and rewritten
    os.remove(os.path.join(d, "part=5", "_DONE"))
    r3 = write_partitioned(ds, d, "k", num_buckets=8)
    assert r3["written"] == [5]
    assert read_back(d, 8).to_pandas()["v"].sum() == df["v"].sum()

    # fully committed -> no-op
    r4 = write_partitioned(ds, d, "k", num_buckets=8)
    assert r4 == {"written": [], "skipped": list(range(8))}


def test_read_back_ignores_uncommitted(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bw2"))
    df = pd.DataFrame({"k": range(100), "v": range(100)})
    write_partitioned(rd.from_pandas(df), d, "k", num_buckets=4)
    os.remove(os.path.join(d, "part=2", "_DONE"))  # now uncommitted
    back = read_back(d, 4).to_pandas()
    assert 0 < len(back) < 100  # partition 2's rows invisible
    with pytest.raises(FileNotFoundError):
        for i in range(4):
            p = os.path.join(d, f"part={i}", "_DONE")
            if os.path.exists(p):
                os.remove(p)
        read_back(d, 4)


def test_export_jsonl_shards_deterministic_and_resumable(ray_session, tmp_path_factory):
    """Byte-deterministic sharded JSONL export: two fresh exports produce
    identical manifests (incl. sha256); a rerun over a committed dir writes
    nothing and returns the SAME manifest; read-back equals the input; a
    crashed (uncommitted) shard is rewritten on resume."""
    import numpy as np
    import ray.data as rd

    from quanta_ray.sinks.batch_write import (
        export_jsonl_shards,
        read_jsonl_shards,
    )

    df = pd.DataFrame(
        {"doc_id": np.arange(200, dtype=np.int64),
         "text": [f"line {i} é" for i in range(200)]}
    )

    d1 = str(tmp_path_factory.mktemp("ex1"))
    d2 = str(tmp_path_factory.mktemp("ex2"))
    m1 = export_jsonl_shards(rd.from_pandas(df), d1, "doc_id", num_shards=4)
    m2 = export_jsonl_shards(rd.from_pandas(df), d2, "doc_id", num_shards=4)
    assert m1.equals(m2)                      # byte-identical across dirs
    assert m1.num_rows == 4
    assert sum(m1.column("n_rows").to_pylist()) == 200

    # rerun over the committed dir: nothing rewritten, same manifest
    mtimes = {
        i: os.path.getmtime(os.path.join(d1, f"shard={i}", "data.jsonl.gz"))
        for i in range(4)
    }
    m3 = export_jsonl_shards(rd.from_pandas(df), d1, "doc_id", num_shards=4)
    assert m3.equals(m1)
    for i in range(4):
        assert os.path.getmtime(
            os.path.join(d1, f"shard={i}", "data.jsonl.gz")
        ) == mtimes[i]

    # read-back equality
    back = read_jsonl_shards(d1, 4).sort_values("doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == df["doc_id"].tolist()
    assert back["text"].tolist() == df["text"].tolist()

    # crash simulation: remove one _DONE -> only that shard is rewritten
    os.remove(os.path.join(d1, "shard=3", "_DONE"))
    m4 = export_jsonl_shards(rd.from_pandas(df), d1, "doc_id", num_shards=4)
    assert m4.equals(m1)
    for i in range(3):
        assert os.path.getmtime(
            os.path.join(d1, f"shard={i}", "data.jsonl.gz")
        ) == mtimes[i]
