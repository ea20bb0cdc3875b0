"""Exactly-once guarantee: files not named by a committed manifest are
invisible, and a crashed epoch's orphan files are overwritten byte-identically
on resume (reference F5/F7 semantics made exactly-once)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from quanta_ray.config import CEPConfig, PipelineSpec, SourceSpec, StageSpec
from quanta_ray.engine import StreamingRunner
from quanta_ray.sinks.exactly_once import part_file_path, read_committed


def test_orphan_files_invisible_and_overwritten(ray_session, small_stream, tmp_path_factory):
    files, _ = small_stream
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        cep=CEPConfig(num_partitions=2),
    )
    d = str(tmp_path_factory.mktemp("orphans"))
    r1 = StreamingRunner(spec, d).run(stop_after_epoch=1)
    assert r1["status"] == "stopped"

    # simulate a crash mid-epoch-2: a garbage partial output landed on disk
    orphan = part_file_path(d, "turns", 0, 2)
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    pq.write_table(pa.table({"conv_id": ["GARBAGE"], "turn_idx": pa.array([0], pa.int32())}), orphan)

    # committed view never sees the orphan
    committed = read_committed(d, "turns")
    assert committed is None or "GARBAGE" not in committed.column("conv_id").to_pylist()

    # resume: epoch 2 is re-run; the deterministic writer REPLACES the garbage
    r2 = StreamingRunner(spec, d).run()
    assert r2["status"] == "complete"
    final = read_committed(d, "turns")
    assert "GARBAGE" not in final.column("conv_id").to_pylist()
    again = pq.read_table(orphan)
    assert "GARBAGE" not in again.column("conv_id").to_pylist()


def test_resume_only_final_flush(ray_session, small_stream, tmp_path_factory):
    """Crash after the LAST data epoch but before the final flush: resume
    must run just the flush and produce output identical to a single run."""
    import pyarrow.compute as pc

    files, _ = small_stream
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        cep=CEPConfig(num_partitions=2),
    )
    full_dir = str(tmp_path_factory.mktemp("flush_full"))
    StreamingRunner(spec, full_dir).run()

    d = str(tmp_path_factory.mktemp("flush_resume"))
    r1 = StreamingRunner(spec, d).run(stop_after_epoch=len(files) - 1)
    assert r1["status"] == "stopped"
    r2 = StreamingRunner(spec, d).run()
    assert r2["status"] == "complete"

    for stream in ("turns", "tumbling", "sliding", "sessions", "joins"):
        a, b = read_committed(full_dir, stream), read_committed(d, stream)
        if a is None:
            assert b is None, stream
            continue
        keys = [(a.column_names[0], "ascending"), (a.column_names[1], "ascending")]
        sa = a.take(pc.sort_indices(a, sort_keys=keys)).combine_chunks()
        sb = b.select(a.column_names)
        sb = sb.take(pc.sort_indices(sb, sort_keys=keys)).combine_chunks()
        assert sa.equals(sb), stream


def test_validate_cli_integrity(ray_session, small_stream, tmp_path_factory):
    """`validate` passes a committed run, ignores crash orphans, and fails
    on a corrupted (row-count-mismatched) data file."""
    import glob
    import os

    import pyarrow.parquet as pq

    from quanta_ray.__main__ import validate_output
    from quanta_ray.config import CEPConfig, PipelineSpec, SourceSpec, StageSpec
    from quanta_ray.engine import StreamingRunner

    files, _ = small_stream
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        cep=CEPConfig(num_partitions=2),
    )
    d = str(tmp_path_factory.mktemp("validate_out"))
    assert StreamingRunner(spec, d).run()["status"] == "complete"
    r = validate_output(d)
    assert r["status"] == "PASS" and not r["errors"] and r["data_rows"] > 0

    # an orphan (crash residue) must not fail validation
    orphan = os.path.join(d, "data", "turns", "part-99999-99999999.parquet")
    some = glob.glob(os.path.join(d, "data", "turns", "*.parquet"))[0]
    import shutil

    shutil.copy(some, orphan)
    r2 = validate_output(d)
    assert r2["status"] == "PASS" and r2["orphans_ignored"] >= 1

    # truncating a COMMITTED file must fail
    t = pq.read_table(some)
    pq.write_table(t.slice(0, max(0, t.num_rows - 1)), some)
    r3 = validate_output(d)
    assert r3["status"] == "FAIL" and any("rows on disk" in e for e in r3["errors"])
