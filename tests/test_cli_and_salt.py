"""CLI entry (reference main.go analog) and salted pre-aggregation tests."""

import json
import subprocess
import sys


def test_cli_run_pipeline(ray_session, small_stream, tmp_path):
    """python -m quanta_ray run <spec> <out> — end-to-end via the CLI spec
    path (subprocess so the CLI owns its own Ray session)."""
    files, _ = small_stream
    spec = {
        "schema_version": "v1",
        "pipeline_id": "cli-test",
        "source": {"kind": "parquet-stream", "paths": list(files)},
        "transformers": [{"name": "normalize", "timeout_ms": 1000,
                          "retry_policy": {"attempts": 3, "backoff_ms": 200}}],
        "sink": {"kind": "exactly-once-parquet", "commit_mode": "e2e"},
        "cep": {"num_partitions": 2},
    }
    spec_path = tmp_path / "pipeline.json"
    spec_path.write_text(json.dumps(spec))
    out_dir = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "quanta_ray", "run", str(spec_path), str(out_dir)],
        capture_output=True,
        text=True,
        timeout=180,
        env={**__import__("os").environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["status"] == "complete"
    assert (out_dir / "_LATEST.json").exists()


def test_salted_preagg_equals_unsalted(ray_session):
    """Hot-key salting on the stateless pre-aggregation path must not change
    the result (SURVEY §7: salt only stateless pre-aggregation)."""
    from quanta_ray.pipelines.batch_cep import tumbling_agg

    sf = "/root/testdata/sf0.001"
    plain = tumbling_agg(sf, salt=0)
    salted = tumbling_agg(sf, salt=4)
    import pyarrow.compute as pc

    def norm(t):
        return t.take(
            pc.sort_indices(t, sort_keys=[("user_id", "ascending"), ("w_start", "ascending")])
        ).combine_chunks()

    assert norm(plain).equals(norm(salted))


def test_export_stream(ray_session, small_stream, tmp_path_factory):
    """Export compacts a committed stream via Ray Data; row-for-row equal to
    read_committed."""
    import pyarrow.parquet as pq_

    from quanta_ray.__main__ import export_stream
    from quanta_ray.config import CEPConfig, PipelineSpec, SourceSpec, StageSpec
    from quanta_ray.engine import StreamingRunner
    from quanta_ray.sinks.exactly_once import read_committed

    files, _ = small_stream
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        cep=CEPConfig(num_partitions=2),
    )
    d = str(tmp_path_factory.mktemp("export_src"))
    assert StreamingRunner(spec, d).run()["status"] == "complete"
    dest = str(tmp_path_factory.mktemp("export_dst"))
    n = export_stream(d, "turns", dest)
    want = read_committed(d, "turns")
    assert n == want.num_rows
    got = pq_.read_table(dest)
    import pyarrow.compute as pc_

    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    got = got.select(want.column_names).take(pc_.sort_indices(got.select(want.column_names), sort_keys=key))
    want = want.take(pc_.sort_indices(want, sort_keys=key))
    assert got.equals(want.combine_chunks()) or got.combine_chunks().to_pydict() == want.combine_chunks().to_pydict()


def test_metrics_summary(ray_session, small_stream, tmp_path_factory):
    from quanta_ray.__main__ import summarize_metrics
    from quanta_ray.config import CEPConfig, PipelineSpec, SourceSpec, StageSpec
    from quanta_ray.engine import StreamingRunner

    files, _ = small_stream
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        cep=CEPConfig(num_partitions=2),
    )
    d = str(tmp_path_factory.mktemp("metrics_out"))
    assert StreamingRunner(spec, d).run()["status"] == "complete"
    m = summarize_metrics(d)
    assert m["committed_epochs"] == len(files) + 1  # + final flush
    assert m["source"]["n_input"] > 0
    assert m["rows_out"]["turns"] == m["source"]["n_after_chain"]
    assert m["emitted"]["tumbling"] == m["rows_out"].get("tumbling", 0)
    assert m["final_watermark"] is not None
