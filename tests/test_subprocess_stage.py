"""Out-of-process plugin stage (reference: transformer.proto plugin boundary,
batch-framed instead of per-record RPC): protocol round-trip, sidecar reuse,
transient-error and crash-respawn retry paths, and end-to-end parity inside
the streaming engine's transform chain."""

import os
import sys
import textwrap

import pyarrow as pa
import pytest

from quanta_ray.config import RetryPolicy
from quanta_ray.stages import RetryingStage, SubprocessTransformer, TransientError

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
UPPER_PLUGIN = os.path.join(REPO, "examples", "plugins", "upper_plugin.py")


def _batch(texts):
    return pa.table({"text": texts, "n": list(range(len(texts)))})


def _write_plugin(tmp_path, body: str) -> str:
    p = tmp_path / "plugin.py"
    p.write_text(
        textwrap.dedent(
            f"""\
            import sys
            sys.path.insert(0, {str(REPO)!r})
            import pyarrow as pa
            from quanta_ray.stages.subprocess_stage import serve_plugin
            """
        )
        + textwrap.dedent(body)
    )
    return str(p)


def test_upper_plugin_roundtrip_and_reuse():
    stage = SubprocessTransformer([sys.executable, UPPER_PLUGIN], name="upper")
    try:
        out1 = stage.transform_batch(_batch(["hello", "World"]))
        assert out1.column("text").to_pylist() == ["HELLO", "WORLD"]
        pid = stage._proc.pid
        out2 = stage.transform_batch(_batch(["again"]))
        assert out2.column("text").to_pylist() == ["AGAIN"]
        assert stage._proc.pid == pid  # sidecar reused, not respawned per batch
        # fan-out/drop native: schema + row count are the plugin's to choose
        assert out1.num_rows == 2 and out2.column("n").to_pylist() == [0]
        # oracle row path goes through the same sidecar
        assert stage.apply_row({"text": "x", "n": 9}) == [{"text": "X", "n": 9}]
    finally:
        stage.close()


def test_error_frame_is_transient_then_dead_letter(tmp_path):
    cmd = [
        sys.executable,
        _write_plugin(
            tmp_path,
            """
            def transform(batch):
                raise ValueError("scripted plugin failure")
            serve_plugin(transform)
            """,
        ),
    ]
    stage = SubprocessTransformer(cmd, name="always-error")
    try:
        with pytest.raises(TransientError, match="scripted plugin failure"):
            stage.transform_batch(_batch(["a"]))
        # under the standard retry policy: retried, then drop+ack + dead-letter
        retrying = RetryingStage(stage, RetryPolicy(attempts=2))
        out = retrying.transform_batch(_batch(["a", "b"]))
        assert out.num_rows == 0
        assert retrying.dropped_after_retries == 2
        assert len(retrying.dead_batches) == 1
    finally:
        stage.close()


def test_crash_respawns_fresh_process(tmp_path):
    # the plugin kills itself on the FIRST call of each process (tracked in a
    # marker file), succeeds afterwards: attempt 1 crashes, the retry path
    # respawns, attempt 2 succeeds — crash recovery without data loss
    marker = tmp_path / "crashed_once"
    cmd = [
        sys.executable,
        _write_plugin(
            tmp_path,
            f"""
            import os
            def transform(batch):
                if not os.path.exists({str(marker)!r}):
                    open({str(marker)!r}, "w").close()
                    os._exit(1)
                return batch
            serve_plugin(transform)
            """,
        ),
    ]
    stage = SubprocessTransformer(cmd, name="crash-once")
    try:
        retrying = RetryingStage(stage, RetryPolicy(attempts=3))
        out = retrying.transform_batch(_batch(["a", "b", "c"]))
        assert out.column("text").to_pylist() == ["a", "b", "c"]
        assert retrying.dropped_after_retries == 0
    finally:
        stage.close()


def test_pickle_ships_argv_not_pipe():
    import pickle

    stage = SubprocessTransformer([sys.executable, UPPER_PLUGIN], name="upper")
    try:
        stage.transform_batch(_batch(["warm"]))  # live pipe exists
        clone = pickle.loads(pickle.dumps(stage))
        assert clone._proc is None and clone.cmd == stage.cmd
        out = clone.transform_batch(_batch(["x"]))
        assert out.column("text").to_pylist() == ["X"]
        clone.close()
    finally:
        stage.close()


def test_subprocess_stage_in_streaming_engine(ray_session, small_stream, tmp_path):
    """Full engine run with a polyglot sidecar stage in the chain: output
    equals the in-process uppercase stage's output byte-for-byte."""
    from quanta_ray.config import CEPConfig, PipelineSpec, SinkSpec, SourceSpec, StageSpec
    from quanta_ray.engine import run_pipeline
    from quanta_ray.sinks.exactly_once import read_committed

    files, _ = small_stream
    cfg = CEPConfig(num_partitions=4)

    def run(stage: StageSpec, sub: str) -> pa.Table:
        spec = PipelineSpec(
            source=SourceSpec(paths=tuple(files)),
            transformers=(StageSpec(name="normalize"), stage),
            sink=SinkSpec(),
            cep=cfg,
        )
        out = str(tmp_path / sub)
        assert run_pipeline(spec, out)["status"] == "complete"
        t = read_committed(out, "turns")
        idx = pa.compute.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        return t.take(idx).combine_chunks()

    got = run(
        StageSpec(
            name="subprocess",
            options={"cmd": [sys.executable, UPPER_PLUGIN], "name": "upper-sidecar"},
        ),
        "sub",
    )
    want = run(StageSpec(name="uppercase"), "inproc")
    assert got.num_rows == want.num_rows
    # the in-process stage adds a `transformed_by` lineage column the plugin
    # doesn't; data columns must agree byte-for-byte
    for col in got.column_names:
        assert got.column(col).equals(want.column(col)), col
    texts = got.column("text").to_pylist()
    assert texts and all(t == t.upper() for t in texts)  # plugin really ran
