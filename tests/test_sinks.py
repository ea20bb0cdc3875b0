"""Sink tests: stdout debug sink (K1 semantics) and fire-and-forget mode (F6)."""

import glob
import io
import os

import pyarrow as pa

from quanta_ray.sinks.stdout import StdoutSink


def _batch(n=5):
    return pa.table({"x": list(range(n)), "text": [f"row-{i}" * 30 for i in range(n)]})


def test_stdout_truncates_and_counts():
    buf = io.StringIO()
    s = StdoutSink(value_max_bytes=20, stream=buf)
    s.write(_batch(3))
    lines = buf.getvalue().splitlines()
    assert len(lines) == 3
    assert lines[0].startswith("[1] ")
    assert all(len(ln) <= len("[9] ") + 20 + 3 for ln in lines)
    assert s.count == 3


def test_ack_batching_and_flush_on_close():
    # driver.go:72-87 — acks collected until batch size; flush on close
    acks = []
    s = StdoutSink(print_values=False, ack_batch_size=2, on_ack=acks.append)
    s.write(_batch(5))
    assert acks == [2, 2]  # 5 rows → two full batches, one pending
    s.close()
    assert acks == [2, 2, 1]


def test_fire_and_forget_mode(ray_session, small_stream, tmp_path_factory):
    """auto commit mode: files land, no manifests/checkpoints (F6)."""
    from quanta_ray.config import CEPConfig, PipelineSpec, SinkSpec, SourceSpec
    from quanta_ray.engine import StreamingRunner

    files, _ = small_stream
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        sink=SinkSpec(commit_mode="auto"),
        cep=CEPConfig(num_partitions=2),
    )
    d = str(tmp_path_factory.mktemp("auto_mode"))
    r = StreamingRunner(spec, d).run()
    assert r["status"] == "complete"
    assert glob.glob(os.path.join(d, "data", "turns", "*.parquet"))
    assert not glob.glob(os.path.join(d, "manifest-*.json"))
    assert not os.path.exists(os.path.join(d, "checkpoints"))


def test_ack_timer_flush():
    """K1 time-based ack flush (sink/stdout/driver.go:72-87) with an
    injected clock."""
    import io

    from quanta_ray.sinks.stdout import StdoutSink

    now = {"t": 100.0}
    acks = []
    sink = StdoutSink(
        print_values=False,
        ack_batch_size=1000,  # size never reached
        ack_flush_ms=500,
        on_ack=acks.append,
        stream=io.StringIO(),
        clock=lambda: now["t"],
    )
    import pyarrow as pa

    sink.write(pa.table({"x": [1, 2, 3]}))
    assert acks == []  # neither size nor timer reached
    now["t"] += 0.4
    sink.tick()
    assert acks == []  # 400 ms < 500 ms
    now["t"] += 0.2
    sink.tick()
    assert acks == [3]  # timer fired with pending acks
    sink.write(pa.table({"x": [4]}))
    now["t"] += 0.6
    sink.write(pa.table({"x": [5]}))  # write() checks the timer too
    assert acks == [3, 2]
    sink.close()
    assert acks == [3, 2]  # nothing pending after timer flush
