"""Live /metrics endpoint (reference parity: telemetry/metrics.go:10-15).

Covers the server unit (fold semantics, JSON shape) and the runner wiring:
a run with metrics_port=0 serves rows-in / watermark / commit frontier per
partition WHILE the pipeline runs (fetched from the tailing idle hook) and
leaves the final snapshot readable after run() returns.
"""

import pytest

from quanta_ray.config import CEPConfig, PipelineSpec, SinkSpec, SourceSpec, StageSpec
from quanta_ray.telemetry import MetricsServer, fetch_metrics


def test_server_fold_and_serve():
    srv = MetricsServer(0)
    try:
        srv.fold_partition({"partition": 0, "epoch": 0, "rows_in": 10, "wm": 5,
                            "tumbling_emitted": 2, "t_ingest": 0.1})
        srv.fold_partition({"partition": 0, "epoch": 1, "rows_in": 7, "wm": 9,
                            "tumbling_emitted": 1, "t_ingest": 0.2})
        srv.fold_partition({"partition": 3, "epoch": 1, "rows_in": 4, "wm": 9})
        srv.fold_partition({"skipped": 2})  # replay marker: no partition key
        srv.update(epochs_committed=1, pipeline_id="t")
        snap = fetch_metrics(srv.url)
        p0 = snap["partitions"]["0"]
        assert p0["rows_in"] == 17  # counter accumulates
        assert p0["tumbling_emitted"] == 3
        assert p0["wm"] == 9 and p0["epoch"] == 1  # gauges replace
        assert p0["t_ingest_last"] == 0.2
        assert snap["rows_in_total"] == 21
        assert snap["epochs_committed"] == 1
    finally:
        srv.close()


def test_server_404_on_other_paths():
    from urllib.error import HTTPError
    from urllib.request import urlopen

    srv = MetricsServer(0)
    try:
        with pytest.raises(HTTPError):
            urlopen(srv.url.replace("/metrics", "/other"), timeout=5)
    finally:
        srv.close()


def test_runner_serves_metrics_during_run(ray_session, small_stream, tmp_path):
    from quanta_ray.engine.runner import StreamingRunner

    files, _ = small_stream
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        sink=SinkSpec(),
        cep=CEPConfig(num_partitions=4),
        metrics_port=0,
    )
    runner = StreamingRunner(spec, str(tmp_path / "out"))
    try:
        assert runner.metrics_url is not None
        mid_run: list[dict] = []

        def on_idle(_n: int) -> None:
            # tailing idle poll = the pipeline is live (workers up, epochs
            # committing); this is the "curl during a run" path
            if not mid_run:
                mid_run.append(fetch_metrics(runner.metrics_url))

        res = runner.run(follow=3, poll_sleep_s=0.01, on_idle=on_idle)
        assert res["status"] == "complete"
        assert mid_run and "partitions" in mid_run[0]
        final = fetch_metrics(runner.metrics_url)
        # rows_in counts post-late-filter rows: equals the committed
        # pass-through turns stream exactly
        from quanta_ray.sinks.exactly_once import read_committed

        turns = read_committed(str(tmp_path / "out"), "turns")
        assert final["rows_in_total"] == turns.num_rows
        assert final["epochs_committed"] == len(files)  # incl. final flush
        assert all("wm" in p for p in final["partitions"].values())
    finally:
        runner.close()
    assert runner.metrics_server is None  # close() is idempotent + final


def test_metrics_off_by_default(ray_session, small_stream, tmp_path):
    from quanta_ray.engine.runner import StreamingRunner

    files, _ = small_stream
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        cep=CEPConfig(num_partitions=4),
    )
    runner = StreamingRunner(spec, str(tmp_path / "out"))
    assert runner.metrics_server is None and runner.metrics_url is None


def test_ping_endpoint():
    """Control-plane Ping parity (control.proto:7,13): live endpoint answers
    {"status": "ok"}; /control 404s until a runner binds it."""
    from urllib.error import HTTPError
    from urllib.request import urlopen

    srv = MetricsServer(0)
    try:
        base = srv.url.replace("/metrics", "")
        assert fetch_metrics(base + "/ping") == {"status": "ok"}
        with pytest.raises(HTTPError):
            urlopen(base + "/control/pause", timeout=5)
    finally:
        srv.close()


def test_pause_resume_quiesces_dispatch(ray_session, small_stream, tmp_path):
    """PausePipeline parity (control.proto:9,18-19): pausing mid-run stops
    NEW epoch dispatch (commit frontier freezes after the in-flight window
    drains) while the endpoint stays live; resume completes the run and the
    committed output is byte-identical to an unpaused run."""
    import threading
    import time

    from quanta_ray.engine.runner import StreamingRunner
    from quanta_ray.sinks.exactly_once import read_committed

    files, _ = small_stream

    def spec() -> PipelineSpec:
        return PipelineSpec(
            source=SourceSpec(paths=tuple(files)),
            transformers=(StageSpec(name="normalize"),),
            sink=SinkSpec(),
            cep=CEPConfig(num_partitions=4),
            metrics_port=0,
        )

    # paused BEFORE run(): dispatch must not start until resume
    runner = StreamingRunner(spec(), str(tmp_path / "paused"))
    try:
        # drive pause through the HTTP control plane, as an operator would
        base = runner.metrics_url.replace("/metrics", "")
        assert fetch_metrics(base + "/control/pause")["paused"] is True
        assert runner.paused
        done: list[dict] = []
        t = threading.Thread(
            target=lambda: done.append(runner.run()), daemon=True
        )
        t.start()
        time.sleep(0.8)
        assert not done, "paused runner must not complete"
        assert read_committed(str(tmp_path / "paused"), "turns") is None
        assert fetch_metrics(base + "/control/resume")["paused"] is False
        t.join(timeout=120)
        assert done and done[0]["status"] == "complete"
        paused_turns = read_committed(str(tmp_path / "paused"), "turns")
    finally:
        runner.close()

    plain_runner = StreamingRunner(spec(), str(tmp_path / "plain"))
    try:
        res = plain_runner.run()
    finally:
        plain_runner.close()  # free the actors' CPUs for the next test
    assert res["status"] == "complete"
    plain_turns = read_committed(str(tmp_path / "plain"), "turns")
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    assert paused_turns.sort_by(key).equals(plain_turns.sort_by(key))


def test_pause_freezes_tailing_countdown(ray_session, small_stream, tmp_path):
    """Pausing a TAILING runner must freeze the end-of-stream idle
    countdown — a paused pipeline may not declare the stream ended, no
    matter how long the pause lasts relative to `follow`."""
    import threading
    import time

    from quanta_ray.engine.runner import StreamingRunner

    files, _ = small_stream
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        sink=SinkSpec(),
        cep=CEPConfig(num_partitions=4),
        metrics_port=0,
    )
    runner = StreamingRunner(spec, str(tmp_path / "out"))
    try:
        polls: list[int] = []
        paused_at = {"n": None}

        def on_idle(n: int) -> None:
            polls.append(n)
            if paused_at["n"] is None and n >= 2:
                paused_at["n"] = n
                runner.pause()

        done: list[dict] = []
        # follow=4, poll 10ms: unpaused this ends in ~40ms of idling; the
        # mid-tail pause must hold it open across 1.2s (30x that budget)
        t = threading.Thread(
            target=lambda: done.append(
                runner.run(follow=4, poll_sleep_s=0.01, on_idle=on_idle)
            ),
            daemon=True,
        )
        t.start()
        deadline = time.monotonic() + 90
        while paused_at["n"] is None and time.monotonic() < deadline:
            time.sleep(0.01)
        assert paused_at["n"] is not None, "runner never reached tailing idle"
        time.sleep(1.2)
        assert not done, "paused tailing runner must not declare end-of-stream"
        n_polls_frozen = len(polls)
        runner.resume()
        t.join(timeout=120)
        assert done and done[0]["status"] == "complete"
        # countdown resumed where it left off: only the remaining polls ran
        assert len(polls) - n_polls_frozen <= 4
    finally:
        runner.close()
