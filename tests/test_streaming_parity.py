"""Oracle-diff tests: the streaming engine must equal the single-threaded
interpreter row-for-row (BASELINE.json: per-turn text equality under stable
(conv_id, turn_idx) ordering), plus exactly-once kill/resume tests."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quanta_ray.config import CEPConfig, PipelineSpec, SinkSpec, SourceSpec, StageSpec
from quanta_ray.oracle import run_oracle
from quanta_ray.sinks.exactly_once import read_committed
from quanta_ray.stages import NormalizeStage, RetryingStage


def _sorted(table: pa.Table, keys) -> pa.Table:
    if table is None:
        return None
    idx = pa.compute.sort_indices(table, sort_keys=[(k, "ascending") for k in keys])
    return table.take(idx).combine_chunks()


def _assert_tables_equal(name, got: pa.Table, want: pa.Table, keys):
    __tracebackhide__ = True
    if want.num_rows == 0:
        assert got is None or got.num_rows == 0, f"{name}: expected empty, got {got.num_rows}"
        return
    assert got is not None, f"{name}: engine produced nothing, oracle has {want.num_rows}"
    got = _sorted(got.select(want.column_names), keys)
    want = _sorted(want, keys)
    assert got.num_rows == want.num_rows, f"{name}: rows {got.num_rows} != {want.num_rows}"
    for col in want.column_names:
        assert got.column(col).equals(want.column(col)), f"{name}: column {col} differs"


SORT_KEYS = {
    "turns": ["conv_id", "turn_idx"],
    "tumbling": ["conv_id", "w_start"],
    "sliding": ["conv_id", "w_start"],
    "sessions": ["conv_id", "session_id"],
    "joins": ["conv_id", "tool_turn_idx"],
    "patterns": ["conv_id", "start_ts", "start_turn_idx"],
    "count_windows": ["conv_id", "window_id"],
    "alerts": ["w_start", "scope"],
    "topk": ["w_start", "rank"],
    "sessquant": ["epoch", "q"],
    "convhist": ["w_start", "bucket"],
    "tooluse": ["w_start", "tool"],
    "drift": ["w_start"],
    "late": ["conv_id", "turn_idx", "ts"],
    "newconvs": ["w_start"],
    "noreply": ["conv_id", "ts", "turn_idx"],
    "resplat": ["conv_id"],
    "runs": ["conv_id", "start_ts", "start_turn_idx"],
}


@pytest.fixture(scope="module")
def engine_and_oracle(ray_session, small_stream, tmp_path_factory):
    from quanta_ray.engine import run_pipeline

    files, _params = small_stream
    cfg = CEPConfig(num_partitions=4, count_window_size=5, alert_ratio=0.5,
                    alert_scopes=("all", "user", "assistant", "tool"),
                    topk_k=3, sess_quantiles=(0.5, 0.95), conv_hist=True,
                    tool_usage=True, role_drift=True, resp_latency=True,
                    run_min_len=2, noreply_timeout_us=45 * 60 * 1_000_000,
                    late_output=True, new_convs=True)
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        sink=SinkSpec(),
        cep=cfg,
    )
    out_dir = str(tmp_path_factory.mktemp("engine_out"))
    summary = run_pipeline(spec, out_dir)
    assert summary["status"] == "complete"

    oracle = run_oracle(
        (pq.read_table(f) for f in files),
        cfg,
        stages=[RetryingStage(NormalizeStage())],
    )
    return out_dir, oracle


@pytest.mark.parametrize(
    "stream",
    ["turns", "tumbling", "sliding", "sessions", "joins", "patterns", "count_windows", "alerts", "sessquant", "convhist", "tooluse", "drift", "late", "newconvs", "noreply", "resplat", "runs"],
)
def test_stream_matches_oracle(engine_and_oracle, stream):
    out_dir, oracle = engine_and_oracle
    got = read_committed(out_dir, stream)
    _assert_tables_equal(stream, got, oracle[stream], SORT_KEYS[stream])


def test_alerts_stream_nonempty(engine_and_oracle):
    """The burst fixture must actually fire alerts (parity isn't vacuous):
    ratio 0.5 fires for any window ≥ half the previous non-empty window's
    count, so the fixture must produce alert rows."""
    _out_dir, oracle = engine_and_oracle
    assert oracle["alerts"].num_rows > 0


def test_topk_stream_nonempty_and_bounded(engine_and_oracle):
    """topk parity isn't vacuous: rows exist, ≤ k per window, ranks are
    1..m contiguous within each window."""
    _out_dir, oracle = engine_and_oracle
    t = oracle["topk"]
    assert t.num_rows > 0
    df = t.to_pandas()
    per_w = df.groupby("w_start")["rank"]
    assert (per_w.count() <= 3).all()  # fixture cfg topk_k=3
    assert (per_w.min() == 1).all()
    assert (per_w.max() == per_w.count()).all()


def test_topk_planted_winner_and_tie(ray_session, tmp_path):
    """Ground-truth pin: conv A dominates the hour, B and C tie and the
    lexicographically smaller conv wins rank 2; partitions split the convs,
    so the committed rows also prove the cross-partition merge is exact."""
    import pandas as pd

    from quanta_ray.engine import run_pipeline
    from quanta_ray.sinks.exactly_once import read_committed

    base = 3_600_000_000 * 1000  # some hour boundary, µs
    rows = []
    for conv, n in (("a-big", 5), ("c-tie", 3), ("b-tie", 3)):
        for i in range(n):
            rows.append((conv, i, "user", f"t{i}", "", base + i * 1_000_000))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["ts"] = pd.to_datetime(df["ts"], unit="us").astype("datetime64[us]")
    f = str(tmp_path / "epoch-00000.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), f)

    spec = PipelineSpec(
        source=SourceSpec(paths=(f,)),
        transformers=(StageSpec(name="normalize"),),
        sink=SinkSpec(),
        cep=CEPConfig(num_partitions=3, topk_k=2),
    )
    out = str(tmp_path / "out")
    assert run_pipeline(spec, out)["status"] == "complete"
    t = read_committed(out, "topk").to_pandas().sort_values("rank")
    assert list(t["conv_id"]) == ["a-big", "b-tie"]
    assert list(t["rank"]) == [1, 2]
    assert list(t["n_turns"]) == [5, 3]


def test_runs_stream_nonempty(engine_and_oracle):
    """runs parity isn't vacuous: the fixture produces >= 1 maximal
    same-role run of length >= 2, and every row respects the min-length."""
    _out_dir, oracle = engine_and_oracle
    t = oracle["runs"]
    assert t.num_rows > 0
    assert min(t.column("run_len").to_pylist()) >= 2


def test_runs_planted_merge_break_flush(ray_session, tmp_path):
    """Ground-truth pin for the run-length quantifier: a user run that
    straddles epochs merges through the compacted tail (len 4), the
    trailing assistant run emits at final flush (len 2), a tail broken by
    a different-role row in a later epoch emits exactly once, alternating
    roles emit nothing, and sub-threshold runs are suppressed."""
    import pandas as pd

    from quanta_ray.engine import run_pipeline
    from quanta_ray.sinks.exactly_once import read_committed

    S = 1_000_000  # 1 s in µs

    def mk(rows):
        df = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        df["ts"] = pd.to_datetime(df["ts"], unit="us").astype("datetime64[us]")
        return pa.Table.from_pandas(df, preserve_index=False)

    e0 = [
        ("x", 0, "user", "x0", "", 0 * S),
        ("x", 1, "user", "x1", "", 10 * S),
        ("z", 0, "assistant", "z0", "", 5 * S),
        ("z", 1, "assistant", "z1", "", 6 * S),
        ("y", 0, "user", "y0", "", 3 * S),
    ]
    e1 = [
        ("x", 2, "user", "x2", "", 7200 * S),
        ("x", 3, "user", "x3", "", 7210 * S),
        ("x", 4, "assistant", "x4", "", 7220 * S),
        ("x", 5, "assistant", "x5", "", 7230 * S),
        ("z", 2, "user", "z2", "", 7200 * S),
        ("y", 1, "assistant", "y1", "", 7201 * S),
        ("y", 2, "user", "y2", "", 7202 * S),
    ]
    f0, f1 = str(tmp_path / "epoch-00000.parquet"), str(tmp_path / "epoch-00001.parquet")
    pq.write_table(mk(e0), f0)
    pq.write_table(mk(e1), f1)

    spec = PipelineSpec(
        source=SourceSpec(paths=(f0, f1)),
        transformers=(StageSpec(name="normalize"),),
        sink=SinkSpec(),
        cep=CEPConfig(num_partitions=2, run_min_len=2,
                      allowed_lateness_us=3600 * S),
    )
    out = str(tmp_path / "out")
    assert run_pipeline(spec, out)["status"] == "complete"
    t = read_committed(out, "runs").to_pandas().sort_values(
        ["conv_id", "start_turn_idx"]
    )
    got = list(
        zip(t["conv_id"], t["role"], t["run_len"],
            t["start_turn_idx"], t["end_turn_idx"])
    )
    assert got == [
        ("x", "user", 4, 0, 3),       # straddles epochs: tail-merge path
        ("x", "assistant", 2, 4, 5),  # unbroken at close: final-flush drain
        ("z", "assistant", 2, 0, 1),  # tail broken by a later-epoch user row
    ]


def test_noreply_planted_semantics(ray_session, tmp_path):
    """Ground-truth pin for the absence/timeout stream: a simultaneous
    assistant does NOT answer (half-open window), an assistant at exactly
    ts+timeout DOES (inclusive), a later one does not, a cross-epoch
    assistant inside the window answers, and exact duplicate user rows
    emit ONE row."""
    import pandas as pd

    from quanta_ray.engine import run_pipeline
    from quanta_ray.sinks.exactly_once import read_committed

    S = 1_000_000  # 1 s in µs

    def mk(rows):
        df = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        )
        df["ts"] = pd.to_datetime(df["ts"], unit="us").astype("datetime64[us]")
        return pa.Table.from_pandas(df, preserve_index=False)

    e0 = [
        ("a", 0, "user", "a0", "", 0),            # simultaneous asst below: unanswered
        ("a", 1, "assistant", "a1", "", 0),        # ts == user ts: does NOT answer
        ("b", 0, "user", "b0", "", 0),
        ("b", 1, "assistant", "b1", "", 100 * S),  # exactly ts+timeout: answers
        ("c", 0, "user", "c0", "", 0),
        ("c", 1, "assistant", "c1", "", 101 * S),  # one past the window: too late
        ("d", 0, "user", "d0", "", 0),
        ("d", 1, "assistant", "d1", "", 50 * S),   # in-window same epoch: answers
        ("e", 0, "user", "e0", "", 0),             # answered from the NEXT epoch
        ("f", 0, "user", "f0", "", 0),             # exact fan-out duplicate ...
        ("f", 0, "user", "f0", "", 0),             # ... emits ONE row
    ]
    e1 = [
        ("e", 1, "assistant", "e1", "", 80 * S),   # cross-epoch in-window answer
        ("zz", 0, "assistant", "zz0", "", 100000 * S),  # watermark driver
    ]
    f0, f1 = str(tmp_path / "epoch-00000.parquet"), str(tmp_path / "epoch-00001.parquet")
    pq.write_table(mk(e0), f0)
    pq.write_table(mk(e1), f1)

    spec = PipelineSpec(
        source=SourceSpec(paths=(f0, f1)),
        transformers=(StageSpec(name="normalize"),),
        sink=SinkSpec(),
        cep=CEPConfig(num_partitions=2, noreply_timeout_us=100 * S,
                      allowed_lateness_us=3600 * S),
    )
    out = str(tmp_path / "out")
    assert run_pipeline(spec, out)["status"] == "complete"
    t = read_committed(out, "noreply").to_pandas().sort_values(["conv_id", "ts"])
    got = list(zip(t["conv_id"], t["turn_idx"]))
    assert got == [("a", 0), ("c", 0), ("f", 0)]
    assert (
        t["deadline"].astype("datetime64[us]").astype("int64")
        == t["ts"].astype("datetime64[us]").astype("int64") + 100 * S
    ).all()


def test_late_rows_were_dropped(engine_and_oracle):
    out_dir, oracle = engine_and_oracle
    assert oracle["metrics"]["n_late_dropped"] > 0, "fixture should contain late rows"
    import json, glob, os

    n_late = 0
    for m in glob.glob(os.path.join(out_dir, "manifest-*.json")):
        with open(m) as f:
            d = json.load(f)
        n_late += d.get("source_stats", {}).get("n_late_dropped", 0)
    assert n_late == oracle["metrics"]["n_late_dropped"]


def test_fragment_parallel_parity(ray_session, small_stream, tmp_path_factory):
    """A stream written with tiny row groups (many map fragments per epoch)
    must produce output identical to the oracle — fragment splitting is a
    physical-plan choice, never a semantic one."""
    from quanta_ray.engine import run_pipeline
    from quanta_ray.fixtures import TranscriptParams, generate_transcripts, write_stream
    from quanta_ray.sources.stream import plan_fragments

    params = TranscriptParams(n_convs=60, seed=42, n_epochs=5)
    d = tmp_path_factory.mktemp("stream_fragmented")
    files = write_stream(generate_transcripts(params), str(d), params.n_epochs, row_group_size=50)
    assert len(plan_fragments(files[0], 100)) > 1, "fixture must yield multiple fragments"

    cfg = CEPConfig(num_partitions=4)
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files), fragment_rows=100),
        transformers=(StageSpec(name="normalize"),),
        sink=SinkSpec(),
        cep=cfg,
    )
    out_dir = str(tmp_path_factory.mktemp("engine_out_frag"))
    assert run_pipeline(spec, out_dir)["status"] == "complete"

    oracle = run_oracle(
        (pq.read_table(f) for f in files),
        cfg,
        stages=[RetryingStage(NormalizeStage())],
    )
    for stream, keys in SORT_KEYS.items():
        _assert_tables_equal(stream, read_committed(out_dir, stream), oracle[stream], keys)


def test_migration_parity_under_skew(ray_session, tmp_path_factory):
    """Aggressive between-epoch partition migration (rebalance every epoch,
    any imbalance triggers) over a Zipf-skewed stream must not change a
    single output row vs the oracle — hosting is physical, state is
    per-partition and pure."""
    from quanta_ray.engine import StreamingRunner
    from quanta_ray.fixtures import TranscriptParams, make_stream

    d = tmp_path_factory.mktemp("stream_skewed")
    params = TranscriptParams(n_convs=40, seed=7, zipf_a=1.2, n_epochs=6)
    files = make_stream(str(d), params)
    cfg = CEPConfig(num_partitions=4, run_min_len=2)
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        cep=cfg,
        rebalance_every=1,
        rebalance_ratio=1.0,
    )
    out_dir = str(tmp_path_factory.mktemp("engine_out_mig"))
    summary = StreamingRunner(spec, out_dir).run()
    assert summary["status"] == "complete"

    oracle = run_oracle(
        (pq.read_table(f) for f in files),
        cfg,
        stages=[RetryingStage(NormalizeStage())],
    )
    for stream, keys in SORT_KEYS.items():
        _assert_tables_equal(stream, read_committed(out_dir, stream), oracle[stream], keys)


def test_kill_resume_identical(ray_session, small_stream, tmp_path_factory):
    """Crash after epoch 1, resume → byte-identical committed output."""
    from quanta_ray.engine import StreamingRunner

    files, _ = small_stream
    cfg = CEPConfig(num_partitions=3, count_window_size=4, alert_ratio=0.5,
                    topk_k=3, sess_quantiles=(0.5, 0.9), conv_hist=True,
                    tool_usage=True, role_drift=True, resp_latency=True,
                    run_min_len=2, noreply_timeout_us=45 * 60 * 1_000_000,
                    late_output=True, new_convs=True)
    # checkpoint_every=2 exercises the restore-then-replay resume path
    # (crash after epoch 2 → state restored from epoch 1, epoch 2 replayed)
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        cep=cfg,
        checkpoint_every=2,
    )
    full_dir = str(tmp_path_factory.mktemp("full_run"))
    StreamingRunner(spec, full_dir).run()

    resumed_dir = str(tmp_path_factory.mktemp("resumed_run"))
    r1 = StreamingRunner(spec, resumed_dir).run(stop_after_epoch=2)
    assert r1["status"] == "stopped"
    r2 = StreamingRunner(spec, resumed_dir).run()
    assert r2["status"] == "complete"

    for stream, keys in SORT_KEYS.items():
        a = read_committed(full_dir, stream)
        b = read_committed(resumed_dir, stream)
        if a is None:
            assert b is None
            continue
        a, b = _sorted(a, keys), _sorted(b.select(a.column_names), keys)
        assert a.equals(b), f"{stream}: resume output differs from single run"


def test_resume_before_any_checkpoint(ray_session, small_stream, tmp_path_factory):
    """Crash after epoch 0 with checkpoint_every=4 and P=3: NO partition has
    a checkpoint in any committed manifest ((0+1+p)%4 != 0 for p<3). Resume
    must rebuild every partition from fresh state by replaying epoch 0, and
    final output must equal an uninterrupted run (ADVICE: resume previously
    asserted len(per_part) == P and aborted)."""
    import json, os

    from quanta_ray.engine import StreamingRunner

    files, _ = small_stream
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        cep=CEPConfig(num_partitions=3),
        checkpoint_every=4,
    )
    full_dir = str(tmp_path_factory.mktemp("full_run_nockpt"))
    StreamingRunner(spec, full_dir).run()

    resumed_dir = str(tmp_path_factory.mktemp("resumed_nockpt"))
    r1 = StreamingRunner(spec, resumed_dir).run(stop_after_epoch=0)
    assert r1["status"] == "stopped"
    with open(os.path.join(resumed_dir, "manifest-00000000.json")) as f:
        assert json.load(f)["checkpoints"] == [], "fixture must hit the no-checkpoint path"
    r2 = StreamingRunner(spec, resumed_dir).run()
    assert r2["status"] == "complete"

    for stream, keys in SORT_KEYS.items():
        a = read_committed(full_dir, stream)
        b = read_committed(resumed_dir, stream)
        if a is None:
            assert b is None
            continue
        a, b = _sorted(a, keys), _sorted(b.select(a.column_names), keys)
        assert a.equals(b), f"{stream}: resume output differs from single run"


def test_hot_conv_isolated_by_migration(ray_session, tmp_path_factory):
    """Hot-conversation handling (SURVEY §7): a conversation can never be
    split across partitions (session merge + join pairing forbid it), so the
    unit of skew relief is its PARTITION — the cost-EMA rebalancer must
    shed other partitions off the hot conv's worker until it is effectively
    dedicated. Asserts migrations happened, the hot partition itself never
    moved (no thrash), its worker ended with the minimum load, and output
    stays oracle-identical."""
    import numpy as np
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_

    from quanta_ray.engine import StreamingRunner
    from quanta_ray.engine.runner import partition_ids
    from quanta_ray.fixtures import (
        BASE_TS_US,
        TranscriptParams,
        generate_transcripts,
        write_stream,
    )
    from quanta_ray.schema import TRANSCRIPT_SCHEMA

    # plant a single dominant conversation: 20k alternating turns at 1 s gaps
    n_hot = 20000
    hot = pa.Table.from_arrays(
        [
            pa.array(["conv-hot"] * n_hot),
            pa.array(np.arange(n_hot, dtype=np.int32), type=pa.int32()),
            pa.array(np.where(np.arange(n_hot) % 2 == 0, "user", "assistant")),
            pa.array([f"conv-hot:{i}" for i in range(n_hot)]),
            pa.array([""] * n_hot),
            pa.array(BASE_TS_US + np.arange(n_hot) * 1_000_000, type=pa.int64()).cast(
                pa.timestamp("us")
            ),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )
    base = generate_transcripts(TranscriptParams(n_convs=30, seed=5, n_epochs=1))
    table = pa.concat_tables([hot, base])
    table = table.take(
        pc_.sort_indices(table, sort_keys=[("ts", "ascending")])
    )  # arrival ≈ event time
    d = tmp_path_factory.mktemp("stream_hot")
    n_epochs = 6
    files = write_stream(table, str(d), n_epochs)

    P = 4
    conv = np.asarray(table.column("conv_id").to_pandas(), dtype=object)
    counts = np.bincount(partition_ids(conv, P), minlength=P)
    hot_part = int(partition_ids(np.array(["conv-hot"], dtype=object), P)[0])
    assert counts[hot_part] > 4 * np.median(np.delete(counts, hot_part))

    cfg = CEPConfig(num_partitions=P)
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        cep=cfg,
        rebalance_every=1,
        rebalance_ratio=1.1,
    )
    out_dir = str(tmp_path_factory.mktemp("engine_out_hot"))
    runner = StreamingRunner(spec, out_dir)
    summary = runner.run()
    assert summary["status"] == "complete"
    assert summary["migrations"], "skewed load must trigger at least one migration"
    # the worker hosting the hot partition must have shed load: it ends with
    # no more partitions than any other worker (dedicated-slot effect)
    final_counts = [len(pids) for pids in runner._assign]
    hot_worker = next(mi for mi, pids in enumerate(runner._assign) if hot_part in pids)
    assert final_counts[hot_worker] == min(final_counts)

    oracle = run_oracle(
        (pq_.read_table(f) for f in files),
        cfg,
        stages=[RetryingStage(NormalizeStage())],
    )
    for stream, keys in SORT_KEYS.items():
        _assert_tables_equal(stream, read_committed(out_dir, stream), oracle[stream], keys)


def test_migration_then_kill_resume(ray_session, tmp_path_factory):
    """Aggressive migration + staggered checkpoints + mid-run crash: the
    resumed run (fresh static worker layout) must reproduce the
    uninterrupted run byte-for-byte. Exercises checkpoint blobs written by
    whichever worker happened to host a partition at checkpoint time."""
    from quanta_ray.engine import StreamingRunner
    from quanta_ray.fixtures import TranscriptParams, make_stream

    d = tmp_path_factory.mktemp("stream_migres")
    params = TranscriptParams(n_convs=50, seed=13, zipf_a=1.3, n_epochs=6)
    files = make_stream(str(d), params)
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        cep=CEPConfig(num_partitions=4),
        checkpoint_every=3,
        rebalance_every=1,
        rebalance_ratio=1.0,
    )
    full_dir = str(tmp_path_factory.mktemp("full_migres"))
    StreamingRunner(spec, full_dir).run()

    resumed_dir = str(tmp_path_factory.mktemp("resumed_migres"))
    r1 = StreamingRunner(spec, resumed_dir).run(stop_after_epoch=3)
    assert r1["status"] == "stopped"
    r2 = StreamingRunner(spec, resumed_dir).run()
    assert r2["status"] == "complete"

    for stream, keys in SORT_KEYS.items():
        a = read_committed(full_dir, stream)
        b = read_committed(resumed_dir, stream)
        if a is None:
            assert b is None
            continue
        a, b = _sorted(a, keys), _sorted(b.select(a.column_names), keys)
        assert a.equals(b), f"{stream}: resume output differs from single run"


def test_tailing_source_picks_up_new_epochs(ray_session, tmp_path_factory):
    """Tailing mode (reference: consumer loops on new records forever,
    driver_sarama.go:71-82): a file appended mid-run is discovered on an
    idle poll, committed, and included in the final output."""
    from quanta_ray.engine import StreamingRunner
    from quanta_ray.fixtures import TranscriptParams, generate_transcripts, write_stream

    params = TranscriptParams(n_convs=40, seed=11, n_epochs=4)
    d = tmp_path_factory.mktemp("stream_tail")
    table = generate_transcripts(params)
    files = write_stream(table, str(d), 4)
    # hold back the last epoch; the producer "appends" it mid-run
    import os

    held_back = files[3]
    hidden = held_back + ".hidden"
    os.rename(held_back, hidden)

    appended = {"done": False}

    def producer(idle_polls: int) -> None:
        if not appended["done"]:
            os.rename(hidden, held_back)
            appended["done"] = True

    cfg = CEPConfig(num_partitions=3)
    spec = PipelineSpec(
        source=SourceSpec(paths=(str(d),)),  # directory source → re-listable
        transformers=(StageSpec(name="normalize"),),
        cep=cfg,
    )
    out_dir = str(tmp_path_factory.mktemp("engine_out_tail"))
    summary = StreamingRunner(spec, out_dir).run(
        follow=3, poll_sleep_s=0.0, on_idle=producer
    )
    assert summary["status"] == "complete"
    assert summary["epochs"] == 4 and appended["done"]

    oracle = run_oracle(
        (pq.read_table(f) for f in files),
        cfg,
        stages=[RetryingStage(NormalizeStage())],
    )
    for stream, keys in SORT_KEYS.items():
        _assert_tables_equal(stream, read_committed(out_dir, stream), oracle[stream], keys)


def test_epoch_completes_past_hanging_stage(ray_session, small_stream, tmp_path_factory):
    """A deliberately hung stage call must not hang the epoch: the watchdog
    times the call out and the retry path completes it (VERDICT item 5)."""
    from quanta_ray.config import RetryPolicy
    from quanta_ray.engine import run_pipeline

    files, _ = small_stream
    cfg = CEPConfig(num_partitions=2)
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(
            StageSpec(
                name="hang",
                timeout_ms=100,
                retry=RetryPolicy(attempts=3),
                options={"hang_s": 30.0, "hang_times": 1},
            ),
            StageSpec(name="normalize"),
        ),
        cep=cfg,
    )
    out_dir = str(tmp_path_factory.mktemp("engine_out_hang"))
    summary = run_pipeline(spec, out_dir)
    assert summary["status"] == "complete"
    # first call per fragment hung once and was retried — zero rows lost
    oracle = run_oracle(
        (pq.read_table(f) for f in files),
        cfg,
        stages=[RetryingStage(NormalizeStage())],
    )
    _assert_tables_equal(
        "turns", read_committed(out_dir, "turns"), oracle["turns"], SORT_KEYS["turns"]
    )


def test_rerun_is_noop(ray_session, small_stream, tmp_path_factory):
    from quanta_ray.engine import StreamingRunner

    files, _ = small_stream
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"),),
        cep=CEPConfig(num_partitions=2),
    )
    d = str(tmp_path_factory.mktemp("noop"))
    assert StreamingRunner(spec, d).run()["status"] == "complete"
    assert StreamingRunner(spec, d).run()["status"] == "already-complete"


def test_dead_letter_stream(ray_session, small_stream, tmp_path_factory):
    """Rows dropped after retry exhaustion are committed to the deadletter
    stream (tagged with stage + reason); drop+ack semantics unchanged — no
    downstream output is produced for them."""
    from quanta_ray.config import RetryPolicy
    from quanta_ray.engine import StreamingRunner

    files, _ = small_stream
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(
            StageSpec(name="normalize"),
            StageSpec(
                name="error_then_ok",
                retry=RetryPolicy(attempts=2),
                options={"fail_times": 10**9},  # never recovers
            ),
        ),
        cep=CEPConfig(num_partitions=2),
    )
    d = str(tmp_path_factory.mktemp("deadletter_out"))
    assert StreamingRunner(spec, d).run()["status"] == "complete"

    dead = read_committed(d, "deadletter")
    assert dead is not None and dead.num_rows > 0
    assert set(dead.column("_stage").to_pylist()) == {"error_then_ok"}
    assert set(dead.column("_reason").to_pylist()) == {"retries_exhausted"}
    # every non-late input row is accounted for in the deadletter stream
    import json, os

    n_in = n_late = 0
    for e in range(len(files)):
        with open(os.path.join(d, f"manifest-{e:08d}.json")) as f:
            ss = json.load(f)["source_stats"]
        n_in += ss["n_input"]
        n_late += ss["n_late_dropped"]
    assert dead.num_rows == n_in - n_late
    # nothing flowed downstream
    for stream in ("turns", "tumbling", "sliding", "sessions", "joins", "patterns"):
        t = read_committed(d, stream)
        assert t is None or t.num_rows == 0, stream


def test_fanout_chain_parity(ray_session, small_stream, tmp_path_factory):
    """1→2 fan-out ahead of the stateful CEP stage: window/session counts
    double consistently and duplicate tool rows resolve to ONE join row
    (the oracle's (conv, turn_idx) dedup — ADVICE r2 fix), engine equal to
    oracle on every stream."""
    from quanta_ray.engine import run_pipeline
    from quanta_ray.stages.transforms import FanoutStage

    files, _ = small_stream
    cfg = CEPConfig(num_partitions=3)
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(StageSpec(name="normalize"), StageSpec(name="fanout")),
        cep=cfg,
    )
    out_dir = str(tmp_path_factory.mktemp("engine_out_fanout"))
    assert run_pipeline(spec, out_dir)["status"] == "complete"

    oracle = run_oracle(
        (pq.read_table(f) for f in files),
        cfg,
        stages=[RetryingStage(NormalizeStage()), RetryingStage(FanoutStage())],
    )
    for stream, keys in SORT_KEYS.items():
        got = read_committed(out_dir, stream)
        want = oracle[stream]
        if stream == "turns":
            # fan-out rows share (conv_id, turn_idx); sort on the full row
            keys = ["conv_id", "turn_idx", "fanout_copy"]
        _assert_tables_equal(stream, got, want, keys)


def test_ooo_commit_straggler_does_not_block_dispatch(
    ray_session, small_stream, tmp_path_factory
):
    """F2/F3 wired into the runner: with ``ooo_commit`` a straggler epoch
    must not head-of-line-block dispatch. The straggler is a scripted write
    BARRIER in epoch 1 — its write task holds until epoch 2's turns files
    exist on disk, so the inversion is deterministic at any host speed —
    the realistic inversion case: stateful worker chains are epoch-ordered
    by actor construction, but write tasks run on independent slots, so
    later epochs fully complete while epoch 1's write drags. Completion
    order shows a later epoch resolving before epoch 1, the uncommitted
    backlog exceeds the in-flight window (dispatch ran ahead), manifests
    still commit strictly contiguously (LowWatermarkTracker), and output is
    byte-identical to the in-order run."""
    from quanta_ray.engine import StreamingRunner

    files, _ = small_stream
    cfg = CEPConfig(num_partitions=3)

    def mk_spec(ooo: bool) -> PipelineSpec:
        return PipelineSpec(
            source=SourceSpec(
                paths=tuple(files), max_inflight_epochs=2, ooo_commit=ooo
            ),
            transformers=(StageSpec(name="normalize"),),
            # straggler injected only in the ooo run (a held write changes
            # timing, never bytes — the in-order baseline needn't pay it)
            sink=SinkSpec(
                options={
                    "debug_slow_write_epoch": 1,
                    "debug_write_barrier_until_epoch": 3,
                }
                if ooo
                else {}
            ),
            cep=cfg,
        )

    inorder_dir = str(tmp_path_factory.mktemp("inorder_run"))
    StreamingRunner(mk_spec(False), inorder_dir).run()

    ooo_dir = str(tmp_path_factory.mktemp("ooo_run"))
    res = StreamingRunner(mk_spec(True), ooo_dir).run()
    assert res["status"] == "complete"
    co = res["ooo_completion_order"]
    # later epochs resolved while the straggler write dragged; epoch 1 either
    # resolved after them or was still pending when the loop drained
    assert 2 in co and 3 in co, co
    assert 1 not in co or co.index(2) < co.index(1), co
    # dispatch ran ahead: more epochs sat uncommitted than the window allows
    assert res["max_uncommitted"] > 2, res

    # committed manifests are a contiguous prefix ending at the flush epoch
    import glob, os

    epochs = sorted(
        int(os.path.basename(p)[len("manifest-") : -len(".json")])
        for p in glob.glob(os.path.join(ooo_dir, "manifest-*.json"))
    )
    assert epochs == list(range(len(files) + 1))

    for stream, keys in SORT_KEYS.items():
        a = read_committed(inorder_dir, stream)
        b = read_committed(ooo_dir, stream)
        if a is None:
            assert b is None
            continue
        a, b = _sorted(a, keys), _sorted(b.select(a.column_names), keys)
        assert a.equals(b), f"{stream}: ooo output differs from in-order run"


def test_ooo_commit_kill_resume_identical(ray_session, small_stream, tmp_path_factory):
    """Kill/resume under ooo_commit stays byte-identical (the commit frontier
    is contiguous, so resume semantics are unchanged)."""
    from quanta_ray.engine import StreamingRunner

    files, _ = small_stream
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files), max_inflight_epochs=2, ooo_commit=True),
        transformers=(StageSpec(name="normalize"),),
        cep=CEPConfig(num_partitions=3),
        checkpoint_every=2,
    )
    full_dir = str(tmp_path_factory.mktemp("ooo_full"))
    StreamingRunner(spec, full_dir).run()
    resumed_dir = str(tmp_path_factory.mktemp("ooo_resumed"))
    assert StreamingRunner(spec, resumed_dir).run(stop_after_epoch=2)["status"] == "stopped"
    assert StreamingRunner(spec, resumed_dir).run()["status"] == "complete"
    for stream, keys in SORT_KEYS.items():
        a = read_committed(full_dir, stream)
        b = read_committed(resumed_dir, stream)
        if a is None:
            assert b is None
            continue
        a, b = _sorted(a, keys), _sorted(b.select(a.column_names), keys)
        assert a.equals(b), f"{stream}: ooo resume output differs"


def test_resume_after_flush_with_grown_source_raises(
    ray_session, small_stream, tmp_path_factory
):
    """ADVICE r2: a completed (final-flushed) run whose source directory
    later grew must fail loudly on re-run instead of silently replaying the
    new file as an already-committed epoch (its rows would never commit)."""
    import os
    import shutil

    from quanta_ray.engine import StreamingRunner

    files, _ = small_stream
    d = str(tmp_path_factory.mktemp("grown_src"))
    local = []
    for f in files:
        dst = os.path.join(d, os.path.basename(f))
        shutil.copy(f, dst)
        local.append(dst)
    spec = PipelineSpec(
        source=SourceSpec(paths=(d,)),
        transformers=(StageSpec(name="normalize"),),
        cep=CEPConfig(num_partitions=3),
    )
    out_dir = str(tmp_path_factory.mktemp("grown_out"))
    assert StreamingRunner(spec, out_dir).run()["status"] == "complete"
    # rerun without growth stays a no-op
    assert StreamingRunner(spec, out_dir).run()["status"] == "already-complete"
    # grow the source AFTER the final flush → must raise, not lose data
    shutil.copy(files[0], os.path.join(d, "zz-late-arrival.parquet"))
    with pytest.raises(ValueError, match="final-flush"):
        StreamingRunner(spec, out_dir).run()


def test_per_row_status_chain_parity(ray_session, small_stream, tmp_path_factory):
    """A chain containing the per-row-status scripted stage (odd turn_idx
    rows RETRY once, every 5th turn DROP) runs through the full streaming
    engine and equals the oracle on every stream — per-row status is
    semantics-preserving under fragmentation, partitioning and retry."""
    from quanta_ray.engine import run_pipeline
    from quanta_ray.stages.transforms import RetryOddStage

    files, _ = small_stream
    cfg = CEPConfig(num_partitions=3)
    spec = PipelineSpec(
        source=SourceSpec(paths=tuple(files)),
        transformers=(
            StageSpec(name="normalize"),
            StageSpec(name="retry_odd", options={"fail_times": 1, "drop_mod": 5}),
        ),
        cep=cfg,
    )
    out_dir = str(tmp_path_factory.mktemp("engine_out_status"))
    assert run_pipeline(spec, out_dir)["status"] == "complete"

    oracle = run_oracle(
        (pq.read_table(f) for f in files),
        cfg,
        stages=[
            RetryingStage(NormalizeStage()),
            RetryingStage(RetryOddStage(fail_times=1, drop_mod=5)),
        ],
    )
    for stream, keys in SORT_KEYS.items():
        _assert_tables_equal(stream, read_committed(out_dir, stream), oracle[stream], keys)


def test_jsonl_driver_matches_parquet_driver(ray_session, small_stream, tmp_path_factory):
    """S2 extension surface is REAL: the same stream serialized as JSONL
    epoch files (ts = epoch-µs envelope ints, sidecar max-ts) must produce
    byte-identical committed streams to the Parquet driver."""
    import json

    from quanta_ray.engine import run_pipeline

    files, _params = small_stream
    jd = tmp_path_factory.mktemp("jsonl_stream")
    jfiles = []
    for i, f in enumerate(files):
        t = pq.read_table(f)
        df = t.to_pandas()
        df["ts"] = df["ts"].astype("datetime64[us]").astype("int64")
        path = str(jd / f"epoch-{i:05d}.jsonl")
        df.to_json(path, orient="records", lines=True)
        with open(path + ".maxts", "w") as fh:
            fh.write(str(int(df["ts"].max())))
        jfiles.append(path)

    cfg = CEPConfig(num_partitions=4)
    outs = {}
    for kind, paths in (("parquet-stream", files), ("jsonl-stream", jfiles)):
        spec = PipelineSpec(
            source=SourceSpec(kind=kind, paths=tuple(paths)),
            transformers=(StageSpec(name="normalize"),),
            sink=SinkSpec(),
            cep=cfg,
        )
        out_dir = str(tmp_path_factory.mktemp(f"out_{kind}"))
        summary = run_pipeline(spec, out_dir)
        assert summary["status"] == "complete"
        outs[kind] = out_dir

    for stream, keys in SORT_KEYS.items():
        a = read_committed(outs["parquet-stream"], stream)
        b = read_committed(outs["jsonl-stream"], stream)
        if a is None or a.num_rows == 0:
            assert b is None or b.num_rows == 0, stream
            continue
        _assert_tables_equal(f"jsonl:{stream}", b, a, keys)


def test_csv_driver_matches_parquet_driver(ray_session, small_stream, tmp_path_factory):
    """Third registry driver: the same stream serialized as CSV epoch files
    (ts = epoch-µs envelope ints, sidecar max-ts, quoted text fields) must
    produce byte-identical committed streams to the Parquet driver."""
    from pyarrow import csv as pa_csv

    from quanta_ray.engine import run_pipeline

    files, _params = small_stream
    cd = tmp_path_factory.mktemp("csv_stream")
    cfiles = []
    for i, f in enumerate(files):
        t = pq.read_table(f)
        ts_i = t.schema.get_field_index("ts")
        t = t.set_column(ts_i, "ts", t.column("ts").cast(pa.int64()))
        path = str(cd / f"epoch-{i:05d}.csv")
        pa_csv.write_csv(t, path)
        import pyarrow.compute as pc2

        with open(path + ".maxts", "w") as fh:
            fh.write(str(pc2.max(t.column("ts")).as_py()))
        cfiles.append(path)

    cfg = CEPConfig(num_partitions=4)
    outs = {}
    for kind, paths in (("parquet-stream", files), ("csv-stream", cfiles)):
        spec = PipelineSpec(
            source=SourceSpec(kind=kind, paths=tuple(paths)),
            transformers=(StageSpec(name="normalize"),),
            sink=SinkSpec(),
            cep=cfg,
        )
        out_dir = str(tmp_path_factory.mktemp(f"out_{kind}"))
        summary = run_pipeline(spec, out_dir)
        assert summary["status"] == "complete"
        outs[kind] = out_dir

    for stream, keys in SORT_KEYS.items():
        a = read_committed(outs["parquet-stream"], stream)
        b = read_committed(outs["csv-stream"], stream)
        if a is None or a.num_rows == 0:
            assert b is None or b.num_rows == 0, stream
            continue
        _assert_tables_equal(f"csv:{stream}", b, a, keys)


def test_convhist_stream_nonempty_and_consistent(engine_and_oracle):
    """convhist parity isn't vacuous, buckets sum to the tumbling conv
    count per window, and all five buckets appear for every window."""
    _out_dir, oracle = engine_and_oracle
    ch = oracle["convhist"]
    assert ch.num_rows > 0 and ch.num_rows % 5 == 0
    import collections

    per_w = collections.Counter(
        ch.column("w_start").cast(pa.int64()).to_pylist()
    )
    assert set(per_w.values()) == {5}
    tumb = oracle["tumbling"]
    tw = collections.Counter(tumb.column("w_start").cast(pa.int64()).to_pylist())
    sums = collections.defaultdict(int)
    for w, n in zip(
        ch.column("w_start").cast(pa.int64()).to_pylist(),
        ch.column("n_convs").to_pylist(),
    ):
        sums[w] += n
    assert dict(sums) == dict(tw)


def test_csv_driver_multiline_text(ray_session, tmp_path):
    """Quoted text with embedded newlines/commas survives the csv driver —
    including files larger than one pyarrow parse block (the chunker
    desyncs without ParseOptions(newlines_in_values=True))."""
    import numpy as np
    from pyarrow import csv as pa_csv

    from quanta_ray.sources.stream import get_driver

    n = 3000
    texts = [f"line one {i},\nline two \"quoted\"\nline three" * 8 for i in range(n)]
    t = pa.table(
        {
            "conv_id": pa.array([f"c{i % 7}" for i in range(n)], pa.string()),
            "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array(np.arange(n, dtype=np.int64) * 1_000_000, pa.int64()),
        }
    )
    path = str(tmp_path / "epoch-00000.csv")
    pa_csv.write_csv(t, path)
    import os

    assert os.path.getsize(path) > 1 << 20  # larger than one parse block
    d = get_driver("csv-stream")
    got = d.read_fragment(path, 0, None)
    assert got.num_rows == n
    assert got.column("text").to_pylist() == texts
    assert got.column("ts").type == pa.timestamp("us")


def test_resplat_stream_nonempty_and_consistent(engine_and_oracle):
    """resplat parity isn't vacuous: one row per conversation, the latency
    column is exactly the difference of the two per-role first-turn
    timestamps, and both match an independent recomputation from the
    committed turns stream (final_flush=True here, so every conv with both
    roles must appear)."""
    out_dir, oracle = engine_and_oracle
    rl = oracle["resplat"]
    assert rl.num_rows > 0
    convs = rl.column("conv_id").to_pylist()
    assert len(convs) == len(set(convs))
    u = rl.column("first_user_ts").cast(pa.int64()).to_pylist()
    a = rl.column("first_assistant_ts").cast(pa.int64()).to_pylist()
    lat = rl.column("latency_us").to_pylist()
    assert lat == [ai - ui for ui, ai in zip(u, a)]

    turns = read_committed(out_dir, "turns")
    import collections

    umin: dict[str, int] = {}
    amin: dict[str, int] = {}
    for c, ts, role in zip(
        turns.column("conv_id").to_pylist(),
        turns.column("ts").cast(pa.int64()).to_pylist(),
        turns.column("role").to_pylist(),
    ):
        if role == "user":
            umin[c] = min(umin.get(c, 1 << 62), ts)
        elif role == "assistant":
            amin[c] = min(amin.get(c, 1 << 62), ts)
    want = {c: (umin[c], amin[c]) for c in umin if c in amin}
    got = {c: (ui, ai) for c, ui, ai in zip(convs, u, a)}
    assert got == want


def test_ipc_driver_matches_parquet_driver(ray_session, small_stream, tmp_path_factory):
    """Fourth registry driver: the same stream serialized as Arrow IPC
    (Feather v2) epoch files — types survive natively, record batches
    fragment like row groups (two batches per epoch here, exercising the
    sub-file fragment path and footer-free max-ts fallback: no sidecar)."""
    import pyarrow.ipc as pa_ipc

    from quanta_ray.engine import run_pipeline

    files, _params = small_stream
    ad = tmp_path_factory.mktemp("ipc_stream")
    afiles = []
    for i, f in enumerate(files):
        t = pq.read_table(f)
        path = str(ad / f"epoch-{i:05d}.arrow")
        half = max(1, t.num_rows // 2)
        with pa_ipc.new_file(path, t.schema) as w:
            for b in t.slice(0, half).to_batches():
                w.write_batch(b)
            for b in t.slice(half).to_batches():
                w.write_batch(b)
        afiles.append(path)

    cfg = CEPConfig(num_partitions=4)
    outs = {}
    for kind, paths in (("parquet-stream", files), ("ipc-stream", afiles)):
        spec = PipelineSpec(
            source=SourceSpec(kind=kind, paths=tuple(paths)),
            transformers=(StageSpec(name="normalize"),),
            sink=SinkSpec(),
            cep=cfg,
        )
        out_dir = str(tmp_path_factory.mktemp(f"out_{kind}"))
        summary = run_pipeline(spec, out_dir)
        assert summary["status"] == "complete"
        outs[kind] = out_dir

    for stream, keys in SORT_KEYS.items():
        a = read_committed(outs["parquet-stream"], stream)
        b = read_committed(outs["ipc-stream"], stream)
        if a is None or a.num_rows == 0:
            assert b is None or b.num_rows == 0, stream
            continue
        _assert_tables_equal(f"ipc:{stream}", b, a, keys)


def test_tooluse_stream_nonempty_and_consistent(engine_and_oracle):
    """tooluse parity isn't vacuous: rows exist, and per window the sum of
    n_calls over tools equals the tumbling stream's total tool-turn count
    (the fixture sets ``tool`` exactly on role=='tool' rows)."""
    import collections

    _out_dir, oracle = engine_and_oracle
    tu = oracle["tooluse"]
    assert tu.num_rows > 0
    calls = collections.defaultdict(int)
    for w, n in zip(
        tu.column("w_start").cast(pa.int64()).to_pylist(),
        tu.column("n_calls").to_pylist(),
    ):
        calls[w] += n
    tool_turns = collections.defaultdict(int)
    tumb = oracle["tumbling"]
    for w, n in zip(
        tumb.column("w_start").cast(pa.int64()).to_pylist(),
        tumb.column("n_tool").to_pylist(),
    ):
        tool_turns[w] += n
    assert dict(calls) == {w: n for w, n in tool_turns.items() if n}
    # distinct-conv counts are bounded by the window's conv count
    n_convs_per_w = collections.Counter(
        tumb.column("w_start").cast(pa.int64()).to_pylist()
    )
    for w, nv in zip(
        tu.column("w_start").cast(pa.int64()).to_pylist(),
        tu.column("n_convs").to_pylist(),
    ):
        assert 1 <= nv <= n_convs_per_w[w]


def test_tooluse_planted_cross_partition_distinct(ray_session, tmp_path):
    """Ground-truth pin: five convs spread over three partitions call
    'search' (one of them twice), one conv also calls 'fetch' — the
    committed rows prove the per-(window, tool) distinct-conv merge is the
    exact global count, not a per-partition one."""
    import pandas as pd

    from quanta_ray.engine import run_pipeline
    from quanta_ray.sinks.exactly_once import read_committed

    base = 3_600_000_000 * 1000  # hour boundary, µs
    rows = []
    for j, conv in enumerate(("c-a", "c-b", "c-c", "c-d", "c-e")):
        rows.append((conv, 0, "user", "q", "", base + j * 1_000_000))
        rows.append((conv, 1, "tool", "r", "search", base + j * 1_000_000 + 1))
    # c-a calls search AGAIN (n_calls=6, n_convs stays 5) and also fetch
    rows.append(("c-a", 2, "tool", "r2", "search", base + 10_000_000))
    rows.append(("c-a", 3, "tool", "r3", "fetch", base + 11_000_000))
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="us").astype("datetime64[us]")
    f = str(tmp_path / "epoch-00000.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), f)

    spec = PipelineSpec(
        source=SourceSpec(paths=(f,)),
        transformers=(StageSpec(name="normalize"),),
        sink=SinkSpec(),
        cep=CEPConfig(num_partitions=3, tool_usage=True),
    )
    out = str(tmp_path / "out")
    assert run_pipeline(spec, out)["status"] == "complete"
    t = read_committed(out, "tooluse").to_pandas().sort_values("tool")
    assert list(t["tool"]) == ["fetch", "search"]
    assert list(t["n_calls"]) == [1, 6]
    assert list(t["n_convs"]) == [1, 5]
    assert (t["w_start"].astype("int64") == base).all()


def test_tooluse_kill_resume_no_duplicates(ray_session, tmp_path_factory):
    """Regression (fuzz find, seed 13493): the toolw drain must advance on
    REPLAY too. A restored checkpoint still holds windows that later
    replayed epochs finalized and committed; if replay skips the drain,
    the first live epoch re-emits them and the tooluse stream gains
    duplicate (w_start, tool) rows. Pin: kill at every epoch boundary,
    resumed output equals the oracle exactly."""
    import pandas as pd

    from quanta_ray.engine import StreamingRunner
    from quanta_ray.fixtures import TranscriptParams, generate_transcripts, write_stream
    from quanta_ray.oracle import run_oracle
    from quanta_ray.stages import NormalizeStage, RetryingStage

    US_ = 1_000_000
    params = TranscriptParams(n_convs=13, seed=13493, n_epochs=4, p_late=0.1)
    cfg = CEPConfig(num_partitions=2, allowed_lateness_us=60 * US_,
                    tumbling_size_us=1800 * US_, sliding_size_us=1200 * US_,
                    sliding_slide_us=300 * US_, session_gap_us=1200 * US_,
                    join_bound_us=1800 * US_, tool_usage=True)
    d = tmp_path_factory.mktemp("tooluse_replay")
    files = write_stream(generate_transcripts(params), str(d / "s"), 4)
    spec = PipelineSpec(source=SourceSpec(paths=tuple(files)),
                        transformers=(StageSpec(name="normalize"),),
                        cep=cfg, checkpoint_every=4)
    oracle = run_oracle(
        [pq.read_table(f) for f in files], cfg,
        stages=[RetryingStage(NormalizeStage())],
    )
    want = (
        oracle["tooluse"].to_pandas().sort_values(["w_start", "tool"]).reset_index(drop=True)
    )
    for kill_at in (0, 1, 2):
        out = str(d / f"out{kill_at}")
        r = StreamingRunner(spec, out).run(stop_after_epoch=kill_at)
        assert r["status"] == "stopped"
        assert StreamingRunner(spec, out).run()["status"] == "complete"
        got = (
            read_committed(out, "tooluse").to_pandas()
            .sort_values(["w_start", "tool"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_orc_driver_matches_parquet_driver(ray_session, small_stream, tmp_path_factory):
    """Fifth registry driver: the same stream as ORC epoch files — stripes
    fragment like row groups (small stripe_size forces multiple stripes per
    epoch, exercising the sub-file fragment path and the narrow-column
    max-ts fallback: no sidecar)."""
    from pyarrow import orc as pa_orc

    from quanta_ray.engine import run_pipeline
    from quanta_ray.sources.stream import get_driver

    files, _params = small_stream
    od = tmp_path_factory.mktemp("orc_stream")
    ofiles = []
    for i, f in enumerate(files):
        t = pq.read_table(f)
        # ts as int64 epoch-us (ORC has no us-timestamp guarantee across
        # writers; the driver re-widens on read like jsonl/csv/ipc)
        t = t.set_column(
            t.schema.get_field_index("ts"), "ts",
            t.column("ts").cast(pa.int64()),
        )
        path = str(od / f"epoch-{i:05d}.orc")
        pa_orc.write_table(t, path, batch_size=50, stripe_size=1024)
        ofiles.append(path)

    # multiple stripes -> multiple fragments at a small row target
    drv = get_driver("orc-stream")
    frags = drv.plan_fragments(ofiles[0], 60)
    assert len(frags) > 1
    n_total = pq.read_table(files[0]).num_rows
    assert sum(
        drv.read_fragment(ofiles[0], lo, hi).num_rows for lo, hi, _ in frags
    ) == n_total
    assert drv.max_ts_us(ofiles[0]) == get_driver("parquet-stream").max_ts_us(files[0])

    cfg = CEPConfig(num_partitions=4)
    outs = {}
    for kind, paths in (("parquet-stream", files), ("orc-stream", ofiles)):
        spec = PipelineSpec(
            source=SourceSpec(kind=kind, paths=tuple(paths)),
            transformers=(StageSpec(name="normalize"),),
            sink=SinkSpec(),
            cep=cfg,
        )
        out_dir = str(tmp_path_factory.mktemp(f"out_{kind}"))
        summary = run_pipeline(spec, out_dir)
        assert summary["status"] == "complete"
        outs[kind] = out_dir

    for stream, keys in SORT_KEYS.items():
        a = read_committed(outs["parquet-stream"], stream)
        b = read_committed(outs["orc-stream"], stream)
        if a is None or a.num_rows == 0:
            assert b is None or b.num_rows == 0, stream
            continue
        _assert_tables_equal(f"orc:{stream}", b, a, keys)
