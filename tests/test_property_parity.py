"""Property-based oracle-diff: random small streams + random CEP configs →
the distributed engine must equal the single-threaded interpreter on every
output stream. Few examples (each spins the full engine), wide coverage of
lateness/window/gap geometry."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quanta_ray.config import CEPConfig, PipelineSpec, SourceSpec, StageSpec, US
from quanta_ray.fixtures import TranscriptParams, generate_transcripts, write_stream
from quanta_ray.oracle import run_oracle
from quanta_ray.sinks.exactly_once import read_committed
from quanta_ray.stages import NormalizeStage, RetryingStage

SORT_KEYS = {
    "turns": ["conv_id", "turn_idx"],
    "tumbling": ["conv_id", "w_start"],
    "sliding": ["conv_id", "w_start"],
    "sessions": ["conv_id", "session_id"],
    "joins": ["conv_id", "tool_turn_idx"],
    "patterns": ["conv_id", "start_ts", "start_turn_idx"],
    "count_windows": ["conv_id", "window_id"],
    "topk": ["w_start", "rank"],
    "sessquant": ["epoch", "q"],
    "resplat": ["conv_id"],
    "runs": ["conv_id", "start_ts", "start_turn_idx"],
}


def _sorted(t: pa.Table, keys):
    idx = pa.compute.sort_indices(t, sort_keys=[(k, "ascending") for k in keys])
    return t.take(idx).combine_chunks()


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 10_000),
    n_convs=st.integers(3, 25),
    n_epochs=st.integers(2, 5),
    lateness_s=st.sampled_from([60, 300, 900]),
    tumbling_s=st.sampled_from([600, 1800, 3600]),
    slide_s=st.sampled_from([300, 900]),
    gap_s=st.sampled_from([120, 600]),
    bound_s=st.sampled_from([300, 3600]),
    p_late=st.sampled_from([0.0, 0.05]),
    ooo=st.booleans(),
    chain=st.sampled_from(["normalize", "retry_odd", "fanout", "enrich"]),
    fragment_rows=st.sampled_from([500, 131072]),
    topk_k=st.sampled_from([0, 3]),
    sessq=st.sampled_from([(), (0.5, 0.9)]),
    noreply_s=st.sampled_from([0, 600, 2700]),
    kill=st.booleans(),
)
def test_random_stream_matches_oracle(
    ray_session,
    tmp_path_factory,
    seed,
    n_convs,
    n_epochs,
    lateness_s,
    tumbling_s,
    slide_s,
    gap_s,
    bound_s,
    p_late,
    ooo,
    chain,
    fragment_rows,
    topk_k,
    sessq,
    noreply_s,
    kill,
):
    from quanta_ray.engine import StreamingRunner
    from quanta_ray.stages.transforms import FanoutStage, RetryOddStage

    params = TranscriptParams(
        n_convs=n_convs, seed=seed, n_epochs=n_epochs, p_late=p_late, max_turns=60
    )
    cfg = CEPConfig(
        allowed_lateness_us=lateness_s * US,
        tumbling_size_us=tumbling_s * US,
        sliding_size_us=tumbling_s * US,  # size must be a multiple of slide
        sliding_slide_us=min(slide_s, tumbling_s) * US,
        session_gap_us=gap_s * US,
        join_bound_us=bound_s * US,
        num_partitions=3,
        topk_k=topk_k,
        sess_quantiles=sessq,
        resp_latency=True,
        run_min_len=2,
        noreply_timeout_us=noreply_s * US,
        late_output=True,
        new_convs=bool(seed % 2),
    )
    d = tmp_path_factory.mktemp("prop")
    table = generate_transcripts(params)
    files = write_stream(table, str(d / "stream"), n_epochs)

    stage_specs = [StageSpec(name="normalize")]
    oracle_stages = [RetryingStage(NormalizeStage())]
    if chain == "retry_odd":
        stage_specs.append(
            StageSpec(name="retry_odd", options={"fail_times": 1, "drop_mod": 7})
        )
        oracle_stages.append(RetryingStage(RetryOddStage(fail_times=1, drop_mod=7)))
    elif chain == "fanout":
        stage_specs.append(StageSpec(name="fanout"))
        oracle_stages.append(RetryingStage(FanoutStage()))
    elif chain == "enrich":
        from quanta_ray.stages.transforms import EnrichStage

        stage_specs.append(StageSpec(name="enrich"))
        oracle_stages.append(RetryingStage(EnrichStage()))

    spec = PipelineSpec(
        source=SourceSpec(
            paths=tuple(files), ooo_commit=ooo, fragment_rows=fragment_rows
        ),
        transformers=tuple(stage_specs),
        cep=cfg,
    )
    out_dir = str(d / "out")
    if kill and n_epochs > 1:
        # crash after the first committed epoch, resume in a fresh runner:
        # the resumed engine must still match the oracle on every stream
        r = StreamingRunner(spec, out_dir).run(stop_after_epoch=0)
        assert r["status"] == "stopped"
    assert StreamingRunner(spec, out_dir).run()["status"] == "complete"

    oracle = run_oracle(
        (pq.read_table(f) for f in files), cfg, stages=oracle_stages
    )
    for stream, keys in SORT_KEYS.items():
        if chain == "fanout" and stream == "turns":
            # fan-out rows share (conv_id, turn_idx); disambiguate the sort
            keys = keys + ["fanout_copy"]
        want = oracle[stream]
        got = read_committed(out_dir, stream)
        if want.num_rows == 0:
            assert got is None or got.num_rows == 0, stream
            continue
        assert got is not None, f"{stream}: engine empty, oracle {want.num_rows}"
        got = _sorted(got.select(want.column_names), keys)
        want = _sorted(want, keys)
        assert got.equals(want), f"{stream} differs (seed={seed})"
