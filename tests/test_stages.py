"""Reference-semantics stage tests, mirroring the reference's runner tests
(``/root/reference/internal/pipeline/runner_test.go:69-142``): OK forwards,
DROP discards, ERROR-then-OK retries exactly once, fan-out doubles rows.
Both execution paths (vectorized batch / per-row oracle) must agree."""

import pyarrow as pa
import pytest

from quanta_ray.config import RetryPolicy, SpecError, StageSpec, load_spec
from quanta_ray.stages import (
    DropRoleStage,
    ErrorThenOKStage,
    FanoutStage,
    NormalizeStage,
    RetryingStage,
    UppercaseStage,
    apply_chain_batch,
    build_chain,
)


def _batch() -> pa.Table:
    return pa.table(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
            "role": ["user", "tool", "assistant"],
            "text": ["hello", "run ls", "hi there"],
            "tool": ["", "bash", ""],
            "ts": pa.array([1, 2, 3], type=pa.int64()).cast(pa.timestamp("us")),
        }
    )


def _rows(t: pa.Table) -> list[dict]:
    return t.to_pylist()


def test_ok_forwards_payload_preserved():
    # runner_test.go:69-87 — OK status forwards the frame, payload preserved
    st = RetryingStage(NormalizeStage())
    out = st.transform_batch(_batch())
    assert out.num_rows == 3
    assert out.column("text").to_pylist() == ["hello", "run ls", "hi there"]
    assert out.column("text_norm").to_pylist() == ["HELLO", "RUN LS", "HI THERE"]


def test_drop_discards():
    # runner_test.go:89-104 — DROP → zero frames forwarded for matches
    st = RetryingStage(DropRoleStage(role="tool"))
    out = st.transform_batch(_batch())
    assert out.num_rows == 2
    assert "tool" not in out.column("role").to_pylist()
    assert st.apply_row({"role": "tool"}) is None


def test_error_then_ok_retries_once():
    # runner_test.go:106-122 — ERROR then OK with retries → exactly one output
    st = RetryingStage(ErrorThenOKStage(fail_times=1), RetryPolicy(attempts=2))
    out = st.transform_batch(_batch())
    assert out.num_rows == 3
    assert st.dropped_after_retries == 0


def test_retries_exhausted_drops_batch():
    # retry exhaustion → drop + count ("drop+ack", reference CONFIGS.md:95)
    st = RetryingStage(ErrorThenOKStage(fail_times=5), RetryPolicy(attempts=2))
    out = st.transform_batch(_batch())
    assert out.num_rows == 0
    assert st.dropped_after_retries == 3


def test_fanout_doubles_rows():
    # runner_test.go:124-142 — two-stage chain, fan-out 1→2
    chain = [RetryingStage(FanoutStage(n=2)), RetryingStage(NormalizeStage())]
    out = apply_chain_batch(chain, _batch())
    assert out.num_rows == 6
    # fan-out descendants inherit source row values (lineage analog)
    assert out.column("conv_id").to_pylist() == ["c1", "c1", "c1", "c1", "c2", "c2"]


def test_batch_and_row_paths_agree():
    for stage in (NormalizeStage(), UppercaseStage(), DropRoleStage("tool"), FanoutStage(2)):
        batch_out = stage.transform_batch(_batch())
        row_out = []
        for r in _rows(_batch()):
            got = stage.apply_row(r)
            if got:
                row_out.extend(got)
        assert batch_out.num_rows == len(row_out), stage.name
        for col in batch_out.column_names:
            assert batch_out.column(col).to_pylist() == [r.get(col) for r in row_out], (
                f"{stage.name}.{col}"
            )


def test_spec_schema_version_enforced():
    # pipeline_test.go:39-53 — unsupported schema_version rejected
    with pytest.raises(SpecError):
        load_spec({"schema_version": "v999"})
    assert load_spec({"schema_version": "v1"}).schema_version == "v1"


def test_unknown_transformer_rejected():
    # compiler.go:64-66 — unsupported transformer type is a compile error
    with pytest.raises(ValueError, match="unknown transformer"):
        build_chain([StageSpec(name="not-a-stage")])


def test_unknown_source_and_sink_rejected():
    with pytest.raises(SpecError, match="source kind"):
        load_spec({"source": {"kind": "kafka"}})
    with pytest.raises(SpecError, match="sink kind"):
        load_spec({"sink": {"kind": "elastic"}})


def test_env_overlay(monkeypatch):
    # config.go:60 — env overrides overlay the file config
    from quanta_ray.config import _env_overlay

    monkeypatch.setenv("QUANTA_RAY__CEP__NUM_PARTITIONS", "17")
    d = _env_overlay({"cep": {}})
    assert d["cep"]["num_partitions"] == 17
    spec = load_spec(d)
    assert spec.cep.num_partitions == 17


def test_stage_timeout_retry_then_drop():
    """T2+T3: a hung stage call times out, is retried, and after exhaustion
    the batch is dropped+acked (reference: context.WithTimeout per call,
    runner.go:138-144, then the drop+ack path)."""
    import pyarrow as pa

    from quanta_ray.config import RetryPolicy
    from quanta_ray.stages.base import RetryingStage
    from quanta_ray.stages.transforms import HangStage

    batch = pa.table({"text": ["a", "b"], "role": ["user", "user"]})

    # hangs forever -> every attempt times out -> drop
    stage = RetryingStage(HangStage(hang_s=5.0), RetryPolicy(attempts=2), timeout_ms=50)
    out = stage.transform_batch(batch)
    assert out.num_rows == 0
    assert stage.timed_out == 2
    assert stage.dropped_after_retries == 2

    # hangs once -> first attempt times out, retry succeeds (no data loss)
    stage2 = RetryingStage(
        HangStage(hang_s=5.0, hang_times=1), RetryPolicy(attempts=3), timeout_ms=50
    )
    out2 = stage2.transform_batch(batch)
    assert out2.num_rows == 2
    assert stage2.timed_out == 1
    assert stage2.dropped_after_retries == 0


def test_timeout_zero_disables_watchdog():
    import pyarrow as pa

    from quanta_ray.stages.base import RetryingStage
    from quanta_ray.stages.transforms import NormalizeStage

    stage = RetryingStage(NormalizeStage(), timeout_ms=0)
    out = stage.transform_batch(pa.table({"text": ["x"]}))
    assert out.column("text_norm").to_pylist() == ["X"]


def test_per_row_status_retry_then_ok():
    """Per-row RETRY granularity (transformer.proto:30-35): only the rows
    marked RETRY are re-presented; after the scripted failures clear, every
    row flows — nothing whole-batch-retried, nothing dropped."""
    from quanta_ray.stages.transforms import RetryOddStage

    st = RetryingStage(RetryOddStage(fail_times=1), RetryPolicy(attempts=3))
    out = st.transform_batch(_batch())
    assert out.num_rows == 3
    assert "_status" not in out.column_names
    assert sorted(out.column("turn_idx").to_pylist()) == [0, 0, 1]
    assert st.dropped_after_retries == 0
    assert st.dropped_by_status == 0


def test_per_row_status_retries_exhausted_dead_letters_subset():
    """Rows that keep returning RETRY exhaust attempts and dead-letter —
    but ONLY those rows; OK rows of the same batch still flow."""
    from quanta_ray.stages.transforms import RetryOddStage

    st = RetryingStage(RetryOddStage(fail_times=99), RetryPolicy(attempts=2))
    out = st.transform_batch(_batch())
    assert out.column("turn_idx").to_pylist() == [0, 0]  # odd row gone
    assert st.dropped_after_retries == 1
    assert len(st.dead_batches) == 1
    assert st.dead_batches[0].column("turn_idx").to_pylist() == [1]


def test_per_row_status_drop_counted_not_dead_lettered():
    from quanta_ray.stages.transforms import RetryOddStage

    # drop_mod=2 → even turn_idx rows DROP; odd row retried once then OK
    st = RetryingStage(RetryOddStage(fail_times=1, drop_mod=2), RetryPolicy(attempts=3))
    out = st.transform_batch(_batch())
    assert out.column("turn_idx").to_pylist() == [1]
    assert st.dropped_by_status == 2
    assert st.dropped_after_retries == 0
    assert not st.dead_batches


def test_per_row_status_batch_and_row_paths_agree():
    from quanta_ray.stages.transforms import RetryOddStage

    batch_stage = RetryingStage(RetryOddStage(fail_times=1, drop_mod=4), RetryPolicy())
    batch_out = batch_stage.transform_batch(_batch())
    row_stage = RetryingStage(RetryOddStage(fail_times=1, drop_mod=4), RetryPolicy())
    row_out = []
    for r in _rows(_batch()):
        got = row_stage.apply_row(r)
        if got:
            row_out.extend(got)
    assert batch_out.to_pylist() == row_out


def test_enrich_stage_broadcast_lookup(ray_session):
    """Stream-table enrichment pinned: mapped tools get their dimension
    class, unmapped tools get 'other', non-tool rows get '' — identically
    in the vectorized batch path and the oracle row path."""
    import pyarrow as pa

    from quanta_ray.stages.transforms import EnrichStage

    st = EnrichStage(mapping={"search": "retrieval", "bash": "execution"})
    batch = pa.table(
        {
            "conv_id": ["c"] * 4,
            "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
            "role": ["user", "tool", "tool", "tool"],
            "text": ["t"] * 4,
            "tool": ["", "search", "bash", "weird"],
            "ts": pa.array([0, 1, 2, 3], pa.timestamp("us")),
        }
    )
    out = st.transform_batch(batch)
    assert out.column("tool_class").to_pylist() == ["", "retrieval", "execution", "other"]
    rows = [st.apply_row(r)[0]["tool_class"] for r in batch.to_pylist()]
    assert rows == ["", "retrieval", "execution", "other"]

    # ray.put broadcast form: the dim is fetched once at stage build
    import ray

    ref = ray.put({"read": "workspace"})
    st2 = EnrichStage(mapping_ref=ref)
    row = st2.apply_row({"tool": "read"})[0]
    assert row["tool_class"] == "workspace"


def test_retry_after_hint_exception_path():
    """A stage-dictated backoff (transformer.proto:34 retry_after_ms) IS
    slept between attempts — unlike the spec's fixed backoff_ms — and is
    never slept after the final attempt (exhaustion drops immediately)."""
    import time

    from quanta_ray.stages.base import Transformer, TransientError

    class HintedFlaky(Transformer):
        name = "hinted-flaky"

        def __init__(self, fail_times):
            self.fail_times = fail_times
            self.calls = 0

        def transform_batch(self, batch):
            self.calls += 1
            if self.calls <= self.fail_times:
                raise TransientError("busy", retry_after_ms=50)
            return batch

    st = RetryingStage(HintedFlaky(fail_times=1), RetryPolicy(attempts=3))
    t0 = time.monotonic()
    out = st.transform_batch(_batch())
    elapsed = time.monotonic() - t0
    assert out.num_rows == 3
    assert st.backoff_hints_honored == 1
    assert st.backoff_hint_ms_total == 50
    assert elapsed >= 0.045

    # exhaustion: attempts=2, both fail -> one sleep (between the two
    # attempts), NOT two; batch still drop+acks
    st2 = RetryingStage(HintedFlaky(fail_times=99), RetryPolicy(attempts=2))
    out2 = st2.transform_batch(_batch())
    assert out2.num_rows == 0
    assert st2.dropped_after_retries == 3
    assert st2.backoff_hints_honored == 1


def test_retry_after_hint_per_row_column():
    """The per-row ``_retry_after_ms`` sibling of ``_status``: the max hint
    across a batch's RETRY rows is slept once per re-presentation and both
    aux columns are stripped from OK output and re-presented rows."""
    import time

    import numpy as np

    from quanta_ray.stages.base import (
        RETRY_AFTER_COL, STATUS_COL, Status, Transformer,
    )

    class RowHinted(Transformer):
        name = "row-hinted"

        def __init__(self):
            self.calls = 0

        def transform_batch(self, batch):
            self.calls += 1
            n = batch.num_rows
            if self.calls == 1:
                idx = np.asarray(batch.column("turn_idx").to_numpy(zero_copy_only=False))
                st = np.where(idx % 2 == 1, int(Status.RETRY), int(Status.OK))
                hint = np.where(idx % 2 == 1, 40, 0)
                return batch.append_column(
                    STATUS_COL, pa.array(st, pa.int32())
                ).append_column(RETRY_AFTER_COL, pa.array(hint, pa.int32()))
            return batch.append_column(
                STATUS_COL, pa.array([int(Status.OK)] * n, pa.int32())
            ).append_column(RETRY_AFTER_COL, pa.array([0] * n, pa.int32()))

    st = RetryingStage(RowHinted(), RetryPolicy(attempts=3))
    t0 = time.monotonic()
    out = st.transform_batch(_batch())
    elapsed = time.monotonic() - t0
    assert out.num_rows == 3
    assert STATUS_COL not in out.column_names
    assert RETRY_AFTER_COL not in out.column_names
    assert st.backoff_hints_honored == 1
    assert st.backoff_hint_ms_total == 40
    assert elapsed >= 0.035
    assert st.dropped_after_retries == 0


def test_retry_after_hint_capped():
    """A runaway plugin hint is capped at 5 s (here: verified by the
    recorded honored total, not by actually sleeping minutes)."""
    from quanta_ray.stages.base import _MAX_RETRY_AFTER_MS, Transformer, TransientError

    class Greedy(Transformer):
        name = "greedy"

        def __init__(self):
            self.calls = 0

        def transform_batch(self, batch):
            self.calls += 1
            if self.calls == 1:
                raise TransientError("busy", retry_after_ms=10_000_000)
            return batch

    st = RetryingStage(Greedy(), RetryPolicy(attempts=2))
    # monkey-cap for the test so the sleep stays fast
    import quanta_ray.stages.base as base_mod

    orig = base_mod._MAX_RETRY_AFTER_MS
    base_mod._MAX_RETRY_AFTER_MS = 20
    try:
        out = st.transform_batch(_batch())
    finally:
        base_mod._MAX_RETRY_AFTER_MS = orig
    assert out.num_rows == 3
    assert st.backoff_hint_ms_total == 20
    assert _MAX_RETRY_AFTER_MS == 5_000
