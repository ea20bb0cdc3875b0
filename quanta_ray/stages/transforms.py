"""Concrete transform stages.

Each stage implements BOTH the vectorized Arrow batch path (engine hot path)
and the per-row path (oracle spec path); unit tests assert they agree.

``UppercaseStage`` is the analog of the reference's example plugin
(``/root/reference/examples/transformers/uppercase/main.go:61-97``: uppercase
the payload and annotate provenance). ``DropRoleStage``/``FanoutStage``/
``ErrorThenOKStage`` reproduce the reference test harness's scripted stage
modes drop/fanout2/errorThenOK (``internal/pipeline/runner_test.go:15-47``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .base import TransientError, Transformer


class NormalizeStage(Transformer):
    """Adds ``text_norm`` = uppercased text; keeps ``text`` untouched so the
    per-turn text-equality invariant stays on the raw column."""

    name = "normalize"

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        if "text_norm" in batch.column_names:
            return batch
        return batch.append_column("text_norm", pc.utf8_upper(batch["text"]))

    def apply_row(self, row: dict) -> list[dict] | None:
        row = dict(row)
        row.setdefault("text_norm", row["text"].upper())
        return [row]


class UppercaseStage(Transformer):
    """In-place uppercase of ``text`` + provenance annotation column
    (`transformed_by`), mirroring the reference plugin's
    ``attributes["transformed_by"]`` echo (uppercase/main.go:83-90)."""

    name = "uppercase"

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        idx = batch.column_names.index("text")
        batch = batch.set_column(idx, "text", pc.utf8_upper(batch["text"]))
        if "transformed_by" not in batch.column_names:
            batch = batch.append_column(
                "transformed_by",
                pa.array(["uppercase"] * batch.num_rows, type=pa.string()),
            )
        return batch

    def apply_row(self, row: dict) -> list[dict] | None:
        row = dict(row)
        row["text"] = row["text"].upper()
        row.setdefault("transformed_by", "uppercase")
        return [row]


class DropRoleStage(Transformer):
    """DROP rows whose role matches (reference DROP status: discard + count +
    still-ack, ``runner.go:161-164``)."""

    name = "drop_role"

    def __init__(self, role: str = "tool"):
        self.role = role

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch["role"], self.role))

    def apply_row(self, row: dict) -> list[dict] | None:
        return None if row["role"] == self.role else [dict(row)]


class FanoutStage(Transformer):
    """1→N fan-out; descendants share the source row's lineage (reference:
    events inherit the original frame's checkpoint, ``runner.go:96-102``)."""

    name = "fanout"

    def __init__(self, n: int = 2):
        self.n = n

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        idx = np.repeat(np.arange(batch.num_rows), self.n)
        out = batch.take(pa.array(idx))
        copy = pa.array(
            np.tile(np.arange(self.n), batch.num_rows).astype("int64"), type=pa.int64()
        )
        if "fanout_copy" in out.column_names:
            out = out.drop_columns(["fanout_copy"])
        return out.append_column("fanout_copy", copy)

    def apply_row(self, row: dict) -> list[dict] | None:
        return [{**row, "fanout_copy": i} for i in range(self.n)]


class ErrorThenOKStage(Transformer):
    """Fails the first ``fail_times`` calls with a transient error, then
    passes rows through — the reference test's errorThenOK scripted mode
    (``runner_test.go:106-122``). Stateful per instance."""

    name = "error_then_ok"

    def __init__(self, fail_times: int = 1):
        self.fail_times = fail_times
        self.calls = 0

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        self.calls += 1
        if self.calls <= self.fail_times:
            raise TransientError("scripted transient failure")
        return batch

    def apply_row(self, row: dict) -> list[dict] | None:
        self.calls += 1
        if self.calls <= self.fail_times:
            raise TransientError("scripted transient failure")
        return [dict(row)]


class HangStage(Transformer):
    """Sleeps ``hang_s`` on the first ``hang_times`` calls, then passes rows
    through — the timeout-enforcement test stage (a deliberately hung plugin;
    reference analog: a plugin that never answers its RPC)."""

    name = "hang"

    def __init__(self, hang_s: float = 10.0, hang_times: int = 1_000_000):
        self.hang_s = hang_s
        self.hang_times = hang_times
        self.calls = 0

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        import time

        self.calls += 1
        if self.calls <= self.hang_times:
            time.sleep(self.hang_s)
        return batch

    def apply_row(self, row: dict) -> list[dict] | None:
        return [dict(row)]


class RetryOddStage(Transformer):
    """Scripted per-row status: marks rows with odd ``turn_idx`` RETRY for
    their first ``fail_times`` presentations (per-row attempt counters held
    by the stage instance), OK afterwards; optionally marks rows with
    ``turn_idx % drop_mod == 0`` DROP (intentional, acked, never
    dead-lettered). Exercises the per-record Status granularity of the
    reference plugin contract (``transformer.proto:30-35,79-84``) through
    the vectorized batch path; the oracle row path mirrors it with
    per-row TransientError / None."""

    name = "retry_odd"

    def __init__(self, fail_times: int = 1, drop_mod: int = 0):
        self.fail_times = fail_times
        self.drop_mod = drop_mod
        self._row_attempts: dict = {}

    def _should_fail(self, conv_id, turn_idx: int) -> bool:
        if turn_idx % 2 != 1:
            return False
        k = (conv_id, turn_idx)
        n = self._row_attempts.get(k, 0)
        if n < self.fail_times:
            self._row_attempts[k] = n + 1
            return True
        return False

    def _is_drop(self, turn_idx: int) -> bool:
        return self.drop_mod > 0 and turn_idx % self.drop_mod == 0

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from .base import STATUS_COL, Status

        tid = batch.column("turn_idx").to_numpy()
        conv = batch.column("conv_id").to_pylist()
        status = np.zeros(len(tid), dtype=np.int8)
        for i, (c, t) in enumerate(zip(conv, tid)):
            t = int(t)
            if self._is_drop(t):
                status[i] = int(Status.DROP)
            elif self._should_fail(c, t):
                status[i] = int(Status.RETRY)
        return batch.append_column(STATUS_COL, pa.array(status, type=pa.int8()))

    def apply_row(self, row: dict) -> list[dict] | None:
        t = int(row["turn_idx"])
        if self._is_drop(t):
            return None
        if self._should_fail(row["conv_id"], t):
            raise TransientError("scripted per-row retry")
        return [dict(row)]


from .subprocess_stage import SubprocessTransformer  # noqa: E402

_DEFAULT_TOOL_DIM = {
    # tiny default dimension over the fixture tool vocabulary; a real
    # deployment passes its own `mapping` (spec-shipped, task-broadcast)
    # or a `mapping_ref` (`ray.put` once, fetched per stage build)
    "search": "retrieval",
    "fetch": "retrieval",
    "read": "workspace",
    "edit": "workspace",
    "bash": "execution",
}


class EnrichStage(Transformer):
    """STREAM-TABLE ENRICHMENT join: attaches ``tool_class`` from a small
    broadcast dimension table keyed by tool name — the broadcast-lookup
    side of a stream join (the shuffle side is the engine's stream-stream
    join). The dimension ships either inline in the spec (``mapping``,
    fine for small dims — it is serialized once per task, not per row) or
    as a ``ray.put`` object ref (``mapping_ref``) fetched ONCE when the
    task builds its chain, never per batch. Non-tool rows (empty tool)
    get ``""``; unmapped tools get ``unmapped_class``.

    Reference analog: the per-record gRPC transformer enrichment hop
    (api/proto/v1/transformer.proto) — here a vectorized in-process batch
    op with the lookup resident, not an RPC per record."""

    name = "enrich"

    def __init__(self, mapping: dict | None = None, mapping_ref=None,
                 unmapped_class: str = "other"):
        if mapping_ref is not None:
            import ray

            mapping = ray.get(mapping_ref)
        # `is not None`: an explicitly passed EMPTY dimension table means
        # every tool is unmapped, not the default mapping
        self.mapping = dict(mapping) if mapping is not None else dict(_DEFAULT_TOOL_DIM)
        self.unmapped = unmapped_class
        # Arrow-native lookup arrays (index_in + take, no per-row python)
        self._keys = pa.array(list(self.mapping.keys()), type=pa.string())
        self._vals = pa.array(
            list(self.mapping.values()) + [self.unmapped], type=pa.string()
        )

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        if "tool_class" in batch.column_names:
            return batch
        tool = batch["tool"]
        idx = pc.index_in(tool, value_set=self._keys)
        n_keys = len(self._keys)
        idx = pc.if_else(pc.is_null(idx), pa.scalar(n_keys, type=idx.type), idx)
        cls = pc.take(self._vals, idx)
        # empty/null tool (non-tool rows) -> ""
        blank = pc.or_kleene(
            pc.is_null(tool), pc.equal(tool, pa.scalar("", type=pa.string()))
        )
        cls = pc.if_else(blank, pa.scalar("", type=pa.string()), cls)
        return batch.append_column("tool_class", cls)

    def apply_row(self, row: dict) -> list[dict] | None:
        row = dict(row)
        t = row.get("tool")
        if t is None or t == "":
            row.setdefault("tool_class", "")
        else:
            row.setdefault("tool_class", self.mapping.get(t, self.unmapped))
        return [row]


TRANSFORM_REGISTRY = {
    "subprocess": SubprocessTransformer,
    "normalize": NormalizeStage,
    "uppercase": UppercaseStage,
    "drop_role": DropRoleStage,
    "fanout": FanoutStage,
    "error_then_ok": ErrorThenOKStage,
    "hang": HangStage,
    "retry_odd": RetryOddStage,
    "enrich": EnrichStage,
}
