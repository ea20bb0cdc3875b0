"""Transformer stage contract + status/retry semantics.

Re-expresses the reference's transformer plugin model without the per-record
gRPC hop:

- reference: one ``TransformService.Transform`` RPC per record per stage
  (``/root/reference/internal/pipeline/runner.go:142``), response is 0..N
  events with a Status (``api/proto/v1/transformer.proto:30-42,79-84``).
- here: a stage is a Python object with a **vectorized batch path**
  (``transform_batch(pa.Table) -> pa.Table``, used inside Ray Data
  ``map_batches`` over zero-copy Arrow) and a **per-row path**
  (``apply_row(dict) -> list[dict] | None``) used by the single-threaded
  oracle. Tests assert both paths agree row-for-row.

Status semantics (``runner.go:158-174``):
  OK    → forward produced rows (1→0..N fan-out native);
  DROP  → row discarded, counted, offset still commits (``apply_row`` → None);
  RETRY/ERROR → retry the call up to ``attempts`` times, then drop+count
  ("drop+ack to avoid deadlocks", reference CONFIGS.md:95). In the batch path
  a transient failure raises ``TransientError`` and the whole batch call is
  retried — logically identical because stages are deterministic per row.
"""

from __future__ import annotations

import enum
from typing import Sequence

import pyarrow as pa

from ..config import RetryPolicy, StageSpec


class Status(enum.IntEnum):  # transformer.proto:79-84
    OK = 0
    DROP = 1
    RETRY = 2
    ERROR = 3


#: Optional per-row status column a stage may attach to its batch output.
#: Rows marked OK flow on (column stripped); DROP rows are discarded and
#: counted (intentional drop — still acked, never dead-lettered); RETRY/ERROR
#: rows are re-submitted to the SAME stage instance up to ``attempts`` times,
#: then drop+ack into the dead-letter stream. This is the reference's
#: per-record status granularity (``transformer.proto:30-35,79-84`` — a
#: plugin can fail individual records) expressed in the vectorized batch
#: contract; a stage that marks rows RETRY must return those rows 1→1 (same
#: schema as its input) so they can be re-presented.
STATUS_COL = "_status"


class TransientError(RuntimeError):
    """Stage-raised transient failure → retried, then dropped (T3).

    ``retry_after_ms`` is the reference's plugin-dictated backoff
    (``transformer.proto:34`` — a TransformResponse may carry
    ``retry_after_ms`` overriding the spec's fixed ``backoff_ms``): unlike
    the fixed backoff (pointless to sleep for a deterministic in-process
    stage), a stage-supplied hint means the stage is waiting on EXTERNAL
    state (a sidecar restart, a rate limit), so ``RetryingStage`` actually
    sleeps it (capped at ``_MAX_RETRY_AFTER_MS``) before the next attempt.
    """

    def __init__(self, *args, retry_after_ms: int | None = None):
        super().__init__(*args)
        self.retry_after_ms = retry_after_ms


#: Optional sibling of STATUS_COL: per-row backoff hint in ms, honored for
#: the rows marked RETRY/ERROR (the max hint across the batch's retry rows
#: is slept once before re-presenting them). transformer.proto:34 parity.
RETRY_AFTER_COL = "_retry_after_ms"

#: Safety cap on any stage-dictated sleep: a buggy plugin must not be able
#: to stall a worker for minutes per attempt.
_MAX_RETRY_AFTER_MS = 5_000


class Transformer:
    """Base stage. Subclasses override one or both paths.

    Default: batch path built from the row path (slow; fine for tests), row
    path built from the batch path is NOT derivable, so hot stages implement
    ``transform_batch`` natively with pyarrow.compute kernels.
    """

    name = "transformer"

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for r in batch.to_pylist():
            out = self.apply_row(r)
            if out:
                rows.extend(out)
        if not rows:
            return batch.schema.empty_table()
        return pa.Table.from_pylist(rows)

    def apply_row(self, row: dict) -> list[dict] | None:
        raise NotImplementedError


class StageTimeout(TransientError):
    """Stage call exceeded ``timeout_ms`` → handled exactly like a transient
    error: retried, then drop+ack (reference: ``context.WithTimeout`` per
    plugin call, ``runner.go:138-144``; DeadlineExceeded takes the retry
    path)."""


#: Abandoned-watchdog cap per process: a timed-out call's thread keeps
#: running (see below); past this many still-alive abandoned threads further
#: timeout attempts fail fast to STOP burning a core per retry on a
#: CPU-bound stall.
_MAX_ABANDONED_THREADS = 8
_abandoned_threads: list = []


def _call_with_timeout(fn, batch: pa.Table, timeout_ms: int) -> pa.Table:
    """Run ``fn(batch)`` under a watchdog thread with a deadline.

    A timed-out call's thread is abandoned (daemon), mirroring the
    reference's cancelled-context semantics — the in-flight plugin call is
    walked away from, never killed. CONTRACT: ``timeout_ms > 0`` therefore
    requires the stage to be STATELESS or thread-safe — the abandoned call
    may still be mutating the transformer object while the retry attempt
    runs on the caller thread (a stateful stage would race itself). The
    in-tree stateful stages (per-row counters) are only used with
    ``timeout_ms = 0``. Abandoned-but-alive threads are capped per process
    (``_MAX_ABANDONED_THREADS``): past the cap, timed-out calls stop
    spawning watchdogs and fail straight to the retry/drop path, so a
    CPU-bound stall cannot pile up a core per retry."""
    import threading

    _abandoned_threads[:] = [t for t in _abandoned_threads if t.is_alive()]
    if len(_abandoned_threads) >= _MAX_ABANDONED_THREADS:
        raise StageTimeout(
            f"{len(_abandoned_threads)} abandoned stage calls still running; "
            "failing fast instead of spawning another watchdog"
        )

    box: list = []

    def run() -> None:
        try:
            box.append(("ok", fn(batch)))
        except BaseException as exc:  # noqa: BLE001 — re-raised on the caller thread
            box.append(("err", exc))

    t = threading.Thread(target=run, daemon=True, name="stage-watchdog")
    t.start()
    t.join(timeout_ms / 1000.0)
    if not box:
        _abandoned_threads.append(t)
        raise StageTimeout(f"stage call exceeded {timeout_ms} ms")
    kind, val = box[0]
    if kind == "err":
        raise val
    return val


class RetryingStage:
    """Wraps a Transformer with the reference's retry-then-drop policy and
    optional per-call timeout (T2+T3).

    Works for both paths; usable directly as a ``map_batches`` callable.
    ``backoff_ms`` is honored as spec parity but not slept in-process
    (the reference sleeps between attempts, ``runner.go:151``; an in-process
    deterministic stage gains nothing from sleeping). A STAGE-dictated
    backoff, in contrast, IS slept: a ``TransientError(retry_after_ms=...)``
    or a per-row ``_retry_after_ms`` column next to ``_status``
    (``transformer.proto:34`` — the plugin overrides the spec's fixed
    backoff) sleeps min(hint, 5 s) before the next attempt, never after the
    last one (exhaustion still drop+acks immediately).
    """

    def __init__(
        self,
        inner: Transformer,
        policy: RetryPolicy | None = None,
        timeout_ms: int = 0,
    ):
        self.inner = inner
        self.policy = policy or RetryPolicy()
        self.timeout_ms = timeout_ms
        self.dropped_after_retries = 0
        self.dropped_by_status = 0  # intentional per-row DROPs (status col)
        self.timed_out = 0
        self.backoff_hints_honored = 0  # stage-dictated retry_after_ms sleeps
        self.backoff_hint_ms_total = 0
        # dead-letter: batches dropped after retry exhaustion, as seen at
        # THIS stage's input — collected by the caller (the reference drops
        # and acks to avoid deadlocks, CONFIGS.md:95; we additionally keep
        # the rows for a committed "deadletter" output stream)
        self.dead_batches: list[pa.Table] = []

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.transform_batch(batch)

    def _attempt(self, batch: pa.Table) -> pa.Table:
        if self.timeout_ms > 0:
            return _call_with_timeout(self.inner.transform_batch, batch, self.timeout_ms)
        return self.inner.transform_batch(batch)

    def _sleep_hint(self, hint_ms, attempts_left: int) -> None:
        """Honor a stage-dictated backoff (transformer.proto:34) before the
        NEXT attempt — skipped when retries are already exhausted, so an
        exhausted batch still drop+acks immediately."""
        if not hint_ms or hint_ms <= 0 or attempts_left <= 0:
            return
        import time

        ms = min(int(hint_ms), _MAX_RETRY_AFTER_MS)
        self.backoff_hints_honored += 1
        self.backoff_hint_ms_total += ms
        time.sleep(ms / 1000.0)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        attempts = max(1, self.policy.attempts)
        pending = batch
        ok_parts: list[pa.Table] = []
        for _attempt in range(attempts):
            try:
                out = self._attempt(pending)
            except StageTimeout:
                self.timed_out += 1
                continue  # whole-batch retry (pending unchanged)
            except TransientError as exc:
                self._sleep_hint(exc.retry_after_ms, attempts - 1 - _attempt)
                continue
            if STATUS_COL not in out.column_names:
                if RETRY_AFTER_COL in out.column_names:
                    # a hint column without a status column is meaningless
                    # (nothing is retrying) — strip it so it never leaks
                    # into the stage's output schema
                    out = out.drop_columns([RETRY_AFTER_COL])
                ok_parts.append(out)
                pending = None
                break
            # per-row status granularity: split OK / DROP / RETRY+ERROR
            st = out.column(STATUS_COL)
            aux = [STATUS_COL]
            if RETRY_AFTER_COL in out.column_names:
                aux.append(RETRY_AFTER_COL)
            ok_parts.append(
                out.filter(pc.equal(st, int(Status.OK))).drop_columns(aux)
            )
            self.dropped_by_status += pc.sum(
                pc.cast(pc.equal(st, int(Status.DROP)), pa.int64())
            ).as_py() or 0
            retry_rows = out.filter(pc.greater_equal(st, int(Status.RETRY)))
            if RETRY_AFTER_COL in retry_rows.column_names and retry_rows.num_rows:
                # one sleep per re-presentation: the max hint across the
                # batch's retry rows (they are re-attempted together)
                hint = pc.max(retry_rows.column(RETRY_AFTER_COL)).as_py()
                self._sleep_hint(hint, attempts - 1 - _attempt)
            pending = retry_rows.drop_columns(aux)
            if pending.num_rows == 0:
                pending = None
                break
        if pending is not None and pending.num_rows:
            # retries exhausted for the remaining rows (or the whole batch)
            self.dropped_after_retries += pending.num_rows
            self.dead_batches.append(pending)
        if not ok_parts:
            return batch.schema.empty_table()
        if len(ok_parts) == 1:
            return ok_parts[0]
        return pa.concat_tables(ok_parts, promote_options="default")

    def apply_row(self, row: dict) -> list[dict] | None:
        attempts = max(1, self.policy.attempts)
        for _attempt in range(attempts):
            try:
                return self.inner.apply_row(row)
            except TransientError as exc:
                self._sleep_hint(exc.retry_after_ms, attempts - 1 - _attempt)
                continue
        self.dropped_after_retries += 1
        return None


def build_chain(specs: Sequence[StageSpec]) -> list[RetryingStage]:
    """Spec → ordered stage chain (reference compiler analog,
    ``internal/pipeline/compiler.go:53-67``)."""
    from .transforms import TRANSFORM_REGISTRY

    chain = []
    for s in specs:
        if s.name not in TRANSFORM_REGISTRY:
            raise ValueError(f"unknown transformer {s.name!r}")
        inner = TRANSFORM_REGISTRY[s.name](**s.options)
        chain.append(RetryingStage(inner, s.retry, timeout_ms=s.timeout_ms))
    return chain


def apply_chain_batch(chain: Sequence[RetryingStage], batch: pa.Table) -> pa.Table:
    """Run a batch through the ordered chain; early-exit on empty
    (reference: ``runner.go:186-189``)."""
    for stage in chain:
        if batch.num_rows == 0:
            break
        batch = stage.transform_batch(batch)
    return batch
