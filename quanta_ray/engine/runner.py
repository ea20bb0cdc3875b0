"""The streaming runner: epoch loop + stateful partition actors.

Physical plan (SURVEY §4.2), per epoch e (one input Parquet file = one
micro-batch):

    driver:  wm[e] precomputed from Parquet footer stats (sources/stream.py)
      └─ _read_split tasks  (stateless; ONE PER FILE FRAGMENT — row-group
         ranges of ~fragment_rows rows, planned from footer metadata): read →
         drop late rows vs wm[e-1] → transform chain (vectorized Arrow,
         status semantics) → hash-partition on conv_id → num_returns=P+1
         (stats + one table per partition). Map parallelism = in-flight
         epochs × fragments, not epochs.
      └─ _write_turns tasks: the pass-through stream, G=turns_write_groups
         sorted zstd files per epoch (partition p → group p % G), written
         off the critical path
      └─ worker[m].process_epoch(e, wm[e], tables…)  (stateful actor process
         hosting P/M partitions, num_cpus=1): incremental window/session/
         join state, watermark-driven emission; returns emitted tables +
         pickled checkpoint blobs via the object store — its chain is
         compute-only
      └─ _write_outputs task (map slots): compress+write emitted streams and
         checkpoint blobs
      └─ driver commits manifest-e (2PC: files + checkpoints + offsets +
         metrics) strictly in epoch order, AFTER all of the above; bounded
         in-flight epochs = backpressure (reference analog: token-bucket
         capacity, ``/root/reference/source/kafka/backpressure.go:9-85``).

Why raw Ray actors instead of ``Dataset.map_batches`` for the stateful stage:
windows/joins need *persistent keyed state across micro-batches* plus
addressable per-partition checkpointing — outside the Dataset API's
per-execution actor lifecycle. Everything stateless stays vectorized Arrow,
and the batch-mode pipelines (``quanta_ray.pipelines``) are pure Ray Data.

Determinism contract (must equal ``quanta_ray.oracle`` row-for-row):
- a conversation lives in exactly ONE partition (hash(conv_id) % P via
  ``pandas.util.hash_array`` — process-independent). Salting/hot-key splitting
  is applied only to stateless pre-aggregation paths (see
  ``pipelines/batch_cep.py``); splitting a conv across salts would break
  session merge and join pairing (SURVEY §7 "hard parts").
- all emission rules are pure functions of (buffered rows, wm[e]); wm is
  data-defined (footer stats), never wall-clock.
- output files have deterministic names and deterministically sorted rows →
  replay/retry writes byte-identical files (exactly-once with the manifest).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa
import ray

from ..config import PipelineSpec
from ..sources.stream import get_driver, precompute_watermarks
from ..stages.base import apply_chain_batch, build_chain
from .worker import MultiPartitionWorker, _limit_native_threads
from ..state.checkpoint import (
    latest_committed_epoch,
    read_manifest,
    write_manifest,
)

NEG_INF = -(1 << 62)
POS_INF = 1 << 62


def partition_ids(conv_ids: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic, process-independent hash partition of conv_id."""
    import pandas as pd

    return (pd.util.hash_array(conv_ids) % num_partitions).astype(np.int64)


# --------------------------------------------------------------------------
# map side: read one epoch, late-filter, transform, split by partition
# --------------------------------------------------------------------------


def _write_turns_impl(
    out_dir: str, epoch: int, group: int, slow_s: float, barrier_epoch: int,
    *parts: pa.Table
) -> dict | None:
    """Write one partition-group's slice of the pass-through "turns" stream.

    Per epoch the turns stream is written by ``turns_write_groups`` parallel
    tasks (partition p → group p % G, G fixed by the spec so file names stay
    deterministic across cluster sizes), each sorted by (conv_id, turn_idx).
    Separate tasks so the (compressing) writes overlap with the stateful
    actors instead of delaying their dispatch.

    ``slow_s`` is fault injection (sink option ``debug_slow_write_epoch``):
    a scripted straggler WRITE — the realistic out-of-order-completion case
    (an overloaded storage node), since stateful worker chains are
    epoch-ordered by construction and can never invert."""
    import pyarrow.compute as pc

    from ..sinks.exactly_once import write_part_file

    _limit_native_threads()
    if slow_s > 0:
        import time as _t

        _t.sleep(slow_s)
    if barrier_epoch >= 0:
        # deterministic straggler (fault injection): hold this write until a
        # LATER epoch's turns data files exist on disk, so an out-of-order
        # completion is guaranteed regardless of host speed. Bounded poll —
        # on timeout the write proceeds (test then fails visibly, no hang).
        import glob as _glob
        import time as _t

        deadline = _t.monotonic() + 120.0
        pat = os.path.join(out_dir, "data", "turns", f"part-*-{barrier_epoch:08d}.parquet")
        while _t.monotonic() < deadline and not _glob.glob(pat):
            _t.sleep(0.05)
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:  # a group's slice can be entirely late-dropped
        return None
    table = pa.concat_tables(nonempty)
    idx = pc.sort_indices(
        table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return write_part_file(table.take(idx), out_dir, "turns", group, epoch)


_write_turns = ray.remote(_write_turns_impl)


@ray.remote
def _write_outputs(out_dir: str, epoch: int, payload: dict) -> dict:
    """Write one worker's emitted stream tables + checkpoint blobs.

    Runs as a task on the map slots so the (compressing) writes overlap with
    the stateful workers instead of extending their serial chains; the
    manifest commit waits on this task, preserving the 2PC guarantee."""
    from ..sinks.exactly_once import write_part_file
    from .worker import write_checkpoint_blob

    _limit_native_threads()
    entries = []
    for stream, pid, table in payload["tables"]:
        e = write_part_file(table, out_dir, stream, pid, epoch)
        if e:
            entries.append(e)
    ckpts = [write_checkpoint_blob(out_dir, meta, raw) for meta, raw in payload["ckpt_blobs"]]
    return {"files": entries, "checkpoints": ckpts}


def _read_split_impl(
    path: str,
    epoch: int,
    wm_prev: int,
    spec: PipelineSpec,
    rg_lo: int = 0,
    rg_hi: int | None = None,
    row_offset: int = 0,
    out_dir: str | None = None,
    frag_idx: int = 0,
) -> list[Any]:
    """Read ONE FRAGMENT (row groups [rg_lo, rg_hi)) of an epoch file, late-
    filter, run the transform chain, hash-partition. Map parallelism is
    epochs × fragments (``SourceSpec.fragment_rows``), so a large epoch no
    longer serializes read+transform+partition in one task.

    Rows a stage drops after retry exhaustion are written (deterministic,
    retry-idempotent) to the ``deadletter`` stream when
    ``SinkSpec.dead_letter``; the entry rides back in ``stats`` and is named
    by the epoch's manifest."""
    import pyarrow.compute as pc

    from ..sources.stream import get_driver

    _limit_native_threads()
    import time as _time

    t0 = _time.perf_counter()
    P = spec.cep.num_partitions
    table = get_driver(spec.source.kind).read_fragment(path, rg_lo, rg_hi)
    missing = {"conv_id", "turn_idx", "role", "text", "tool", "ts"} - set(
        table.schema.names
    )
    if missing:
        raise ValueError(
            f"{path}: source is missing transcript columns {sorted(missing)} "
            f"(input_hint schema: conv_id, turn_idx, role, text, tool, ts)"
        )
    n_input = table.num_rows
    # lineage columns (CheckpointToken analog): epoch + file-global row offset
    table = table.append_column("_epoch", pa.array(np.full(n_input, epoch), type=pa.int64()))
    table = table.append_column(
        "_offset", pa.array(row_offset + np.arange(n_input), type=pa.int64())
    )
    # late filter vs the watermark at arrival (wm after the previous epoch)
    ts = table.column("ts").cast(pa.int64())
    on_time = pc.greater_equal(ts, pa.scalar(wm_prev, type=pa.int64()))
    n_late = n_input - pc.sum(pc.cast(on_time, pa.int64())).as_py()
    late_entry = None
    if n_late:
        # late-data side output (Flink/Beam side-output parity): commit the
        # RAW dropped rows (pre-transform) with their epoch + the watermark
        # they were late against; the on-time path is unchanged
        if out_dir is not None and spec.cep.late_output:
            from ..schema import LATE_SCHEMA
            from ..sinks.exactly_once import write_part_file

            lt = table.filter(pc.invert(on_time))
            late_tbl = pa.Table.from_arrays(
                [
                    lt.column("conv_id").cast(pa.string()),
                    lt.column("turn_idx").cast(pa.int64()),
                    lt.column("role").cast(pa.string()),
                    lt.column("text").cast(pa.string()),
                    lt.column("tool").cast(pa.string()),
                    lt.column("ts").cast(pa.timestamp("us")),
                    pa.array(np.full(lt.num_rows, epoch), type=pa.int64()),
                    pa.array(
                        np.full(lt.num_rows, wm_prev), type=pa.int64()
                    ).cast(pa.timestamp("us")),
                ],
                schema=LATE_SCHEMA,
            )
            late_entry = write_part_file(late_tbl, out_dir, "late", frag_idx, epoch)
        table = table.filter(on_time)
    # transform chain (vectorized; OK/DROP/RETRY/ERROR semantics inside)
    chain = build_chain(spec.transformers)
    table = apply_chain_batch(chain, table)
    n_out = table.num_rows
    # dead-letter: rows dropped after retry exhaustion, tagged with the
    # responsible stage; drop+ack semantics unchanged (the rows do not flow
    # downstream), but they become a committed, inspectable output stream
    dead_entry = None
    if out_dir is not None and spec.sink.dead_letter:
        dead_parts = []
        keep_cols = {"conv_id", "turn_idx", "role", "text", "tool", "ts", "_epoch", "_offset"}
        for stage in chain:
            for b in stage.dead_batches:
                sel = b.select([c for c in b.schema.names if c in keep_cols])
                sel = sel.append_column(
                    "_stage", pa.array([stage.inner.name] * sel.num_rows, type=pa.string())
                )
                sel = sel.append_column(
                    "_reason",
                    pa.array(
                        ["timeout" if stage.timed_out else "retries_exhausted"]
                        * sel.num_rows,
                        type=pa.string(),
                    ),
                )
                dead_parts.append(sel)
        if dead_parts:
            from ..sinks.exactly_once import write_part_file

            dead_entry = write_part_file(
                pa.concat_tables(dead_parts, promote_options="default"),
                out_dir,
                "deadletter",
                frag_idx,
                epoch,
            )
    # hash partition on conv_id
    conv = np.asarray(table.column("conv_id").to_pandas(), dtype=object)
    part = partition_ids(conv, P)
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    stats = {
        "epoch": epoch,
        "n_input": n_input,
        "n_late_dropped": int(n_late),
        "n_after_chain": int(n_out),
        "n_stage_dropped": int(
            sum(getattr(s, "dropped_after_retries", 0) for s in chain)
        ),
        "t_read_split": round(_time.perf_counter() - t0, 4),
        "deadletter": dead_entry if out_dir is not None and spec.sink.dead_letter else None,
        "late": late_entry,
    }
    out: list[Any] = [stats]
    for p in range(P):
        idx = order[bounds[p] : bounds[p + 1]]
        out.append(table.take(pa.array(idx)))  # take() copies → compact buffers
    return out


_read_split = ray.remote(_read_split_impl)


# --------------------------------------------------------------------------
# reduce side: per-partition stateful CEP worker (see worker.py)
# --------------------------------------------------------------------------

# Each worker PROCESS hosts several logical partitions and reserves one CPU
# slot — the slots model: partition count P is fixed by the job, worker count
# scales with the cluster, and the num_cpus=1 reservation makes
# ``ray.init(num_cpus=N)`` a REAL parallelism bound (a 0-cpu actor would run
# unthrottled on every physical core and fake any scaling measurement).
PartitionWorker = ray.remote(num_cpus=1)(MultiPartitionWorker)


def plan_worker_slots(P: int, cpus: int | None = None) -> list[list[int]]:
    """partition → worker-process assignment: M = cpus − reserve slots for
    the map/write tasks, capped at P; deterministic round-robin.

    ``QUANTA_WORKER_RESERVE`` overrides the reserved slot count (deployment
    tuning: more reserve = fewer, better-packed reduce workers)."""
    if cpus is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    env_r = os.environ.get("QUANTA_WORKER_RESERVE")
    # density: 3/4 of cpus run reduce workers, 1/4 the map/write tasks.
    # r2 measured the trade: reserve=cpus/2 raises absolute throughput
    # (8cpu 350k→492k turns/s; 32cpu best 1.21M) because the map side
    # stops starving, but the low parallelism level then saturates and
    # measured 8→32 scaling efficiency collapses (0.72 → ~0.5). The
    # default keeps the fixed wide layout whose between-level scaling is
    # honest; deployments chasing single-size throughput should set
    # QUANTA_WORKER_RESERVE = cpus/2.
    reserve = int(env_r) if env_r else max(2, cpus // 4)
    target = max(1, min(P, cpus - reserve))
    # prefer an M that divides P: unequal partitions-per-worker makes the
    # heavier workers 2x stragglers on every epoch
    M = next((m for m in range(target, 0, -1) if P % m == 0), 1)
    return [[p for p in range(P) if p % M == m] for m in range(M)]


# --------------------------------------------------------------------------
# driver: the epoch loop (backpressure + in-order 2PC commit + resume)
# --------------------------------------------------------------------------


class StreamingRunner:
    """Runs a PipelineSpec over its parquet stream with exactly-once output.

    ``run(stop_after_epoch=k)`` simulates a crash after committing epoch k
    (for kill/resume tests); a subsequent ``run()`` resumes from the last
    committed manifest and produces byte-identical final output.
    """

    def __init__(self, spec: PipelineSpec, out_dir: str):
        self.spec = spec
        self.out_dir = out_dir
        self.driver = get_driver(spec.source.kind)
        self.files = self.driver.list_files(spec.source.paths)
        if not self.files:
            raise ValueError("source has no files")
        self._workers: list[Any] | None = None
        self._assign: list[list[int]] | None = None
        # live /metrics endpoint (reference: telemetry/metrics.go:10-15).
        # Lives for the runner's lifetime so the final snapshot stays
        # inspectable after run() returns; off unless the spec or env asks.
        env_port = os.environ.get("QUANTA_METRICS_PORT")
        port = int(env_port) if env_port is not None else spec.metrics_port
        # control plane: PausePipeline/Resume (reference Control service,
        # api/proto/v1/control.proto:9,18-19 — stubbed UnimplementedControl
        # there; real here). Pause quiesces DISPATCH: in-flight epochs
        # drain and finished prefixes keep committing, no new epoch starts
        # until resume. Kill-while-paused == crash (resume-from-manifest
        # covers it), so pause never weakens exactly-once.
        import threading as _threading

        self._pause = _threading.Event()
        self.metrics_server = None
        if port >= 0:
            from ..telemetry import MetricsServer

            self.metrics_server = MetricsServer(port)
            self.metrics_server.bind_control(
                self.pause, self.resume, lambda: {"paused": self.paused}
            )

    def pause(self) -> None:
        """Quiesce epoch dispatch (PausePipeline parity); idempotent."""
        self._pause.set()

    def resume(self) -> None:
        """Lift a pause; idempotent (no-op when not paused)."""
        self._pause.clear()

    @property
    def paused(self) -> bool:
        return self._pause.is_set()

    @property
    def metrics_url(self) -> str | None:
        return self.metrics_server.url if self.metrics_server else None

    def close(self) -> None:
        if self.metrics_server is not None:
            self.metrics_server.close()
            self.metrics_server = None
        # drop worker actor handles so their CPU reservations free
        # immediately (not at GC time) — a closed runner that stays
        # referenced must not starve the next runner's actors
        self._workers = None
        self._assign = None

    def __del__(self) -> None:  # pragma: no cover - GC-order dependent
        try:
            self.close()
        except Exception:
            pass

    def prepare_workers(self) -> None:
        """Create + warm the worker actors (process spawn and imports happen
        here). Call before ``run()`` to measure sustained throughput without
        actor cold-start; ``run()`` calls it lazily."""
        if self._workers is None:
            P = self.spec.cep.num_partitions
            os.makedirs(self.out_dir, exist_ok=True)
            self._assign = plan_worker_slots(P)
            self._workers = [
                PartitionWorker.remote(pids, self.spec.cep, self.out_dir)
                for pids in self._assign
            ]
            ray.get([w.ping.remote() for w in self._workers])

    @staticmethod
    def _maybe_migrate(
        workers: list[Any],
        assign: list[list[int]],
        part_cost: dict[int, float],
        ratio: float,
    ) -> tuple[int, int, int] | None:
        """Move one partition from the most- to the least-loaded worker if
        the imbalance exceeds ``ratio`` and the move strictly improves it.

        Zero-stall protocol: ``extract`` is enqueued on the donor after its
        already-dispatched epochs (actor calls run in submission order) and
        ``adopt`` on the receiver before its next epoch; the extract→adopt
        ObjectRef dependency orders the two actors. State is per-partition
        and pure, so output is unaffected by which worker hosts it."""
        M = len(workers)
        if M < 2 or not part_cost:
            return None
        loads = [sum(part_cost.get(p, 0.0) for p in assign[mi]) for mi in range(M)]
        di = max(range(M), key=lambda i: loads[i])
        ri = min(range(M), key=lambda i: loads[i])
        # a zero MIN load is fine (tiny partitions round to 0) — only a zero
        # MAX load means there is no signal yet
        if di == ri or len(assign[di]) < 2 or loads[di] <= 0:
            return None
        if loads[di] < ratio * loads[ri]:
            return None
        gap = (loads[di] - loads[ri]) / 2
        p = min(assign[di], key=lambda q: abs(part_cost.get(q, 0.0) - gap))
        c = part_cost.get(p, 0.0)
        if c <= 0 or c >= loads[di] - loads[ri]:  # move must strictly improve
            return None
        ref = workers[di].extract_partition.remote(p)
        workers[ri].adopt_partition.remote(p, ref)
        assign[di].remove(p)
        assign[ri].append(p)
        return (di, ri, p)

    def run(
        self,
        stop_after_epoch: int | None = None,
        follow: int = 0,
        poll_sleep_s: float = 0.05,
        on_idle: Any = None,
    ) -> dict[str, Any]:
        """Run the stream to completion (exactly-once commit per epoch).

        ``follow > 0`` enables TAILING mode (reference analog: the consumer
        loops on new records forever, ``driver_sarama.go:71-82``): when the
        known epoch files are exhausted the source directory is re-listed;
        new files extend the stream (watermarks extended incrementally from
        footer stats). After ``follow`` consecutive empty polls the stream
        is declared ended and the final flush runs. ``on_idle(n)`` is an
        injectable hook called per empty poll (tests use it to append
        files deterministically); ``poll_sleep_s`` paces the driver's poll
        loop only — never semantics (all event time is data ``ts``).
        A flushed (completed) stream is final: growth after the final-flush
        manifest is not resumable."""
        import time as _walltime

        spec, cfg = self.spec, self.spec.cep
        P = cfg.num_partitions
        files = self.files
        n_epochs = len(files)
        final_epoch = n_epochs  # reserved epoch index for the final flush
        os.makedirs(self.out_dir, exist_ok=True)

        prefix, wms = precompute_watermarks(files, cfg.allowed_lateness_us, self.driver)
        cur_max = prefix[-1]

        latest = latest_committed_epoch(self.out_dir)
        if latest >= final_epoch:
            return {"status": "already-complete", "epochs": latest}
        if latest >= 0:
            m0 = read_manifest(self.out_dir, latest)
            if m0 is not None and m0.get("input", {}).get("file") is None:
                # the newest committed manifest is a FINAL FLUSH (input=None,
                # wm=+inf) yet the source now has more files: the stream
                # already ended and flushed — silently replaying the new
                # files as committed epochs would drop their rows (their
                # turns are never committed). Growth after flush is
                # non-resumable by contract; fail loudly instead.
                raise ValueError(
                    f"source grew to {len(files)} files after the final-flush "
                    f"manifest (epoch {latest}) was committed; a flushed "
                    "stream is final — write new files to a fresh pipeline "
                    "output dir (or tail with follow>0 BEFORE the flush)"
                )
        start_epoch = latest + 1
        ckpt_every = max(1, spec.checkpoint_every)

        self.prepare_workers()
        workers, assign = self._workers, self._assign
        assert workers is not None
        M = len(workers)
        resumed_ckpt_epoch: int | None = None
        # global burst-alert reducer state: per scope ('all' or a role), the
        # last non-empty tumbling window's (start, count). O(#scopes);
        # persisted in every manifest so resume continues each chain exactly
        # where the last committed epoch left it.
        alert_state: dict[str, Any] = {
            s: {"last_w": None, "last_n": 0} for s in spec.cep.alert_scopes
        }
        # role-mix drift reducer state: the last non-empty tumbling window's
        # start and its 4 global counts (n_turns, n_user, n_assistant,
        # n_tool). O(1); persisted in every manifest so resume continues
        # the drift chain exactly where the last committed epoch left it.
        drift_state: dict[str, Any] = {"last_w": None, "last": [0, 0, 0, 0]}
        # new-conversation accumulator: per still-open tumbling window, the
        # count of conversations whose global first turn landed in it so
        # far. O(open windows); persisted in every manifest, windows leave
        # the dict when emitted (wm >= w + size).
        newconv_state: dict[int, int] = {}
        # running session-duration quantile reducer state: the cumulative
        # duration histogram (O(sess_hist_bins) ints) — persisted in every
        # manifest so resume continues the running estimates exactly.
        sessq_state: list[int] = [0] * spec.cep.sess_hist_bins
        if latest >= 0:
            m = read_manifest(self.out_dir, latest)
            assert m is not None, f"latest manifest {latest} missing or unreadable"
            assert m["num_partitions"] == P, "partition count changed across resume"
            for s, st_s in (m.get("alerts_state") or {}).items():
                alert_state[s] = dict(st_s)
            saved_dr = m.get("drift_state")
            if saved_dr:
                drift_state = {
                    "last_w": saved_dr["last_w"],
                    "last": [int(v) for v in saved_dr["last"]],
                }
            saved_nc = m.get("newconv_state")
            if saved_nc:
                newconv_state = {int(w): int(c) for w, c in saved_nc.items()}
            saved_sq = m.get("sessq_state")
            if saved_sq:
                assert len(saved_sq) == len(sessq_state), (
                    "sess_hist_bins changed across resume"
                )
                sessq_state = [int(v) for v in saved_sq]
            # checkpoints are staggered across partitions: collect each
            # partition's newest checkpoint ≤ latest, restore, then replay
            # the (deterministic) epochs since — workers skip epochs already
            # folded into their restored state; no outputs are rewritten.
            per_part: dict[int, dict] = {}
            e_scan = latest
            while len(per_part) < P and e_scan >= 0:
                sm = read_manifest(self.out_dir, e_scan)
                assert sm is not None, f"manifest {e_scan} missing"
                for c in sm["checkpoints"]:
                    per_part.setdefault(c["partition"], c)
                e_scan -= 1
            resumed_ckpt_epoch = m.get("last_checkpoint_epoch", latest)
            ray.get(
                [
                    workers[mi].restore.remote(
                        {p: per_part[p]["path"] for p in assign[mi] if p in per_part}
                    )
                    for mi in range(M)
                ]
            )
            # Staggered checkpoints ((e+1+p) % K) mean a crash early in the
            # run can leave partitions with NO checkpoint in any committed
            # manifest. Those partitions start from fresh (empty) state and
            # deterministically replay every committed epoch; restored
            # partitions skip epochs already folded into their state
            # (worker.process_epoch's last_epoch guard).
            if len(per_part) < P:
                replay_from = 0
            else:
                replay_from = min(c["epoch"] for c in per_part.values()) + 1
            for e in range(replay_from, latest + 1):
                wm_prev = wms[e - 1] if e > 0 else NEG_INF
                frags = self.driver.plan_fragments(files[e], spec.source.fragment_rows)
                # replay: deadletter files rewrite idempotently (same bytes)
                frefs = [
                    _read_split.options(num_returns=P + 1).remote(
                        files[e], e, wm_prev, spec, lo, hi, off, self.out_dir, fi
                    )
                    for fi, (lo, hi, off) in enumerate(frags)
                ]
                F = len(frags)
                ray.get(
                    [
                        workers[mi].process_epoch.options(num_returns=2).remote(
                            e, wms[e], [], False, F, list(assign[mi]),
                            *[frefs[fi][1 + p] for p in assign[mi] for fi in range(F)],
                        )[0]
                        for mi in range(M)
                    ]
                )

        inflight: dict[int, tuple[Any, list[Any]]] = {}
        max_inflight = max(1, spec.source.max_inflight_epochs)
        # --- out-of-order completion window (F2/F3 wired; reference:
        # contiguous-ack tracker + capacity-returns-on-ack semantics) ---
        ooo = spec.source.ooo_commit
        from ..state.checkpoint import LowWatermarkTracker

        tracker = LowWatermarkTracker()  # seq i ⇔ epoch start_epoch + i
        epoch_refs: dict[int, list[Any]] = {}  # incomplete epochs → waiting refs
        completion_order: list[int] = []
        max_uncommitted = spec.source.max_uncommitted_epochs or 4 * max_inflight
        max_uncommitted_seen = 0

        def ooo_poll() -> None:
            """Mark epochs whose tasks all finished as resolved; commit the
            contiguous prefix (manifests stay strictly ordered)."""
            nonlocal max_uncommitted_seen
            # high-water mark BEFORE draining commits: records how far
            # dispatch ran ahead of the commit frontier at this instant
            max_uncommitted_seen = max(max_uncommitted_seen, len(inflight))
            for ei in list(epoch_refs):
                refs = epoch_refs[ei]
                _done, rem = ray.wait(
                    refs, num_returns=len(refs), timeout=0, fetch_local=False
                )
                if rem:
                    epoch_refs[ei] = rem
                else:
                    del epoch_refs[ei]
                    completion_order.append(ei)
                    tracker.resolve(ei - start_epoch)
            while inflight and (min(inflight) - start_epoch) <= tracker.highest():
                commit(min(inflight))

        def ooo_backpressure() -> None:
            """Block dispatch only while ≥ max_inflight epochs are INCOMPLETE
            — a completed-but-uncommitted straggler backlog does not consume
            window (bounded separately by ``max_uncommitted``)."""
            nonlocal max_uncommitted_seen
            ooo_poll()
            while len(epoch_refs) >= max_inflight:
                allr = [r for refs in epoch_refs.values() for r in refs]
                ray.wait(allr, num_returns=1, fetch_local=False)
                ooo_poll()
            max_uncommitted_seen = max(max_uncommitted_seen, len(inflight))
            while len(inflight) > max_uncommitted:
                commit(min(inflight))
        summary_metrics: list[dict] = []
        # per-partition compute-cost EMA drives between-epoch work stealing.
        # Metas are harvested EAGERLY (ray.wait, zero timeout) as workers
        # finish epochs — not at commit — so rebalancing reacts within
        # ~1 epoch instead of lagging the in-flight window.
        part_cost: dict[int, float] = {}
        migrations: list[tuple[int, int, int, int]] = []
        unharvested: list[Any] = []

        def fold_meta(r: dict) -> None:
            for pm in r["metrics"]:
                p = pm.get("partition")
                if p is None:
                    continue
                c = pm.get("t_ingest", 0.0) + pm.get("t_emit", 0.0) + pm.get("t_write", 0.0)
                part_cost[p] = 0.5 * part_cost.get(p, c) + 0.5 * c

        def harvest_ready() -> None:
            nonlocal unharvested
            if not unharvested:
                return
            ready, unharvested = ray.wait(
                unharvested, num_returns=len(unharvested), timeout=0
            )
            for r in ray.get(ready):
                fold_meta(r)

        last_ckpt_epoch = {"v": resumed_ckpt_epoch}
        # "auto" commit mode = fire-and-forget (reference F6,
        # source/kafka/driver_sarama.go:191-199): files land but no manifest
        # / checkpoint transaction — kept as a mode for benchmarking the 2PC
        # overhead; no exactly-once, no resume.
        e2e = spec.sink.commit_mode != "auto"

        def commit(epoch: int) -> None:
            import time as _time

            t_c0 = _time.perf_counter()
            stats_refs, meta_refs, write_refs, turns_refs = inflight.pop(epoch)
            frag_stats = ray.get(stats_refs) if stats_refs else []
            stats: dict[str, Any] = {}
            dead_entries: list[dict] = []
            if frag_stats:
                dead_entries = [s["deadletter"] for s in frag_stats if s.get("deadletter")]
                dead_entries += [s["late"] for s in frag_stats if s.get("late")]
                stats = {
                    "epoch": epoch,
                    "n_fragments": len(frag_stats),
                    "n_input": sum(s["n_input"] for s in frag_stats),
                    "n_late_dropped": sum(s["n_late_dropped"] for s in frag_stats),
                    "n_after_chain": sum(s["n_after_chain"] for s in frag_stats),
                    "n_stage_dropped": sum(s["n_stage_dropped"] for s in frag_stats),
                    "t_read_split": max(s["t_read_split"] for s in frag_stats),
                }
            metas = ray.get(meta_refs)
            writes = ray.get(write_refs)
            if self.metrics_server is not None:
                # commit runs once per epoch (both modes), so each partition
                # metric folds exactly once; O(partitions) scalars per epoch
                for r in metas:
                    for pm in r["metrics"]:
                        self.metrics_server.fold_partition(pm)
                self.metrics_server.update(
                    pipeline_id=spec.pipeline_id,
                    epochs_committed=epoch,
                    watermark=wms[epoch] if epoch < len(files) else POS_INF,
                    inflight_epochs=len(inflight),
                )
            stream_files = [f for w in writes for f in w["files"]]
            # second-level reduce: fold per-worker tumbling-window partials
            # (O(windows/epoch) scalars) into global counts, chain the burst
            # predicate through windows in w_start order. Commits run in
            # strict epoch order (both modes), so the fold order — and
            # therefore the alert stream — is deterministic.
            alert_entries: list[dict] = []
            merged: dict[int, list[int]] = {}
            if spec.cep.alert_ratio > 0 or spec.cep.role_drift:
                for r in metas:
                    for w, t in r.get("win_partials", {}).items():
                        m_w = merged.setdefault(int(w), [0, 0, 0, 0])
                        for i, v in enumerate(t):
                            m_w[i] += int(v)
            if spec.cep.alert_ratio > 0:
                from ..schema import ALERT_SCHEMA
                from ..sinks.exactly_once import write_part_file

                scope_col = {"all": 0, "user": 1, "assistant": 2, "tool": 3}
                alert_rows: list[tuple[str, int, int, int]] = []
                for w in sorted(merged):
                    counts = merged[w]
                    for scope in spec.cep.alert_scopes:
                        n = counts[scope_col[scope]]
                        if n == 0:
                            continue  # empty FOR THIS SCOPE: chain unmoved
                        st_s = alert_state[scope]
                        if (
                            st_s["last_w"] is not None
                            and n >= spec.cep.alert_ratio * st_s["last_n"]
                        ):
                            alert_rows.append((scope, w, n, st_s["last_n"]))
                        st_s["last_w"], st_s["last_n"] = w, n
                if alert_rows:
                    alert_rows.sort(key=lambda r: (r[1], r[0]))
                    tbl = pa.Table.from_arrays(
                        [
                            pa.array([r[0] for r in alert_rows], pa.string()),
                            pa.array([r[1] for r in alert_rows], pa.int64()).cast(
                                pa.timestamp("us")
                            ),
                            pa.array([r[2] for r in alert_rows], pa.int64()),
                            pa.array([r[3] for r in alert_rows], pa.int64()),
                        ],
                        schema=ALERT_SCHEMA,
                    )
                    e_a = write_part_file(tbl, self.out_dir, "alerts", 0, epoch)
                    if e_a:
                        alert_entries.append(e_a)
            # role-mix drift: chain the same global per-window role counts
            # through non-empty windows in w_start order (commits run in
            # strict epoch order, so the chain — and the stream — is
            # deterministic); emit the exact cross-multiplied integer L1
            # vs the previous non-empty window. Python-int arithmetic in
            # the fold, int64 on emit.
            drift_entries: list[dict] = []
            if spec.cep.role_drift:
                from ..schema import DRIFT_SCHEMA
                from ..sinks.exactly_once import write_part_file

                dr_rows: list[tuple[int, int, int, int, int, int]] = []
                for w in sorted(merged):
                    cur = merged[w]
                    n_tot = cur[0]
                    if n_tot == 0:
                        continue  # empty window: chain unmoved
                    if drift_state["last_w"] is not None:
                        prev = drift_state["last"]
                        m_tot = prev[0]
                        l1 = sum(
                            abs(cur[i] * m_tot - prev[i] * n_tot)
                            for i in (1, 2, 3)
                        )
                        dr_rows.append(
                            (w, drift_state["last_w"], n_tot, m_tot,
                             l1, n_tot * m_tot)
                        )
                    drift_state["last_w"] = w
                    drift_state["last"] = list(cur)
                if dr_rows:
                    tbl = pa.Table.from_arrays(
                        [
                            pa.array([r[0] for r in dr_rows], pa.int64()).cast(
                                pa.timestamp("us")
                            ),
                            pa.array([r[1] for r in dr_rows], pa.int64()).cast(
                                pa.timestamp("us")
                            ),
                            pa.array([r[2] for r in dr_rows], pa.int64()),
                            pa.array([r[3] for r in dr_rows], pa.int64()),
                            pa.array([r[4] for r in dr_rows], pa.int64()),
                            pa.array([r[5] for r in dr_rows], pa.int64()),
                        ],
                        schema=DRIFT_SCHEMA,
                    )
                    e_d = write_part_file(tbl, self.out_dir, "drift", 0, epoch)
                    if e_d:
                        drift_entries.append(e_d)
            # new-conversation acquisition: fold the per-worker per-window
            # counts of newly-final first turns into the manifest-carried
            # accumulator; a window emits (once) when the watermark passes
            # its end — past that point no accepted row can start a new
            # conversation in it or lower an existing minimum into it.
            newconv_entries: list[dict] = []
            if spec.cep.new_convs:
                from ..schema import NEWCONV_SCHEMA
                from ..sinks.exactly_once import write_part_file

                for r in metas:
                    for w, c in r.get("newconv_partials", {}).items():
                        wi = int(w)
                        newconv_state[wi] = newconv_state.get(wi, 0) + int(c)
                wm_now = wms[epoch] if epoch < len(files) else POS_INF
                done_ws = sorted(
                    w for w in newconv_state
                    if w + spec.cep.tumbling_size_us <= wm_now
                )
                if done_ws:
                    tbl = pa.Table.from_arrays(
                        [
                            pa.array(done_ws, pa.int64()).cast(pa.timestamp("us")),
                            pa.array(
                                [newconv_state.pop(w) for w in done_ws], pa.int64()
                            ),
                        ],
                        schema=NEWCONV_SCHEMA,
                    )
                    e_nc = write_part_file(tbl, self.out_dir, "newconvs", 0, epoch)
                    if e_nc:
                        newconv_entries.append(e_nc)
            # windowed exact top-k: merge the workers' per-window k-sized
            # lists (convs are partition-disjoint → merge of complete local
            # top-ks is the exact global top-k), emit rank rows. All
            # partitions finalize a window in the same epoch (shared wm
            # sequence), so each window appears in exactly one commit; no
            # cross-epoch reducer state to persist.
            topk_entries: list[dict] = []
            if spec.cep.topk_k > 0:
                from ..schema import TOPK_SCHEMA
                from ..sinks.exactly_once import write_part_file

                merged_tk: dict[int, list] = {}
                for r in metas:
                    for w, lst in r.get("topk_partials", {}).items():
                        merged_tk.setdefault(int(w), []).extend(
                            (c, int(n)) for c, n in lst
                        )
                tk_rows: list[tuple[int, int, str, int]] = []
                for w in sorted(merged_tk):
                    best = sorted(merged_tk[w], key=lambda t: (-t[1], t[0]))
                    best = best[: spec.cep.topk_k]
                    tk_rows += [(w, i, c, n) for i, (c, n) in enumerate(best, 1)]
                if tk_rows:
                    tbl = pa.Table.from_arrays(
                        [
                            pa.array([r[0] for r in tk_rows], pa.int64()).cast(
                                pa.timestamp("us")
                            ),
                            pa.array([r[1] for r in tk_rows], pa.int64()),
                            pa.array([r[2] for r in tk_rows], pa.string()),
                            pa.array([r[3] for r in tk_rows], pa.int64()),
                        ],
                        schema=TOPK_SCHEMA,
                    )
                    e_tk = write_part_file(tbl, self.out_dir, "topk", 0, epoch)
                    if e_tk:
                        topk_entries.append(e_tk)
            # windowed conversation-activity histogram: vector-add the
            # workers' per-window 5-int partials (convs are partition-
            # disjoint → the sum is the exact global histogram), emit all
            # five buckets per window. Like topk: windows finalize in
            # exactly one epoch, so no cross-epoch reducer state.
            convhist_entries: list[dict] = []
            if spec.cep.conv_hist:
                from ..schema import CONVHIST_BUCKETS, CONVHIST_SCHEMA
                from ..sinks.exactly_once import write_part_file

                merged_ch: dict[int, list[int]] = {}
                for r in metas:
                    for w, v in r.get("convhist_partials", {}).items():
                        prev = merged_ch.get(int(w))
                        merged_ch[int(w)] = (
                            [a + b for a, b in zip(prev, v)] if prev else list(v)
                        )
                if merged_ch:
                    ch_rows = [
                        (w, b, int(merged_ch[w][i]))
                        for w in sorted(merged_ch)
                        for i, b in enumerate(CONVHIST_BUCKETS)
                    ]
                    tbl = pa.Table.from_arrays(
                        [
                            pa.array([r[0] for r in ch_rows], pa.int64()).cast(
                                pa.timestamp("us")
                            ),
                            pa.array([r[1] for r in ch_rows], pa.string()),
                            pa.array([r[2] for r in ch_rows], pa.int64()),
                        ],
                        schema=CONVHIST_SCHEMA,
                    )
                    e_ch = write_part_file(tbl, self.out_dir, "convhist", 0, epoch)
                    if e_ch:
                        convhist_entries.append(e_ch)
            # windowed tool usage: sum the workers' per-(window, tool)
            # (n_calls, n_distinct_convs) partials — convs are partition-
            # disjoint, so both sums are exact global values. Like convhist:
            # windows finalize in exactly one epoch, no cross-epoch state.
            tooluse_entries: list[dict] = []
            if spec.cep.tool_usage:
                from ..schema import TOOLUSE_SCHEMA
                from ..sinks.exactly_once import write_part_file

                merged_tu: dict[int, dict[str, list[int]]] = {}
                for r in metas:
                    for w, by_tool in r.get("tooluse_partials", {}).items():
                        cur = merged_tu.setdefault(int(w), {})
                        for t, v in by_tool.items():
                            prev = cur.get(t)
                            cur[t] = (
                                [prev[0] + v[0], prev[1] + v[1]]
                                if prev else [int(v[0]), int(v[1])]
                            )
                if merged_tu:
                    tu_rows = [
                        (w, t, merged_tu[w][t][0], merged_tu[w][t][1])
                        for w in sorted(merged_tu)
                        for t in sorted(merged_tu[w])
                    ]
                    tbl = pa.Table.from_arrays(
                        [
                            pa.array([r[0] for r in tu_rows], pa.int64()).cast(
                                pa.timestamp("us")
                            ),
                            pa.array([r[1] for r in tu_rows], pa.string()),
                            pa.array([r[2] for r in tu_rows], pa.int64()),
                            pa.array([r[3] for r in tu_rows], pa.int64()),
                        ],
                        schema=TOOLUSE_SCHEMA,
                    )
                    e_tu = write_part_file(tbl, self.out_dir, "tooluse", 0, epoch)
                    if e_tu:
                        tooluse_entries.append(e_tu)
            # running session-duration quantiles: fold this epoch's histogram
            # partials into the cumulative state (vector add of integer bin
            # counts — mergeable by construction); if any session closed this
            # epoch, emit one row per requested quantile. Commits run in
            # strict epoch order, so the running estimate is deterministic.
            sessq_entries: list[dict] = []
            if spec.cep.sess_quantiles:
                from ..schema import SESSQUANT_SCHEMA
                from ..sinks.exactly_once import write_part_file

                added = 0
                for r in metas:
                    for b, c in r.get("sessq_partials", {}).items():
                        sessq_state[int(b)] += int(c)
                        added += int(c)
                if added:
                    from ..state.sessquant import quantile_rows

                    total = sum(sessq_state)
                    sq_rows = quantile_rows(
                        sessq_state, spec.cep.sess_quantiles,
                        spec.cep.sess_hist_bin_us,
                    )
                    tbl = pa.Table.from_arrays(
                        [
                            pa.array([epoch] * len(sq_rows), pa.int64()),
                            pa.array([r[0] for r in sq_rows], pa.float64()),
                            pa.array([r[1] for r in sq_rows], pa.int64()),
                            pa.array([total] * len(sq_rows), pa.int64()),
                        ],
                        schema=SESSQUANT_SCHEMA,
                    )
                    e_sq = write_part_file(tbl, self.out_dir, "sessquant", 0, epoch)
                    if e_sq:
                        sessq_entries.append(e_sq)
            turns_entries = [t for t in ray.get(turns_refs) if t] if turns_refs else []
            if stats:
                stats["t_commit_wait"] = round(_time.perf_counter() - t_c0, 4)
            if not e2e:
                summary_metrics.append({"epoch": epoch, **stats})
                return
            checkpoints = [c for w in writes for c in w["checkpoints"]]
            if checkpoints:
                last_ckpt_epoch["v"] = epoch
            manifest = {
                "pipeline_id": spec.pipeline_id,
                "num_partitions": P,
                "input": {"file": files[epoch] if epoch < len(files) else None},
                "watermark": wms[epoch] if epoch < len(files) else POS_INF,
                "source_stats": stats,
                "files": turns_entries + dead_entries + stream_files + alert_entries
                + drift_entries + newconv_entries + topk_entries + convhist_entries
                + tooluse_entries + sessq_entries,
                "checkpoints": checkpoints,
                "last_checkpoint_epoch": last_ckpt_epoch["v"],
                "alerts_state": {s: dict(v) for s, v in alert_state.items()},
                "drift_state": (
                    {"last_w": drift_state["last_w"],
                     "last": list(drift_state["last"])}
                    if spec.cep.role_drift
                    else None
                ),
                "newconv_state": (
                    {str(w): c for w, c in newconv_state.items()}
                    if spec.cep.new_convs
                    else None
                ),
                "sessq_state": list(sessq_state) if spec.cep.sess_quantiles else None,
                "metrics": [pm for r in metas for pm in r["metrics"]],
            }
            write_manifest(self.out_dir, epoch, manifest)
            summary_metrics.append(
                {"epoch": epoch, **stats, "files": len(manifest["files"])}
            )

        G = max(1, min(spec.sink.turns_write_groups, P))
        reb_every = spec.rebalance_every
        last_dispatched = start_epoch - 1
        e = start_epoch
        idle_polls = 0
        from ..state.checkpoint import CommitThrottle

        idle_throttle = CommitThrottle(interval=max(poll_sleep_s, 0.0))
        while True:
            # control plane: paused -> stop dispatching NEW epochs; keep
            # harvesting in-flight results and committing finished
            # contiguous prefixes (durability while quiesced), then resume
            # exactly where dispatch stopped.
            while self._pause.is_set():
                harvest_ready()
                if inflight and idle_throttle.should_commit(_walltime.monotonic()):
                    if ooo:
                        ooo_poll()
                    else:
                        commit(min(inflight))
                _walltime.sleep(poll_sleep_s if poll_sleep_s else 0.02)
            # tailing: poll the source for new epoch files when caught up
            while e >= len(files) and follow > 0 and idle_polls < follow:
                if self._pause.is_set():
                    # paused while tailing: freeze the end-of-stream idle
                    # countdown (a paused pipeline must not declare the
                    # stream ended) but keep committing finished prefixes
                    # for durability, same as the dispatch-side pause block
                    if inflight and idle_throttle.should_commit(
                        _walltime.monotonic()
                    ):
                        if ooo:
                            ooo_poll()
                        else:
                            commit(min(inflight))
                    _walltime.sleep(poll_sleep_s if poll_sleep_s else 0.02)
                    continue
                relisted = self.driver.list_files(spec.source.paths)
                new = relisted[len(files):]
                if new:
                    assert relisted[: len(files)] == files, "existing epoch files changed"
                    for f in new:
                        cur_max = max(cur_max, self.driver.max_ts_us(f))
                        wms.append(cur_max - cfg.allowed_lateness_us)
                    files.extend(new)
                    idle_polls = 0
                    break
                idle_polls += 1
                # durability while waiting: commit finished epochs instead
                # of holding them until the stream ends — throttled like the
                # reference's commit_interval (checkpoint.go:108-135; driver-
                # side cadence only, never semantics)
                if inflight and idle_throttle.should_commit(_walltime.monotonic()):
                    if ooo:
                        ooo_poll()  # commit what's contiguous; never block on a straggler
                    else:
                        commit(min(inflight))
                if on_idle is not None:
                    on_idle(idle_polls)
                if poll_sleep_s:
                    _walltime.sleep(poll_sleep_s)
            if e >= len(files):
                break
            harvest_ready()
            if reb_every > 0 and e > start_epoch and e % reb_every == 0:
                mv = self._maybe_migrate(workers, assign, part_cost, spec.rebalance_ratio)
                if mv is not None:
                    migrations.append((e, *mv))
            wm_prev = wms[e - 1] if e > 0 else NEG_INF
            frags = self.driver.plan_fragments(files[e], spec.source.fragment_rows)
            F = len(frags)
            frefs = [
                _read_split.options(num_returns=P + 1).remote(
                    files[e], e, wm_prev, spec, lo, hi, off, self.out_dir, fi
                )
                for fi, (lo, hi, off) in enumerate(frags)
            ]
            stats_refs = [r[0] for r in frefs]
            # parts[p] = this epoch's fragment tables for partition p, in
            # arrival (fragment) order
            parts = [[frefs[fi][1 + p] for fi in range(F)] for p in range(P)]
            straggle = spec.sink.options.get("debug_slow_write_epoch") == e
            slow_s = (
                float(spec.sink.options.get("debug_slow_write_s", 0.0))
                if straggle
                else 0.0
            )
            barrier = (
                int(spec.sink.options.get("debug_write_barrier_until_epoch", -1))
                if straggle
                else -1
            )
            turns_refs = [
                _write_turns.remote(
                    self.out_dir, e, g, slow_s,
                    # barrier on one group only: enough to hold the epoch's
                    # completion, without occupying G task slots polling
                    barrier if g == 0 else -1,
                    *[t for p in range(g, P, G) for t in parts[p]],
                )
                for g in range(G)
            ]
            # stagger checkpoints across partitions so the pickle+write I/O
            # spreads over epochs instead of spiking every K-th epoch
            meta_refs, write_refs = [], []
            for mi in range(M):
                meta_ref, tables_ref = workers[mi].process_epoch.options(
                    num_returns=2
                ).remote(
                    e,
                    wms[e],
                    [
                        p
                        for p in assign[mi]
                        if e2e
                        and ((e + 1 + p) % ckpt_every == 0 or e == len(files) - 1)
                    ],
                    True,
                    F,
                    list(assign[mi]),
                    *[t for p in assign[mi] for t in parts[p]],
                )
                meta_refs.append(meta_ref)
                write_refs.append(_write_outputs.remote(self.out_dir, e, tables_ref))
            unharvested.extend(meta_refs)
            inflight[e] = (stats_refs, meta_refs, write_refs, turns_refs)
            last_dispatched = e
            if ooo:
                tracker.track()  # dispatch order ⇒ seq == e - start_epoch
                epoch_refs[e] = [*stats_refs, *meta_refs, *write_refs, *turns_refs]
                ooo_backpressure()
            else:
                while len(inflight) >= max_inflight:
                    commit(min(inflight))
            if stop_after_epoch is not None and e >= stop_after_epoch:
                break
            e += 1

        while inflight:
            if ooo and epoch_refs:
                # keep recording completions through the final drain —
                # committing directly here would skip ooo_poll and drop
                # late-resolving epochs from completion_order (observed as a
                # load-dependent gap: an epoch that resolved after the last
                # dispatch-loop poll committed unrecorded)
                allr = [r for refs in epoch_refs.values() for r in refs]
                ray.wait(allr, num_returns=1, fetch_local=False)
                ooo_poll()
            else:
                commit(min(inflight))

        final_epoch = len(files)  # the stream may have grown while tailing
        if stop_after_epoch is not None and stop_after_epoch < final_epoch:
            # a requested stop always halts BEFORE the final flush — even when
            # every data epoch committed — so resume exercises the flush path
            return {"status": "stopped", "committed_through": last_dispatched}

        # final flush epoch (wm → +inf)
        meta_refs, write_refs = [], []
        for mi in range(M):
            meta_ref, tables_ref = workers[mi].finish.options(num_returns=2).remote(
                final_epoch, e2e
            )
            meta_refs.append(meta_ref)
            write_refs.append(_write_outputs.remote(self.out_dir, final_epoch, tables_ref))
        inflight[final_epoch] = ([], meta_refs, write_refs, [])
        commit(final_epoch)
        out = {
            "status": "complete",
            "epochs": len(files),
            "metrics": summary_metrics,
            "migrations": migrations,
        }
        if ooo:
            out["ooo_completion_order"] = completion_order
            out["max_uncommitted"] = max_uncommitted_seen
        return out


def run_pipeline(spec: PipelineSpec, out_dir: str, **kw: Any) -> dict[str, Any]:
    return StreamingRunner(spec, out_dir).run(**kw)
