"""The streaming runner: epoch loop + stateful partition actors.

Physical plan (SURVEY §4.2), per epoch e (one input Parquet file = one
micro-batch):

    driver:  wm[e] precomputed from Parquet footer stats (sources/stream.py)
      └─ _read_split task   (stateless; one per epoch, scales to one per file
         fragment): read → drop late rows vs wm[e-1] → transform chain
         (vectorized Arrow, status semantics) → hash-partition on conv_id →
         num_returns=P+1 (stats + one table per partition)
      └─ PartitionWorker[p].process_epoch(e, wm[e], part_table)  (stateful
         actor, one per partition): ordered per-conv buffers, watermark-driven
         tumbling/sliding/session emission, tool→assistant join resolution,
         eviction, Parquet part-file writes, state checkpoint
      └─ driver commits manifest-e (2PC: files + checkpoints + offsets +
         metrics) strictly in epoch order; bounded in-flight epochs =
         backpressure (reference analog: token-bucket capacity,
         ``/root/reference/source/kafka/backpressure.go:9-85``).

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

import bisect
import os
import pickle
from collections import defaultdict
from typing import Any

import numpy as np
import pyarrow as pa
import ray

from ..config import CEPConfig, PipelineSpec
from ..schema import JOIN_SCHEMA, SESSION_SCHEMA, WINDOW_AGG_SCHEMA
from ..sinks.exactly_once import write_part_file
from ..sources.stream import list_epoch_files, precompute_watermarks
from ..stages.base import apply_chain_batch, build_chain
from ..state.checkpoint import (
    latest_committed_epoch,
    read_manifest,
    write_json_atomic,
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


def _read_split_impl(
    path: str, epoch: int, wm_prev: int, spec: PipelineSpec
) -> list[Any]:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    P = spec.cep.num_partitions
    table = pq.read_table(path)
    n_input = table.num_rows
    # lineage columns (CheckpointToken analog): epoch + row offset in file
    table = table.append_column("_epoch", pa.array(np.full(n_input, epoch), type=pa.int64()))
    table = table.append_column("_offset", pa.array(np.arange(n_input), type=pa.int64()))
    # late filter vs the watermark at arrival (wm after the previous epoch)
    ts = table.column("ts").cast(pa.int64())
    on_time = pc.greater_equal(ts, pa.scalar(wm_prev, type=pa.int64()))
    n_late = n_input - pc.sum(pc.cast(on_time, pa.int64())).as_py()
    if n_late:
        table = table.filter(on_time)
    # transform chain (vectorized; OK/DROP/RETRY/ERROR semantics inside)
    chain = build_chain(spec.transformers)
    table = apply_chain_batch(chain, table)
    n_out = table.num_rows
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
    }
    out: list[Any] = [stats]
    for p in range(P):
        idx = order[bounds[p] : bounds[p + 1]]
        out.append(table.take(pa.array(idx)))  # take() copies → compact buffers
    return out


_read_split = ray.remote(_read_split_impl)


# --------------------------------------------------------------------------
# reduce side: per-partition stateful CEP worker
# --------------------------------------------------------------------------


class _ConvState:
    """Per-conversation CEP state (lives inside exactly one partition actor)."""

    __slots__ = (
        "rows",
        "emitted_tumbling",
        "emitted_sliding",
        "emitted_sessions",
        "session_count",
        "resolved_tools",
    )

    def __init__(self) -> None:
        self.rows: list[tuple] = []  # sorted (ts, turn_idx, role, text, tool)
        self.emitted_tumbling: set[int] = set()
        self.emitted_sliding: set[int] = set()
        self.emitted_sessions: set[tuple[int, int]] = set()
        self.session_count = 0
        self.resolved_tools: set[int] = set()


class PartitionWorkerImpl:
    """One hash-partition's ordered buffers + window/join state.

    Reference analogs: per-partition ``ConsumeClaim`` loop ordering
    (``driver_sarama.go:114-214``) and the north-rule CEP operators N3-N8.
    Incremental emission: a conversation is re-examined only when touched
    this epoch or when its earliest pending deadline passes the watermark.
    """

    def __init__(self, partition: int, cfg: CEPConfig, out_dir: str):
        self.partition = partition
        self.cfg = cfg
        self.out_dir = out_dir
        self.convs: dict[str, _ConvState] = {}
        # conv -> earliest pending emission deadline (us); POS_INF = none
        self.pending: dict[str, int] = {}
        self.wm = NEG_INF
        self.totals = defaultdict(int)
        # horizon: an emitted session ending before wm - H is fully evictable
        self.horizon = max(
            cfg.tumbling_size_us,
            cfg.sliding_size_us,
            cfg.join_bound_us,
            cfg.session_gap_us,
        )

    # --- lifecycle -----------------------------------------------------------

    def checkpoint_state(self, epoch: int) -> dict:
        path = os.path.join(
            self.out_dir, "checkpoints", f"epoch-{epoch:08d}", f"part-{self.partition:05d}.pkl"
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        payload = {
            "partition": self.partition,
            "wm": self.wm,
            "totals": dict(self.totals),
            "convs": {
                c: (
                    s.rows,
                    s.emitted_tumbling,
                    s.emitted_sliding,
                    s.emitted_sessions,
                    s.session_count,
                    s.resolved_tools,
                )
                for c, s in self.convs.items()
            },
            "pending": self.pending,
        }
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
        return {
            "partition": self.partition,
            "path": os.path.relpath(path, self.out_dir),
            "epoch": epoch,
        }

    def restore(self, checkpoint_rel_path: str) -> None:
        with open(os.path.join(self.out_dir, checkpoint_rel_path), "rb") as f:
            payload = pickle.load(f)
        assert payload["partition"] == self.partition
        self.wm = payload["wm"]
        self.totals = defaultdict(int, payload["totals"])
        self.pending = payload["pending"]
        self.convs = {}
        for c, (rows, emt, ems, esn, cnt, rst) in payload["convs"].items():
            st = _ConvState()
            st.rows, st.emitted_tumbling, st.emitted_sliding = rows, emt, ems
            st.emitted_sessions, st.session_count, st.resolved_tools = esn, cnt, rst
            self.convs[c] = st

    # --- per-epoch processing -------------------------------------------------

    def process_epoch(self, epoch: int, wm: int, table: pa.Table) -> dict:
        touched: set[str] = set()
        if table.num_rows:
            conv_col = table.column("conv_id").to_pylist()
            ts_col = table.column("ts").cast(pa.int64()).to_pylist()
            turn_col = table.column("turn_idx").to_pylist()
            role_col = table.column("role").to_pylist()
            text_col = table.column("text").to_pylist()
            tool_col = table.column("tool").to_pylist()
            for c, t, k, r, x, o in zip(
                conv_col, ts_col, turn_col, role_col, text_col, tool_col
            ):
                st = self.convs.get(c)
                if st is None:
                    st = self.convs[c] = _ConvState()
                bisect.insort(st.rows, (t, k, r, x, o))
                touched.add(c)

        self.wm = max(self.wm, wm)
        out = self._emission_pass(touched)

        # write outputs (deterministic names + row order) and checkpoint
        files = []
        entry = self._write_stream(self._sorted_turns_table(table), "turns", epoch)
        if entry:
            files.append(entry)
        for stream, schema, rows, keyfn in (
            ("tumbling", WINDOW_AGG_SCHEMA, out["tumbling"], lambda r: (r["conv_id"], r["w_start"])),
            ("sliding", WINDOW_AGG_SCHEMA, out["sliding"], lambda r: (r["conv_id"], r["w_start"])),
            ("sessions", SESSION_SCHEMA, out["sessions"], lambda r: (r["conv_id"], r["session_id"])),
            ("joins", JOIN_SCHEMA, out["joins"], lambda r: (r["conv_id"], r["tool_turn_idx"])),
        ):
            if rows:
                rows.sort(key=keyfn)
                entry = self._write_stream(_rows_to_table(rows, schema), stream, epoch)
                if entry:
                    files.append(entry)

        self.totals["turns_in"] += table.num_rows
        for k in ("tumbling", "sliding", "sessions", "joins"):
            self.totals[f"{k}_emitted"] += len(out[k])
        ckpt = self.checkpoint_state(epoch)
        metrics = {
            "partition": self.partition,
            "epoch": epoch,
            "rows_in": table.num_rows,
            "wm": self.wm,
            "live_convs": len(self.convs),
            "live_rows": sum(len(s.rows) for s in self.convs.values()),
            **{f"{k}_emitted": len(out[k]) for k in ("tumbling", "sliding", "sessions", "joins")},
        }
        return {"files": files, "checkpoint": ckpt, "metrics": metrics}

    def finish(self, epoch: int) -> dict:
        """End-of-stream final flush: watermark → +inf (cfg.final_flush)."""
        if not self.cfg.final_flush:
            return self.process_epoch(epoch, self.wm, _empty_turns_table())
        return self.process_epoch(epoch, POS_INF, _empty_turns_table())

    # --- emission core (must mirror quanta_ray.oracle semantics) -------------

    def _emission_pass(self, touched: set[str]) -> dict[str, list]:
        wm = self.wm
        due = [c for c, dl in self.pending.items() if dl <= wm]
        out: dict[str, list] = {"tumbling": [], "sliding": [], "sessions": [], "joins": []}
        for conv in set(due) | touched:
            st = self.convs.get(conv)
            if st is None or not st.rows:
                self.pending.pop(conv, None)
                continue
            next_dl = self._emit_conv(conv, st, wm, out)
            self._evict(conv, st, wm)
            if not st.rows:
                del self.convs[conv]
                self.pending.pop(conv, None)
            elif next_dl >= POS_INF:
                self.pending.pop(conv, None)
            else:
                self.pending[conv] = next_dl
        return out

    def _emit_conv(self, conv: str, st: _ConvState, wm: int, out: dict) -> int:
        cfg = self.cfg
        rows = st.rows  # sorted by (ts, turn_idx)
        tsize = cfg.tumbling_size_us
        size, slide = cfg.sliding_size_us, cfg.sliding_slide_us
        next_dl = POS_INF

        # tumbling
        by_w: dict[int, list[tuple]] = defaultdict(list)
        for r in rows:
            by_w[r[0] // tsize * tsize].append(r)
        for w_start, wrows in by_w.items():
            if w_start in st.emitted_tumbling:
                continue
            if w_start + tsize <= wm:
                st.emitted_tumbling.add(w_start)
                out["tumbling"].append(_window_agg(conv, w_start, w_start + tsize, wrows))
            else:
                next_dl = min(next_dl, w_start + tsize)

        # sliding
        by_s: dict[int, list[tuple]] = defaultdict(list)
        for r in rows:
            ts = r[0]
            k_lo = (ts - size) // slide + 1
            k_hi = ts // slide
            for k in range(k_lo, k_hi + 1):
                by_s[k * slide].append(r)
        for w_start, wrows in by_s.items():
            if w_start in st.emitted_sliding:
                continue
            if w_start + size <= wm:
                st.emitted_sliding.add(w_start)
                out["sliding"].append(_window_agg(conv, w_start, w_start + size, wrows))
            else:
                next_dl = min(next_dl, w_start + size)

        # sessions (gap rule over sorted rows; emit when closed by watermark)
        gap = cfg.session_gap_us
        sess: list[list[tuple]] = []
        for r in rows:
            if sess and r[0] - sess[-1][-1][0] <= gap:
                sess[-1].append(r)
            else:
                sess.append([r])
        for s in sess:
            s_start, s_end = s[0][0], s[-1][0]
            key = (s_start, s_end)
            if key in st.emitted_sessions:
                continue
            if s_end + gap < wm:
                st.emitted_sessions.add(key)
                out["sessions"].append(
                    {
                        "conv_id": conv,
                        "session_id": st.session_count,
                        "session_start": s_start,
                        "session_end": s_end,
                        "n_turns": len(s),
                        "first_text": s[0][3],
                        "last_text": s[-1][3],
                    }
                )
                st.session_count += 1
            else:
                next_dl = min(next_dl, s_end + gap + 1)  # strict <

        # join: resolve tool rows past deadline
        bound = cfg.join_bound_us
        assistants = [r for r in rows if r[2] == "assistant"]
        for r in rows:
            if r[2] != "tool" or r[1] in st.resolved_tools:
                continue
            if r[0] + bound > wm:
                next_dl = min(next_dl, r[0] + bound)
                continue
            st.resolved_tools.add(r[1])
            match = None
            for a in assistants:
                if a[1] > r[1] and r[0] <= a[0] <= r[0] + bound:
                    match = a
                    break
            out["joins"].append(
                {
                    "conv_id": conv,
                    "tool_turn_idx": r[1],
                    "tool": r[4],
                    "tool_text": r[3],
                    "tool_ts": r[0],
                    "assistant_turn_idx": match[1] if match else None,
                    "assistant_text": match[3] if match else None,
                    "assistant_ts": match[0] if match else None,
                    "matched": match is not None,
                }
            )
        return next_dl

    def _evict(self, conv: str, st: _ConvState, wm: int) -> None:
        """Drop rows no longer reachable by any emission rule.

        Eviction is **all-or-nothing per emitted session**: a session
        ``(a, b)`` is evictable once ``b + horizon <= wm``. Then every row in
        it satisfies ``ts + horizon <= wm`` (ts ≤ b), so all its tumbling and
        sliding windows are already emitted (w_end ≤ ts + size ≤ wm) and all
        its tool rows are resolved (deadline ≤ b + bound ≤ wm). Partial
        eviction would let the surviving rows re-form a session fragment with
        a new (start, end) key and re-emit — all-or-nothing prevents that.
        Emitted-window dedup keys are pruned only strictly below the minimum
        live ts, because only live rows can re-trigger a window emission
        (a new on-time row landing in an already-emitted window would by
        definition have been late).
        """
        if wm <= NEG_INF or not st.emitted_sessions:
            return
        evictable = {k for k in st.emitted_sessions if k[1] + self.horizon <= wm}
        if not evictable:
            return
        spans = sorted(evictable)

        keep: list[tuple] = []
        for r in st.rows:
            if any(a <= r[0] <= b for a, b in spans):
                if r[2] == "tool":
                    st.resolved_tools.discard(r[1])
                self.totals["rows_evicted"] += 1
            else:
                keep.append(r)
        st.rows = keep
        st.emitted_sessions -= evictable
        min_ts = st.rows[0][0] if st.rows else POS_INF
        st.emitted_tumbling = {
            w for w in st.emitted_tumbling if w + self.cfg.tumbling_size_us > min_ts
        }
        st.emitted_sliding = {
            w for w in st.emitted_sliding if w + self.cfg.sliding_size_us > min_ts
        }
        st.emitted_sessions = {k for k in st.emitted_sessions if k[1] >= min_ts}

    # --- output helpers -------------------------------------------------------

    def _sorted_turns_table(self, table: pa.Table) -> pa.Table:
        if table.num_rows == 0:
            return table
        idx = pa.compute.sort_indices(
            table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        return table.take(idx)

    def _write_stream(self, table: pa.Table, stream: str, epoch: int):
        if table is None or table.num_rows == 0:
            return None
        return write_part_file(table, self.out_dir, stream, self.partition, epoch)


def _window_agg(conv: str, w_start: int, w_end: int, rows: list[tuple]) -> dict:
    return {
        "conv_id": conv,
        "w_start": w_start,
        "w_end": w_end,
        "n_turns": len(rows),
        "n_user": sum(1 for r in rows if r[2] == "user"),
        "n_assistant": sum(1 for r in rows if r[2] == "assistant"),
        "n_tool": sum(1 for r in rows if r[2] == "tool"),
        "first_text": rows[0][3],
        "last_text": rows[-1][3],
        "min_ts": rows[0][0],
        "max_ts": max(r[0] for r in rows),
    }


def _rows_to_table(rows: list[dict], schema: pa.Schema) -> pa.Table:
    cols = []
    for f in schema:
        vals = [r.get(f.name) for r in rows]
        if pa.types.is_timestamp(f.type):
            cols.append(pa.array(vals, type=pa.int64()).cast(f.type))
        else:
            cols.append(pa.array(vals, type=f.type))
    return pa.Table.from_arrays(cols, schema=schema)


def _empty_turns_table() -> pa.Table:
    from ..schema import TRANSCRIPT_SCHEMA, with_lineage

    return with_lineage(TRANSCRIPT_SCHEMA).empty_table()


PartitionWorker = ray.remote(PartitionWorkerImpl)


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
        self.files = list_epoch_files(spec.source.paths)
        if not self.files:
            raise ValueError("source has no files")

    def run(self, stop_after_epoch: int | None = None) -> dict[str, Any]:
        spec, cfg = self.spec, self.spec.cep
        P = cfg.num_partitions
        files = self.files
        n_epochs = len(files)
        final_epoch = n_epochs  # reserved epoch index for the final flush
        os.makedirs(self.out_dir, exist_ok=True)

        _, wms = precompute_watermarks(files, cfg.allowed_lateness_us)

        latest = latest_committed_epoch(self.out_dir)
        if latest >= final_epoch:
            return {"status": "already-complete", "epochs": latest}
        start_epoch = latest + 1

        workers = [
            PartitionWorker.remote(p, cfg, self.out_dir) for p in range(P)
        ]
        if latest >= 0:
            m = read_manifest(self.out_dir, latest)
            assert m is not None and m["num_partitions"] == P, "partition count changed across resume"
            ray.get(
                [
                    workers[c["partition"]].restore.remote(c["path"])
                    for c in m["checkpoints"]
                ]
            )

        inflight: dict[int, tuple[Any, list[Any]]] = {}
        max_inflight = max(1, spec.source.max_inflight_epochs)
        summary_metrics: list[dict] = []

        def commit(epoch: int) -> None:
            stats_ref, result_refs = inflight.pop(epoch)
            stats = ray.get(stats_ref) if stats_ref is not None else {}
            results = ray.get(result_refs)
            manifest = {
                "pipeline_id": spec.pipeline_id,
                "num_partitions": P,
                "input": {"file": files[epoch] if epoch < n_epochs else None},
                "watermark": wms[epoch] if epoch < n_epochs else POS_INF,
                "source_stats": stats,
                "files": [f for r in results for f in r["files"]],
                "checkpoints": [r["checkpoint"] for r in results],
                "metrics": [r["metrics"] for r in results],
            }
            write_manifest(self.out_dir, epoch, manifest)
            summary_metrics.append(
                {"epoch": epoch, **stats, "files": len(manifest["files"])}
            )

        last_dispatched = start_epoch - 1
        for e in range(start_epoch, n_epochs):
            wm_prev = wms[e - 1] if e > 0 else NEG_INF
            refs = _read_split.options(num_returns=P + 1).remote(
                files[e], e, wm_prev, spec
            )
            stats_ref, parts = refs[0], refs[1:]
            res = [
                workers[p].process_epoch.remote(e, wms[e], parts[p]) for p in range(P)
            ]
            inflight[e] = (stats_ref, res)
            last_dispatched = e
            while len(inflight) >= max_inflight:
                commit(min(inflight))
            if stop_after_epoch is not None and e >= stop_after_epoch:
                break

        while inflight:
            commit(min(inflight))

        if stop_after_epoch is not None and last_dispatched < n_epochs - 1:
            return {"status": "stopped", "committed_through": last_dispatched}

        # final flush epoch (wm → +inf)
        res = [workers[p].finish.remote(final_epoch) for p in range(P)]
        inflight[final_epoch] = (None, res)
        commit(final_epoch)
        return {
            "status": "complete",
            "epochs": n_epochs,
            "metrics": summary_metrics,
        }


def run_pipeline(spec: PipelineSpec, out_dir: str, **kw: Any) -> dict[str, Any]:
    return StreamingRunner(spec, out_dir).run(**kw)
