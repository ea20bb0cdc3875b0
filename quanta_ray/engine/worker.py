"""Per-partition stateful CEP worker — fully incremental.

State per conversation is O(open windows + open sessions + pending tools +
join-horizon assistants) — never the raw rows. Everything a closed window
needs is folded into running aggregates at ingest:

- **tumbling/sliding windows**: PARTITION-LEVEL COLUMNAR state
  (``_WindowState``): parallel numpy arrays keyed (conv code, w_start) with
  counts + first/last (ts, turn, text). Merge = concat + lexsort +
  segment-reduce; emission = ``w + size <= wm`` mask. Per-conv dicts would
  cost one Python op per (conv, window) group and most groups hold ~1 row
  per epoch — columnar keeps the whole path vectorized. A window is popped
  and emitted when ``w_start + size <= wm``. No emitted-dedup set is needed:
  a row that would re-create an emitted window is by definition late and was
  dropped at the source (see oracle.py watermark proof).
- **sessions**: sorted disjoint interval list ``[start_key, end_key, n]``
  maintained by interval-merge insertion (gap clustering is incremental: a
  new point can bridge at most its two neighbor sessions, and any two points
  of one session are chained by ≤gap steps). Sessions close strictly in
  start order (disjointness ⇒ earlier sessions close first), so the per-conv
  ``session_id`` counter matches the oracle's emission order.
- **join**: per conv a sorted ``assistants`` list of (ts, turn_idx, text)
  and a ``tools`` min-heap keyed by deadline ``ts + bound``. A tool resolves
  at the first pass with ``deadline <= wm``; its match is the minimal
  (ts, turn_idx) assistant with ``turn_idx > tool_turn`` in the ts bound.
  Assistants with ``ts < wm - bound`` can never match a pending tool
  (pending ⇒ ``tool_ts > wm - bound ≥ assistant ts``) and are pruned.

Scheduling: a conversation is touched at ingest and re-examined only when
its earliest pending deadline passes the watermark (``pending`` dict).
Deadlines stored are lower bounds — an extra no-op pass is harmless, a
missed emission impossible (every structure's true deadline only moves
later via merges; new rows lower it through ingest).

Batch-level vectorization: rows are sorted once by (conv, ts, turn_idx);
window partials reduce over contiguous (conv, window) runs with numpy
``add.reduceat`` (group first/last = the oracle's (ts, turn_idx)-min/max),
sessions are gap-clustered in numpy and merged as whole intervals, and the
remaining Python loops touch one (conv, window) or cluster per epoch — never
a row (except assistant/tool inserts, which touch only their rows).
"""

from __future__ import annotations

import heapq
import os
import pickle
from bisect import bisect_left, bisect_right, insort
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import CEPConfig
from ..schema import JOIN_SCHEMA, SESSION_SCHEMA, WINDOW_AGG_SCHEMA

NEG_INF = -(1 << 62)
POS_INF = 1 << 62


def _limit_native_threads() -> None:
    """One compute thread per worker process: parallelism comes from Ray
    scheduling workers, not intra-worker Arrow/BLAS pools (P workers × 32
    threads each thrashes the node)."""
    try:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
    except Exception:
        pass


class _ConvState:
    """Incremental per-conversation CEP state (sessions + join buffers).

    Window state is NOT here: with short conversations most (conv, window)
    groups hold ~1 row per epoch, so per-conv dicts degenerate to one Python
    dict op per row. Windows live in the partition-level columnar
    ``_WindowState`` instead (vectorized merge + emission)."""

    __slots__ = ("sessions", "session_count", "assistants", "tools")

    def __init__(self) -> None:
        # sorted disjoint [start_key, end_key, n]; keys are (ts, turn, text)
        self.sessions: list[list] = []
        self.session_count = 0
        self.assistants: list[tuple] = []  # sorted (ts, turn_idx, text)
        self.tools: list[tuple] = []  # heap (deadline, ts, turn_idx, tool, text)

    def to_payload(self) -> tuple:
        return (
            self.sessions,
            self.session_count,
            self.assistants,
            self.tools,
        )

    @classmethod
    def from_payload(cls, p: tuple) -> "_ConvState":
        st = cls()
        (st.sessions, st.session_count, st.assistants, st.tools) = p
        return st


_WS_FIELDS = (
    "code", "w", "n", "nu", "na", "nt",
    "f_ts", "f_turn", "f_text", "l_ts", "l_turn", "l_text",
)


class _WindowState:
    """Partition-level columnar open-window state (one per window kind).

    Arrays are parallel, keyed by (conv code, w_start) — codes intern conv
    ids per partition (``PartitionWorkerImpl.conv_code``). Merge is a
    vectorized concat + lexsort + segment-reduce; emission is a boolean
    mask. first/last are the (ts, turn_idx)-min/max rows of the window
    ((conv, ts, turn_idx) is unique, so text never breaks ties)."""

    __slots__ = _WS_FIELDS

    def __init__(self) -> None:
        for f in ("code", "w", "n", "nu", "na", "nt", "f_ts", "f_turn", "l_ts", "l_turn"):
            setattr(self, f, np.empty(0, np.int64))
        self.f_text = np.empty(0, object)
        self.l_text = np.empty(0, object)

    def merge(self, *partial: np.ndarray) -> None:
        """Fold partial aggregates (same 12-field layout) into state."""
        cols = [np.concatenate([getattr(self, f), p]) if len(getattr(self, f)) else p
                for f, p in zip(_WS_FIELDS, partial)]
        (code, w, n, nu, na, nt, f_ts, f_turn, f_text, l_ts, l_turn, l_text) = cols
        if len(code) == 0:
            return
        # primary order (code, w); secondary (f_ts, f_turn) → group starts
        # are the per-group first-key minima
        ord_f = np.lexsort((f_turn, f_ts, w, code))
        code_s, w_s = code[ord_f], w[ord_f]
        brk = np.concatenate(
            ([True], (code_s[1:] != code_s[:-1]) | (w_s[1:] != w_s[:-1]))
        )
        starts = np.flatnonzero(brk)
        if len(starts) == len(code_s):  # all keys unique — no combining
            self.code, self.w = code_s, w_s
            self.n, self.nu, self.na, self.nt = n[ord_f], nu[ord_f], na[ord_f], nt[ord_f]
            self.f_ts, self.f_turn, self.f_text = f_ts[ord_f], f_turn[ord_f], f_text[ord_f]
            self.l_ts, self.l_turn, self.l_text = l_ts[ord_f], l_turn[ord_f], l_text[ord_f]
            return
        ends = np.append(starts[1:], len(code_s)) - 1
        self.code, self.w = code_s[starts], w_s[starts]
        self.n = np.add.reduceat(n[ord_f], starts)
        self.nu = np.add.reduceat(nu[ord_f], starts)
        self.na = np.add.reduceat(na[ord_f], starts)
        self.nt = np.add.reduceat(nt[ord_f], starts)
        self.f_ts, self.f_turn, self.f_text = (
            f_ts[ord_f][starts], f_turn[ord_f][starts], f_text[ord_f][starts]
        )
        # same group segments under the (l_ts, l_turn)-secondary order;
        # group ends are the per-group last-key maxima
        ord_l = np.lexsort((l_turn, l_ts, w, code))
        self.l_ts, self.l_turn, self.l_text = (
            l_ts[ord_l][ends], l_turn[ord_l][ends], l_text[ord_l][ends]
        )

    def pop_closed(self, size: int, wm: int) -> tuple | None:
        """Remove and return all windows with w + size <= wm (vectorized)."""
        if len(self.w) == 0:
            return None
        mask = self.w + size <= wm
        if not mask.any():
            return None
        out = (
            self.code[mask], self.w[mask], self.n[mask], self.nu[mask],
            self.na[mask], self.nt[mask], self.f_ts[mask], self.f_text[mask],
            self.l_ts[mask], self.l_text[mask],
        )
        keep = ~mask
        for f in _WS_FIELDS:
            setattr(self, f, getattr(self, f)[keep])
        return out

    def to_payload(self) -> tuple:
        return tuple(getattr(self, f) for f in _WS_FIELDS)

    @classmethod
    def from_payload(cls, p: tuple) -> "_WindowState":
        ws = cls()
        for f, arr in zip(_WS_FIELDS, p):
            setattr(ws, f, arr)
        return ws


def _window_partials(
    codes: np.ndarray,
    w: np.ndarray,
    ts: np.ndarray,
    turn: np.ndarray,
    text: np.ndarray,
    is_user: np.ndarray,
    is_assistant: np.ndarray,
    is_tool: np.ndarray,
) -> tuple:
    """Per-(conv, window) partial aggregates of a batch slice as arrays.

    Inputs are sorted by (conv, ts, turn) with w monotone in ts within a
    conv, so groups are contiguous runs; first/last = run boundaries."""
    n = len(w)
    if n == 0:
        z = np.empty(0, np.int64)
        o = np.empty(0, object)
        return (z, z, z, z, z, z, z, z, o, z, z, o)
    brk = np.concatenate(([True], (codes[1:] != codes[:-1]) | (w[1:] != w[:-1])))
    starts = np.flatnonzero(brk)
    counts = np.diff(np.append(starts, n))
    lasts = starts + counts - 1
    return (
        codes[starts],
        w[starts],
        counts.astype(np.int64),
        np.add.reduceat(is_user, starts),
        np.add.reduceat(is_assistant, starts),
        np.add.reduceat(is_tool, starts),
        ts[starts],
        turn[starts].astype(np.int64),
        text[starts],
        ts[lasts],
        turn[lasts].astype(np.int64),
        text[lasts],
    )


def write_checkpoint_blob(out_dir: str, meta: dict, raw: bytes) -> dict:
    """Compress + atomically write one partition checkpoint blob."""
    path = os.path.join(out_dir, meta["path"])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if len(raw) > 4096:  # text-heavy state compresses ~5x; disk is scarce
        import zlib

        raw = b"QZC1" + zlib.compress(raw, 1)
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(raw)
    os.replace(tmp, path)
    return meta


class PartitionWorkerImpl:
    """One hash-partition's window/session/join state (north-rule N3-N8).

    Reference analogs: per-partition ordered processing of the Kafka claim
    loop (``/root/reference/source/kafka/driver_sarama.go:114-214``) and the
    contiguous commit watermark (``checkpoint.go:11-62``) — here per-epoch
    state + the 2PC manifest sink make it exactly-once.
    """

    def __init__(self, partition: int, cfg: CEPConfig, out_dir: str):
        _limit_native_threads()
        self.partition = partition
        self.cfg = cfg
        self.out_dir = out_dir
        self.convs: dict[str, _ConvState] = {}
        self.pending: dict[str, int] = {}  # conv -> earliest deadline lower bound
        # session ids are per-conv monotonic FOREVER (oracle semantics), so
        # the counter must survive eviction of an idle conv's heavy state
        self.session_counts: dict[str, int] = {}
        # conv interning for the columnar window state (grows with convs
        # seen, like session_counts — an accepted O(seen convs) map)
        self.conv_code: dict[str, int] = {}
        self.conv_names: list[str] = []
        self.win = {"tumbling": _WindowState(), "sliding": _WindowState()}
        self.wm = NEG_INF
        self.last_epoch = -1  # highest epoch folded into state
        self.totals: dict[str, int] = defaultdict(int)

    # --- checkpoint / restore -------------------------------------------------

    def state_payload(self) -> dict:
        """Complete per-partition state as a plain dict — the unit of both
        checkpointing and live partition migration (work stealing)."""
        return {
            "partition": self.partition,
            "wm": self.wm,
            "epoch": self.last_epoch,
            "totals": dict(self.totals),
            "convs": {c: s.to_payload() for c, s in self.convs.items()},
            "pending": self.pending,
            "session_counts": self.session_counts,
            "conv_names": list(self.conv_names),
            "win": {k: ws.to_payload() for k, ws in self.win.items()},
        }

    def load_state_payload(self, payload: dict) -> None:
        assert payload["partition"] == self.partition
        self.wm = payload["wm"]
        self.last_epoch = payload.get("epoch", -1)
        self.totals = defaultdict(int, payload["totals"])
        self.pending = payload["pending"]
        self.session_counts = payload.get("session_counts", {})
        self.conv_names = list(payload["conv_names"])
        self.conv_code = {c: i for i, c in enumerate(self.conv_names)}
        self.win = {k: _WindowState.from_payload(p) for k, p in payload["win"].items()}
        self.convs = {c: _ConvState.from_payload(p) for c, p in payload["convs"].items()}

    def checkpoint_blob(self, epoch: int) -> tuple[dict, bytes]:
        """Serialize state (must happen in-worker); the compress+write runs
        as an off-worker task (see runner._write_outputs)."""
        path = os.path.join(
            "checkpoints", f"epoch-{epoch:08d}", f"part-{self.partition:05d}.pkl"
        )
        payload = dict(self.state_payload(), epoch=epoch)
        raw = pickle.dumps(payload, protocol=pickle.HIGHEST_PROTOCOL)
        meta = {"partition": self.partition, "path": path, "epoch": epoch}
        return meta, raw

    def checkpoint_state(self, epoch: int) -> dict:
        """Synchronous form (used by direct/unit callers)."""
        meta, raw = self.checkpoint_blob(epoch)
        write_checkpoint_blob(self.out_dir, meta, raw)
        return meta

    def restore(self, checkpoint_rel_path: str) -> None:
        with open(os.path.join(self.out_dir, checkpoint_rel_path), "rb") as f:
            raw = f.read()
        if raw[:4] == b"QZC1":
            import zlib

            raw = zlib.decompress(raw[4:])
        self.load_state_payload(pickle.loads(raw))

    # --- epoch processing -----------------------------------------------------

    def process_epoch(
        self,
        epoch: int,
        wm: int,
        table: pa.Table,
        do_checkpoint: bool = True,
        write_outputs: bool = True,
    ) -> dict:
        import time as _time

        if epoch <= self.last_epoch:
            # replay of an epoch already folded into this partition's
            # restored state (staggered checkpoints): pure no-op
            return {"tables": [], "ckpt_blob": None, "metrics": {"skipped": epoch}}
        self.last_epoch = epoch

        t0 = _time.perf_counter()
        touched = self._ingest(table) if table.num_rows else set()
        self.wm = max(self.wm, wm)
        t_ingest = _time.perf_counter()
        out = self._emission_pass(touched)
        # columnar window emission: mask + filter, no per-conv iteration.
        # Runs on replay too (state must advance identically).
        win_tables = {
            "tumbling": self._pop_windows_table("tumbling", self.cfg.tumbling_size_us, self.wm),
            "sliding": self._pop_windows_table("sliding", self.cfg.sliding_size_us, self.wm),
        }
        t_emit = _time.perf_counter()

        n_emitted = {
            "tumbling": win_tables["tumbling"].num_rows if win_tables["tumbling"] is not None else 0,
            "sliding": win_tables["sliding"].num_rows if win_tables["sliding"] is not None else 0,
            "sessions": len(out["sessions"]),
            "joins": len(out["joins"]),
        }
        # totals accumulate on replay too, so a resumed run's checkpointed
        # counters match an uninterrupted run (ADVICE: metrics drift)
        self.totals["turns_in"] += table.num_rows
        for k, v in n_emitted.items():
            self.totals[f"{k}_emitted"] += v

        if not write_outputs:
            # resume replay of an already-committed epoch: state advances,
            # outputs (byte-identical, already in the manifest) are skipped
            return {"tables": [], "ckpt_blob": None, "metrics": {"replayed": epoch}}

        # build the emitted tables but DON'T write them here: the (zstd)
        # parquet writes run as tasks on the map slots so the stateful
        # worker chain — the scaling-critical path — stays compute-only
        tables = []
        for stream in ("tumbling", "sliding"):
            t = win_tables[stream]
            if t is not None and t.num_rows:
                tables.append((stream, self.partition, t))
        for stream, schema, rows in (
            ("sessions", SESSION_SCHEMA, out["sessions"]),
            ("joins", JOIN_SCHEMA, out["joins"]),
        ):
            if rows:
                rows.sort(key=lambda r: (r[0], r[1]))
                tables.append((stream, self.partition, _rows_to_table(rows, schema)))
        t_write = _time.perf_counter()

        ckpt = self.checkpoint_blob(epoch) if do_checkpoint else None
        t_ckpt = _time.perf_counter()
        metrics = {
            "partition": self.partition,
            "epoch": epoch,
            "rows_in": table.num_rows,
            "wm": self.wm,
            "live_convs": len(self.convs),
            **{f"{k}_emitted": v for k, v in n_emitted.items()},
            "t_ingest": round(t_ingest - t0, 4),
            "t_emit": round(t_emit - t_ingest, 4),
            "t_write": round(t_write - t_emit, 4),
            "t_ckpt": round(t_ckpt - t_write, 4),
        }
        return {"tables": tables, "ckpt_blob": ckpt, "metrics": metrics}

    def finish(self, epoch: int, do_checkpoint: bool = True) -> dict:
        empty = _empty_turns_table()
        wm = self.wm if not self.cfg.final_flush else POS_INF
        return self.process_epoch(epoch, wm, empty, do_checkpoint)

    # --- ingest (vectorized per batch) ---------------------------------------

    def _ingest(self, table: pa.Table) -> set[str]:
        cfg = self.cfg
        tsize, ssize, slide = (
            cfg.tumbling_size_us,
            cfg.sliding_size_us,
            cfg.sliding_slide_us,
        )
        gap, bound = cfg.session_gap_us, cfg.join_bound_us

        # sort the batch by (conv_code, ts, turn): groups become contiguous and
        # group-first/last are the oracle's (ts, turn_idx)-min/max per window
        ts0 = table.column("ts").cast(pa.int64()).to_numpy()
        conv0 = np.asarray(table.column("conv_id").to_pandas(), dtype=object)
        codes0, uniques = pd.factorize(conv0, sort=False)
        order = np.lexsort((table.column("turn_idx").to_numpy(), ts0, codes0))
        ts = ts0[order]
        codes = codes0[order]
        turn = table.column("turn_idx").to_numpy()[order]
        role = np.asarray(table.column("role").to_pandas())[order]
        text = np.asarray(table.column("text").to_pandas())[order]
        tool = np.asarray(table.column("tool").to_pandas())[order]
        is_user = (role == "user").astype(np.int64)
        is_assistant = (role == "assistant").astype(np.int64)
        is_tool = role == "tool"

        touched: set[str] = set(uniques)
        for c in uniques:
            if c not in self.convs:
                st = self.convs[c] = _ConvState()
                st.session_count = self.session_counts.get(c, 0)
        convs = self.convs
        names = uniques.tolist()

        # ---- windows: columnar partials → vectorized state merge ----
        # map batch-local factorize codes to persistent per-partition codes
        # (one dict op per TOUCHED CONV, not per row/group)
        cc = self.conv_code
        cn = self.conv_names
        pmap = np.empty(len(names), np.int64)
        for i, c in enumerate(names):
            pc_ = cc.get(c)
            if pc_ is None:
                pc_ = len(cn)
                cc[c] = pc_
                cn.append(c)
            pmap[i] = pc_
        pcodes = pmap[codes]
        it = is_tool.astype(np.int64)

        self.win["tumbling"].merge(
            *_window_partials(
                pcodes, ts // tsize * tsize, ts, turn, text, is_user, is_assistant, it
            )
        )

        # sliding: k shifted window assignments. Each shift keeps (conv, ts)
        # order and w_j is monotone in ts within a conv → groups stay
        # contiguous; the k partials concatenate into ONE state merge.
        k = ssize // slide
        base = ts // slide * slide
        shift_parts = []
        for j in range(k):
            w_j = base - j * slide
            mask = w_j > ts - ssize
            if mask.all():
                shift_parts.append(
                    _window_partials(pcodes, w_j, ts, turn, text, is_user, is_assistant, it)
                )
            else:
                sel = np.flatnonzero(mask)
                shift_parts.append(
                    _window_partials(
                        pcodes[sel], w_j[sel], ts[sel], turn[sel], text[sel],
                        is_user[sel], is_assistant[sel], it[sel],
                    )
                )
        self.win["sliding"].merge(
            *(np.concatenate([sp[i] for sp in shift_parts]) for i in range(12))
        )

        # ---- sessions + join state: vectorized per-conv segments ----
        # gap-cluster the NEW rows of each conv in numpy (one python op per
        # cluster, not per row), then interval-merge each cluster into the
        # session list; assistants/tools touch python only for their rows.
        n = len(ts)
        pend = self.pending
        # cluster breaks: same conv AND within gap of previous row
        brk = np.concatenate(
            ([True], (codes[1:] != codes[:-1]) | (np.diff(ts) > gap))
        )
        cl_starts = np.flatnonzero(brk)
        cl_ends = np.append(cl_starts[1:], n) - 1
        cl_s_list = cl_starts.tolist()
        cl_e_list = cl_ends.tolist()
        ts_s, ts_e = ts[cl_starts].tolist(), ts[cl_ends].tolist()
        turn_s, turn_e = turn[cl_starts].tolist(), turn[cl_ends].tolist()
        text_s, text_e = text[cl_starts].tolist(), text[cl_ends].tolist()
        code_s = codes[cl_starts].tolist()
        for gi in range(len(cl_s_list)):
            conv = names[code_s[gi]]
            st = convs[conv]
            skey = (ts_s[gi], turn_s[gi], text_s[gi])
            ekey = (ts_e[gi], turn_e[gi], text_e[gi])
            self._session_insert_cluster(
                st.sessions, skey, ekey, cl_e_list[gi] - cl_s_list[gi] + 1, gap
            )
            cand = ts_s[gi] + gap + 1
            if cand < pend.get(conv, POS_INF):
                pend[conv] = cand

        a_idx = np.flatnonzero(is_assistant)
        if len(a_idx):
            a_ts = ts[a_idx].tolist()
            a_turn = turn[a_idx].tolist()
            a_text = text[a_idx].tolist()
            a_code = codes[a_idx].tolist()
            for i in range(len(a_ts)):
                insort(convs[names[a_code[i]]].assistants, (a_ts[i], a_turn[i], a_text[i]))

        t_idx = np.flatnonzero(is_tool)
        if len(t_idx):
            t_ts = ts[t_idx].tolist()
            t_turn = turn[t_idx].tolist()
            t_text = text[t_idx].tolist()
            t_tool = tool[t_idx].tolist()
            t_code = codes[t_idx].tolist()
            for i in range(len(t_ts)):
                conv = names[t_code[i]]
                st = convs[conv]
                deadline = t_ts[i] + bound
                heapq.heappush(
                    st.tools, (deadline, t_ts[i], t_turn[i], t_tool[i], t_text[i])
                )
                if deadline < pend.get(conv, POS_INF):
                    pend[conv] = deadline

        return touched

    @staticmethod
    def _session_insert_cluster(
        sess: list, skey: tuple, ekey: tuple, count: int, gap: int
    ) -> None:
        """Interval-merge a pre-clustered run of rows (internal gaps ≤ gap)
        into the sorted disjoint session list. A cluster can bridge at most
        one session on its left but arbitrarily many on its right (any
        session starting within ``cluster_end + gap`` chains through the
        cluster's ≤gap-spaced points)."""
        cs, ce = skey[0], ekey[0]
        lo, hi = 0, len(sess)
        while lo < hi:
            mid = (lo + hi) // 2
            if sess[mid][0] <= skey:
                lo = mid + 1
            else:
                hi = mid
        i = lo  # sess[i-1].start_key <= skey < sess[i].start_key
        # absorb right neighbors chained through the cluster
        j = i
        while j < len(sess) and sess[j][0][0] - ce <= gap:
            j += 1
        merge_left = i > 0 and cs - sess[i - 1][1][0] <= gap
        if merge_left:
            tgt = sess[i - 1]
            if skey < tgt[0]:
                tgt[0] = skey
            if ekey > tgt[1]:
                tgt[1] = ekey
            tgt[2] += count
            for k in range(i, j):
                if sess[k][1] > tgt[1]:
                    tgt[1] = sess[k][1]
                tgt[2] += sess[k][2]
            del sess[i:j]
        elif j > i:
            tgt = sess[i]
            if skey < tgt[0]:
                tgt[0] = skey
            if ekey > tgt[1]:
                tgt[1] = ekey
            tgt[2] += count
            for k in range(i + 1, j):
                if sess[k][1] > tgt[1]:
                    tgt[1] = sess[k][1]
                tgt[2] += sess[k][2]
            del sess[i + 1 : j]
        else:
            sess.insert(i, [skey, ekey, count])

    # --- emission -------------------------------------------------------------

    def _pop_windows_table(self, kind: str, size: int, wm: int) -> pa.Table | None:
        """Emit all closed windows of one kind as a sorted Arrow table."""
        popped = self.win[kind].pop_closed(size, wm)
        if popped is None:
            return None
        import pyarrow.compute as pc

        code, w, n, nu, na, nt, f_ts, f_text, l_ts, l_text = popped
        names = np.array(self.conv_names, dtype=object)[code]
        us = pa.timestamp("us")
        tbl = pa.Table.from_arrays(
            [
                pa.array(names, type=pa.string()),
                pa.array(w, type=pa.int64()).cast(us),
                pa.array(w + size, type=pa.int64()).cast(us),
                pa.array(n, type=pa.int64()),
                pa.array(nu, type=pa.int64()),
                pa.array(na, type=pa.int64()),
                pa.array(nt, type=pa.int64()),
                pa.array(f_text, type=pa.string()),
                pa.array(l_text, type=pa.string()),
                pa.array(f_ts, type=pa.int64()).cast(us),
                pa.array(l_ts, type=pa.int64()).cast(us),
            ],
            schema=WINDOW_AGG_SCHEMA,
        )
        idx = pc.sort_indices(
            tbl, sort_keys=[("conv_id", "ascending"), ("w_start", "ascending")]
        )
        return tbl.take(idx)

    def _emission_pass(self, touched: set[str]) -> dict[str, list]:
        """Per-conv emission for sessions + joins (windows are columnar and
        emitted separately via ``_pop_windows_table``)."""
        wm = self.wm
        out: dict[str, list] = {"sessions": [], "joins": []}
        due = [c for c, dl in self.pending.items() if dl <= wm]
        for conv in due if not touched else set(due) | touched:
            st = self.convs.get(conv)
            if st is None:
                self.pending.pop(conv, None)
                continue
            dl = self.pending.get(conv, POS_INF)
            if dl > wm:
                continue  # touched but nothing can emit yet; deadline is a lower bound
            next_dl = self._emit_conv(conv, st, wm, out)
            if not (st.sessions or st.tools or st.assistants):
                if st.session_count:
                    self.session_counts[conv] = st.session_count
                del self.convs[conv]
                self.pending.pop(conv, None)
            elif next_dl >= POS_INF:
                self.pending.pop(conv, None)
            else:
                self.pending[conv] = next_dl
        return out

    def _emit_conv(self, conv: str, st: _ConvState, wm: int, out: dict) -> int:
        cfg = self.cfg
        next_dl = POS_INF

        # sessions: closable prefix (disjointness ⇒ earlier sessions close first)
        gap = cfg.session_gap_us
        sess = st.sessions
        n_close = 0
        for s in sess:
            if s[1][0] + gap < wm:
                n_close += 1
            else:
                break
        for s in sess[:n_close]:
            out["sessions"].append(
                (
                    conv, st.session_count, s[0][0], s[1][0],
                    s[2], s[0][2], s[1][2],
                )
            )
            st.session_count += 1
        if n_close:
            del sess[:n_close]
        if sess:
            next_dl = min(next_dl, sess[0][1][0] + gap + 1)

        # joins: resolve tools past deadline (heap order = deadline order =
        # ts order; output re-sorted by (conv, tool_turn_idx) at write)
        bound = cfg.join_bound_us
        tools = st.tools
        assistants = st.assistants
        # fan-out stages (1→N) duplicate whole rows; the oracle resolves each
        # (conv, turn_idx) tool at most once (oracle.py resolved_tools).
        # Duplicates share ts ⇒ share deadline ⇒ pop in the SAME loop (a later
        # re-arrival would be late-dropped at the source), so a per-loop set
        # reproduces the oracle without unbounded persistent state.
        popped: set[tuple] = set()
        while tools and tools[0][0] <= wm:
            deadline, t_ts, t_turn, t_tool, t_text = heapq.heappop(tools)
            if (t_ts, t_turn) in popped:
                continue
            popped.add((t_ts, t_turn))
            match = None
            i = bisect_left(assistants, (t_ts,))
            while i < len(assistants):
                a = assistants[i]
                if a[0] > t_ts + bound:
                    break
                if a[1] > t_turn:
                    match = a
                    break
                i += 1
            out["joins"].append(
                (
                    conv, t_turn, t_tool, t_text, t_ts,
                    match[1] if match else None,
                    match[2] if match else None,
                    match[0] if match else None,
                    match is not None,
                )
            )
        if tools:
            next_dl = min(next_dl, tools[0][0])

        # prune assistants that no pending tool can ever match
        if assistants:
            cut = wm - bound
            if cut > NEG_INF:
                i = bisect_right(assistants, (cut,))
                if i:
                    del assistants[:i]

        return next_dl


def _rows_to_table(rows: list[tuple], schema: pa.Schema) -> pa.Table:
    cols = list(zip(*rows))
    arrays = []
    for i, f in enumerate(schema):
        if pa.types.is_timestamp(f.type):
            arrays.append(pa.array(cols[i], type=pa.int64()).cast(f.type))
        else:
            arrays.append(pa.array(cols[i], type=f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def _empty_turns_table() -> pa.Table:
    from ..schema import TRANSCRIPT_SCHEMA, with_lineage

    return with_lineage(TRANSCRIPT_SCHEMA).empty_table()


class MultiPartitionWorker:
    """One worker PROCESS hosting several logical partitions (the slots
    model of real clusters: partition count P is fixed by the job, worker
    processes scale with the cluster; each Ray actor reserves ``num_cpus=1``
    so ``ray.init(num_cpus=N)`` genuinely bounds reduce-stage parallelism —
    actors with default 0-cpu reservation would run unthrottled on every
    physical core and fake any scaling measurement).

    State, checkpoints and output files stay PER PARTITION, so a resumed run
    may use a different worker count over the same partition layout.
    """

    def __init__(self, partition_ids: list[int], cfg, out_dir: str):
        _limit_native_threads()
        self.cfg = cfg
        self.out_dir = out_dir
        self.impls = {p: PartitionWorkerImpl(p, cfg, out_dir) for p in partition_ids}
        self.pids = list(partition_ids)

    # --- live partition migration (between-epoch work stealing) --------------
    # Actor calls execute in submission order, so the driver enqueues
    # ``extract`` on the donor AFTER the last pre-migration epoch and
    # ``adopt`` on the receiver BEFORE the first post-migration epoch; the
    # extract→adopt ObjectRef dependency orders the two actors. No drain.

    def extract_partition(self, pid: int) -> dict:
        impl = self.impls.pop(pid)
        self.pids.remove(pid)
        return impl.state_payload()

    def adopt_partition(self, pid: int, payload: dict) -> bool:
        impl = PartitionWorkerImpl(pid, self.cfg, self.out_dir)
        impl.load_state_payload(payload)
        self.impls[pid] = impl
        self.pids.append(pid)
        return True

    def process_epoch(
        self,
        epoch: int,
        wm: int,
        do_checkpoint_pids: list[int],
        write_outputs: bool,
        n_frags: int,
        pids: list[int],
        *tables: pa.Table,
    ) -> dict:
        """``tables`` is pid-major: ``n_frags`` fragment tables per hosted
        partition, in arrival (fragment) order — concatenated here so the
        per-partition state fold sees the epoch exactly as a single-task
        read would have produced it. ``pids`` is the driver's view of this
        worker's layout — asserted against actor state to catch any
        migration desync."""
        assert pids == self.pids, f"layout desync: driver {pids} != worker {self.pids}"
        out_tables, blobs, metrics = [], [], []
        for i, pid in enumerate(self.pids):
            frag = list(tables[i * n_frags : (i + 1) * n_frags])
            nonempty = [t for t in frag if t.num_rows]
            if not nonempty:
                table = frag[0]
            elif len(nonempty) == 1:
                table = nonempty[0]
            else:
                table = pa.concat_tables(nonempty)
            r = self.impls[pid].process_epoch(
                epoch, wm, table, pid in do_checkpoint_pids, write_outputs
            )
            out_tables.extend(r["tables"])
            if r["ckpt_blob"]:
                blobs.append(r["ckpt_blob"])
            metrics.append(r["metrics"])
        # two returns (num_returns=2): small meta for the driver's commit;
        # emitted tables + checkpoint blobs go to the off-worker writer task
        # — the driver never pulls the heavy payload
        return {"metrics": metrics}, {"tables": out_tables, "ckpt_blobs": blobs}

    def finish(self, epoch: int, do_checkpoint: bool = True) -> tuple:
        out_tables, blobs, metrics = [], [], []
        for pid in self.pids:
            r = self.impls[pid].finish(epoch, do_checkpoint)
            out_tables.extend(r["tables"])
            if r["ckpt_blob"]:
                blobs.append(r["ckpt_blob"])
            metrics.append(r["metrics"])
        return {"metrics": metrics}, {"tables": out_tables, "ckpt_blobs": blobs}

    def restore(self, by_pid: dict[int, str]) -> None:
        for pid, rel in by_pid.items():
            self.impls[pid].restore(rel)

    def ping(self) -> bool:
        return True
