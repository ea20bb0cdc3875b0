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
- **sessions**: PARTITION-LEVEL COLUMNAR disjoint intervals
  (``_SessionState``), merged per epoch by a vectorized segmented sweep
  (per-code cummax of ends; an interval joins the running group when its
  start is within ``gap``). Sessions close strictly in start order
  (disjointness ⇒ earlier sessions close first), so the per-code persistent
  ``sess_counter`` matches the oracle's per-conv emission order.
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
from ..schema import (
    COUNT_WINDOW_SCHEMA,
    JOIN_SCHEMA,
    NOREPLY_SCHEMA,
    PATTERN_SCHEMA,
    RESPLAT_SCHEMA,
    RUNS_SCHEMA,
    SESSION_SCHEMA,
    WINDOW_AGG_SCHEMA,
)

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
    """Incremental per-conversation JOIN state only.

    Window AND session state are not here: with short conversations most
    per-conv groups hold ~1 row per epoch, so per-conv structures cost one
    Python op per row. Windows live in the columnar ``_WindowState``,
    sessions in the columnar ``_SessionState``. A _ConvState exists only
    for conversations with pending join material (assistants/tools)."""

    __slots__ = ("assistants", "tools")

    def __init__(self) -> None:
        self.assistants: list[tuple] = []  # sorted (ts, turn_idx, text)
        self.tools: list[tuple] = []  # heap (deadline, ts, turn_idx, tool, text)

    def to_payload(self) -> tuple:
        return (self.assistants, self.tools)

    @classmethod
    def from_payload(cls, p: tuple) -> "_ConvState":
        st = cls()
        (st.assistants, st.tools) = p
        return st


_WS_FIELDS = (
    "code", "w", "n", "nu", "na", "nt",
    "f_ts", "f_turn", "f_text", "l_ts", "l_turn", "l_text",
)


_W_SPAN = np.uint64(1) << np.uint64(32)
_W_HALF = np.int64(1) << np.int64(31)


def _wkey(code: np.ndarray, w: np.ndarray, quantum: int) -> np.ndarray:
    """Composite sortable uint64 key for (conv code, window start).

    Window starts are multiples of ``quantum`` (size for tumbling, slide for
    sliding), so ``w // quantum`` indexes windows densely; offset by 2^31 to
    admit negative event time. Packing is order-preserving iff
    0 <= w_idx < 2^32 and code < 2^31 — ±2^31 windows spans ±245k years of
    hourly windows, and codes are per-partition conv ranks."""
    w_idx = w // quantum + _W_HALF
    return code.astype(np.uint64) * _W_SPAN + w_idx.astype(np.uint64)


def _wkey_safe(code: np.ndarray, w: np.ndarray, quantum: int) -> bool:
    if len(code) == 0:
        return True
    w_idx_min = int(w.min()) // quantum + (1 << 31)
    w_idx_max = int(w.max()) // quantum + (1 << 31)
    return 0 <= w_idx_min and w_idx_max < (1 << 32) and int(code.max()) < (1 << 31)


class _WindowState:
    """Partition-level columnar open-window state (one per window kind).

    Arrays are parallel, kept SORTED by the composite key (conv code,
    w_start) — codes intern conv ids per partition
    (``PartitionWorkerImpl.conv_code``). Merge dedupes+sorts only the
    PARTIALS (G log G) and folds them into the sorted state with one
    ``searchsorted`` + masked combine + ``np.insert`` — O(S + G log G).
    At scale S (open state) ≫ G (one epoch's groups), so re-sorting state
    every epoch would be the wrong asymptotic. Emission is a boolean mask.
    first/last are the (ts, turn_idx)-min/max rows of the window
    ((conv, ts, turn_idx) is unique, so text never breaks ties)."""

    __slots__ = _WS_FIELDS + ("key",)

    def __init__(self) -> None:
        for f in ("code", "w", "n", "nu", "na", "nt", "f_ts", "f_turn", "l_ts", "l_turn"):
            setattr(self, f, np.empty(0, np.int64))
        self.f_text = np.empty(0, object)
        self.l_text = np.empty(0, object)
        self.key: np.ndarray | None = None  # lazily (re)derived from code/w

    def _dedupe_partials(self, partial: tuple, pkey: np.ndarray) -> tuple:
        """Sort partials by key and combine duplicate keys (segment reduce).
        Returns 12 field arrays + the sorted unique key array."""
        (pcode, pw, pn, pnu, pna, pnt, pf_ts, pf_turn, pf_text, pl_ts, pl_turn, pl_text) = partial
        ordf = np.lexsort((pf_turn, pf_ts, pkey))
        key_s = pkey[ordf]
        brk = np.concatenate(([True], key_s[1:] != key_s[:-1]))
        starts = np.flatnonzero(brk)
        if len(starts) == len(key_s):  # unique keys: f and l come from the same row
            return tuple(p[ordf] for p in partial) + (key_s,)
        ends = np.append(starts[1:], len(key_s)) - 1
        ordl = np.lexsort((pl_turn, pl_ts, pkey))
        return (
            pcode[ordf][starts],
            pw[ordf][starts],
            np.add.reduceat(pn[ordf], starts),
            np.add.reduceat(pnu[ordf], starts),
            np.add.reduceat(pna[ordf], starts),
            np.add.reduceat(pnt[ordf], starts),
            pf_ts[ordf][starts],
            pf_turn[ordf][starts],
            pf_text[ordf][starts],
            pl_ts[ordl][ends],
            pl_turn[ordl][ends],
            pl_text[ordl][ends],
            key_s[starts],
        )

    def merge(self, *partial: np.ndarray, quantum: int) -> None:
        """Fold partial aggregates (12-field layout) into state."""
        if len(partial[0]) == 0:
            return
        if not (_wkey_safe(partial[0], partial[1], quantum)
                and _wkey_safe(self.code, self.w, quantum)):  # pragma: no cover
            raise OverflowError(
                "window key packing out of range (code >= 2^31 or |w/quantum| >= 2^31)"
            )
        pkey = _wkey(partial[0], partial[1], quantum)
        deduped = self._dedupe_partials(partial, pkey)
        parts, key2 = deduped[:-1], deduped[-1]
        if self.key is None or len(self.key) != len(self.code):
            self.key = _wkey(self.code, self.w, quantum)  # restore/adopt path
        skey = self.key
        if len(skey) == 0:
            for f, arr in zip(_WS_FIELDS, parts):
                setattr(self, f, arr)
            self.key = key2
            return
        pos = np.searchsorted(skey, key2)
        posc = np.minimum(pos, len(skey) - 1)
        exist = skey[posc] == key2
        (code2, w2, n2, nu2, na2, nt2, f_ts2, f_turn2, f_text2, l_ts2, l_turn2, l_text2) = parts
        if exist.any():
            idx = posc[exist]
            self.n[idx] += n2[exist]
            self.nu[idx] += nu2[exist]
            self.na[idx] += na2[exist]
            self.nt[idx] += nt2[exist]
            ef_ts, ef_turn = f_ts2[exist], f_turn2[exist]
            m = (ef_ts < self.f_ts[idx]) | (
                (ef_ts == self.f_ts[idx]) & (ef_turn < self.f_turn[idx])
            )
            if m.any():
                ii = idx[m]
                self.f_ts[ii] = ef_ts[m]
                self.f_turn[ii] = ef_turn[m]
                self.f_text[ii] = f_text2[exist][m]
            el_ts, el_turn = l_ts2[exist], l_turn2[exist]
            m = (el_ts > self.l_ts[idx]) | (
                (el_ts == self.l_ts[idx]) & (el_turn > self.l_turn[idx])
            )
            if m.any():
                ii = idx[m]
                self.l_ts[ii] = el_ts[m]
                self.l_turn[ii] = el_turn[m]
                self.l_text[ii] = l_text2[exist][m]
        new = ~exist
        if new.any():
            at = pos[new]
            self.key = np.insert(skey, at, key2[new])
            for f, arr in zip(_WS_FIELDS, parts):
                setattr(self, f, np.insert(getattr(self, f), at, arr[new]))

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
        if self.key is not None:
            self.key = self.key[keep]
        return out

    def to_payload(self) -> tuple:
        return tuple(getattr(self, f) for f in _WS_FIELDS)

    @classmethod
    def from_payload(cls, p: tuple) -> "_WindowState":
        ws = cls()
        for f, arr in zip(_WS_FIELDS, p):
            # copy: object-store payloads are zero-copy READ-ONLY and the
            # sorted-merge mutates counts/first/last in place
            setattr(ws, f, np.array(arr, copy=True))
        return ws


_SS_FIELDS = ("code", "s_ts", "s_turn", "s_text", "e_ts", "e_turn", "e_text", "n")


class _SessionState:
    """Partition-level columnar open-session intervals (gap-merged).

    Parallel arrays of disjoint intervals sorted by (conv code, start key).
    Merge = concat + lexsort + segmented sweep (an interval joins the
    running group when its start is within ``gap`` of the group's running
    max end — per-code cummax via a pandas segmented scan). Emission =
    ``end + gap < wm`` mask. The per-cluster Python insertion this replaces
    cost one interpreter pass per (conv, cluster) — ~1 per row on short
    conversations."""

    __slots__ = _SS_FIELDS

    def __init__(self) -> None:
        for f in ("code", "s_ts", "s_turn", "e_ts", "e_turn", "n"):
            setattr(self, f, np.empty(0, np.int64))
        self.s_text = np.empty(0, object)
        self.e_text = np.empty(0, object)

    def merge(self, parts: tuple, gap: int) -> None:
        cols = [
            np.concatenate([getattr(self, f), p]) if len(getattr(self, f)) else p
            for f, p in zip(_SS_FIELDS, parts)
        ]
        (code, s_ts, s_turn, s_text, e_ts, e_turn, e_text, n) = cols
        if len(code) == 0:
            return
        ord1 = np.lexsort((s_turn, s_ts, code))
        code, s_ts, s_turn, s_text = code[ord1], s_ts[ord1], s_turn[ord1], s_text[ord1]
        e_ts, e_turn, e_text, n = e_ts[ord1], e_turn[ord1], e_text[ord1], n[ord1]
        # segmented sweep-merge: per-code running max end (cummax resets at
        # code boundaries — pandas does the segmented scan in C)
        cm = pd.Series(e_ts).groupby(pd.Series(code), sort=False).cummax().to_numpy()
        prev_cm = np.concatenate(([NEG_INF], cm[:-1]))
        code_brk = np.concatenate(([True], code[1:] != code[:-1]))
        new_grp = code_brk | (s_ts > prev_cm + gap)
        starts = np.flatnonzero(new_grp)
        if len(starts) == len(code):  # nothing bridges — all disjoint
            self.code, self.s_ts, self.s_turn, self.s_text = code, s_ts, s_turn, s_text
            self.e_ts, self.e_turn, self.e_text, self.n = e_ts, e_turn, e_text, n
            return
        ends_seg = np.append(starts[1:], len(code)) - 1
        self.code = code[starts]
        self.s_ts, self.s_turn, self.s_text = s_ts[starts], s_turn[starts], s_text[starts]
        gid = np.cumsum(new_grp) - 1
        ord2 = np.lexsort((e_turn, e_ts, gid))
        self.e_ts, self.e_turn, self.e_text = (
            e_ts[ord2][ends_seg], e_turn[ord2][ends_seg], e_text[ord2][ends_seg]
        )
        self.n = np.add.reduceat(n, starts)

    def pop_closed(self, gap: int, wm: int) -> tuple | None:
        """Remove and return all sessions with end + gap < wm, sorted by
        (code, start) — disjointness ⇒ per-conv close order = start order."""
        if len(self.code) == 0:
            return None
        mask = self.e_ts + gap < wm
        if not mask.any():
            return None
        out = (
            self.code[mask], self.s_ts[mask], self.s_text[mask],
            self.e_ts[mask], self.e_text[mask], self.n[mask],
        )
        keep = ~mask
        for f in _SS_FIELDS:
            setattr(self, f, getattr(self, f)[keep])
        return out

    def to_payload(self) -> tuple:
        return tuple(getattr(self, f) for f in _SS_FIELDS)

    @classmethod
    def from_payload(cls, p: tuple) -> "_SessionState":
        ss = cls()
        for f, arr in zip(_SS_FIELDS, p):
            setattr(ss, f, arr)
        return ss


_PS_FIELDS = ("code", "ts", "turn", "role")


class _PatternState:
    """Partition-level pending rows for the CEP consecutive-role sequence
    pattern (MATCH_RECOGNIZE family): emit one match per run of L adjacent
    turns (per conv, final (ts, turn_idx) order) whose roles equal
    ``cfg.pattern_roles``.

    Stability argument (why emission is exactly-once and insert-safe): a
    match's last element has ``end_ts``; once ``wm > end_ts`` no on-time row
    can ever sort at-or-before it (late rows with ts < wm are dropped at
    the source), so adjacency of the triple is final. A match is emitted in
    the first epoch where ``end_ts < wm`` (strict — at ts == wm a future
    on-time row could still tie-insert), deduped by the monotone emit
    watermark, not a seen-set: emit iff ``prev_emit_wm <= end_ts < wm``.

    State is O(rows within the lateness window): after each pop, finalized
    rows (ts < wm) are evicted except the last L-1 per conv, which may
    still prefix a future match. All appends/sorts/matches are vectorized;
    per epoch one lexsort over the pending arrays (≈ one epoch's rows)."""

    __slots__ = (*_PS_FIELDS, "role_code", "role_names", "emit_wm")

    def __init__(self) -> None:
        self.code = np.empty(0, np.int64)
        self.ts = np.empty(0, np.int64)
        self.turn = np.empty(0, np.int64)
        self.role = np.empty(0, np.int64)  # interned role codes
        self.role_code: dict = {}
        self.role_names: list = []
        self.emit_wm = NEG_INF

    def add(self, code: np.ndarray, ts: np.ndarray, turn: np.ndarray, role: np.ndarray) -> None:
        # intern roles to int codes at append time (hash-based factorize is
        # ~10x cheaper than a sort-based unique at pop time, and int sort
        # keys keep the per-epoch lexsort off the object path)
        rc_local, uniq = pd.factorize(np.asarray(role, dtype=object))
        lut = np.empty(len(uniq), np.int64)
        for i, u in enumerate(uniq):
            c = self.role_code.get(u)
            if c is None:
                c = len(self.role_names)
                self.role_code[u] = c
                self.role_names.append(u)
            lut[i] = c
        self.code = np.concatenate([self.code, code])
        self.ts = np.concatenate([self.ts, ts])
        self.turn = np.concatenate([self.turn, turn.astype(np.int64)])
        self.role = np.concatenate([self.role, lut[rc_local]])

    def pop_matches(self, pattern: tuple, wm: int) -> tuple | None:
        """Emit matches with prev_emit_wm <= end_ts < wm; evict finalized
        rows beyond the per-conv L-1 tail. Returns (code, start_turn,
        start_ts, end_ts) arrays or None."""
        L = len(pattern)
        n = len(self.code)
        if L == 0 or n == 0:
            self.emit_wm = max(self.emit_wm, wm)
            return None
        # tie-break codes by the roles' LEXICOGRAPHIC rank so the sort
        # matches the oracle's (ts, turn, role) tuple order even when
        # transform stages emit equal-(ts, turn) duplicates
        rank = np.empty(len(self.role_names), np.int64)
        rank[np.argsort(np.asarray(self.role_names, dtype=object))] = np.arange(
            len(self.role_names)
        )
        order = np.lexsort((rank[self.role], self.turn, self.ts, self.code))
        code, ts, turn, role = (
            self.code[order], self.ts[order], self.turn[order], self.role[order]
        )

        out = None
        steps = [self.role_code.get(s, -1) for s in pattern]
        if n >= L and all(s >= 0 for s in steps):
            m = np.ones(n - L + 1, dtype=bool)
            for i, step in enumerate(steps):
                m &= role[i : n - L + 1 + i] == step
                if i:
                    m &= code[i : n - L + 1 + i] == code[: n - L + 1]
            end_ts = ts[L - 1 :]
            m &= (end_ts < wm) & (end_ts >= self.emit_wm)
            idx = np.flatnonzero(m)
            if len(idx):
                out = (code[idx], turn[idx], ts[idx], end_ts[idx])

        # evict: finalized rows (ts < wm) beyond the last L-1 of each conv
        fin = ts < wm
        if fin.any():
            grp_start = np.concatenate(([True], code[1:] != code[:-1]))
            gid = np.cumsum(grp_start) - 1
            fin_i = fin.astype(np.int64)
            cum = np.cumsum(fin_i)
            starts = np.flatnonzero(grp_start)
            cum_before = np.concatenate(([0], cum[starts[1:] - 1]))
            rank = cum - cum_before[gid]  # 1-based rank among conv's finalized
            fin_per = np.add.reduceat(fin_i, starts)
            keep = (~fin) | (rank > fin_per[gid] - (L - 1))
            code, ts, turn, role = code[keep], ts[keep], turn[keep], role[keep]
        self.code, self.ts, self.turn, self.role = code, ts, turn, role
        self.emit_wm = max(self.emit_wm, wm)
        return out

    def to_payload(self) -> tuple:
        return (self.code, self.ts, self.turn, self.role, list(self.role_names), self.emit_wm)

    @classmethod
    def from_payload(cls, p: tuple) -> "_PatternState":
        ps = cls()
        (ps.code, ps.ts, ps.turn, ps.role, names, ps.emit_wm) = p
        # copy: payloads via the object store are read-only; role/turn are
        # re-concatenated but names is mutated by add()
        ps.role_names = list(names)
        ps.role_code = {r: i for i, r in enumerate(ps.role_names)}
        return ps


_CW_PENDING = ("code", "ts", "turn", "rrank", "text", "iu", "ia", "it")
_CW_PERCONV = (
    "cw_wid", "cw_n", "cw_nu", "cw_na", "cw_nt",
    "cw_first_ts", "cw_last_ts", "cw_first_text", "cw_last_text",
)


class _CountWindowState:
    """COUNT-trigger tumbling windows: chunk each conv's turns (final
    (ts, turn_idx) order) into consecutive groups of N rows.

    Finality: window w of a conv is rows [wN, (w+1)N) of the final order; a
    FULL window is emitted once its last row's ts < wm (strict — every
    earlier position is then insert-proof, since any future on-time row has
    ts >= wm and sorts after). The partial tail emits only at final flush.

    Unlike time windows, finalized rows can be FOLDED and discarded: the
    state keeps (a) pending rows inside the lateness window and (b) one
    open-window accumulator per conv (counts + first/last), so memory is
    O(lateness window + convs), never O(stream). The fold is one lexsort +
    reduceat-segmented aggregation per epoch — no per-conv Python."""

    __slots__ = (*_CW_PENDING, *_CW_PERCONV)

    def __init__(self) -> None:
        for f in ("code", "ts", "turn", "rrank", "iu", "ia", "it"):
            setattr(self, f, np.empty(0, np.int64))
        self.text = np.empty(0, object)
        for f in ("cw_wid", "cw_n", "cw_nu", "cw_na", "cw_nt", "cw_first_ts", "cw_last_ts"):
            setattr(self, f, np.empty(0, np.int64))
        self.cw_first_text = np.empty(0, object)
        self.cw_last_text = np.empty(0, object)

    def _grow(self, n_codes: int) -> None:
        cur = len(self.cw_wid)
        if n_codes <= cur:
            return
        for f in _CW_PERCONV:
            old = getattr(self, f)
            grown = np.zeros(n_codes, dtype=old.dtype)
            grown[:cur] = old
            setattr(self, f, grown)

    def add(self, code, ts, turn, rrank, text, iu, ia, it) -> None:
        self.code = np.concatenate([self.code, code])
        self.ts = np.concatenate([self.ts, ts])
        self.turn = np.concatenate([self.turn, turn])
        self.rrank = np.concatenate([self.rrank, rrank])
        self.text = np.concatenate([self.text, np.asarray(text, dtype=object)])
        self.iu = np.concatenate([self.iu, iu])
        self.ia = np.concatenate([self.ia, ia])
        self.it = np.concatenate([self.it, it])

    def pop_windows(self, N: int, wm: int, n_codes: int) -> tuple | None:
        """Fold finalized pending rows into per-conv accumulators, emitting
        every completed window; at flush (wm >= POS_INF) also emit partial
        tails. Returns column tuple or None."""
        self._grow(n_codes)
        outs = []
        n = len(self.code)
        if n:
            # full-tuple tie-break to match the oracle's sorted() over
            # (ts, turn, role, text) rows: role rank (assistant<tool<user
            # lexicographically; non-canonical roles rank last — multiple
            # DISTINCT non-canonical roles tied on (ts, turn) would need the
            # raw string to order exactly, same residual the oracle notes)
            # then text, so equal-(ts, turn) duplicates with different
            # role/text chunk identically to the reference interpreter.
            tkey = self.text
            if any(t is None for t in tkey):
                tkey = pd.Series(tkey, dtype=object).fillna("").to_numpy()
            order = np.lexsort((tkey, self.rrank, self.turn, self.ts, self.code))
            code, ts, turn, text = (
                self.code[order], self.ts[order], self.turn[order], self.text[order]
            )
            rrank = self.rrank[order]
            iu, ia, it = self.iu[order], self.ia[order], self.it[order]
            fin = ts < wm
            keep = ~fin
            (
                self.code, self.ts, self.turn, self.rrank,
                self.text, self.iu, self.ia, self.it,
            ) = (
                code[keep], ts[keep], turn[keep], rrank[keep],
                text[keep], iu[keep], ia[keep], it[keep],
            )
            if fin.any():
                fc, fts, ftext = code[fin], ts[fin], text[fin]
                fiu, fia, fit = iu[fin], ia[fin], it[fin]
                m = len(fc)
                grp_start = np.concatenate(([True], fc[1:] != fc[:-1]))
                g_idx = np.flatnonzero(grp_start)
                gsizes = np.diff(np.append(g_idx, m))
                rank = np.arange(m) - np.repeat(g_idx, gsizes)
                p = self.cw_n[fc] + rank
                wloc = p // N
                seg_start = grp_start | np.concatenate(([False], wloc[1:] != wloc[:-1]))
                s_idx = np.flatnonzero(seg_start)
                e_idx = np.append(s_idx[1:], m) - 1
                seg_code = fc[s_idx]
                seg_wid = self.cw_wid[seg_code] + wloc[s_idx]
                seg_nu = np.add.reduceat(fiu, s_idx)
                seg_na = np.add.reduceat(fia, s_idx)
                seg_nt = np.add.reduceat(fit, s_idx)
                seg_n = (e_idx - s_idx + 1).astype(np.int64)
                continues = (p[s_idx] % N) != 0  # joins the conv's open partial
                w_n = seg_n + np.where(continues, self.cw_n[seg_code], 0)
                w_nu = seg_nu + np.where(continues, self.cw_nu[seg_code], 0)
                w_na = seg_na + np.where(continues, self.cw_na[seg_code], 0)
                w_nt = seg_nt + np.where(continues, self.cw_nt[seg_code], 0)
                w_first_ts = np.where(continues, self.cw_first_ts[seg_code], fts[s_idx])
                w_first_text = np.where(continues, self.cw_first_text[seg_code], ftext[s_idx])
                w_last_ts = fts[e_idx]
                w_last_text = ftext[e_idx]
                complete = (p[e_idx] % N) == N - 1
                if complete.any():
                    cm = complete
                    outs.append(
                        (
                            seg_code[cm], seg_wid[cm], w_n[cm], w_nu[cm], w_na[cm],
                            w_nt[cm], w_first_text[cm], w_last_text[cm],
                            w_first_ts[cm], w_last_ts[cm],
                        )
                    )
                # per-conv rollover: wid += completed windows; partial = last
                # (incomplete) segment's merged values, or reset if it closed
                conv_u = fc[g_idx]
                old_n = self.cw_n[conv_u]
                self.cw_wid[conv_u] += (old_n + gsizes) // N
                new_n = (old_n + gsizes) % N
                seg_last = np.concatenate((seg_code[1:] != seg_code[:-1], [True]))
                ls = np.flatnonzero(seg_last)  # one per conv_u, same order
                has = new_n > 0
                self.cw_n[conv_u] = new_n
                self.cw_nu[conv_u] = np.where(has, w_nu[ls], 0)
                self.cw_na[conv_u] = np.where(has, w_na[ls], 0)
                self.cw_nt[conv_u] = np.where(has, w_nt[ls], 0)
                self.cw_first_ts[conv_u] = np.where(has, w_first_ts[ls], 0)
                self.cw_last_ts[conv_u] = np.where(has, w_last_ts[ls], 0)
                self.cw_first_text[conv_u] = np.where(has, w_first_text[ls], None)
                self.cw_last_text[conv_u] = np.where(has, w_last_text[ls], None)

        if wm >= POS_INF:  # final flush: emit partial tails
            tails = np.flatnonzero(self.cw_n > 0)
            if len(tails):
                outs.append(
                    (
                        tails.astype(np.int64), self.cw_wid[tails], self.cw_n[tails],
                        self.cw_nu[tails], self.cw_na[tails], self.cw_nt[tails],
                        self.cw_first_text[tails], self.cw_last_text[tails],
                        self.cw_first_ts[tails], self.cw_last_ts[tails],
                    )
                )
                self.cw_wid[tails] += 1
                self.cw_n[tails] = 0

        if not outs:
            return None
        return tuple(np.concatenate([o[i] for o in outs]) for i in range(10))

    def to_payload(self) -> tuple:
        return tuple(getattr(self, f) for f in (*_CW_PENDING, *_CW_PERCONV))

    @classmethod
    def from_payload(cls, p: tuple) -> "_CountWindowState":
        cw = cls()
        for f, arr in zip((*_CW_PENDING, *_CW_PERCONV), p):
            setattr(cw, f, np.array(arr) if f in _CW_PERCONV else arr)
        return cw


_RL_FIELDS = ("u_min", "a_min", "has_u", "has_a", "emitted")


class _RespLatState:
    """Per-conversation FIRST-RESPONSE LATENCY state, columnar by conv code.

    Five dense arrays indexed by the partition's persistent conv interning
    code: the running per-role first-turn minima (valid where ``has_*``)
    and an emitted flag (each conversation's row is emitted exactly once).
    O(1) integers per seen conversation — never row-proportional. The
    minima are FINAL once ``min <= wm``: a late row is ``ts < wm`` and is
    dropped at ingest, so no accepted arrival can lower a minimum the
    watermark has passed; ties at ``ts == wm`` leave the minimum unchanged.
    """

    __slots__ = _RL_FIELDS

    def __init__(self) -> None:
        self.u_min = np.zeros(0, dtype=np.int64)
        self.a_min = np.zeros(0, dtype=np.int64)
        self.has_u = np.zeros(0, dtype=bool)
        self.has_a = np.zeros(0, dtype=bool)
        self.emitted = np.zeros(0, dtype=bool)

    def _grow(self, n_codes: int) -> None:
        if n_codes <= len(self.u_min):
            return
        for f in ("u_min", "a_min"):
            grown = np.full(n_codes, POS_INF, dtype=np.int64)
            old = getattr(self, f)
            grown[: len(old)] = old
            setattr(self, f, grown)
        for f in ("has_u", "has_a", "emitted"):
            grown_b = np.zeros(n_codes, dtype=bool)
            old_b = getattr(self, f)
            grown_b[: len(old_b)] = old_b
            setattr(self, f, grown_b)

    def add(
        self,
        codes: np.ndarray,
        ts: np.ndarray,
        is_user: np.ndarray,
        is_assistant: np.ndarray,
        n_codes: int,
    ) -> None:
        """Fold one ingested batch (already (code, ts, turn)-sorted, so the
        first row of each (code, role-mask) run IS that code's batch
        minimum — one boolean diff per role, no reduceat needed)."""
        self._grow(n_codes)
        for mask, vmin, has in (
            (is_user, self.u_min, self.has_u),
            (is_assistant, self.a_min, self.has_a),
        ):
            sel = np.flatnonzero(mask)
            if not len(sel):
                continue
            d = codes[sel]
            first = np.concatenate(([True], d[1:] != d[:-1]))
            dc = d[first]
            np.minimum.at(vmin, dc, ts[sel][first])
            has[dc] = True

    def pop_final(self, wm: int) -> tuple | None:
        """Emit (once) every conversation whose BOTH minima the watermark
        has passed — vectorized mask + filter."""
        if not len(self.u_min):
            return None
        mask = (
            self.has_u
            & self.has_a
            & ~self.emitted
            & (self.u_min <= wm)
            & (self.a_min <= wm)
        )
        idx = np.flatnonzero(mask)
        if not len(idx):
            return None
        self.emitted[idx] = True
        return idx, self.u_min[idx], self.a_min[idx]

    def to_payload(self) -> tuple:
        return tuple(getattr(self, f) for f in _RL_FIELDS)

    @classmethod
    def from_payload(cls, p: tuple) -> "_RespLatState":
        st = cls()
        for f, arr in zip(_RL_FIELDS, p):
            # copy: payloads via the object store are read-only; mutated in place
            setattr(st, f, np.array(arr))
        return st


_NC_FIELDS = ("first_min", "emitted")


class _NewConvState:
    """Per-conversation GLOBAL first-turn minimum + emitted flag, columnar
    by conv code (the resplat shape, any-role). A minimum is FINAL once
    ``min <= wm``; the pop groups newly-final conversations by their first
    turn's tumbling window and returns per-window counts — O(windows
    touched this epoch) scalars for the driver's second-level reduce."""

    __slots__ = _NC_FIELDS

    def __init__(self) -> None:
        self.first_min = np.zeros(0, dtype=np.int64)
        self.emitted = np.zeros(0, dtype=bool)

    def _grow(self, n_codes: int) -> None:
        if n_codes <= len(self.first_min):
            return
        grown = np.full(n_codes, POS_INF, dtype=np.int64)
        grown[: len(self.first_min)] = self.first_min
        self.first_min = grown
        grown_b = np.zeros(n_codes, dtype=bool)
        grown_b[: len(self.emitted)] = self.emitted
        self.emitted = grown_b

    def add(self, codes: np.ndarray, ts: np.ndarray, n_codes: int) -> None:
        """Fold one ingested batch (already (code, ts, turn)-sorted, so
        each code run's first row is its batch minimum)."""
        self._grow(n_codes)
        if not len(codes):
            return
        first = np.concatenate(([True], codes[1:] != codes[:-1]))
        np.minimum.at(self.first_min, codes[first], ts[first])

    def pop_counts(self, tsize: int, wm: int) -> dict[int, int]:
        """Per-window counts of newly-final first turns; marks emitted."""
        if not len(self.first_min):
            return {}
        mask = (~self.emitted) & (self.first_min <= wm)
        idx = np.flatnonzero(mask)
        if not len(idx):
            return {}
        self.emitted[idx] = True
        w = self.first_min[idx] // tsize * tsize
        uw, cnt = np.unique(w, return_counts=True)
        return {int(a): int(b) for a, b in zip(uw, cnt)}

    def to_payload(self) -> tuple:
        return tuple(getattr(self, f) for f in _NC_FIELDS)

    @classmethod
    def from_payload(cls, p: tuple) -> "_NewConvState":
        st = cls()
        st.first_min = np.array(p[0], dtype=np.int64)
        st.emitted = np.array(p[1], dtype=bool)
        return st


_NR_FIELDS = ("p_code", "p_ts", "p_turn", "a_code", "a_ts")


class _NoReplyState:
    """ABSENCE / event-time-timeout state (CEP ``notFollowedBy``), columnar.

    Two bounded row sets per partition:

    - pending USER turns ``(code, ts, turn)`` — unanswered so far; a pending
      row lives at most ``timeout`` past the watermark (then it times out
      and emits) so the set is O(rows in the last timeout horizon);
    - retained ASSISTANT timestamps ``(code, ts)`` with ``ts > wm`` — an
      older assistant can answer no future-accepted user turn (answering
      needs ``a_ts > u_ts >= wm``), so it is pruned after each match pass.

    Matching is one vectorized pass per pop: assistants are sorted by
    ``(code, ts)`` and each pending probes the count of assistants in
    ``(u_ts, u_ts + timeout]`` of its own code via two ``searchsorted``
    calls on a DENSE composite key ``code * (R + 2) + rank(ts)`` (ranks
    over the retained assistants' unique timestamps, so the composite
    stays far below 2^63 regardless of absolute stream time — asserted).
    Exact-duplicate pendings (fan-out copies) collapse at emission, which
    matches the oracle's set-keyed spec; a copy can never arrive after its
    twin was answered or emitted (the late filter bounds arrivals below by
    the watermark that resolved the twin).
    """

    __slots__ = _NR_FIELDS

    def __init__(self) -> None:
        self.p_code = np.zeros(0, dtype=np.int64)
        self.p_ts = np.zeros(0, dtype=np.int64)
        self.p_turn = np.zeros(0, dtype=np.int64)
        self.a_code = np.zeros(0, dtype=np.int64)
        self.a_ts = np.zeros(0, dtype=np.int64)

    def add(
        self,
        codes: np.ndarray,
        ts: np.ndarray,
        turn: np.ndarray,
        is_user: np.ndarray,
        is_assistant: np.ndarray,
    ) -> None:
        u = np.flatnonzero(is_user)
        if len(u):
            self.p_code = np.concatenate([self.p_code, codes[u]])
            self.p_ts = np.concatenate([self.p_ts, ts[u]])
            self.p_turn = np.concatenate([self.p_turn, turn[u]])
        a = np.flatnonzero(is_assistant)
        if len(a):
            self.a_code = np.concatenate([self.a_code, codes[a]])
            self.a_ts = np.concatenate([self.a_ts, ts[a]])

    def pop_timeouts(self, timeout: int, wm: int) -> tuple | None:
        """Match, emit newly-final timeouts, prune. Returns unique
        ``(code, ts, turn)`` arrays of emitted rows, or None."""
        if len(self.p_code) and len(self.a_code):
            uniq = np.unique(self.a_ts)
            R = len(uniq)
            max_code = int(max(self.p_code.max(), self.a_code.max()))
            assert (max_code + 1) < (2**63 - 1) // (R + 2), (
                "noreply composite key would overflow (convs x retained "
                "assistant rows); shrink the epoch/lateness horizon"
            )
            a_key = self.a_code * (R + 2) + np.searchsorted(uniq, self.a_ts)
            a_key.sort()
            lo = np.searchsorted(
                a_key,
                self.p_code * (R + 2) + np.searchsorted(uniq, self.p_ts, side="right"),
            )
            hi = np.searchsorted(
                a_key,
                self.p_code * (R + 2)
                + np.searchsorted(uniq, self.p_ts + timeout, side="right"),
            )
            unanswered = hi <= lo
            if not unanswered.all():
                self.p_code = self.p_code[unanswered]
                self.p_ts = self.p_ts[unanswered]
                self.p_turn = self.p_turn[unanswered]
        out = None
        if len(self.p_code):
            final = self.p_ts + timeout < wm
            idx = np.flatnonzero(final)
            if len(idx):
                c, t, n = self.p_code[idx], self.p_ts[idx], self.p_turn[idx]
                order = np.lexsort((n, t, c))
                c, t, n = c[order], t[order], n[order]
                first = np.concatenate(
                    ([True], (c[1:] != c[:-1]) | (t[1:] != t[:-1]) | (n[1:] != n[:-1]))
                )
                out = (c[first], t[first], n[first])
                keep = ~final
                self.p_code = self.p_code[keep]
                self.p_ts = self.p_ts[keep]
                self.p_turn = self.p_turn[keep]
        if len(self.a_code):
            keep_a = self.a_ts > wm
            if not keep_a.all():
                self.a_code = self.a_code[keep_a]
                self.a_ts = self.a_ts[keep_a]
        return out

    def to_payload(self) -> tuple:
        return tuple(getattr(self, f) for f in _NR_FIELDS)

    @classmethod
    def from_payload(cls, p: tuple) -> "_NoReplyState":
        st = cls()
        for f, arr in zip(_NR_FIELDS, p):
            # copy: payloads via the object store are read-only; mutated in place
            setattr(st, f, np.array(arr, dtype=np.int64))
        return st


_RUN_PENDING = ("code", "ts", "turn", "role")
_RUN_TAILS = ("t_role", "t_len", "t_s_ts", "t_s_turn", "t_e_ts", "t_e_turn")


class _RunState:
    """CEP run-length quantifier (Flink CEP ``times(K,)`` / MATCH_RECOGNIZE
    ``A{K,}`` family): emit every MAXIMAL run of >= ``min_len`` consecutive
    same-role turns of a conversation (final (ts, turn_idx) order) — the
    'runaway same-role loop' detector.

    Finality: all rows with ``ts < wm`` are in final order (a late row is
    ``ts < wm`` and is dropped at the source, so nothing can ever insert
    below the watermark). A run is therefore maximal — and emitted, once —
    when a DIFFERENT-role row follows it within the final region; the last
    (unbroken) run of each conv compacts to an O(1) per-conv tail summary
    (role, length, start, end) that future rows extend or break. State is
    O(convs + rows above wm), never O(stream): each pop lexsorts the
    pending arrays once, folds the sub-wm prefix into tails, and keeps only
    the at-or-above-wm suffix. At final flush (wm = +inf) the surviving
    tails themselves are emitted.

    Equal-(ts, turn) duplicates (byte-identical fan-out copies) extend the
    run they sit in, matching the oracle's row semantics; distinct roles on
    an equal (ts, turn) key sort by lexicographic role rank (the
    _PatternState convention), which keeps engine and oracle byte-equal."""

    __slots__ = (*_RUN_PENDING, *_RUN_TAILS, "role_code", "role_names")

    def __init__(self) -> None:
        for f in _RUN_PENDING:
            setattr(self, f, np.empty(0, np.int64))
        for f in _RUN_TAILS:
            setattr(self, f, np.empty(0, np.int64))
        self.role_code: dict = {}
        self.role_names: list = []

    def _grow_tails(self, n_codes: int) -> None:
        if n_codes <= len(self.t_role):
            return
        for f in _RUN_TAILS:
            old = getattr(self, f)
            grown = np.full(n_codes, -1, np.int64) if f == "t_role" else np.zeros(
                n_codes, np.int64
            )
            grown[: len(old)] = old
            setattr(self, f, grown)

    def add(self, code: np.ndarray, ts: np.ndarray, turn: np.ndarray, role: np.ndarray) -> None:
        rc_local, uniq = pd.factorize(np.asarray(role, dtype=object))
        lut = np.empty(len(uniq), np.int64)
        for i, u in enumerate(uniq):
            c = self.role_code.get(u)
            if c is None:
                c = len(self.role_names)
                self.role_code[u] = c
                self.role_names.append(u)
            lut[i] = c
        self.code = np.concatenate([self.code, code])
        self.ts = np.concatenate([self.ts, ts])
        self.turn = np.concatenate([self.turn, turn.astype(np.int64)])
        self.role = np.concatenate([self.role, lut[rc_local]])

    def pop_runs(self, min_len: int, wm: int, n_codes: int) -> tuple | None:
        """Fold the finalized (< wm) pending prefix into per-conv tails and
        return the newly-maximal runs with length >= min_len as arrays
        (code, role_code, length, start_ts, start_turn, end_ts, end_turn),
        or None. ``wm >= POS_INF`` (final flush) also drains the tails."""
        self._grow_tails(n_codes)
        final = wm >= POS_INF
        out: list[tuple] = []
        n = len(self.code)
        if n:
            rank = np.empty(len(self.role_names), np.int64)
            rank[np.argsort(np.asarray(self.role_names, dtype=object))] = np.arange(
                len(self.role_names)
            )
            order = np.lexsort((rank[self.role], self.turn, self.ts, self.code))
            code, ts = self.code[order], self.ts[order]
            turn, role = self.turn[order], self.role[order]
            fin = ts < wm
            if fin.any():
                keep = ~fin
                cf, tsf = code[fin], ts[fin]
                tnf, rlf = turn[fin], role[fin]
                self.code, self.ts = code[keep], ts[keep]
                self.turn, self.role = turn[keep], role[keep]
                m = len(cf)
                first = np.concatenate(([True], cf[1:] != cf[:-1]))
                brk = first | np.concatenate(([True], rlf[1:] != rlf[:-1]))
                starts = np.flatnonzero(brk)
                counts = np.diff(np.append(starts, m)).astype(np.int64)
                ends = starts + counts - 1
                r_code, r_role = cf[starts], rlf[starts]
                is_first = first[starts]
                is_last = np.append(r_code[1:] != r_code[:-1], True)
                # merge each conv's first run with its stored tail (same
                # role: lengths add, start comes from the tail); a
                # different-role first row BREAKS the tail -> emit it now,
                # before the conv's last run overwrites the slot
                tr = self.t_role[r_code]
                merged = is_first & (tr == r_role)
                broken_tail = is_first & (tr != -1) & ~merged
                if broken_tail.any():
                    bc = r_code[broken_tail]
                    ok = self.t_len[bc] >= min_len
                    if ok.any():
                        sel = bc[ok]
                        out.append(
                            (sel, self.t_role[sel], self.t_len[sel],
                             self.t_s_ts[sel], self.t_s_turn[sel],
                             self.t_e_ts[sel], self.t_e_turn[sel])
                        )
                r_len = counts.copy()
                r_s_ts, r_s_turn = tsf[starts].copy(), tnf[starts].copy()
                if merged.any():
                    mc = r_code[merged]
                    r_len[merged] += self.t_len[mc]
                    r_s_ts[merged] = self.t_s_ts[mc]
                    r_s_turn[merged] = self.t_s_turn[mc]
                # runs broken WITHIN the final region are maximal: emit
                emit = ~is_last & (r_len >= min_len)
                if emit.any():
                    out.append(
                        (r_code[emit], r_role[emit], r_len[emit],
                         r_s_ts[emit], r_s_turn[emit],
                         tsf[ends[emit]], tnf[ends[emit]])
                    )
                # each conv's last run becomes (or replaces) its tail
                lc = r_code[is_last]
                self.t_role[lc] = r_role[is_last]
                self.t_len[lc] = r_len[is_last]
                self.t_s_ts[lc] = r_s_ts[is_last]
                self.t_s_turn[lc] = r_s_turn[is_last]
                self.t_e_ts[lc] = tsf[ends[is_last]]
                self.t_e_turn[lc] = tnf[ends[is_last]]
            else:
                self.code, self.ts = code, ts
                self.turn, self.role = turn, role
        if final and len(self.t_role):
            live = np.flatnonzero((self.t_role != -1) & (self.t_len >= min_len))
            if len(live):
                out.append(
                    (live, self.t_role[live], self.t_len[live],
                     self.t_s_ts[live], self.t_s_turn[live],
                     self.t_e_ts[live], self.t_e_turn[live])
                )
            self.t_role[:] = -1
        if not out:
            return None
        return tuple(np.concatenate([p[i] for p in out]) for i in range(7))

    def to_payload(self) -> tuple:
        return (
            *(getattr(self, f) for f in _RUN_PENDING),
            *(getattr(self, f) for f in _RUN_TAILS),
            list(self.role_names),
        )

    @classmethod
    def from_payload(cls, p: tuple) -> "_RunState":
        st = cls()
        fields = (*_RUN_PENDING, *_RUN_TAILS)
        for f, arr in zip(fields, p):
            # copy: payloads via the object store are read-only; mutated in place
            setattr(st, f, np.array(arr))
        st.role_names = list(p[len(fields)])
        st.role_code = {r: i for i, r in enumerate(st.role_names)}
        return st


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
        # conv interning for the columnar states (grows with convs seen —
        # an accepted O(seen convs) map, like the session counter below)
        self.conv_code: dict[str, int] = {}
        self.conv_names: list[str] = []
        self.win = {"tumbling": _WindowState(), "sliding": _WindowState()}
        self.sess = _SessionState()
        self.pat = _PatternState()
        self.cwin = _CountWindowState()
        self.resplat = _RespLatState()
        self.runs = _RunState()
        self.noreply = _NoReplyState()
        self.newconv = _NewConvState()
        # windowed tool usage: w_start -> tool -> [n_calls, set(pcodes)].
        # Popped (and deleted) when the watermark passes w_start + size;
        # tiny — open windows x small tool vocab x touched convs.
        self.toolw: dict[int, dict[str, list]] = {}
        # session ids are per-conv monotonic FOREVER (oracle semantics):
        # per-code counter indexed by the interning code
        self.sess_counter = np.zeros(0, dtype=np.int64)
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
            "conv_names": list(self.conv_names),
            "win": {k: ws.to_payload() for k, ws in self.win.items()},
            "sess": self.sess.to_payload(),
            "sess_counter": self.sess_counter,
            "pat": self.pat.to_payload(),
            "cwin": self.cwin.to_payload(),
            "resplat": self.resplat.to_payload(),
            "runs": self.runs.to_payload(),
            "noreply": self.noreply.to_payload(),
            "newconv": self.newconv.to_payload(),
            "toolw": {
                w: {t: [v[0], sorted(v[1])] for t, v in by_tool.items()}
                for w, by_tool in self.toolw.items()
            },
        }

    def load_state_payload(self, payload: dict) -> None:
        assert payload["partition"] == self.partition
        self.wm = payload["wm"]
        self.last_epoch = payload.get("epoch", -1)
        self.totals = defaultdict(int, payload["totals"])
        self.pending = payload["pending"]
        self.conv_names = list(payload["conv_names"])
        self.conv_code = {c: i for i, c in enumerate(self.conv_names)}
        self.win = {k: _WindowState.from_payload(p) for k, p in payload["win"].items()}
        self.sess = _SessionState.from_payload(payload["sess"])
        if "pat" in payload:
            self.pat = _PatternState.from_payload(payload["pat"])
        if "cwin" in payload:
            self.cwin = _CountWindowState.from_payload(payload["cwin"])
        if "resplat" in payload:
            self.resplat = _RespLatState.from_payload(payload["resplat"])
        if "runs" in payload:
            self.runs = _RunState.from_payload(payload["runs"])
        if "noreply" in payload:
            self.noreply = _NoReplyState.from_payload(payload["noreply"])
        if "newconv" in payload:
            self.newconv = _NewConvState.from_payload(payload["newconv"])
        self.toolw = {
            int(w): {t: [int(v[0]), set(v[1])] for t, v in by_tool.items()}
            for w, by_tool in payload.get("toolw", {}).items()
        }
        # copy: payloads arriving via the object store (migration) are
        # zero-copy READ-ONLY, and the counter is mutated in place
        self.sess_counter = np.array(payload["sess_counter"], dtype=np.int64)
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
        if table.num_rows:
            self._ingest(table)
        self.wm = max(self.wm, wm)
        t_ingest = _time.perf_counter()
        out = self._emission_pass()
        # columnar window/session emission: mask + filter, no per-conv
        # iteration. Runs on replay too (state must advance identically).
        win_tables = {
            "tumbling": self._pop_windows_table("tumbling", self.cfg.tumbling_size_us, self.wm),
            "sliding": self._pop_windows_table("sliding", self.cfg.sliding_size_us, self.wm),
        }
        sess_table = self._pop_sessions_table(self.cfg.session_gap_us, self.wm)
        pat_table = self._pop_patterns_table(self.wm)
        cw_table = self._pop_count_windows_table(self.wm)
        rl_table = self._pop_resplat_table(self.wm) if self.cfg.resp_latency else None
        run_table = self._pop_runs_table(self.wm) if self.cfg.run_min_len else None
        nr_table = (
            self._pop_noreply_table(self.wm) if self.cfg.noreply_timeout_us else None
        )
        t_emit = _time.perf_counter()

        n_emitted = {
            "tumbling": win_tables["tumbling"].num_rows if win_tables["tumbling"] is not None else 0,
            "sliding": win_tables["sliding"].num_rows if win_tables["sliding"] is not None else 0,
            "sessions": sess_table.num_rows if sess_table is not None else 0,
            "patterns": pat_table.num_rows if pat_table is not None else 0,
            "count_windows": cw_table.num_rows if cw_table is not None else 0,
            "resplat": rl_table.num_rows if rl_table is not None else 0,
            "runs": run_table.num_rows if run_table is not None else 0,
            "noreply": nr_table.num_rows if nr_table is not None else 0,
            "joins": len(out["joins"]),
        }
        # totals accumulate on replay too, so a resumed run's checkpointed
        # counters match an uninterrupted run (ADVICE: metrics drift)
        self.totals["turns_in"] += table.num_rows
        for k, v in n_emitted.items():
            self.totals[f"{k}_emitted"] += v

        # new-conversation drain: mark newly-final first-turn minima BEFORE
        # the replay early-return (state advance, same rule as the toolw
        # drain below); replayed epochs discard the partials — the driver's
        # manifest-carried window accumulator already folded them.
        newconv_partial: dict[int, int] = {}
        if self.cfg.new_convs:
            newconv_partial = self.newconv.pop_counts(
                self.cfg.tumbling_size_us, self.wm
            )

        # windowed tool-usage drain: pop newly-final (window -> tool) state
        # BEFORE the replay early-return — the drain is a STATE advance
        # (like the window/session pops above), not just an output. A
        # restored checkpoint still holds windows that later replayed
        # epochs finalized and committed; skipping the drain on replay
        # left them in `toolw`, and the first live epoch re-emitted them
        # as duplicates (fuzz find, seeds 13493/73155/...). On replay the
        # popped partials are discarded below — their rows are already in
        # the committed manifests.
        tooluse_partial: dict[int, list[tuple[str, int, int]]] = {}
        if self.cfg.tool_usage and self.toolw:
            tsize_tu = self.cfg.tumbling_size_us
            for w in [w for w in self.toolw if w + tsize_tu <= self.wm]:
                by_tool = self.toolw.pop(w)
                tooluse_partial[int(w)] = sorted(
                    (t, int(v[0]), len(v[1])) for t, v in by_tool.items()
                )

        if not write_outputs:
            # resume replay of an already-committed epoch: state advances,
            # outputs (byte-identical, already in the manifest) are skipped
            # (incl. alert partials: the reducer state was restored from the
            # committed manifest, which already folded these windows)
            return {"tables": [], "ckpt_blob": None, "metrics": {"replayed": epoch}}

        # global burst-alert partials: per newly-final tumbling window, this
        # partition's total turn count — O(windows/epoch) scalars for the
        # driver's second-level reduce, never row- or conv-proportional
        win_partial: dict[int, tuple[int, int, int, int]] = {}
        if (
            self.cfg.alert_ratio > 0 or self.cfg.role_drift
        ) and win_tables["tumbling"] is not None:
            tt = win_tables["tumbling"]
            ws = tt.column("w_start").cast(pa.int64()).to_numpy()
            uw, inv = np.unique(ws, return_inverse=True)
            per_col = [
                np.bincount(inv, weights=tt.column(c).to_numpy()).astype(np.int64)
                for c in ("n_turns", "n_user", "n_assistant", "n_tool")
            ]
            win_partial = {
                int(w): (int(per_col[0][i]), int(per_col[1][i]),
                         int(per_col[2][i]), int(per_col[3][i]))
                for i, w in enumerate(uw)
            }

        # session-duration histogram partials: one integer count per TOUCHED
        # duration bin over this epoch's newly-closed sessions — O(bins)
        # scalars for the driver's cumulative running-quantile fold, never
        # session-proportional
        sessq_partial: dict[int, int] = {}
        if self.cfg.sess_quantiles and sess_table is not None and sess_table.num_rows:
            dur = (
                sess_table.column("session_end").cast(pa.int64()).to_numpy()
                - sess_table.column("session_start").cast(pa.int64()).to_numpy()
            )
            b = np.minimum(dur // self.cfg.sess_hist_bin_us,
                           self.cfg.sess_hist_bins - 1)
            ub, cb = np.unique(b, return_counts=True)
            sessq_partial = {int(x): int(c) for x, c in zip(ub, cb)}

        # windowed exact top-k partials: per newly-final tumbling window,
        # this partition's k most active convs. Complete for this
        # partition's convs (a conv lives in exactly one partition), so the
        # driver's merge of per-worker lists is the EXACT global top-k —
        # O(k) per window per partition, never conv-proportional.
        topk_partial: dict[int, list[tuple[str, int]]] = {}
        if self.cfg.topk_k > 0 and win_tables["tumbling"] is not None:
            tt = win_tables["tumbling"]
            ws_tk = tt.column("w_start").cast(pa.int64()).to_numpy()
            convs_tk = tt.column("conv_id").to_pylist()
            ns_tk = tt.column("n_turns").to_numpy()
            k = self.cfg.topk_k
            for w in np.unique(ws_tk):
                idx = np.flatnonzero(ws_tk == w)
                best = sorted(
                    ((convs_tk[i], int(ns_tk[i])) for i in idx),
                    key=lambda t: (-t[1], t[0]),
                )[:k]
                topk_partial[int(w)] = best

        # windowed conversation-activity histogram partials: per newly-final
        # tumbling window, this partition's conv counts per activity bucket
        # (complete for its convs) — one 5-int vector per window, never
        # conv-proportional. Bucket edges are exact integer searchsorted.
        convhist_partial: dict[int, list[int]] = {}
        if self.cfg.conv_hist and win_tables["tumbling"] is not None:
            tt = win_tables["tumbling"]
            ws_ch = tt.column("w_start").cast(pa.int64()).to_numpy()
            nt_ch = tt.column("n_turns").to_numpy()
            edges = np.array([2, 4, 8, 16], dtype=np.int64)
            bids = np.searchsorted(edges, nt_ch, side="right")
            for w in np.unique(ws_ch):
                m = ws_ch == w
                cnt = np.bincount(bids[m], minlength=5)
                convhist_partial[int(w)] = [int(x) for x in cnt]

        # (tooluse_partial was drained above, before the replay early-return:
        # per newly-final tumbling window, this partition's per-tool
        # (n_calls, n_distinct_convs) — complete for its convs, so the
        # driver's merge SUMS per (window, tool) to the exact global row.)

        # build the emitted tables but DON'T write them here: the (zstd)
        # parquet writes run as tasks on the map slots so the stateful
        # worker chain — the scaling-critical path — stays compute-only
        tables = []
        for stream, t in (
            ("tumbling", win_tables["tumbling"]),
            ("sliding", win_tables["sliding"]),
            ("sessions", sess_table),
            ("patterns", pat_table),
            ("count_windows", cw_table),
            ("resplat", rl_table),
            ("runs", run_table),
            ("noreply", nr_table),
        ):
            if t is not None and t.num_rows:
                tables.append((stream, self.partition, t))
        rows = out["joins"]
        if rows:
            rows.sort(key=lambda r: (r[0], r[1]))
            tables.append(("joins", self.partition, _rows_to_table(rows, JOIN_SCHEMA)))
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
        return {
            "tables": tables,
            "ckpt_blob": ckpt,
            "metrics": metrics,
            "win_partial": win_partial,
            "topk_partial": topk_partial,
            "sessq_partial": sessq_partial,
            "convhist_partial": convhist_partial,
            "tooluse_partial": tooluse_partial,
            "newconv_partial": newconv_partial,
        }

    def finish(self, epoch: int, do_checkpoint: bool = True) -> dict:
        empty = _empty_turns_table()
        wm = self.wm if not self.cfg.final_flush else POS_INF
        return self.process_epoch(epoch, wm, empty, do_checkpoint)

    # --- ingest (vectorized per batch) ---------------------------------------

    def _ingest(self, table: pa.Table) -> None:
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

        convs = self.convs
        names = uniques.tolist()

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
        if len(cn) > len(self.sess_counter):  # grow the per-conv session counter
            grown = np.zeros(len(cn), dtype=np.int64)
            grown[: len(self.sess_counter)] = self.sess_counter
            self.sess_counter = grown
        pcodes = pmap[codes]
        it = is_tool.astype(np.int64)

        self.win["tumbling"].merge(
            *_window_partials(
                pcodes, ts // tsize * tsize, ts, turn, text, is_user, is_assistant, it
            ),
            quantum=tsize,
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
            *(np.concatenate([sp[i] for sp in shift_parts]) for i in range(12)),
            quantum=slide,
        )

        # ---- sessions: columnar cluster partials → vectorized state merge ----
        n = len(ts)
        pend = self.pending
        # cluster breaks: same conv AND within gap of previous row
        brk = np.concatenate(
            ([True], (codes[1:] != codes[:-1]) | (np.diff(ts) > gap))
        )
        cl_starts = np.flatnonzero(brk)
        cl_ends = np.append(cl_starts[1:], n) - 1
        self.sess.merge(
            (
                pcodes[cl_starts],
                ts[cl_starts], turn[cl_starts].astype(np.int64), text[cl_starts],
                ts[cl_ends], turn[cl_ends].astype(np.int64), text[cl_ends],
                (cl_ends - cl_starts + 1).astype(np.int64),
            ),
            gap,
        )

        # ---- pattern state: append this batch's sorted arrays (matched
        # and evicted vectorized at emission time, watermark-driven) ----
        if cfg.pattern_roles:
            self.pat.add(pcodes, ts, turn, role)

        # ---- first-response latency: fold per-role first-turn minima ----
        if cfg.resp_latency:
            self.resplat.add(pcodes, ts, is_user, is_assistant, len(cn))

        # ---- run-length quantifier: append; compacted at emission time ----
        if cfg.run_min_len:
            self.runs.add(pcodes, ts, turn, role)

        # ---- absence/timeout: append pendings + retained assistants ----
        if cfg.noreply_timeout_us:
            self.noreply.add(
                pcodes, ts, turn.astype(np.int64), is_user, is_assistant
            )

        # ---- new-conversation acquisition: fold first-turn minima ----
        if cfg.new_convs:
            self.newconv.add(pcodes, ts, len(cn))

        # ---- windowed tool usage: fold (window, tool) partials. A row
        # contributes iff its tool value is non-null and non-empty; the
        # python loop touches one (window, tool) GROUP per batch, never a
        # row (grouping itself is pandas-C) ----
        if cfg.tool_usage:
            tsel = np.flatnonzero(pd.notna(tool) & (tool != ""))
            if len(tsel):
                df_t = pd.DataFrame(
                    {"w": ts[tsel] // tsize * tsize, "t": tool[tsel],
                     "c": pcodes[tsel]}
                )
                gb = df_t.groupby(["w", "t"], sort=False)["c"]
                cnts = gb.size()
                uniqs = gb.unique()
                for (w, t), n_c, cs in zip(
                    cnts.index, cnts.to_numpy(), uniqs.to_numpy()
                ):
                    ent = self.toolw.setdefault(int(w), {}).setdefault(
                        t, [0, set()]
                    )
                    ent[0] += int(n_c)
                    ent[1].update(int(c) for c in cs)

        # ---- count windows: append; folded at emission time ----
        if cfg.count_window_size:
            # lexicographic role rank: assistant(0) < tool(1) < user(2);
            # non-canonical roles last (3)
            rrank = np.where(
                is_assistant, 0, np.where(it, 1, np.where(is_user, 2, 3))
            ).astype(np.int64)
            self.cwin.add(
                pcodes, ts, turn.astype(np.int64), rrank, text,
                is_user, is_assistant, it,
            )

        # ---- join state: per-conv buffers, touched only for join rows ----
        a_idx = np.flatnonzero(is_assistant)
        if len(a_idx):
            a_ts = ts[a_idx].tolist()
            a_turn = turn[a_idx].tolist()
            a_text = text[a_idx].tolist()
            a_code = codes[a_idx].tolist()
            for i in range(len(a_ts)):
                conv = names[a_code[i]]
                st = convs.get(conv)
                if st is None:
                    st = convs[conv] = _ConvState()
                insort(st.assistants, (a_ts[i], a_turn[i], a_text[i]))
                # revisit once this assistant becomes prunable, so buffers
                # of convs that never see a tool are still evicted
                cand = a_ts[i] + bound + 1
                if cand < pend.get(conv, POS_INF):
                    pend[conv] = cand

        t_idx = np.flatnonzero(is_tool)
        if len(t_idx):
            t_ts = ts[t_idx].tolist()
            t_turn = turn[t_idx].tolist()
            t_text = text[t_idx].tolist()
            t_tool = tool[t_idx].tolist()
            t_code = codes[t_idx].tolist()
            for i in range(len(t_ts)):
                conv = names[t_code[i]]
                st = convs.get(conv)
                if st is None:
                    st = convs[conv] = _ConvState()
                deadline = t_ts[i] + bound
                heapq.heappush(
                    st.tools, (deadline, t_ts[i], t_turn[i], t_tool[i], t_text[i])
                )
                if deadline < pend.get(conv, POS_INF):
                    pend[conv] = deadline

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

    def _pop_patterns_table(self, wm: int) -> pa.Table | None:
        """Emit newly-final consecutive-role pattern matches, sorted."""
        popped = self.pat.pop_matches(tuple(self.cfg.pattern_roles), wm)
        if popped is None:
            return None
        import pyarrow.compute as pc

        code, s_turn, s_ts, e_ts = popped
        names = np.array(self.conv_names, dtype=object)[code]
        us = pa.timestamp("us")
        tbl = pa.Table.from_arrays(
            [
                pa.array(names, type=pa.string()),
                pa.array(s_turn, type=pa.int64()).cast(pa.int32()),
                pa.array(s_ts, type=pa.int64()).cast(us),
                pa.array(e_ts, type=pa.int64()).cast(us),
                pa.array(e_ts - s_ts, type=pa.int64()),
            ],
            schema=PATTERN_SCHEMA,
        )
        idx = pc.sort_indices(
            tbl,
            sort_keys=[
                ("conv_id", "ascending"),
                ("start_ts", "ascending"),
                ("start_turn_idx", "ascending"),
            ],
        )
        return tbl.take(idx)

    def _pop_count_windows_table(self, wm: int) -> pa.Table | None:
        """Emit newly-completed count windows (and partial tails at flush)."""
        N = self.cfg.count_window_size
        if not N:
            return None
        popped = self.cwin.pop_windows(N, wm, len(self.conv_names))
        if popped is None:
            return None
        import pyarrow.compute as pc

        code, wid, n, nu, na, nt, f_text, l_text, f_ts, l_ts = popped
        names = np.array(self.conv_names, dtype=object)[code]
        us = pa.timestamp("us")
        tbl = pa.Table.from_arrays(
            [
                pa.array(names, type=pa.string()),
                pa.array(wid, type=pa.int64()),
                pa.array(n, type=pa.int64()),
                pa.array(nu, type=pa.int64()),
                pa.array(na, type=pa.int64()),
                pa.array(nt, type=pa.int64()),
                pa.array(f_text, type=pa.string()),
                pa.array(l_text, type=pa.string()),
                pa.array(f_ts, type=pa.int64()).cast(us),
                pa.array(l_ts, type=pa.int64()).cast(us),
            ],
            schema=COUNT_WINDOW_SCHEMA,
        )
        idx = pc.sort_indices(
            tbl, sort_keys=[("conv_id", "ascending"), ("window_id", "ascending")]
        )
        return tbl.take(idx)

    def _emission_pass(self) -> dict[str, list]:
        """Per-conv emission for joins (windows and sessions are columnar,
        emitted via ``_pop_windows_table`` / ``_pop_sessions_table``).
        Deadlines in ``pending`` are exact for tools and lower bounds for
        assistant pruning — an extra no-op visit is harmless."""
        wm = self.wm
        out: dict[str, list] = {"joins": []}
        due = [c for c, dl in self.pending.items() if dl <= wm]
        for conv in due:
            st = self.convs.get(conv)
            if st is None:
                self.pending.pop(conv, None)
                continue
            next_dl = self._emit_conv(conv, st, wm, out)
            if not (st.tools or st.assistants):
                del self.convs[conv]
                self.pending.pop(conv, None)
            elif next_dl >= POS_INF:
                self.pending.pop(conv, None)
            else:
                self.pending[conv] = next_dl
        return out

    def _pop_resplat_table(self, wm: int) -> pa.Table | None:
        """Emit newly-final first-response-latency rows as a sorted Arrow
        table (one row per conversation, ever)."""
        popped = self.resplat.pop_final(wm)
        if popped is None:
            return None
        import pyarrow.compute as pc

        code, u_min, a_min = popped
        names = np.array(self.conv_names, dtype=object)[code]
        us = pa.timestamp("us")
        tbl = pa.Table.from_arrays(
            [
                pa.array(names, type=pa.string()),
                pa.array(u_min, type=pa.int64()).cast(us),
                pa.array(a_min, type=pa.int64()).cast(us),
                pa.array(a_min - u_min, type=pa.int64()),
            ],
            schema=RESPLAT_SCHEMA,
        )
        return tbl.take(pc.sort_indices(tbl, sort_keys=[("conv_id", "ascending")]))

    def _pop_noreply_table(self, wm: int) -> pa.Table | None:
        """Emit newly-final absence rows (user turns whose reply window the
        watermark has strictly passed) as a sorted Arrow table."""
        popped = self.noreply.pop_timeouts(self.cfg.noreply_timeout_us, wm)
        if popped is None:
            return None
        import pyarrow.compute as pc

        code, ts_arr, turn_arr = popped
        names = np.array(self.conv_names, dtype=object)[code]
        us = pa.timestamp("us")
        tbl = pa.Table.from_arrays(
            [
                pa.array(names, type=pa.string()),
                pa.array(ts_arr, type=pa.int64()).cast(us),
                pa.array(turn_arr, type=pa.int64()),
                pa.array(
                    ts_arr + self.cfg.noreply_timeout_us, type=pa.int64()
                ).cast(us),
            ],
            schema=NOREPLY_SCHEMA,
        )
        # sort by conv_id STRING like every other emitted stream (the pop's
        # lexsort is internal conv-code order — interning order, not name
        # order)
        return tbl.take(
            pc.sort_indices(
                tbl,
                sort_keys=[
                    ("conv_id", "ascending"), ("ts", "ascending"),
                    ("turn_idx", "ascending"),
                ],
            )
        )

    def _pop_runs_table(self, wm: int) -> pa.Table | None:
        """Emit newly-maximal same-role runs (length >= cfg.run_min_len) as
        a sorted Arrow table."""
        popped = self.runs.pop_runs(self.cfg.run_min_len, wm, len(self.conv_names))
        if popped is None:
            return None
        import pyarrow.compute as pc

        code, role, rlen, s_ts, s_turn, e_ts, e_turn = popped
        names = np.array(self.conv_names, dtype=object)[code]
        roles = np.array(self.runs.role_names, dtype=object)[role]
        us = pa.timestamp("us")
        tbl = pa.Table.from_arrays(
            [
                pa.array(names, type=pa.string()),
                pa.array(roles, type=pa.string()),
                pa.array(rlen, type=pa.int64()),
                pa.array(s_ts, type=pa.int64()).cast(us),
                pa.array(e_ts, type=pa.int64()).cast(us),
                pa.array(s_turn, type=pa.int64()),
                pa.array(e_turn, type=pa.int64()),
            ],
            schema=RUNS_SCHEMA,
        )
        idx = pc.sort_indices(
            tbl,
            sort_keys=[("conv_id", "ascending"), ("start_ts", "ascending"),
                       ("start_turn_idx", "ascending")],
        )
        return tbl.take(idx)

    def _pop_sessions_table(self, gap: int, wm: int) -> pa.Table | None:
        """Emit all closed sessions as a sorted Arrow table; per-conv session
        ids continue from the persistent per-code counter."""
        popped = self.sess.pop_closed(gap, wm)
        if popped is None:
            return None
        import pyarrow.compute as pc

        code, s_ts, s_text, e_ts, e_text, n = popped
        firsts = np.flatnonzero(np.concatenate(([True], code[1:] != code[:-1])))
        sizes = np.diff(np.append(firsts, len(code)))
        rank = np.arange(len(code)) - np.repeat(firsts, sizes)
        sid = self.sess_counter[code] + rank
        self.sess_counter[code[firsts]] += sizes
        names = np.array(self.conv_names, dtype=object)[code]
        us = pa.timestamp("us")
        tbl = pa.Table.from_arrays(
            [
                pa.array(names, type=pa.string()),
                pa.array(sid, type=pa.int64()),
                pa.array(s_ts, type=pa.int64()).cast(us),
                pa.array(e_ts, type=pa.int64()).cast(us),
                pa.array(n, type=pa.int64()),
                pa.array(s_text, type=pa.string()),
                pa.array(e_text, type=pa.string()),
            ],
            schema=SESSION_SCHEMA,
        )
        idx = pc.sort_indices(
            tbl, sort_keys=[("conv_id", "ascending"), ("session_id", "ascending")]
        )
        return tbl.take(idx)

    def _emit_conv(self, conv: str, st: _ConvState, wm: int, out: dict) -> int:
        cfg = self.cfg
        next_dl = POS_INF

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
        if assistants:
            # revisit when the newest assistant becomes prunable, so a conv
            # that never sees another tool still drains and gets evicted
            next_dl = min(next_dl, assistants[-1][0] + bound + 1)

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


def _fold_topk(parts: dict[int, list[tuple[str, int]]], k: int) -> None:
    """Trim each window's merged per-partition top-k lists back to k,
    in place. Convs are partition-disjoint, so merging COMPLETE local lists
    and re-trimming is exact. Ties: (n_turns desc, conv_id asc)."""
    for lst in parts.values():
        lst.sort(key=lambda t: (-t[1], t[0]))
        del lst[k:]


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
        win_partials: dict[int, tuple[int, int, int, int]] = {}
        topk_partials: dict[int, list[tuple[str, int]]] = {}
        sessq_partials: dict[int, int] = {}
        convhist_partials: dict[int, list[int]] = {}
        tooluse_partials: dict[int, dict[str, list[int]]] = {}
        newconv_partials: dict[int, int] = {}
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
            for w, t in r.get("win_partial", {}).items():
                prev = win_partials.get(w, (0, 0, 0, 0))
                win_partials[w] = tuple(a + b for a, b in zip(prev, t))
            for w, lst in r.get("topk_partial", {}).items():
                topk_partials.setdefault(w, []).extend(lst)
            for b, c in r.get("sessq_partial", {}).items():
                sessq_partials[b] = sessq_partials.get(b, 0) + c
            for w, v in r.get("convhist_partial", {}).items():
                prev = convhist_partials.get(w)
                convhist_partials[w] = (
                    [a + b2 for a, b2 in zip(prev, v)] if prev else list(v)
                )
            for w, lst in r.get("tooluse_partial", {}).items():
                cur = tooluse_partials.setdefault(w, {})
                for t, n_c, n_v in lst:
                    prev_t = cur.get(t)
                    cur[t] = (
                        [prev_t[0] + n_c, prev_t[1] + n_v]
                        if prev_t else [n_c, n_v]
                    )
            for w, c in r.get("newconv_partial", {}).items():
                newconv_partials[w] = newconv_partials.get(w, 0) + c
        _fold_topk(topk_partials, self.cfg.topk_k)
        # two returns (num_returns=2): small meta for the driver's commit;
        # emitted tables + checkpoint blobs go to the off-worker writer task
        # — the driver never pulls the heavy payload
        return (
            {"metrics": metrics, "win_partials": win_partials,
             "topk_partials": topk_partials, "sessq_partials": sessq_partials,
             "convhist_partials": convhist_partials,
             "tooluse_partials": tooluse_partials,
             "newconv_partials": newconv_partials},
            {"tables": out_tables, "ckpt_blobs": blobs},
        )

    def finish(self, epoch: int, do_checkpoint: bool = True) -> tuple:
        out_tables, blobs, metrics = [], [], []
        win_partials: dict[int, tuple[int, int, int, int]] = {}
        topk_partials: dict[int, list[tuple[str, int]]] = {}
        sessq_partials: dict[int, int] = {}
        convhist_partials: dict[int, list[int]] = {}
        tooluse_partials: dict[int, dict[str, list[int]]] = {}
        newconv_partials: dict[int, int] = {}
        for pid in self.pids:
            r = self.impls[pid].finish(epoch, do_checkpoint)
            out_tables.extend(r["tables"])
            if r["ckpt_blob"]:
                blobs.append(r["ckpt_blob"])
            metrics.append(r["metrics"])
            for w, t in r.get("win_partial", {}).items():
                prev = win_partials.get(w, (0, 0, 0, 0))
                win_partials[w] = tuple(a + b for a, b in zip(prev, t))
            for w, lst in r.get("topk_partial", {}).items():
                topk_partials.setdefault(w, []).extend(lst)
            for b, c in r.get("sessq_partial", {}).items():
                sessq_partials[b] = sessq_partials.get(b, 0) + c
            for w, v in r.get("convhist_partial", {}).items():
                prev = convhist_partials.get(w)
                convhist_partials[w] = (
                    [a + b2 for a, b2 in zip(prev, v)] if prev else list(v)
                )
            for w, lst in r.get("tooluse_partial", {}).items():
                cur = tooluse_partials.setdefault(w, {})
                for t, n_c, n_v in lst:
                    prev_t = cur.get(t)
                    cur[t] = (
                        [prev_t[0] + n_c, prev_t[1] + n_v]
                        if prev_t else [n_c, n_v]
                    )
            for w, c in r.get("newconv_partial", {}).items():
                newconv_partials[w] = newconv_partials.get(w, 0) + c
        _fold_topk(topk_partials, self.cfg.topk_k)
        return (
            {"metrics": metrics, "win_partials": win_partials,
             "topk_partials": topk_partials, "sessq_partials": sessq_partials,
             "convhist_partials": convhist_partials,
             "tooluse_partials": tooluse_partials,
             "newconv_partials": newconv_partials},
            {"tables": out_tables, "ckpt_blobs": blobs},
        )

    def restore(self, by_pid: dict[int, str]) -> None:
        for pid, rel in by_pid.items():
            self.impls[pid].restore(rel)

    def ping(self) -> bool:
        return True
