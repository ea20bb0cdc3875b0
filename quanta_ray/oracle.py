"""Single-threaded oracle interpreter — THE semantic spec of the engine.

Plain Python over pyarrow, row at a time, no Ray. Every distributed pipeline
in ``quanta_ray.engine`` must produce row-for-row identical output to this
interpreter for the same input stream + config (per ``BASELINE.json``:
"per-turn text equality under stable (conv_id, turn_idx) ordering").

This mirrors the reference's own minimal semantic harness — driving
``Runner.pushFrame`` directly with scripted stages
(``/root/reference/internal/pipeline/runner_test.go:69-142``) — extended with
the north-rule CEP contracts the reference lacks.

Pinned semantics (all time values are int64 epoch-microseconds):

- **Stream**: an ordered list of epoch tables; arrival order = (epoch, row).
- **Watermark** (deterministic, epoch-granular): ``max_ts_seen`` is the max
  ``ts`` over all rows in epochs ``<= e``;
  ``wm_e = max_ts_seen - allowed_lateness``. A row in epoch ``e`` is **late**
  iff ``ts < wm_{e-1}``; late rows are dropped and counted (reference analog:
  DROP status ack-and-discard, ``internal/pipeline/runner.go:161-164``) and do
  not advance ``max_ts_seen``.
- **Transform chain**: ordered stages with OK/DROP/RETRY/ERROR status
  semantics and 1→0..N fan-out (``runner.go:120-200``); RETRY/ERROR retried
  ``attempts`` times then dropped-with-count (``runner.go:135-176``).
- **Tumbling window**: key ``(conv_id, w_start = ts // size * size)``; a
  window is emitted exactly once, at the end of the first epoch whose
  ``wm_e >= w_start + size``.
- **Sliding window**: row belongs to every ``w_start = k*slide`` with
  ``w_start <= ts < w_start + size``; emission rule as tumbling.
- **Session window**: per conv, rows sorted by ``(ts, turn_idx)``; a new
  session starts when ``ts - prev_ts > gap``; a session is emitted when
  ``wm_e > session_end + gap`` (no on-time row can extend it afterwards).
  ``session_id`` is the 0-based index of the session within its conversation
  in final emission order.
- **Sequence pattern** (MATCH_RECOGNIZE family): per conv, rows sorted by
  ``(ts, turn_idx)``; every run of ``len(pattern_roles)`` ADJACENT rows whose
  roles equal ``pattern_roles`` is a match, emitted at the end of the first
  epoch with ``wm > end_ts`` (strict: once past, no on-time row can ever
  sort at-or-before the run's last element, so adjacency is final).
  Patterns with adjacent-equal roles are unsupported under fan-out
  duplication (identical matches would collapse in this set-keyed spec).
- **Count window**: per conv, rows sorted by ``(ts, turn_idx)``; window
  ``w`` is rows ``[wN, (w+1)N)`` of that order. A FULL window emits at the
  end of the first epoch with ``wm > last row ts`` (strict; every earlier
  position is then insert-proof); the partial tail emits only at final
  flush. ``count_window_size=0`` disables the stream.
- **Stream-stream join**: a ``tool`` row at turn ``k`` resolves at the end of
  the first epoch with ``wm_e >= tool_ts + bound``; its match is the
  ``assistant`` row with minimal ``(ts, turn_idx)`` among buffered on-time
  assistants of the same conv with ``turn_idx > k`` and
  ``tool_ts <= ts <= tool_ts + bound``; if none, an unmatched row
  (``matched=false``, null assistant fields) is emitted (side-expiry).
- **End of stream** (``final_flush``): watermark jumps to +inf; all remaining
  windows/sessions/tool rows emit under the same rules.

Outputs (dicts of python lists, converted to Arrow by ``run_oracle``):
``turns`` (transformed on-time rows), ``tumbling``, ``sliding``, ``sessions``,
``joins``, and a ``metrics`` dict. All outputs sorted by their natural key.
"""

from __future__ import annotations

from bisect import bisect_right
from collections import defaultdict
from typing import Any, Iterable

import pyarrow as pa

from .config import CEPConfig
from .schema import (
    COUNT_WINDOW_SCHEMA,
    JOIN_SCHEMA,
    PATTERN_SCHEMA,
    RESPLAT_SCHEMA,
    RUNS_SCHEMA,
    SESSION_SCHEMA,
    WINDOW_AGG_SCHEMA,
)


class OracleState:
    def __init__(self, cfg: CEPConfig, stages: list[Any] | None = None):
        self.cfg = cfg
        self.stages = stages or []
        self.max_ts_seen = -(1 << 62)
        self.wm = -(1 << 62)
        # per conv: list of (ts, turn_idx, role, text, tool) on-time rows
        self.buf: dict[str, list[tuple]] = defaultdict(list)
        self.emitted_tumbling: set[tuple[str, int]] = set()
        self.emitted_sliding: set[tuple[str, int]] = set()
        self.emitted_sessions: set[tuple[str, int, int]] = set()  # (conv, start, end)
        self.resolved_tools: set[tuple[str, int]] = set()
        # (conv, ts1, turn1): unique per match — adjacency is final once
        # emitted, and identical overlapping matches are impossible for
        # patterns without adjacent-equal roles (duplicate rows sort
        # contiguously, which breaks any distinct-role sequence)
        self.emitted_patterns: set[tuple] = set()
        self.emitted_count_windows: set[tuple[str, int]] = set()
        self.session_counter: dict[str, int] = defaultdict(int)
        self.metrics = {
            "n_input": 0,
            "n_late_dropped": 0,
            "n_stage_dropped": 0,
            "n_turns_out": 0,
        }
        self.epoch_idx = 0
        self.late: list[dict] = []
        self.turns: list[dict] = []
        self.tumbling: list[dict] = []
        self.sliding: list[dict] = []
        self.sessions: list[dict] = []
        self.joins: list[dict] = []
        self.patterns: list[dict] = []
        self.count_windows: list[dict] = []


def _ts_us(v) -> int:
    """pyarrow timestamp scalar → int64 epoch-us."""
    return v.cast(pa.int64()).as_py()


def process_epoch(st: OracleState, table: pa.Table) -> None:
    cfg = st.cfg
    rows = table.to_pylist()
    # normalize ts to int us
    ts_col = table.column("ts").cast(pa.int64()).to_pylist()
    for r, t in zip(rows, ts_col):
        r["ts"] = t

    epoch_max = st.max_ts_seen
    for r in rows:
        st.metrics["n_input"] += 1
        if r["ts"] < st.wm:  # late vs wm at arrival (= wm after previous epoch)
            st.metrics["n_late_dropped"] += 1
            if cfg.late_output:
                # side output: the RAW row (pre-transform), its arrival
                # epoch and the watermark it was late against
                st.late.append(
                    {
                        "conv_id": r["conv_id"],
                        "turn_idx": r["turn_idx"],
                        "role": r["role"],
                        "text": r["text"],
                        "tool": r["tool"],
                        "ts": r["ts"],
                        "epoch": st.epoch_idx,
                        "wm": st.wm,
                    }
                )
            continue
        epoch_max = max(epoch_max, r["ts"])
        # transform chain (status semantics + fan-out)
        out_rows = [r]
        dropped = False
        for stage in st.stages:
            nxt: list[dict] = []
            for rr in out_rows:
                produced = stage.apply_row(dict(rr))
                if produced is None:
                    st.metrics["n_stage_dropped"] += 1
                else:
                    nxt.extend(produced)
            out_rows = nxt
            if not out_rows:
                dropped = True
                break
        if dropped:
            continue
        for rr in out_rows:
            st.metrics["n_turns_out"] += 1
            st.turns.append(rr)
            st.buf[rr["conv_id"]].append(
                (rr["ts"], rr["turn_idx"], rr["role"], rr["text"], rr["tool"])
            )
    st.max_ts_seen = epoch_max
    st.wm = st.max_ts_seen - cfg.allowed_lateness_us
    st.epoch_idx += 1
    _emit(st, st.wm)


def finish(st: OracleState) -> None:
    if st.cfg.final_flush:
        _emit(st, 1 << 62)


def _agg(conv: str, w_start: int, w_end: int, rows: list[tuple]) -> dict:
    rows = sorted(rows)  # (ts, turn_idx, ...) order
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


def _emit(st: OracleState, wm: int) -> None:
    cfg = st.cfg
    size, slide = cfg.sliding_size_us, cfg.sliding_slide_us
    tsize = cfg.tumbling_size_us
    for conv, rows in st.buf.items():
        if not rows:
            continue
        # --- tumbling ---
        by_w: dict[int, list[tuple]] = defaultdict(list)
        for r in rows:
            by_w[r[0] // tsize * tsize].append(r)
        for w_start, wrows in by_w.items():
            if w_start + tsize <= wm and (conv, w_start) not in st.emitted_tumbling:
                st.emitted_tumbling.add((conv, w_start))
                st.tumbling.append(_agg(conv, w_start, w_start + tsize, wrows))
        # --- sliding ---
        by_s: dict[int, list[tuple]] = defaultdict(list)
        for r in rows:
            ts = r[0]
            k_hi = ts // slide
            k_lo = (ts - size) // slide + 1
            for k in range(k_lo, k_hi + 1):
                by_s[k * slide].append(r)
        for w_start, wrows in by_s.items():
            if w_start + size <= wm and (conv, w_start) not in st.emitted_sliding:
                st.emitted_sliding.add((conv, w_start))
                st.sliding.append(_agg(conv, w_start, w_start + size, wrows))
        # --- sessions ---
        srows = sorted(rows)
        sess: list[list[tuple]] = []
        for r in srows:
            if sess and r[0] - sess[-1][-1][0] <= cfg.session_gap_us:
                sess[-1].append(r)
            else:
                sess.append([r])
        for s in sess:
            s_start, s_end = s[0][0], s[-1][0]
            key = (conv, s_start, s_end)
            if s_end + cfg.session_gap_us < wm and key not in st.emitted_sessions:
                st.emitted_sessions.add(key)
                st.sessions.append(
                    {
                        "conv_id": conv,
                        "session_id": st.session_counter[conv],
                        "session_start": s_start,
                        "session_end": s_end,
                        "n_turns": len(s),
                        "first_text": s[0][3],
                        "last_text": s[-1][3],
                    }
                )
                st.session_counter[conv] += 1
        # --- count windows: N-row chunks in final order ---
        CN = cfg.count_window_size
        if CN:
            for w0 in range(0, len(srows), CN):
                win = srows[w0 : w0 + CN]
                wid = w0 // CN
                full = len(win) == CN
                if not ((full and win[-1][0] < wm) or wm >= (1 << 62)):
                    continue  # partial tails emit only at final flush
                key = (conv, wid)
                if key in st.emitted_count_windows:
                    continue
                st.emitted_count_windows.add(key)
                st.count_windows.append(
                    {
                        "conv_id": conv,
                        "window_id": wid,
                        "n_turns": len(win),
                        "n_user": sum(1 for r in win if r[2] == "user"),
                        "n_assistant": sum(1 for r in win if r[2] == "assistant"),
                        "n_tool": sum(1 for r in win if r[2] == "tool"),
                        "first_text": win[0][3],
                        "last_text": win[-1][3],
                        "min_ts": win[0][0],
                        "max_ts": win[-1][0],
                    }
                )
        # --- pattern: consecutive-role sequence matches ---
        pat = cfg.pattern_roles
        L = len(pat)
        if L:
            for i in range(len(srows) - L + 1):
                win = srows[i : i + L]
                if any(win[j][2] != pat[j] for j in range(L)):
                    continue
                end_ts = win[-1][0]
                if end_ts >= wm:  # strict: at ts == wm a row could tie-insert
                    continue
                key = (conv, win[0][0], win[0][1])
                if key in st.emitted_patterns:
                    continue
                st.emitted_patterns.add(key)
                st.patterns.append(
                    {
                        "conv_id": conv,
                        "start_turn_idx": win[0][1],
                        "start_ts": win[0][0],
                        "end_ts": end_ts,
                        "span_us": end_ts - win[0][0],
                    }
                )
        # --- join: resolve tool rows past their deadline ---
        assistants = sorted(r for r in srows if r[2] == "assistant")
        for r in srows:
            if r[2] != "tool":
                continue
            key = (conv, r[1])
            if key in st.resolved_tools or r[0] + cfg.join_bound_us > wm:
                continue
            st.resolved_tools.add(key)
            match = None
            for a in assistants:
                if a[1] > r[1] and r[0] <= a[0] <= r[0] + cfg.join_bound_us:
                    match = a
                    break
            st.joins.append(
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


def _to_table(rows: list[dict], schema: pa.Schema, sort_keys: list[str]) -> pa.Table:
    rows = sorted(rows, key=lambda r: tuple((r[k] is None, r[k]) for k in sort_keys))
    if not rows:
        return schema.empty_table()
    cols = {}
    for f in schema:
        vals = [r.get(f.name) for r in rows]
        if pa.types.is_timestamp(f.type):
            cols[f.name] = pa.array(vals, type=pa.int64()).cast(f.type)
        else:
            cols[f.name] = pa.array(vals, type=f.type)
    return pa.Table.from_arrays([cols[f.name] for f in schema], schema=schema)


def run_oracle(
    epochs: Iterable[pa.Table],
    cfg: CEPConfig,
    stages: list[Any] | None = None,
) -> dict[str, Any]:
    """Run the interpreter over an ordered epoch stream; return Arrow outputs."""
    st = OracleState(cfg, stages)
    # (epoch index, #sessions closed so far) after each epoch — the
    # sessquant stream's emission schedule (final flush = epoch n_epochs,
    # matching the engine's finish commit)
    sess_marks: list[tuple[int, int]] = []
    n_epochs = 0
    for t in epochs:
        process_epoch(st, t)
        sess_marks.append((n_epochs, len(st.sessions)))
        n_epochs += 1
    finish(st)
    sess_marks.append((n_epochs, len(st.sessions)))

    turn_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    # transformed rows may carry extra columns added by stages; infer the
    # arrow type from the first non-None value (stages emit int64/float64/
    # string in both paths)
    extra = sorted(
        {k for r in st.turns for k in r} - {f.name for f in turn_schema} - {"_epoch", "_offset"}
    )
    for name in extra:
        sample = next((r[name] for r in st.turns if r.get(name) is not None), None)
        if isinstance(sample, bool):
            typ = pa.bool_()
        elif isinstance(sample, int):
            typ = pa.int64()
        elif isinstance(sample, float):
            typ = pa.float64()
        else:
            typ = pa.string()
        turn_schema = turn_schema.append(pa.field(name, typ))
    # global burst alerts: the reference semantics are a pure function of
    # the FINAL tumbling output (window finality timing never changes which
    # windows exist or their counts), so the oracle derives them from the
    # tumbling rows — sum per w_start, chain the ratio predicate through
    # non-empty windows in w_start order (engine analog: runner commit fold).
    alerts: list[dict] = []
    if cfg.alert_ratio > 0:
        scope_key = {"all": "n_turns", "user": "n_user",
                     "assistant": "n_assistant", "tool": "n_tool"}
        totals: dict[int, dict[str, int]] = {}
        for r in st.tumbling:
            t = totals.setdefault(r["w_start"], {s: 0 for s in cfg.alert_scopes})
            for s in cfg.alert_scopes:
                t[s] += r[scope_key[s]]
        chains = {s: (None, 0) for s in cfg.alert_scopes}
        for w in sorted(totals):
            for s in cfg.alert_scopes:
                n = totals[w][s]
                if n == 0:
                    continue  # empty for this scope: chain unmoved
                last_w, last_n = chains[s]
                if last_w is not None and n >= cfg.alert_ratio * last_n:
                    alerts.append(
                        {"scope": s, "w_start": w, "n_turns": n, "prev_n": last_n}
                    )
                chains[s] = (w, n)

    # role-mix drift: like alerts, a pure function of the FINAL tumbling
    # output — global per-window role counts, chained through non-empty
    # windows in w_start order; each emitted row is the exact
    # cross-multiplied integer L1 distance vs the previous non-empty
    # window (engine analog: runner commit fold over the same alert
    # partials, chain state manifest-carried).
    drift: list[dict] = []
    if cfg.role_drift:
        totals_d: dict[int, list[int]] = {}
        for r in st.tumbling:
            t_d = totals_d.setdefault(r["w_start"], [0, 0, 0, 0])
            t_d[0] += r["n_turns"]
            t_d[1] += r["n_user"]
            t_d[2] += r["n_assistant"]
            t_d[3] += r["n_tool"]
        last_w: int | None = None
        last: list[int] = [0, 0, 0, 0]
        for w in sorted(totals_d):
            cur = totals_d[w]
            n_tot = cur[0]
            if n_tot == 0:
                continue  # empty window: chain unmoved
            if last_w is not None:
                m_tot = last[0]
                l1 = sum(abs(cur[i] * m_tot - last[i] * n_tot) for i in (1, 2, 3))
                drift.append(
                    {
                        "w_start": w,
                        "prev_w": last_w,
                        "n_turns": n_tot,
                        "prev_turns": m_tot,
                        "l1_num": l1,
                        "l1_den": n_tot * m_tot,
                    }
                )
            last_w, last = w, cur

    # windowed exact top-k: like alerts, a pure function of the FINAL
    # tumbling output — per w_start, the k most active convs, ties broken
    # (n_turns desc, conv_id asc) (engine analog: per-partition local top-k
    # merged at the runner's commit fold).
    topk: list[dict] = []
    if cfg.topk_k > 0:
        byw: dict[int, list[tuple[int, str]]] = {}
        for r in st.tumbling:
            byw.setdefault(r["w_start"], []).append((r["n_turns"], r["conv_id"]))
        for w in sorted(byw):
            best = sorted(byw[w], key=lambda t: (-t[0], t[1]))[: cfg.topk_k]
            topk += [
                {"w_start": w, "rank": i, "conv_id": c, "n_turns": n}
                for i, (n, c) in enumerate(best, 1)
            ]

    # windowed conversation-activity histogram: like topk, a pure function
    # of the FINAL tumbling output — per w_start, conv counts per activity
    # bucket (exact integer searchsorted edges), all five buckets emitted.
    convhist: list[dict] = []
    if cfg.conv_hist:
        from .schema import CONVHIST_BUCKETS

        edges = (2, 4, 8, 16)
        byw_ch: dict[int, list[int]] = {}
        for r in st.tumbling:
            v = byw_ch.setdefault(r["w_start"], [0] * 5)
            n = r["n_turns"]
            b = 0
            while b < 4 and n >= edges[b]:
                b += 1
            v[b] += 1
        for w in sorted(byw_ch):
            convhist += [
                {"w_start": w, "bucket": lbl, "n_convs": byw_ch[w][i]}
                for i, lbl in enumerate(CONVHIST_BUCKETS)
            ]

    # windowed tool usage: a pure function of the final on-time rows — per
    # (tumbling window, non-empty tool name), the call count and the number
    # of distinct conversations, for every window the final watermark
    # closed (all windows at final flush). Engine analog: per-partition
    # (window, tool) partials summed at the runner's commit fold (convs are
    # partition-disjoint, so the distinct-conv sum is exact).
    tooluse: list[dict] = []
    if cfg.tool_usage:
        final_wm = (1 << 62) if cfg.final_flush else st.wm
        tsize = cfg.tumbling_size_us
        agg_tu: dict[tuple[int, str], list] = {}
        for conv, rows in st.buf.items():
            for (t, _ti, _role, _tx, tl) in rows:
                if tl is None or tl == "":
                    continue
                w = t // tsize * tsize
                if w + tsize > final_wm:
                    continue
                ent = agg_tu.setdefault((w, tl), [0, set()])
                ent[0] += 1
                ent[1].add(conv)
        tooluse = [
            {"w_start": w, "tool": tl, "n_calls": v[0], "n_convs": len(v[1])}
            for (w, tl), v in sorted(agg_tu.items())
        ]

    # running session-duration quantiles: replay the engine's commit-order
    # fold — per epoch that closed >= 1 session, fold those durations into
    # the cumulative histogram and emit the shared-spec estimates
    # (state/sessquant.quantile_rows — the same function the runner calls,
    # so interpolation is bit-identical by construction).
    sessquant: list[dict] = []
    if cfg.sess_quantiles:
        from .state.sessquant import quantile_rows

        counts = [0] * cfg.sess_hist_bins
        prev = 0
        for e, n in sess_marks:
            if n == prev:
                continue
            for s in st.sessions[prev:n]:
                b = min(
                    (s["session_end"] - s["session_start"]) // cfg.sess_hist_bin_us,
                    cfg.sess_hist_bins - 1,
                )
                counts[b] += 1
            prev = n
            sessquant += [
                {"epoch": e, "q": q, "est_duration_us": est, "n_sessions": n}
                for q, est in quantile_rows(
                    counts, cfg.sess_quantiles, cfg.sess_hist_bin_us
                )
            ]

    # first-response latency: one row per conversation that has both a user
    # and an assistant turn — per-role first-turn minima over all on-time
    # rows, final (and emitted once) when the watermark passes both minima.
    resplat: list[dict] = []
    if cfg.resp_latency:
        final_wm = (1 << 62) if cfg.final_flush else st.wm
        for conv, rows in st.buf.items():
            u_ts = [t for (t, _ti, role, _tx, _tl) in rows if role == "user"]
            a_ts = [t for (t, _ti, role, _tx, _tl) in rows if role == "assistant"]
            if u_ts and a_ts:
                u, a = min(u_ts), min(a_ts)
                if u <= final_wm and a <= final_wm:
                    resplat.append(
                        {
                            "conv_id": conv,
                            "first_user_ts": u,
                            "first_assistant_ts": a,
                            "latency_us": a - u,
                        }
                    )

    # run-length quantifier: maximal same-role runs over each conv's final
    # (ts, turn_idx, role)-sorted sequence (lexicographic role tie-break —
    # the engine's _PatternState/_RunState convention) with length >=
    # run_min_len. A run is emitted iff a different-role row follows it
    # strictly below the final watermark (nothing can ever insert under
    # wm), or unconditionally at final flush, which also drains the
    # still-open last runs.
    runs: list[dict] = []
    if cfg.run_min_len > 0:
        final_wm = (1 << 62) if cfg.final_flush else st.wm
        for conv, rows in st.buf.items():
            seq = sorted(rows, key=lambda r: (r[0], r[1], r[2]))
            i, n = 0, len(seq)
            while i < n:
                j = i
                while j + 1 < n and seq[j + 1][2] == seq[i][2]:
                    j += 1
                broken_final = j + 1 < n and seq[j + 1][0] < final_wm
                at_flush = j + 1 == n and cfg.final_flush
                if j - i + 1 >= cfg.run_min_len and (broken_final or at_flush):
                    runs.append(
                        {
                            "conv_id": conv,
                            "role": seq[i][2],
                            "run_len": j - i + 1,
                            "start_ts": seq[i][0],
                            "end_ts": seq[j][0],
                            "start_turn_idx": seq[i][1],
                            "end_turn_idx": seq[j][1],
                        }
                    )
                i = j + 1

    # new-conversation acquisition: per tumbling window, the number of
    # conversations whose GLOBAL first turn (min ts over all on-time rows)
    # falls in it; a window emits once the watermark passes its end
    # (engine analog: per-partition newly-final first-turn counts, summed
    # by the driver into manifest-carried per-window accumulators).
    newconvs: list[dict] = []
    if cfg.new_convs:
        tsz = cfg.tumbling_size_us
        final_wm = (1 << 62) if cfg.final_flush else st.wm
        by_w: dict[int, int] = {}
        for _conv, rows in st.buf.items():
            if not rows:
                continue
            m = min(t for (t, _ti, _r, _tx, _tl) in rows)
            by_w[m // tsz * tsz] = by_w.get(m // tsz * tsz, 0) + 1
        for w in sorted(by_w):
            if w + tsz <= final_wm:
                newconvs.append({"w_start": w, "n_new_convs": by_w[w]})

    # absence/timeout (notFollowedBy): a USER turn with NO assistant turn of
    # the same conv in (ts, ts + timeout] — half-open (simultaneous does not
    # answer), inclusive at +timeout — emitted once the watermark STRICTLY
    # passes ts + timeout (afterwards any accepted assistant row has
    # a_ts >= wm and can no longer answer). Set-keyed on (conv, ts, turn):
    # exact fan-out duplicates emit one row (engine analog: _NoReplyState's
    # unique-at-emission), matching the pattern stream's duplicate spec.
    noreply: list[dict] = []
    if cfg.noreply_timeout_us > 0:
        T = cfg.noreply_timeout_us
        final_wm = (1 << 62) if cfg.final_flush else st.wm
        seen_nr: set[tuple] = set()
        for conv, rows in st.buf.items():
            a_ts = sorted(t for (t, _ti, role, _tx, _tl) in rows if role == "assistant")
            for (t, ti, role, _tx, _tl) in rows:
                if role != "user" or t + T >= final_wm:
                    continue
                key = (conv, t, ti)
                if key in seen_nr:
                    continue
                i = bisect_right(a_ts, t)  # first assistant with ts > t
                if i < len(a_ts) and a_ts[i] <= t + T:
                    continue  # answered
                seen_nr.add(key)
                noreply.append(
                    {"conv_id": conv, "ts": t, "turn_idx": ti, "deadline": t + T}
                )

    from .schema import (
        ALERT_SCHEMA, CONVHIST_SCHEMA, DRIFT_SCHEMA, LATE_SCHEMA,
        NEWCONV_SCHEMA, NOREPLY_SCHEMA, SESSQUANT_SCHEMA, TOOLUSE_SCHEMA,
        TOPK_SCHEMA,
    )

    return {
        "turns": _to_table(st.turns, turn_schema, ["conv_id", "turn_idx"]),
        "alerts": _to_table(alerts, ALERT_SCHEMA, ["w_start", "scope"]),
        "drift": _to_table(drift, DRIFT_SCHEMA, ["w_start"]),
        "topk": _to_table(topk, TOPK_SCHEMA, ["w_start", "rank"]),
        "convhist": _to_table(convhist, CONVHIST_SCHEMA, ["w_start", "bucket"]),
        "tooluse": _to_table(tooluse, TOOLUSE_SCHEMA, ["w_start", "tool"]),
        "late": _to_table(st.late, LATE_SCHEMA, ["conv_id", "turn_idx", "ts"]),
        "newconvs": _to_table(newconvs, NEWCONV_SCHEMA, ["w_start"]),
        "noreply": _to_table(noreply, NOREPLY_SCHEMA, ["conv_id", "ts", "turn_idx"]),
        "resplat": _to_table(resplat, RESPLAT_SCHEMA, ["conv_id"]),
        "runs": _to_table(runs, RUNS_SCHEMA, ["conv_id", "start_ts", "start_turn_idx"]),
        "sessquant": _to_table(sessquant, SESSQUANT_SCHEMA, ["epoch", "q"]),
        "tumbling": _to_table(st.tumbling, WINDOW_AGG_SCHEMA, ["conv_id", "w_start"]),
        "sliding": _to_table(st.sliding, WINDOW_AGG_SCHEMA, ["conv_id", "w_start"]),
        "sessions": _to_table(st.sessions, SESSION_SCHEMA, ["conv_id", "session_id"]),
        "joins": _to_table(st.joins, JOIN_SCHEMA, ["conv_id", "tool_turn_idx"]),
        "patterns": _to_table(
            st.patterns, PATTERN_SCHEMA, ["conv_id", "start_ts", "start_turn_idx"]
        ),
        "count_windows": _to_table(
            st.count_windows, COUNT_WINDOW_SCHEMA, ["conv_id", "window_id"]
        ),
        "metrics": dict(st.metrics),
    }
