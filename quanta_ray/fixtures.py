"""Deterministic synthetic transcript generator (FIXTURES.md family A).

Produces the ``input_hint`` table ``(conv_id, turn_idx, role, text, tool, ts)``
as an ordered list of Parquet "epoch" files — file order = arrival order =
the stream; offsets are ``(file_idx, row_idx)``.

Design requirements pinned here:
- fully seeded (``numpy.random.default_rng``), no wall clock;
- Zipf-skewed turns/conv → hot conversations for skew/salting tests;
- repeating ``user → assistant [→ tool → assistant]*`` turn pattern so every
  ``tool`` row has a defined next-``assistant`` join partner; a tunable
  fraction of tool rows is unmatched (conversation ends after the tool turn);
- bounded disorder: arrival order shuffled within a window of ``disorder_k``
  positions; plus a seeded fraction of **late** rows whose ts is pushed far
  into the past so they arrive after the watermark has passed (the engine and
  the oracle must both drop and count them);
- ``text`` unique per row → row-for-row text equality catches dup/loss/misorder.

The reference repo ships no data fixtures; its tests drive scripted in-memory
stages (``/root/reference/internal/pipeline/runner_test.go:15-67``). The
scripted stage modes (ok/drop/errorThenOK/fanout2) are reproduced by transform
stages in ``quanta_ray.stages`` against this table.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import TRANSCRIPT_SCHEMA

BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch-us


@dataclass(frozen=True)
class TranscriptParams:
    n_convs: int = 100
    seed: int = 42
    max_turns: int = 400
    zipf_a: float = 1.5
    mean_gap_s: float = 30.0
    # probability that after an assistant turn the conv continues with a tool call
    p_tool: float = 0.35
    # fraction of tool rows left unmatched (conv ends right after the tool turn)
    p_unmatched_tool: float = 0.05
    # a large gap (> session_gap) is inserted with this probability per turn
    p_session_break: float = 0.03
    session_break_s: float = 1200.0
    # disorder: arrival shuffled within k positions; ts jitter ±j seconds
    disorder_k: int = 8
    jitter_s: float = 5.0
    # fraction of rows made late (ts shifted far into the past)
    p_late: float = 0.01
    late_shift_s: float = 7200.0
    n_epochs: int = 4


_TOOLS = np.array(["search", "bash", "read", "edit", "fetch"])


def generate_transcripts(p: TranscriptParams) -> pa.Table:
    """Build the full table in arrival order (row order = arrival order)."""
    rng = np.random.default_rng(p.seed)

    # --- per-conversation turn counts (Zipf tail → hot convs) ---
    n_turns = 1 + rng.zipf(p.zipf_a, size=p.n_convs).astype(np.int64)
    n_turns = np.clip(n_turns, 2, p.max_turns)
    total = int(n_turns.sum())

    conv_ids = np.repeat([f"conv-{i:06d}" for i in range(p.n_convs)], n_turns)
    turn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in n_turns])

    # --- roles: repeating user → assistant [→ tool → assistant]* ---
    roles = np.empty(total, dtype=object)
    tools = np.empty(total, dtype=object)
    pos = 0
    for ci in range(p.n_convs):
        n = int(n_turns[ci])
        r = np.empty(n, dtype=object)
        t = np.full(n, "", dtype=object)
        i = 0
        state = "user"
        while i < n:
            r[i] = state
            if state == "user":
                state = "assistant"
            elif state == "assistant":
                if rng.random() < p.p_tool:
                    state = "tool"
                else:
                    state = "user"
            else:  # tool
                t[i] = _TOOLS[rng.integers(0, len(_TOOLS))]
                if rng.random() < p.p_unmatched_tool:
                    # unmatched tool: truncate the conversation here
                    n = i + 1
                    break
                state = "assistant"
            i += 1
        roles[pos : pos + n] = r[:n]
        tools[pos : pos + n] = t[:n]
        if n < int(n_turns[ci]):
            # mark truncated tail for removal
            roles[pos + n : pos + int(n_turns[ci])] = None
        pos += int(n_turns[ci])

    keep = roles != None  # noqa: E711  (object array null mask)
    conv_ids, turn_idx, roles, tools = (
        conv_ids[keep],
        turn_idx[keep],
        roles[keep],
        tools[keep],
    )
    total = len(conv_ids)

    # --- event times: per-conv cumulative exponential gaps + session breaks ---
    gaps = rng.exponential(p.mean_gap_s, size=total)
    breaks = rng.random(total) < p.p_session_break
    gaps = gaps + breaks * p.session_break_s
    # conv start offsets spread over ~2 hours so convs overlap in event time
    conv_start = rng.uniform(0, 7200.0, size=p.n_convs)
    ts_s = np.empty(total, dtype=np.float64)
    pos = 0
    # recompute per-conv lengths after truncation
    _, counts = np.unique(conv_ids, return_counts=True)
    # np.unique sorts; conv ids are lexicographically ordered by construction
    for n in counts:
        seg = gaps[pos : pos + n].cumsum()
        cid = int(conv_ids[pos].split("-")[1])
        ts_s[pos : pos + n] = conv_start[cid] + seg
        pos += n

    # jitter (bounded; allowed_lateness should exceed jitter + disorder skew)
    ts_s = ts_s + rng.uniform(-p.jitter_s, p.jitter_s, size=total)
    ts_us = BASE_TS_US + (ts_s * 1e6).astype(np.int64)

    # deterministic per-row token (zlib.crc32 — process-independent, unlike hash())
    import zlib

    text = np.array(
        [
            f"{c}:{t}:{r}:tok{zlib.crc32(f'{c}:{t}'.encode()) & 0xFFFF:04x}"
            for c, t, r in zip(conv_ids, turn_idx, roles)
        ],
        dtype=object,
    )

    # --- arrival order: globally sorted by ts, then bounded-window shuffle ---
    order = np.argsort(ts_us, kind="stable")
    arrival = order.copy()
    if p.disorder_k > 1:
        for s in range(0, total, p.disorder_k):
            seg = arrival[s : s + p.disorder_k]
            rng.shuffle(seg)
            arrival[s : s + p.disorder_k] = seg

    conv_ids, turn_idx, roles, tools, text, ts_us = (
        conv_ids[arrival],
        turn_idx[arrival],
        roles[arrival],
        tools[arrival],
        text[arrival],
        ts_us[arrival],
    )

    # --- late rows: shift ts far into the past (will be behind the watermark) ---
    # only rows that are not near the start of the stream can be late
    late = (rng.random(total) < p.p_late) & (np.arange(total) > total // 4)
    ts_us = ts_us - late * int(p.late_shift_s * 1e6)

    return pa.Table.from_arrays(
        [
            pa.array(conv_ids, type=pa.string()),
            pa.array(turn_idx, type=pa.int32()),
            pa.array(roles, type=pa.string()),
            pa.array(text, type=pa.string()),
            pa.array(tools, type=pa.string()),
            pa.array(ts_us, type=pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


def write_stream(
    table: pa.Table, out_dir: str, n_epochs: int, row_group_size: int = 65536
) -> list[str]:
    """Split the arrival-ordered table into epoch files (the "topic").

    ``row_group_size`` bounds the map-side fragment granularity: the runner
    reads each epoch with one task per ~``fragment_rows`` rows split on
    row-group boundaries, so a single giant row group would serialize the
    read."""
    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    bounds = [round(i * n / n_epochs) for i in range(n_epochs + 1)]
    paths = []
    for e in range(n_epochs):
        path = os.path.join(out_dir, f"epoch-{e:05d}.parquet")
        pq.write_table(
            table.slice(bounds[e], bounds[e + 1] - bounds[e]),
            path,
            row_group_size=row_group_size,
        )
        paths.append(path)
    return paths


def make_stream(
    out_dir: str,
    params: TranscriptParams | None = None,
    row_group_size: int = 65536,
) -> list[str]:
    """Generate and write a transcript stream; returns ordered epoch paths.

    Idempotent for a given (out_dir, params): regenerates only if missing.
    """
    p = params or TranscriptParams()
    expect = [os.path.join(out_dir, f"epoch-{e:05d}.parquet") for e in range(p.n_epochs)]
    if all(os.path.exists(x) for x in expect):
        return expect
    return write_stream(generate_transcripts(p), out_dir, p.n_epochs, row_group_size)
