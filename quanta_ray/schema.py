"""Arrow schemas for the engine.

The transcript schema is fixed by ``BASELINE.json.input_hint``; the engine
*upgrades* the reference's opaque ``Frame.value: bytes`` payload
(``/root/reference/api/proto/v1/frame.proto:35-42``) to typed Arrow columns —
Ray Data blocks are Arrow tables, so schema'd payloads are free.

Lineage columns play the role of the reference's ``CheckpointToken``
(``frame.proto:25-32``): provenance carried through the pipeline so the sink
can commit input offsets, never parsed by transform stages.
"""

from __future__ import annotations

import pyarrow as pa

# --- transcript table (input_hint) -------------------------------------------
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),  # user | assistant | tool
        ("text", pa.string()),
        ("tool", pa.string()),  # tool name for role='tool', "" otherwise
        ("ts", pa.timestamp("us")),
    ]
)

# Lineage/provenance columns (CheckpointToken analog). ``_epoch`` is the file
# index in the ordered stream ("partition+offset" coarse component), ``_offset``
# the row index within the file. Fan-out descendants inherit their source row's
# lineage (reference: ``runner.go:96-102`` — events inherit the original
# frame's checkpoint token).
LINEAGE_EPOCH = "_epoch"
LINEAGE_OFFSET = "_offset"
PARTITION_COL = "_part"

ROLES = ("user", "assistant", "tool")


def with_lineage(schema: pa.Schema) -> pa.Schema:
    return schema.append(pa.field(LINEAGE_EPOCH, pa.int64())).append(
        pa.field(LINEAGE_OFFSET, pa.int64())
    )


# --- CEP output schemas -------------------------------------------------------
WINDOW_AGG_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("w_start", pa.timestamp("us")),
        ("w_end", pa.timestamp("us")),
        ("n_turns", pa.int64()),
        ("n_user", pa.int64()),
        ("n_assistant", pa.int64()),
        ("n_tool", pa.int64()),
        ("first_text", pa.string()),
        ("last_text", pa.string()),
        ("min_ts", pa.timestamp("us")),
        ("max_ts", pa.timestamp("us")),
    ]
)

SESSION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("session_id", pa.int64()),
        ("session_start", pa.timestamp("us")),
        ("session_end", pa.timestamp("us")),
        ("n_turns", pa.int64()),
        ("first_text", pa.string()),
        ("last_text", pa.string()),
    ]
)

COUNT_WINDOW_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("window_id", pa.int64()),
        ("n_turns", pa.int64()),
        ("n_user", pa.int64()),
        ("n_assistant", pa.int64()),
        ("n_tool", pa.int64()),
        ("first_text", pa.string()),
        ("last_text", pa.string()),
        ("min_ts", pa.timestamp("us")),
        ("max_ts", pa.timestamp("us")),
    ]
)

PATTERN_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("start_turn_idx", pa.int32()),
        ("start_ts", pa.timestamp("us")),
        ("end_ts", pa.timestamp("us")),
        ("span_us", pa.int64()),
    ]
)

JOIN_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("tool_turn_idx", pa.int32()),
        ("tool", pa.string()),
        ("tool_text", pa.string()),
        ("tool_ts", pa.timestamp("us")),
        ("assistant_turn_idx", pa.int32()),  # null when expired unmatched
        ("assistant_text", pa.string()),
        ("assistant_ts", pa.timestamp("us")),
        ("matched", pa.bool_()),
    ]
)


ALERT_SCHEMA = pa.schema(
    [
        ("scope", pa.string()),  # 'all' or a role: chains are independent
        ("w_start", pa.timestamp("us")),
        ("n_turns", pa.int64()),
        ("prev_n", pa.int64()),
    ]
)


# windowed EXACT top-k stream: per final tumbling window, the k most active
# conversations globally. Exact without a sketch: a conv lives in exactly one
# partition, so the global top-k is the merge of per-partition top-k lists
# (each partition's counts are complete). Ties: (n_turns desc, conv_id asc).
TOPK_SCHEMA = pa.schema(
    [
        ("w_start", pa.timestamp("us")),
        ("rank", pa.int64()),  # 1-based; ≤ k rows per window
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
    ]
)


# running SESSION-DURATION QUANTILE stream: after each epoch that closes at
# least one session, the requested quantiles of ALL sessions closed so far,
# estimated from a mergeable fixed-bin histogram (integer counts — merge is
# a vector add, estimates are deterministic upper bin edges). One row per
# (epoch, q).
SESSQUANT_SCHEMA = pa.schema(
    [
        ("epoch", pa.int64()),
        ("q", pa.float64()),
        ("est_duration_us", pa.int64()),  # upper edge of the quantile's bin
        ("n_sessions", pa.int64()),       # sessions closed so far (cumulative)
    ]
)


# windowed CONVERSATION-ACTIVITY HISTOGRAM stream: per final tumbling
# window, the global count of conversations per activity bucket (all five
# buckets emitted, zeros included — deterministic row count per window).
CONVHIST_BUCKETS = ("1", "2-3", "4-7", "8-15", "16+")
CONVHIST_SCHEMA = pa.schema(
    [
        ("w_start", pa.timestamp("us")),
        ("bucket", pa.string()),
        ("n_convs", pa.int64()),
    ]
)

# windowed TOOL-USAGE stream: per final tumbling window and tool name, the
# global call count and the EXACT count of distinct conversations that used
# the tool in the window. Multi-key grouped global reduce: a conversation
# lives in exactly one partition, so per-partition distinct-conv counts per
# (window, tool) SUM to the exact global distinct — no sketch, no extra
# shuffle. Rows exist only for (window, tool) pairs with >= 1 call.
TOOLUSE_SCHEMA = pa.schema(
    [
        ("w_start", pa.timestamp("us")),
        ("tool", pa.string()),
        ("n_calls", pa.int64()),
        ("n_convs", pa.int64()),
    ]
)

# windowed ROLE-MIX DRIFT stream: per final non-empty tumbling window that
# has a predecessor (the previous non-empty final window, chained in
# w_start order), the EXACT L1 distance between the two windows' global
# role distributions — the distribution-shift monitor for a transcript
# stream. Exactness convention: with current counts (N; n_user,
# n_assistant, n_tool) and previous (M; m_*), the distance
# Σ|n_r/N − m_r/M| is emitted as the integer pair
#   l1_num = Σ_r |n_r·M − m_r·N|,  l1_den = N·M
# (order-free integer arithmetic; num/den overflow int64 only beyond
# ~3e9 turns per window). First non-empty window seeds the chain and
# emits nothing.
DRIFT_SCHEMA = pa.schema(
    [
        ("w_start", pa.timestamp("us")),
        ("prev_w", pa.timestamp("us")),
        ("n_turns", pa.int64()),
        ("prev_turns", pa.int64()),
        ("l1_num", pa.int64()),
        ("l1_den", pa.int64()),
    ]
)

# NEW-CONVERSATION acquisition stream: per tumbling window, the number of
# conversations whose GLOBAL first turn falls in it (emitted once, when
# the watermark passes the window end — the cohort-entry curve).
NEWCONV_SCHEMA = pa.schema(
    [
        ("w_start", pa.timestamp("us")),
        ("n_new_convs", pa.int64()),
    ]
)

# LATE-DATA side output: the raw (pre-transform) row the watermark filter
# dropped, plus the epoch it arrived in and the watermark it was late
# against (ts < wm at arrival). The event-time twin of the dead-letter
# stream: drop semantics unchanged, but the rows are inspectable.
LATE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int64()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("epoch", pa.int64()),
        ("wm", pa.timestamp("us")),
    ]
)

# ABSENCE / TIMEOUT stream: one row per USER turn that received NO assistant
# turn of the same conversation within (ts, ts + timeout] — the CEP
# notFollowedBy / event-time-timer output. `deadline` = ts + timeout (the
# event time at which the absence became true). Exactly-once: a row is
# emitted in the first epoch whose watermark strictly passes the deadline.
NOREPLY_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("ts", pa.timestamp("us")),
        ("turn_idx", pa.int64()),
        ("deadline", pa.timestamp("us")),
    ]
)

RESPLAT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("first_user_ts", pa.timestamp("us")),
        ("first_assistant_ts", pa.timestamp("us")),
        ("latency_us", pa.int64()),
    ]
)

RUNS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("role", pa.string()),
        ("run_len", pa.int64()),
        ("start_ts", pa.timestamp("us")),
        ("end_ts", pa.timestamp("us")),
        ("start_turn_idx", pa.int64()),
        ("end_turn_idx", pa.int64()),
    ]
)


def from_pandas(df) -> pa.Table:
    """``pa.Table.from_pandas`` minus the auto-attached pandas schema
    metadata. The metadata dict makes the resulting ``pa.Schema`` unhashable,
    which defeats Ray Data's schema-dedup early exit when unifying output
    blocks (it logs 'Failed to hash the schemas' and falls through to the
    slow unify path in every map worker). Stripping is metadata-only —
    zero-copy on the column buffers."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def read_parquet_clean(paths, columns=None, **kwargs):
    """``ray.data.read_parquet`` with the file's embedded pandas metadata
    stripped via an explicit ``schema=``. Parquet written by pandas embeds a
    'pandas' metadata dict in the file schema; blocks read from such files
    carry it into every downstream schema-unify, where the unhashable dict
    defeats Ray Data's schema-dedup early exit ('Failed to hash the
    schemas' in every coalescing worker). One footer read on the driver;
    column projection still prunes at the scan.

    Also sizes blocks to the DATA, not the CPU count: Ray's default
    parallelism splits even a 2 MB file into 2x num_cpus blocks, and on
    multi-stage pipelines the fixed per-task cost of those empty-ish blocks
    dominates wall time (measured 2-9x per query at sf0.1). Policy:
    ``max(8, ceil(file_bytes / 32 MB))`` — ~32 MB compressed per block
    (~128 MB in memory, Ray's target block size) for large inputs, a floor
    of 8 so small inputs still parallelize fused CPU work. Callers that pass
    ``override_num_blocks`` keep their setting; multi-file reads keep Ray's
    per-fragment planning."""
    import math as _math
    import os as _os

    import pyarrow.parquet as _pq
    import ray.data as _rd

    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    schema = _pq.read_schema(first).remove_metadata()
    if columns is not None:
        # Ray expects schema to describe the PROJECTED columns
        schema = pa.schema([schema.field(c) for c in columns])
    if (
        "override_num_blocks" not in kwargs
        and not isinstance(paths, (list, tuple))
        and _os.path.isfile(first)
    ):
        kwargs["override_num_blocks"] = max(
            8, _math.ceil(_os.path.getsize(first) / (32 * 1024 * 1024))
        )
    return _rd.read_parquet(paths, columns=columns, schema=schema, **kwargs)
