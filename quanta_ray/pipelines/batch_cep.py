"""Batch-mode CEP pipelines over the ``events`` stream table — pure Ray Data.

These are the SQL-checkable counterparts of the streaming engine's window /
join operators (SURVEY §2.2 N5-N8), run in batch mode (watermark = +inf, no
late-drop) so a DuckDB oracle can verify them. Key = ``user_id`` (stands in
for ``conv_id``), event-time = ``ts``.

Scale notes (100 TB discipline):
- window assignment is vectorized Arrow/numpy inside ``map_batches``;
- every aggregation **pre-aggregates per batch** (one row per key+window per
  batch) before the global ``groupby`` — the all-to-all shuffle moves
  partial aggregates, not events;
- per-key ordered logic (sessions, next-event join) uses ONE hash shuffle
  (``groupby(key).map_groups``) and sorts only within groups;
- hot keys in the pre-aggregate path can be salted (``salt`` param) — the
  partial-agg key becomes (key, salt) and the second, tiny groupby removes
  the salt. Stateful per-key order logic must NOT be salted (SURVEY §7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..schema import from_pandas as _from_pandas, read_parquet_clean as _read_pq

US = 1_000_000
HOUR_US = 3600 * US


def _events(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return _read_pq(f"{sf_dir}/events.parquet", columns=columns)


def _w_start_us(ts_us: np.ndarray, size_us: int) -> np.ndarray:
    return ts_us // size_us * size_us


def _coalesce(ds: rd.Dataset, blocks: int = 16) -> rd.Dataset:
    """Coalesce partial-aggregate blocks before the global groupby.

    Per-batch partials shrink the data to ~key-cardinality rows; the
    all-to-all groupby over many near-empty blocks is pure scheduling
    overhead (measured 17.9s → 6.3s on 100k rows). At 100 TB the partials
    are proportionally larger but still ≤ cardinality × #map-tasks, and 16+
    blocks keeps the reduce parallel."""
    return ds.repartition(blocks)


# --- tumbling window aggregate (N5) ------------------------------------------


def tumbling_agg(sf_dir: str, size_us: int = HOUR_US, salt: int = 0) -> pa.Table:
    """Per (user_id, tumbling window): count + sum(value) + min/max ts.

    Two-phase: vectorized per-batch partial aggregates (pandas groupby inside
    the batch), then a global groupby over the partials.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        # integer CENTS (value is a 2-decimal source column, *100 tie-free):
        # distributed float partial sums are order-dependent and diverge
        # from the oracle in the last ulp
        val_c = np.round(batch.column("value").to_numpy() * 100.0).astype(np.int64)
        df = pd.DataFrame(
            {
                "user_id": batch.column("user_id").to_numpy(),
                "w_start_us": _w_start_us(ts, size_us),
                "value_c": val_c,
                "ts_us": ts,
            }
        )
        if salt:
            df["_salt"] = np.arange(len(df)) % salt
        keys = ["user_id", "w_start_us"] + (["_salt"] if salt else [])
        g = df.groupby(keys, as_index=False).agg(
            n_events=("value_c", "size"),
            sum_value_c=("value_c", "sum"),
            min_ts_us=("ts_us", "min"),
            max_ts_us=("ts_us", "max"),
        )
        return _from_pandas(g.drop(columns=["_salt"] if salt else []))

    from ..bucket import bucketed_group_agg

    partials = _events(sf_dir, ["user_id", "ts", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    )
    out = bucketed_group_agg(
        partials,
        ["user_id", "w_start_us"],
        dict(
            n_events=("n_events", "sum"),
            sum_value_c=("sum_value_c", "sum"),
            min_ts_us=("min_ts_us", "min"),
            max_ts_us=("max_ts_us", "max"),
        ),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        w = batch.column("w_start_us").cast(pa.int64()).cast(pa.timestamp("us"))
        mn = batch.column("min_ts_us").cast(pa.int64()).cast(pa.timestamp("us"))
        mx = batch.column("max_ts_us").cast(pa.int64()).cast(pa.timestamp("us"))
        return pa.Table.from_arrays(
            [
                batch.column("user_id"),
                w,
                batch.column("n_events").cast(pa.int64()),
                pc.divide(batch.column("sum_value_c").cast(pa.float64()), 100.0),
                mn,
                mx,
            ],
            names=["user_id", "w_start", "n_events", "sum_value", "min_ts", "max_ts"],
        )

    return _concat(out.map_batches(finalize, batch_format="pyarrow"))


TUMBLING_SQL = """
SELECT user_id,
       make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS w_start,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_value,
       min(ts) AS min_ts,
       max(ts) AS max_ts
FROM events
GROUP BY 1, 2
"""


# --- sliding window aggregate (N6) -------------------------------------------


def sliding_agg(
    sf_dir: str, size_us: int = HOUR_US, slide_us: int = 15 * 60 * US
) -> pa.Table:
    """Per (user_id, sliding window): count + sum(value). A row belongs to
    ``size/slide`` windows; expansion is vectorized (numpy repeat/tile)."""
    k = size_us // slide_us

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        user = batch.column("user_id").to_numpy()
        val = batch.column("value").to_numpy()
        base = ts // slide_us * slide_us
        offs = np.tile(np.arange(k, dtype=np.int64) * slide_us, n)
        w_start = np.repeat(base, k) - offs
        keep = w_start > np.repeat(ts, k) - size_us  # w_start <= ts < w_start+size
        val_c = np.round(val * 100.0).astype(np.int64)  # tie-free: 2-decimal source
        df = pd.DataFrame(
            {
                "user_id": np.repeat(user, k)[keep],
                "w_start_us": w_start[keep],
                "value_c": np.repeat(val_c, k)[keep],
            }
        )
        g = df.groupby(["user_id", "w_start_us"], as_index=False).agg(
            n_events=("value_c", "size"), sum_value_c=("value_c", "sum")
        )
        return _from_pandas(g)

    from ..bucket import bucketed_group_agg

    partials = _events(sf_dir, ["user_id", "ts", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    )
    out = bucketed_group_agg(
        partials,
        ["user_id", "w_start_us"],
        dict(n_events=("n_events", "sum"), sum_value_c=("sum_value_c", "sum")),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column("user_id"),
                batch.column("w_start_us").cast(pa.int64()).cast(pa.timestamp("us")),
                batch.column("n_events").cast(pa.int64()),
                pc.divide(batch.column("sum_value_c").cast(pa.float64()), 100.0),
            ],
            names=["user_id", "w_start", "n_events", "sum_value"],
        )

    return _concat(out.map_batches(finalize, batch_format="pyarrow"))


SLIDING_SQL = """
WITH expanded AS (
  SELECT user_id, value,
         (epoch_us(ts) // 900000000 - k.k) * 900000000 AS w_start_us,
         epoch_us(ts) AS ts_us
  FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) k
)
SELECT user_id,
       make_timestamp(w_start_us) AS w_start,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_value
FROM expanded
WHERE w_start_us <= ts_us AND w_start_us > ts_us - 3600000000
GROUP BY 1, 2
"""


# --- session windows (N7) -----------------------------------------------------


def session_agg(sf_dir: str, gap_us: int = 30 * 60 * US) -> pa.Table:
    """Gap-based sessions per user: one hash-bucketed shuffle on user_id,
    sessions of ALL users in a bucket computed in one vectorized pass
    (sessions need per-key order — never salted)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        ts_us = g["ts"].astype("int64")
        new_user = g["user_id"].ne(g["user_id"].shift())
        new_sess = new_user | ((ts_us - ts_us.shift()).fillna(gap_us + 1) > gap_us)
        sid = new_sess.cumsum()  # bucket-global session counter, ts-ordered
        g = g.assign(
            value_c=np.round(g["value"].to_numpy(np.float64) * 100.0).astype(
                np.int64
            )
        )
        out = g.groupby(sid.values).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"),
            sum_value=("value_c", "sum"),
        )
        out["session_id"] = out.groupby("user_id").cumcount()
        out["sum_value"] = out["sum_value"].to_numpy(dtype=np.int64) / 100.0
        return out[
            ["user_id", "session_id", "session_start", "session_end", "n_events", "sum_value"]
        ]

    from ..bucket import bucketed_apply

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = bucketed_apply(ds, ["user_id"], per_bucket)
    return _concat(out).select(
        ["user_id", "session_id", "session_start", "session_end", "n_events", "sum_value"]
    )


SESSION_SQL = """
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
), numbered AS (
  -- CAST: window-sum yields HUGEINT → float64 in pandas; the engine emits
  -- int64, and the driver hash is dtype-sensitive
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM ordered
)
SELECT user_id, session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_value
FROM numbered
GROUP BY 1, 2
"""


# --- stream-stream join (N8, batch form) -------------------------------------


def next_event_join(
    sf_dir: str,
    left_type: str = "click",
    right_type: str = "purchase",
    bound_us: int = HOUR_US,
) -> pa.Table:
    """For every ``left_type`` event, the first ``right_type`` event of the
    same user with ``left.ts <= right.ts <= left.ts + bound`` (the batch-mode
    analog of the tool→assistant streaming join). Unmatched lefts emitted
    with nulls (left outer, side-expiry analog).

    One hash shuffle on user_id; per group a vectorized ``searchsorted``
    against the sorted right side.
    """

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": pd.array([], dtype="int64"),
                "left_id": pd.array([], dtype="int64"),
                "left_ts": pd.array([], dtype="datetime64[us]"),
                "right_id": pd.array([], dtype="Int64"),
                "right_ts": pd.array([], dtype="datetime64[us]"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """One vectorized searchsorted over the whole bucket — no per-user
        Python loop. Rights are lexsorted by (user, ts, event_id); both sides
        are mapped to a composite int64 key of (dense user code, ts RANK).
        Ranks instead of raw microsecond timestamps keep the product key
        < bucket_rows² — overflow-safe regardless of the data's time span."""
        et = g["event_type"].to_numpy()
        lmask = et == left_type
        n_l = int(lmask.sum())
        if n_l == 0:
            return _empty()
        rmask = et == right_type
        uid = g["user_id"].to_numpy()
        ts = g["ts"].astype("int64").to_numpy()
        eid = g["event_id"].to_numpy()
        l_uid, l_ts, l_eid = uid[lmask], ts[lmask], eid[lmask]
        r_ts = ts[rmask]
        n_r = len(r_ts)
        if n_r == 0:
            ok = np.zeros(n_l, dtype=bool)
            rid_sel = np.zeros(n_l, dtype=np.int64)
            rts_sel = np.zeros(n_l, dtype=np.int64)
        else:
            r_uid, r_eid = uid[rmask], eid[rmask]
            codes, _uniq = pd.factorize(np.concatenate([l_uid, r_uid]), sort=False)
            l_code, r_code = codes[:n_l], codes[n_l:]
            uts = np.unique(np.concatenate([l_ts, r_ts]))
            l_rank = np.searchsorted(uts, l_ts)
            r_rank = np.searchsorted(uts, r_ts)
            stride = np.int64(len(uts) + 1)
            order = np.lexsort((r_eid, r_rank, r_code))
            r_key = r_code[order].astype(np.int64) * stride + r_rank[order]
            pos = np.searchsorted(r_key, l_code.astype(np.int64) * stride + l_rank)
            sel = np.minimum(pos, n_r - 1)
            take = order[sel]
            ok = (
                (pos < n_r)
                & (r_code[take] == l_code)
                & (r_ts[take] <= l_ts + bound_us)
            )
            rid_sel, rts_sel = r_eid[take], r_ts[take]
        # nullable Int64 preserves event_id fidelity past 2^53 (ADVICE r2);
        # both sides of the driver compare degrade identically (arrow
        # int64+null / pandas Int64 -> the same NaN form DuckDB's nullable
        # BIGINT takes), so the value-hash still agrees
        right_id = pd.array(rid_sel, dtype="Int64")
        right_id[~ok] = pd.NA
        right_ts = pd.Series(pd.to_datetime(rts_sel, unit="us")).where(ok, pd.NaT)
        return pd.DataFrame(
            {
                "user_id": l_uid,
                "left_id": l_eid,
                "left_ts": pd.to_datetime(l_ts, unit="us"),
                "right_id": right_id,
                "right_ts": right_ts.astype("datetime64[us]").to_numpy(),
            }
        )

    from ..bucket import bucketed_apply

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    out = bucketed_apply(ds, ["user_id"], per_bucket)
    return _concat(out)


NEXT_EVENT_JOIN_SQL = """
SELECT l.user_id,
       l.event_id AS left_id,
       l.ts AS left_ts,
       r.right_id,
       r.right_ts
FROM events l
LEFT JOIN LATERAL (
  SELECT r.event_id AS right_id, r.ts AS right_ts
  FROM events r
  WHERE r.user_id = l.user_id AND r.event_type = 'purchase'
    AND r.ts >= l.ts AND epoch_us(r.ts) <= epoch_us(l.ts) + 3600000000
  ORDER BY r.ts, r.event_id
  LIMIT 1
) r ON TRUE
WHERE l.event_type = 'click'
"""


# --- dedup / top-k / projection ----------------------------------------------


def dedup_exact(sf_dir: str) -> pa.Table:
    """Exact dedup: first event (by ts, event_id) per (user_id, event_type).

    Hash-partition on the dedup key + per-group first — the groupby shuffle
    moves each key group to one reducer (SURVEY guide pattern)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["user_id", "event_type", "ts", "event_id"])
            .groupby(["user_id", "event_type"], as_index=False, sort=False)
            .head(1)
        )

    from ..bucket import bucketed_apply

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])
    out = bucketed_apply(ds, ["user_id", "event_type"], per_bucket)
    return _concat(out).select(["user_id", "event_type", "event_id", "ts", "value"])


DEDUP_EXACT_SQL = """
SELECT user_id, event_type, event_id, ts, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
"""


def topk_users(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k users by total value: partial-agg → tiny groupby → sort/limit."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch.column("user_id").to_numpy(),
                "value": batch.column("value").to_numpy(),
            }
        )
        # integer CENTS (2-decimal source, *100 tie-free): the top-k RANKS
        # on this sum, so order-dependent float partials could flip ranks
        g = df.assign(
            value_c=np.round(df["value"].to_numpy(np.float64) * 100.0).astype(
                np.int64
            )
        ).groupby("user_id", as_index=False)["value_c"].sum()
        return _from_pandas(g)

    from ..bucket import bucketed_group_agg

    partials = _events(sf_dir, ["user_id", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    )
    agg = bucketed_group_agg(partials, ["user_id"], dict(total_c=("value_c", "sum")))
    # per-bucket local top-k → tiny driver merge (partial top-k pattern)
    local = agg.map_batches(
        lambda df: df.sort_values(
            ["total_c", "user_id"], ascending=[False, True]
        ).head(k),
        batch_format="pandas",
    )
    df = _concat(local).to_pandas()
    df = df.sort_values(["total_c", "user_id"], ascending=[False, True]).head(k)
    t = _from_pandas(df.reset_index(drop=True))
    return pa.Table.from_arrays(
        [
            t.column("user_id"),
            pc.divide(t.column("total_c").cast(pa.float64()), 100.0),
        ],
        names=["user_id", "total_value"],
    )


TOPK_USERS_SQL = """
WITH c AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_c
  FROM events GROUP BY 1
)
SELECT user_id, total_c / 100.0 AS total_value
FROM c
ORDER BY total_c DESC, user_id LIMIT 10
"""


def filter_project_upper(sf_dir: str, min_value: float = 100.0) -> pa.Table:
    """The reference's uppercase transform as a batch op: filter + project +
    ``upper(event_type)`` (``examples/transformers/uppercase/main.go:61-97``),
    fully vectorized arrow kernels, columns pruned at the read."""

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch.column("value"), min_value))
        return pa.Table.from_arrays(
            [
                batch.column("event_id"),
                pc.utf8_upper(batch.column("event_type")),
                batch.column("value"),
            ],
            names=["event_id", "event_type_u", "value"],
        )

    return _concat(
        _events(sf_dir, ["event_id", "event_type", "value"]).map_batches(
            fn, batch_format="pyarrow"
        )
    )


FILTER_PROJECT_SQL = """
SELECT event_id, upper(event_type) AS event_type_u, value
FROM events WHERE value > 100.0
"""


def _concat(ds: rd.Dataset) -> pa.Table:
    """Materialize a (small, post-aggregation) Dataset result to one table."""
    tables = [b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)]
    if not tables:
        return pa.table({})
    t = pa.concat_tables(tables, promote_options="default")
    # Strip pandas reconstruction metadata: without it, to_pandas() degrades
    # nullable int64 -> float64/NaN — the SAME degradation DuckDB's .df()
    # applies to nullable BIGINT — so the driver's value hash agrees on both
    # sides while the Arrow schema we return keeps full int64 fidelity.
    return t.combine_chunks().replace_schema_metadata(None)


# --- additional SQL-checkable operators --------------------------------------


def type_hourly_stats(sf_dir: str) -> pa.Table:
    """Per (event_type, hour): count + avg/min/max value — the windowed
    aggregate shape over a low-cardinality key (pre-aggregated partials).

    The avg numerator is summed in integer MICRO-UNITS (round(value*1e6) as
    int64): float summation order differs between a distributed partial-sum
    tree and any sequential oracle, and a last-ulp difference flips
    round(avg, 6) exactly at a rounding boundary (observed: 1 of 900 groups
    at sf0.1). Integer summation is order-free, so engine and oracle agree
    bit-for-bit at every scale. Envelope: |value| ≤ ~1e3 → ≤1e9 units/row →
    int64 safe to ~9e9 rows per (type, hour) group; past that, widen the
    unit. min/max are order-free in float already."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        val = batch.column("value").to_numpy()
        df = pd.DataFrame(
            {
                "event_type": batch.column("event_type").to_numpy(),
                "w_start_us": _w_start_us(ts, HOUR_US),
                "value_u": np.round(val * 1e6).astype(np.int64),
                "value": val,
            }
        )
        g = df.groupby(["event_type", "w_start_us"], as_index=False).agg(
            n=("value", "size"),
            sum_value=("value_u", "sum"),
            min_value=("value", "min"),
            max_value=("value", "max"),
        )
        return _from_pandas(g)

    from ..bucket import bucketed_group_agg

    partials = _events(sf_dir, ["event_type", "ts", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    )
    out = bucketed_group_agg(
        partials,
        ["event_type", "w_start_us"],
        dict(
            n=("n", "sum"),
            sum_value=("sum_value", "sum"),
            min_value=("min_value", "min"),
            max_value=("max_value", "max"),
        ),
        num_buckets=16,
    )
    t = _concat(out)
    # The rounded average is computed ENTIRELY in integer micro-units —
    # avg_u = (2*sum_u + n) // (2n), i.e. round-half-up of sum_u/n for
    # non-negative values — then divided by 1e6 once. Any float rounding of
    # a distributed average diverges from an oracle in the last ulp (both
    # tie-breaking at exact .5 boundaries AND the rounded double's
    # representation differ between pyarrow and DuckDB; observed at sf0.1).
    # Identical integers / identical single division -> bit-identical
    # doubles at every scale.
    su = t.column("sum_value").cast(pa.int64()).to_numpy()
    n = t.column("n").cast(pa.int64()).to_numpy()
    avg_u = (2 * su + n) // (2 * n)
    avg = pa.array(avg_u / 1e6, pa.float64())
    return pa.Table.from_arrays(
        [
            t.column("event_type"),
            t.column("w_start_us").cast(pa.int64()).cast(pa.timestamp("us")),
            t.column("n").cast(pa.int64()),
            avg,
            pc.round(t.column("min_value"), 6),
            pc.round(t.column("max_value"), 6),
        ],
        names=["event_type", "w_start", "n", "avg_value", "min_value", "max_value"],
    )


TYPE_HOURLY_SQL = """
SELECT event_type,
       make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS w_start,
       count(*) AS n,
       ((2 * sum(CAST(round(value * 1000000) AS BIGINT)) + count(*))
        // (2 * count(*))) / 1000000.0 AS avg_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events GROUP BY 1, 2
"""


def distinct_users_per_type(sf_dir: str) -> pa.Table:
    """COUNT(DISTINCT ...) via two-level groupby: dedup on the pair key,
    then count — both shuffles move only key pairs."""
    from ray.data.aggregate import Count

    from ..bucket import bucketed_apply

    # stage 1 (high-cardinality pair dedup): bucketed drop_duplicates;
    # stage 2 (5 groups): Ray's native Count is fine at tiny cardinality
    pairs = bucketed_apply(
        _events(sf_dir, ["event_type", "user_id"]),
        ["event_type", "user_id"],
        lambda g: g.drop_duplicates(["event_type", "user_id"]),
    )
    out = pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))
    t = _concat(out)
    return pa.Table.from_arrays(
        [t.column("event_type"), t.column("n_users").cast(pa.int64())],
        names=["event_type", "n_users"],
    )


DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


# --- JSON payload parsing (reference parity: the uppercase plugin JSON-decodes
# the opaque payload, examples/transformers/uppercase/main.go:63-78) ----------


def props_k_stats(sf_dir: str) -> pa.Table:
    """Parse the JSON ``props`` payload, extract ``k``, aggregate value stats
    per k-decile. Parsing is vectorized (the payload shape is fixed, so a
    regex beats per-row json.loads; a stage would fall back to json.loads for
    irregular payloads)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["props"].str.extract(r'"k":\s*(-?\d+)', expand=False).astype("int64")
        decile = k // 10
        val_c = np.round(batch["value"].to_numpy(np.float64) * 100.0).astype(
            np.int64
        )  # integer cents: order-free across the distributed partial tree
        df = pd.DataFrame({"k_decile": decile, "value_c": val_c})
        return df.groupby("k_decile", as_index=False).agg(
            n=("value_c", "size"), sum_value_c=("value_c", "sum")
        )

    from ray.data.aggregate import Sum

    out = (
        _coalesce(
            _events(sf_dir, ["props", "value"]).map_batches(
                partial, batch_format="pandas", batch_size=65536
            ),
            blocks=4,
        )
        .groupby("k_decile")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value_c", alias_name="sum_value_c"))
    )
    t = _concat(out)
    return pa.Table.from_arrays(
        [
            t.column("k_decile").cast(pa.int64()),
            t.column("n").cast(pa.int64()),
            pc.divide(t.column("sum_value_c").cast(pa.float64()), 100.0),
        ],
        names=["k_decile", "n", "sum_value"],
    )


PROPS_K_STATS_SQL = """
-- floor() (not //): DuckDB // truncates toward zero while Python floor-divides;
-- the extraction regex admits negative k, so keep both floor-consistent
SELECT CAST(floor(json_extract(props, '$.k')::BIGINT / 10.0) AS BIGINT) AS k_decile,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_value
FROM events GROUP BY 1
"""


# --- approximate distinct count (HyperLogLog sketch) --------------------------


class _HLLPartial:
    """Per-batch HyperLogLog registers (m=2^p) over a key column.

    The sketch is the canonical at-scale distinct-count: each batch emits a
    fixed 2^p-byte register vector regardless of row count, and vectors
    merge by elementwise max — the shuffle moves O(#batches × 2^p) bytes,
    never keys."""

    def __init__(self, column: str, p: int = 12):
        self.column = column
        self.p = p
        self.m = 1 << p

    def _idx_rank(self, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized (register index, rank) per value."""
        h = pd.util.hash_array(values).astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining bits, top-aligned
        # rank = position of first set bit in the remaining 64-p bits (1-based)
        nz = rest != 0
        lz = np.full(len(h), 64 - self.p, dtype=np.int64)
        r = rest[nz]
        # count leading zeros via float trick is lossy; use bit scan
        shift = np.zeros(len(r), dtype=np.int64)
        cur = r.copy()
        for s in (32, 16, 8, 4, 2, 1):
            mask = cur < (np.uint64(1) << np.uint64(63 - s + 1))
            cur[mask] = cur[mask] << np.uint64(s)
            shift[mask] += s
        lz[nz] = shift
        rank = np.minimum(lz + 1, 64 - self.p + 1)
        return idx, rank

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        idx, rank = self._idx_rank(batch[self.column].to_numpy())
        regs = np.zeros(self.m, dtype=np.int64)
        np.maximum.at(regs, idx, rank)
        return pd.DataFrame({"reg_idx": np.arange(self.m, dtype=np.int64), "rank": regs})


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    if est <= 2.5 * m:  # small-range correction
        zeros = int((regs == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def distinct_users_approx(sf_dir: str, p: int = 12) -> pa.Table:
    """Approximate COUNT(DISTINCT user_id) via a distributed HyperLogLog:
    per-batch register partials → elementwise-max reduce (bucketed by
    register index) → driver estimate. Rows-only oracle (approximate by
    design; pytest pins <2% relative error on the fixture)."""
    from ..bucket import bucketed_group_agg

    partials = _events(sf_dir, ["user_id"]).map_batches(
        _HLLPartial,
        fn_constructor_kwargs={"column": "user_id", "p": p},
        batch_format="pandas",
        batch_size=131072,
        concurrency=2,
    )
    merged = bucketed_group_agg(
        partials, ["reg_idx"], dict(rank=("rank", "max")), num_buckets=8
    )
    df = _concat(merged).to_pandas().sort_values("reg_idx")
    regs = np.zeros(1 << p, dtype=np.int64)
    regs[df["reg_idx"].to_numpy()] = df["rank"].to_numpy()
    est = _hll_estimate(regs)
    return pa.table({"approx_distinct_users": pa.array([round(est)], type=pa.int64())})


# --- consistent (hash-ordered) sampling ---------------------------------------


def consistent_sample(sf_dir: str, k: int = 100) -> pa.Table:
    """Deterministic k-sample of events: the k smallest md5(event_id) keys —
    the stable "consistent sample" primitive (same rows at any scale-out,
    resample-free as data grows at the tail). Per-block partial top-k →
    tiny driver merge; SQL-checkable exactly.

    The md5 sort key is REQUIRED by the oracle's ORDER BY, so it can't be
    swapped for the cheap ``hash_array`` fast path — instead it's computed
    through DuckDB's C-vectorized ``md5()`` kernel over the whole batch
    (zero-copy Arrow in/out), not a per-row Python lambda."""

    from ..hashutil import md5_hex

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(_skey=md5_hex(batch["event_id"].to_numpy(np.int64)))
        return batch.sort_values("_skey").head(k)

    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )
    df = _concat(ds).to_pandas().sort_values("_skey").head(k)
    df = df.drop(columns=["_skey"]).reset_index(drop=True)
    return _from_pandas(df)


CONSISTENT_SAMPLE_SQL = """
SELECT event_id, user_id, event_type, ts, value
FROM events
ORDER BY md5(CAST(event_id AS VARCHAR)) LIMIT 100
"""


# --- SQL-window parity: top-N most recent events per user --------------------


def latest_events_per_user(sf_dir: str, n: int = 3, buckets: int = 32) -> pa.Table:
    """Ranked top-N per group — the ``row_number() OVER (PARTITION BY ...)``
    window form Ray Data has no native operator for.

    Shape: hash-bucket on the partition key (``bucketed_apply``), then one
    vectorized sort + ``groupby.cumcount`` per bucket — every row of a user
    is in exactly one bucket, so ranks are exact; no global sort. Ordering:
    ts DESC, event_id DESC tiebreak (total order -> deterministic)."""
    from ..bucket import bucketed_apply

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "ts", "event_id"],
            ascending=[True, False, False],
            kind="mergesort",
        )
        rn = g.groupby("user_id").cumcount().to_numpy() + 1
        g = g.assign(rn=rn.astype(np.int64))
        return g[g["rn"] <= n][["user_id", "event_id", "ts", "rn"]]

    ds = _events(sf_dir, ["event_id", "ts", "user_id"])
    out = bucketed_apply(ds, ["user_id"], bucket_fn, num_buckets=buckets)
    t = _concat(out)
    return t.take(
        pc.sort_indices(t, sort_keys=[("user_id", "ascending"), ("rn", "ascending")])
    )


LATEST_EVENTS_PER_USER_SQL = """
SELECT user_id, event_id, ts, rn FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn <= 3
ORDER BY user_id, rn
"""


# --- approximate heavy hitters (mergeable truncated-counts sketch) -----------


def heavy_hitters_users(sf_dir: str, k: int = 10, m: int = 256) -> pa.Table:
    """Approximate top-k users by event COUNT via a mergeable
    truncated-counts sketch (SpaceSaving-family): each block keeps only its
    local top-``m`` (user, count) rows plus the mass it dropped, partials
    reduce by user, and the result reports each survivor's count lower
    bound and the global upper-bound slack (max undercount = sum over
    blocks of that block's dropped tail's max count).

    Guarantee: any key whose true count exceeds the reported ``max_slack``
    is present, and reported counts are exact for keys that made every
    block's top-m. Shuffle volume is O(m x #blocks), never the key
    cardinality — this is the 100-TB path where exact ``topk_users`` would
    shuffle every distinct key. Approximate by design -> rows-only oracle;
    pinned by a planted-skew pytest against the exact answer."""
    from ..bucket import bucketed_group_agg

    def partial(batch: pa.Table) -> pd.DataFrame:
        u = batch.column("user_id").to_numpy()
        vals, cnts = np.unique(u, return_counts=True)
        if len(vals) > m:
            order = np.argsort(-cnts, kind="stable")
            keep, drop = order[:m], order[m:]
            slack = int(cnts[drop].max())
            vals, cnts = vals[keep], cnts[keep]
        else:
            slack = 0
        return pd.DataFrame(
            {
                "user_id": np.concatenate([vals.astype(np.int64), [-1]]),
                "cnt": np.concatenate([cnts.astype(np.int64), [slack]]),
            }
        )

    parts = _events(sf_dir, ["user_id"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    )
    agg = bucketed_group_agg(parts, ["user_id"], dict(cnt=("cnt", "sum")))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        # the slack sentinel must survive the local prune regardless of rank
        sent = df[df["user_id"] == -1]
        real = df[df["user_id"] != -1]
        return pd.concat(
            [sent, real.sort_values(["cnt", "user_id"], ascending=[False, True]).head(k)]
        )

    local = agg.map_batches(local_topk, batch_format="pandas")
    df = _concat(local).to_pandas()
    slack = int(df.loc[df["user_id"] == -1, "cnt"].sum())
    df = df[df["user_id"] != -1]
    df = df.sort_values(["cnt", "user_id"], ascending=[False, True]).head(k)
    return pa.table(
        {
            "user_id": pa.array(df["user_id"].to_numpy(dtype=np.int64), pa.int64()),
            "cnt_lower": pa.array(df["cnt"].to_numpy(dtype=np.int64), pa.int64()),
            "max_slack": pa.array(np.full(len(df), slack, dtype=np.int64), pa.int64()),
        }
    )


# --- bounded range join: follow-up events within a time window ---------------


def followup_range_join(
    sf_dir: str,
    first: str = "click",
    then: str = "purchase",
    minutes: int = 30,
    buckets: int = 32,
) -> pa.Table:
    """Bounded RANGE join — for each ``first`` event, the same user's
    ``then`` events with ``ts`` in ``(first.ts, first.ts + minutes]``
    (half-open, so an exactly-simultaneous pair does not match). A join
    Ray Data lacks natively; the CEP "A followed by B within w" pattern in
    batch form.

    Shape: both sides' event-type predicate is pushed down to the parquet
    scan, both sides hash-bucket on the user key (one all-to-all of pruned
    columns), and each bucket does an equality merge on user plus a
    vectorized interval mask. Partitioning assumption: per-key fan-in
    (A_u x B_u) is bounded — true for per-user activity; an unbounded-key
    variant would sub-bucket by coarse time range."""
    import pyarrow.dataset as pads

    def side(ev_type: str, sid: int) -> rd.Dataset:
        ds = _read_pq(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
            filter=(pads.field("event_type") == pads.scalar(ev_type)),
        ).select_columns(["event_id", "ts", "user_id"])

        def tag(b: pd.DataFrame) -> pd.DataFrame:
            k = b["user_id"].to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {
                    "user_id": k,
                    "ts": b["ts"].astype("datetime64[us]"),
                    "event_id": b["event_id"].astype(np.int64),
                    "_side": np.int64(sid),
                    "_bucket": (pd.util.hash_array(k) % buckets).astype(np.int64),
                }
            )

        return ds.map_batches(tag, batch_format="pandas")

    both = side(first, 0).union(side(then, 1))
    span = pd.Timedelta(minutes=minutes)

    def rjoin(g: pd.DataFrame) -> pa.Table:
        a = g[g["_side"] == 0][["user_id", "ts", "event_id"]].rename(
            columns={"ts": "a_ts", "event_id": "a_event_id"}
        )
        b = g[g["_side"] == 1][["user_id", "ts", "event_id"]].rename(
            columns={"ts": "b_ts", "event_id": "b_event_id"}
        )
        m = a.merge(b, on="user_id")
        m = m[(m["b_ts"] > m["a_ts"]) & (m["b_ts"] <= m["a_ts"] + span)]
        return pa.table(
            {
                "a_event_id": pa.array(m["a_event_id"].to_numpy(dtype=np.int64), pa.int64()),
                "b_event_id": pa.array(m["b_event_id"].to_numpy(dtype=np.int64), pa.int64()),
                "user_id": pa.array(m["user_id"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    out = both.groupby("_bucket").map_groups(rjoin, batch_format="pandas")
    t = _concat(out)
    if t.num_rows == 0:
        t = pa.table(
            {
                "a_event_id": pa.array([], pa.int64()),
                "b_event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
            }
        )
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("a_event_id", "ascending"), ("b_event_id", "ascending")]
        )
    )


FOLLOWUP_RANGE_JOIN_SQL = """
SELECT a.event_id AS a_event_id, b.event_id AS b_event_id, a.user_id
FROM events a
JOIN events b
  ON b.user_id = a.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
ORDER BY a_event_id, b_event_id
"""


# --- absence anti-join: A NOT followed by B within a time window --------------


def absence_join(
    sf_dir: str,
    first: str = "click",
    then: str = "purchase",
    minutes: int = 30,
    buckets: int = 32,
) -> pa.Table:
    """ABSENCE detection in batch form — every ``first`` event with NO
    same-user ``then`` event in ``(ts, ts + minutes]``: the negative
    (``NOT EXISTS`` / Flink-CEP ``notFollowedBy``) twin of
    ``followup_range_join``, the abandonment/no-conversion query.

    Shape: same two-sided user-key hash bucket as the positive join (type
    predicates pushed to the scan, one all-to-all of pruned columns); per
    bucket each side is sorted once by (user, ts) and existence is decided
    with two vectorized ``searchsorted`` probes per A row against the
    B side's (user, ts) composite key — no A x B pair materialization, so
    a hot user with many As and Bs costs O((|A|+|B|) log |B|), not
    |A| x |B|. Emits the absent A rows only."""
    import pyarrow.dataset as pads

    def side(ev_type: str, sid: int) -> rd.Dataset:
        ds = _read_pq(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
            filter=(pads.field("event_type") == pads.scalar(ev_type)),
        ).select_columns(["event_id", "ts", "user_id"])

        def tag(b: pd.DataFrame) -> pd.DataFrame:
            k = b["user_id"].to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {
                    "user_id": k,
                    "ts": b["ts"].astype("datetime64[us]"),
                    "event_id": b["event_id"].astype(np.int64),
                    "_side": np.int64(sid),
                    "_bucket": (pd.util.hash_array(k) % buckets).astype(np.int64),
                }
            )

        return ds.map_batches(tag, batch_format="pandas")

    both = side(first, 0).union(side(then, 1))
    span_us = np.int64(minutes) * 60 * US

    def absent(g: pd.DataFrame) -> pa.Table:
        a = g[g["_side"] == 0]
        b = g[g["_side"] == 1]
        a_uid = a["user_id"].to_numpy(dtype=np.int64)
        a_ts = a["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(b) == 0:
            keep = np.ones(len(a), dtype=bool)
        elif len(a) == 0:
            keep = np.zeros(0, dtype=bool)
        else:
            b_uid = b["user_id"].to_numpy(dtype=np.int64)
            b_ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            # one monotonic composite key (user, ts-offset): offsets are
            # bounded by the bucket's time extent + window, so the shifted
            # user id and the offset pack into int64 without overflow for
            # any realistic (users x time-extent) — asserted, not assumed.
            tmin = min(b_ts.min(), a_ts.min())
            width = np.int64(
                max(b_ts.max(), a_ts.max() + span_us) - tmin
            ) + 2  # +2: room for the exclusive probe bound
            umax = np.int64(max(b_uid.max(), a_uid.max()))
            assert (umax + 1) < (2**63 - 1) // width, (
                "absence_join composite key would overflow; sub-bucket by "
                "coarse time range for this extent"
            )
            b_key = b_uid * width + (b_ts - tmin)
            b_key.sort()
            lo = np.searchsorted(b_key, a_uid * width + (a_ts - tmin), side="right")
            hi = np.searchsorted(
                b_key, a_uid * width + (a_ts + span_us - tmin), side="right"
            )
            keep = hi <= lo  # no B strictly inside (a_ts, a_ts + span]
        out = a[keep]
        return pa.table(
            {
                "event_id": pa.array(out["event_id"].to_numpy(dtype=np.int64), pa.int64()),
                "user_id": pa.array(out["user_id"].to_numpy(dtype=np.int64), pa.int64()),
                "ts": pa.array(
                    out["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                    pa.int64(),
                ).cast(pa.timestamp("us")),
            }
        )

    t = _concat(both.groupby("_bucket").map_groups(absent, batch_format="pandas"))
    if t.num_rows == 0:
        t = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
            }
        )
    return t.take(pc.sort_indices(t, sort_keys=[("event_id", "ascending")]))


ABSENCE_JOIN_SQL = """
SELECT a.event_id, a.user_id, a.ts
FROM events a
WHERE a.event_type = 'click'
  AND NOT EXISTS (
    SELECT 1 FROM events b
    WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
      AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
  )
ORDER BY a.event_id
"""


# --- interval-overlap counts: concurrent sessions per session -----------------


def session_overlap_counts(
    sf_dir: str, gap_us: int = 30 * 60 * US, buckets: int = 32
) -> pa.Table:
    """INTERVAL-OVERLAP join, collapsed to the stabbing count — for every
    gap-sessionized (user, session) interval, how many OTHER sessions (any
    user) overlap it in time. The concurrency / co-presence query; the
    overlap condition is the classic closed-interval test
    (other.start <= my.end AND other.end >= my.start).

    Shape: sessions are built with the one-shuffle sessionize kernel (user
    hash bucket -> mergesort -> gap-break cumsum), reduced to O(sessions)
    (user, session, start, end, n_events) rows. The pairwise overlap count
    then needs NO pair materialization: with the global sorted arrays of
    starts and ends,  n_overlap = #(starts <= my_end) - #(ends < my_start)
    - 1  (exact integer-microsecond arithmetic, self excluded). The two
    endpoint arrays are result-sized (the same order as the output itself),
    so they are computed where the result already lives; a corpus where
    sessions outgrow one node would range-partition time and keep per-range
    endpoint prefix sums (the cent-histogram exchange pattern) instead."""
    from ..bucket import bucketed_apply

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        brk = np.concatenate(([False], np.diff(ts) > gap_us)) & ~new_user
        c = np.cumsum(brk.astype(np.int64))
        first_idx = np.flatnonzero(new_user)
        sizes = np.diff(np.append(first_idx, len(uid)))
        sid = c - np.repeat(c[first_idx], sizes)
        # collapse the labeled stream to per-session rows
        df = pd.DataFrame(
            {"user_id": uid, "session_id": sid.astype(np.int64), "ts": ts}
        )
        s = df.groupby(["user_id", "session_id"], as_index=False).agg(
            start=("ts", "min"), end=("ts", "max"), n_events=("ts", "size")
        )
        return s

    ds = _events(sf_dir, ["user_id", "event_id", "ts"])
    t = _concat(bucketed_apply(ds, ["user_id"], bucket_fn, num_buckets=buckets))
    df = t.to_pandas()
    starts = np.sort(df["start"].to_numpy(dtype=np.int64))
    ends = np.sort(df["end"].to_numpy(dtype=np.int64))
    n_le_end = np.searchsorted(starts, df["end"].to_numpy(dtype=np.int64), side="right")
    n_lt_start = np.searchsorted(ends, df["start"].to_numpy(dtype=np.int64), side="left")
    df["n_overlap"] = (n_le_end - n_lt_start - 1).astype(np.int64)
    df = df.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    return pa.table(
        {
            "user_id": pa.array(df["user_id"].to_numpy(dtype=np.int64), pa.int64()),
            "session_id": pa.array(df["session_id"].to_numpy(dtype=np.int64), pa.int64()),
            "start_ts": pa.array(df["start"].to_numpy(dtype=np.int64), pa.int64()).cast(
                pa.timestamp("us")
            ),
            "end_ts": pa.array(df["end"].to_numpy(dtype=np.int64), pa.int64()).cast(
                pa.timestamp("us")
            ),
            "n_events": pa.array(df["n_events"].to_numpy(dtype=np.int64), pa.int64()),
            "n_overlap": pa.array(df["n_overlap"].to_numpy(dtype=np.int64), pa.int64()),
        }
    )


SESSION_OVERLAP_COUNTS_SQL = """
WITH lab AS (
  SELECT user_id, ts,
         CAST(sum(CASE WHEN gap_us IS NULL OR gap_us <= 1800000000 THEN 0 ELSE 1 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM (
    SELECT event_id, user_id, ts,
           date_diff('microsecond',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) AS gap_us
    FROM events
  )
), sess AS (
  SELECT user_id, session_id,
         min(ts) AS start_ts, max(ts) AS end_ts,
         CAST(count(*) AS BIGINT) AS n_events
  FROM lab GROUP BY user_id, session_id
)
SELECT a.user_id, a.session_id, a.start_ts, a.end_ts, a.n_events,
       CAST(count(*) - 1 AS BIGINT) AS n_overlap
FROM sess a
JOIN sess b ON b.start_ts <= a.end_ts AND b.end_ts >= a.start_ts
GROUP BY a.user_id, a.session_id, a.start_ts, a.end_ts, a.n_events
ORDER BY a.user_id, a.session_id
"""


# --- pivot: hourly counts, one column per event type -------------------------


def type_hourly_pivot(
    sf_dir: str,
    types: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> pa.Table:
    """Long→wide PIVOT: events per (hour, event_type) as one row per hour
    with a count column per type. Like every pivot, the category set must
    be declared up front (columns cannot be discovered mid-stream);
    undeclared types are ignored.

    Shape: per-batch crosstab partial (groupby + unstack, vectorized) so
    each batch ships at most #hours rows; bucketed sum reduce on the hour."""
    from ..bucket import bucketed_group_agg

    cols = [f"n_{t}" for t in types]

    def partial(batch: pa.Table) -> pd.DataFrame:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        df = pd.DataFrame(
            {"h": ts // HOUR_US * HOUR_US, "et": batch.column("event_type").to_numpy()}
        )
        g = df.groupby(["h", "et"]).size().unstack(fill_value=0)
        g = g.reindex(columns=list(types), fill_value=0)
        g.columns = cols
        return g.reset_index()

    parts = _events(sf_dir, ["ts", "event_type"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    )
    agg = bucketed_group_agg(parts, ["h"], {c: (c, "sum") for c in cols})
    t = _concat(agg)
    out = pa.table(
        {
            "hour": t.column("h").cast(pa.int64()).cast(pa.timestamp("us")),
            **{c: t.column(c).cast(pa.int64()) for c in cols},
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("hour", "ascending")]))


TYPE_HOURLY_PIVOT_SQL = """
SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS hour,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
GROUP BY 1
ORDER BY hour
"""


# --- staged funnel analysis ---------------------------------------------------


def funnel(
    sf_dir: str, stages: tuple[str, ...] = ("view", "click", "purchase")
) -> pa.Table:
    """Per-user ordered funnel: how many users reached stage i, where a user
    reaches stage i when an event of type ``stages[i]`` occurs strictly
    AFTER the user's earliest completion of stage i-1 (the classic
    min-timestamp funnel, e.g. view -> click -> purchase).

    Shape: ONE hash shuffle on user_id (``bucketed_apply``); inside each
    bucket the staged min-after recurrence is a per-stage vectorized
    groupby-min over the (complete) user groups — no cross-bucket state, no
    second shuffle for the final count (the per-bucket partial counts are a
    ≤ num_buckets x len(stages) frame reduced on the driver)."""
    from ..bucket import bucketed_apply

    stage_list = list(stages)

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].astype("int64")
        # reach[u] = min ts of stages[0] per user
        reach = ts[g["event_type"] == stage_list[0]].groupby(g["user_id"]).min()
        counts = [len(reach)]
        for st in stage_list[1:]:
            m = g["event_type"] == st
            cand = pd.DataFrame({"u": g.loc[m, "user_id"], "t": ts[m]})
            cand["prev"] = cand["u"].map(reach)
            cand = cand[cand["t"] > cand["prev"]]  # NaN prev -> False
            reach = cand.groupby("u")["t"].min()
            counts.append(len(reach))
        return pd.DataFrame(
            {
                "stage_idx": np.arange(len(stage_list), dtype=np.int64),
                "stage": stage_list,
                "n_users": np.asarray(counts, dtype=np.int64),
            }
        )

    ds = _events(sf_dir, ["user_id", "ts", "event_type"])
    parts = _concat(bucketed_apply(ds, ["user_id"], bucket_fn)).to_pandas()
    out = (
        parts.groupby(["stage_idx", "stage"], as_index=False)["n_users"]
        .sum()
        .sort_values("stage_idx")
    )
    t = _from_pandas(out.reset_index(drop=True))
    return pa.Table.from_arrays(
        [
            t.column("stage_idx").cast(pa.int64()),
            t.column("stage"),
            t.column("n_users").cast(pa.int64()),
        ],
        names=["stage_idx", "stage", "n_users"],
    )


FUNNEL_SQL = """
WITH s0 AS (
  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
), s1 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s0 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY e.user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY e.user_id
)
SELECT 0 AS stage_idx, 'view' AS stage, (SELECT count(*) FROM s0) AS n_users
UNION ALL
SELECT 1, 'click', (SELECT count(*) FROM s1)
UNION ALL
SELECT 2, 'purchase', (SELECT count(*) FROM s2)
ORDER BY stage_idx
"""


# --- per-user running (cumulative) aggregate ----------------------------------


def user_running_sum(sf_dir: str, buckets: int = 32) -> pa.Table:
    """Running SUM(value) per user ordered by (ts, event_id) — the
    ``SUM() OVER (PARTITION BY ... ORDER BY ...)`` cumulative-window form.

    Shape: one hash shuffle on user_id; inside each bucket one mergesort +
    ``groupby.cumsum``, vectorized over all that bucket's users at once.
    The sum runs in integer MICRO-UNITS (round(value*1e6) as int64): integer
    addition is association-free, so the engine's per-bucket cumsum and any
    oracle's window-frame tree agree bit-for-bit (same micro-unit protocol
    as ``type_hourly_stats``; int64 overflows only past ~9e12 value-units
    per user)."""
    from ..bucket import bucketed_apply

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        vu = np.round(g["value"].to_numpy() * 1e6).astype(np.int64)
        run = pd.Series(vu).groupby(g["user_id"].to_numpy()).cumsum().to_numpy()
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "event_id": g["event_id"].to_numpy(),
                "ts": g["ts"].to_numpy(),
                "running_value": run / 1e6,
            }
        )

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])
    t = _concat(bucketed_apply(ds, ["user_id"], bucket_fn, num_buckets=buckets))
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]
        )
    )


USER_RUNNING_SUM_SQL = """
SELECT user_id, event_id, ts,
       sum(CAST(round(value * 1000000) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id) / 1000000.0
         AS running_value
FROM events
ORDER BY user_id, ts, event_id
"""


# --- cohort retention ---------------------------------------------------------


def user_retention(sf_dir: str) -> pa.Table:
    """Day-grain cohort retention: users are cohorted by the day of their
    FIRST event; for each (cohort_day, day_offset) count the distinct users
    active that day.

    Shape: one hash shuffle on user_id (``bucketed_apply``) emits each
    user's distinct (cohort_day, active_day) pairs — ≤ #days per user, far
    smaller than the event stream — then a tiny bucketed count-sum over
    (cohort_day, offset). No driver-side pass over events."""
    from ..bucket import bucketed_apply, bucketed_group_agg

    DAY_US = 24 * HOUR_US

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        day = g["ts"].astype("int64").to_numpy() // DAY_US * DAY_US
        df = pd.DataFrame({"u": g["user_id"].to_numpy(), "day": day})
        df = df.drop_duplicates()
        cohort = df.groupby("u")["day"].transform("min")
        return pd.DataFrame(
            {
                "cohort_day": cohort.to_numpy(),
                "day_offset": ((df["day"].to_numpy() - cohort.to_numpy()) // DAY_US),
                "n": np.ones(len(df), dtype=np.int64),
            }
        )

    ds = _events(sf_dir, ["user_id", "ts"])
    pairs = bucketed_apply(ds, ["user_id"], bucket_fn)
    agg = bucketed_group_agg(pairs, ["cohort_day", "day_offset"], dict(n=("n", "sum")))
    t = _concat(agg)
    out = pa.table(
        {
            "cohort_day": t.column("cohort_day").cast(pa.int64()).cast(pa.timestamp("us")),
            "day_offset": t.column("day_offset").cast(pa.int64()),
            "n_users": t.column("n").cast(pa.int64()),
        }
    )
    return out.take(
        pc.sort_indices(
            out,
            sort_keys=[("cohort_day", "ascending"), ("day_offset", "ascending")],
        )
    )


USER_RETENTION_SQL = """
WITH active AS (
  SELECT DISTINCT user_id,
         make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS day
  FROM events
), cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM active GROUP BY user_id
)
SELECT c.cohort_day,
       CAST(date_diff('day', c.cohort_day, a.day) AS BIGINT) AS day_offset,
       count(DISTINCT a.user_id) AS n_users
FROM active a JOIN cohort c USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_day, day_offset
"""


# --- per-user inter-event gap statistics (LAG window form) ---------------------


def user_gap_stats(sf_dir: str, buckets: int = 32) -> pa.Table:
    """Per-user inter-event GAP statistics — the ``LAG() OVER (PARTITION BY
    user ORDER BY ts)`` window family (session-gap tuning, bot detection).

    One hash shuffle on user_id (projected to 3 columns at the read);
    inside each bucket one mergesort + vectorized diff masked at user
    boundaries. Gap sums are int64 microseconds — association-free, so the
    distributed result is bit-identical to any window-frame oracle."""
    from ..bucket import bucketed_apply

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = np.diff(ts)
        same = uid[1:] == uid[:-1]
        d = uid[1:][same]
        gaps = gap[same]
        labels, inv = np.unique(d, return_inverse=True)
        return pd.DataFrame(
            {
                "user_id": labels,
                "n_gaps": np.bincount(inv).astype(np.int64),
                "total_gap_us": np.bincount(inv, weights=gaps).astype(np.int64),
                "max_gap_us": np.maximum.reduceat(
                    gaps[np.argsort(inv, kind="stable")],
                    np.searchsorted(np.sort(inv), np.arange(len(labels))),
                ).astype(np.int64),
            }
        )

    ds = _events(sf_dir, ["user_id", "event_id", "ts"])
    t = _concat(bucketed_apply(ds, ["user_id"], bucket_fn, num_buckets=buckets))
    return t.take(pc.sort_indices(t, sort_keys=[("user_id", "ascending")]))


USER_GAP_STATS_SQL = """
WITH d AS (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_us
  FROM events
)
SELECT user_id, count(gap_us) AS n_gaps,
       CAST(sum(gap_us) AS BIGINT) AS total_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us
FROM d
GROUP BY user_id
HAVING count(gap_us) > 0
ORDER BY user_id
"""


# --- grouped HyperLogLog: approx distinct users per event type ----------------


def distinct_users_per_type_approx(sf_dir: str, p: int = 12) -> pa.Table:
    """Approximate COUNT(DISTINCT user_id) PER GROUP via grouped
    HyperLogLog — the sketch that replaces a key-exploding distinct shuffle
    with O(groups × 2^p) register rows at 100 TB.

    Per-batch: one vectorized hash + rank pass (shared with the global
    HLL), then a (group, register) max — only TOUCHED registers are
    emitted, so a batch contributes at most min(rows, groups × 2^p) rows.
    Merge: elementwise max keyed by (group, reg_idx). Rows-only oracle
    (approximate by design); pinned <2% per group against the exact count."""
    from ..bucket import bucketed_group_agg

    class GroupedHLLPartial(_HLLPartial):
        def __init__(self, column: str, group: str, p: int = 12):
            super().__init__(column, p)
            self.group = group

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            idx, rank = self._idx_rank(batch[self.column].to_numpy())
            df = pd.DataFrame(
                {
                    "grp": batch[self.group].to_numpy(),
                    "reg_idx": idx,
                    "rank": rank,
                }
            )
            return df.groupby(["grp", "reg_idx"], as_index=False)["rank"].max()

    partials = _events(sf_dir, ["user_id", "event_type"]).map_batches(
        GroupedHLLPartial,
        fn_constructor_kwargs={"column": "user_id", "group": "event_type", "p": p},
        batch_format="pandas",
        batch_size=131072,
        concurrency=2,
    )
    merged = bucketed_group_agg(
        partials, ["grp", "reg_idx"], dict(rank=("rank", "max")), num_buckets=8
    )
    df = _concat(merged).to_pandas()
    out_rows = []
    for grp, g in df.groupby("grp"):
        regs = np.zeros(1 << p, dtype=np.int64)
        regs[g["reg_idx"].to_numpy()] = g["rank"].to_numpy()
        out_rows.append((grp, round(_hll_estimate(regs))))
    out_rows.sort()
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in out_rows], type=pa.string()),
            "approx_distinct_users": pa.array(
                [r[1] for r in out_rows], type=pa.int64()
            ),
        }
    )


# --- CEP sequence pattern match (MATCH_RECOGNIZE-style) -----------------------


def pattern_match(
    sf_dir: str,
    pattern: tuple[str, ...] = ("view", "click", "purchase"),
    buckets: int = 32,
) -> pa.Table:
    """Detect every CONSECUTIVE occurrence of an event-type sequence per
    user (SQL MATCH_RECOGNIZE / lead()-chain family) — the batch form of the
    CEP pattern operator at the heart of engines like the reference's
    source→transformer CEP chain (reference: internal/pipeline/runner.go:123-205
    orders stages; here the "pattern" runs over the event stream itself).

    Shape: one hash shuffle on user_id (3 columns leave the scan); inside
    each bucket one mergesort by (user_id, ts, event_id) then ONE vectorized
    shifted-comparison pass per pattern step — no per-row Python, no state
    beyond the bucket. Matches report the anchor event and the span in
    int64 microseconds (association-free ⇒ bit-identical to the window
    oracle). At 10^12 rows the shuffle carries only (user_id, event_id,
    ts, event_type) and each bucket is a complete set of user groups."""
    from ..bucket import bucketed_apply

    L = len(pattern)

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        eid = g["event_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(g)
        if n < L:
            return pd.DataFrame(
                {
                    "user_id": np.array([], dtype=np.int64),
                    "start_event_id": np.array([], dtype=np.int64),
                    "start_ts": np.array([], dtype="datetime64[us]"),
                    "end_ts": np.array([], dtype="datetime64[us]"),
                    "span_us": np.array([], dtype=np.int64),
                }
            )
        m = np.ones(n - L + 1, dtype=bool)
        for i, step in enumerate(pattern):
            m &= et[i : n - L + 1 + i] == step
            if i:  # same user across the whole window
                m &= uid[i : n - L + 1 + i] == uid[: n - L + 1]
        idx = np.flatnonzero(m)
        return pd.DataFrame(
            {
                "user_id": uid[idx],
                "start_event_id": eid[idx],
                "start_ts": ts[idx].astype("datetime64[us]"),
                "end_ts": ts[idx + L - 1].astype("datetime64[us]"),
                "span_us": (ts[idx + L - 1] - ts[idx]).astype(np.int64),
            }
        )

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])
    t = _concat(bucketed_apply(ds, ["user_id"], bucket_fn, num_buckets=buckets))
    return t.take(
        pc.sort_indices(
            t,
            sort_keys=[("user_id", "ascending"), ("start_event_id", "ascending")],
        )
    )


PATTERN_MATCH_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2,
         lead(ts, 2) OVER w AS ts2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id AS start_event_id, ts AS start_ts, ts2 AS end_ts,
       CAST(date_diff('microsecond', ts, ts2) AS BIGINT) AS span_us
FROM o
WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
ORDER BY user_id, start_event_id
"""


# --- per-user journey path (ordered string_agg) -------------------------------


def user_journey(sf_dir: str, buckets: int = 32) -> pa.Table:
    """Per-user ordered event-type PATH string (`a>b>c...`) — the
    session-path / clickstream-journey operator (SQL `string_agg(...
    ORDER BY ts)` per user).

    One user_id hash shuffle of 3 narrow columns; inside each bucket one
    mergesort then a per-user C-level join (the group loop is per USER, not
    per row, and each join is a single allocation). Output size is bounded
    by per-user activity — the inherent output of a journey operator."""
    from ..bucket import bucketed_apply

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        agg = g.groupby("user_id", sort=False)["event_type"].agg(">".join)
        return pd.DataFrame(
            {
                "user_id": agg.index.to_numpy(dtype=np.int64),
                "journey": agg.to_numpy(),
                "n_events": g.groupby("user_id", sort=False).size().to_numpy(),
            }
        )

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])
    t = _concat(bucketed_apply(ds, ["user_id"], bucket_fn, num_buckets=buckets))
    return t.take(pc.sort_indices(t, sort_keys=[("user_id", "ascending")]))


USER_JOURNEY_SQL = """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS journey,
       count(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# --- count-based tumbling windows (per-user fixed-size event chunks) ----------


def count_windows(sf_dir: str, size: int = 5, buckets: int = 32) -> pa.Table:
    """COUNT-based tumbling windows: chunk each user's event stream into
    consecutive groups of ``size`` events (CEP count-trigger windows — the
    row-count sibling of the time-based tumbling operator; reference chains
    fire per-record, internal/pipeline/runner.go:123-205).

    One user_id hash shuffle of 4 narrow columns; per bucket one mergesort,
    a vectorized cumcount → window_id, then one grouped agg over
    (user, window). Association-safe outputs (count, min/max ts) plus a
    sum in integer CENTS (2-decimal source, *100 tie-free — a float sum
    even over ≤``size`` elements can differ from the oracle's grouping
    order in the last ulp)."""
    from ..bucket import bucketed_apply

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g["window_id"] = (
            g.groupby("user_id", sort=False).cumcount().to_numpy() // size
        ).astype(np.int64)
        g = g.assign(
            value_c=np.round(g["value"].to_numpy(np.float64) * 100.0).astype(
                np.int64
            )
        )
        out = g.groupby(["user_id", "window_id"], as_index=False, sort=False).agg(
            n_events=("event_id", "size"),
            sum_value=("value_c", "sum"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max"),
        )
        out["sum_value"] = out["sum_value"].to_numpy(dtype=np.int64) / 100.0
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])
    t = _concat(bucketed_apply(ds, ["user_id"], bucket_fn, num_buckets=buckets))
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("window_id", "ascending")]
        )
    )


COUNT_WINDOWS_SQL = """
WITH r AS (
  SELECT user_id, value, ts,
         CAST((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)
              // 5 AS BIGINT) AS window_id
  FROM events
)
SELECT user_id, window_id, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_value,
       min(ts) AS start_ts, max(ts) AS end_ts
FROM r
GROUP BY user_id, window_id
ORDER BY user_id, window_id
"""


# --- mergeable histogram quantile sketch (continuous values) ------------------


def value_quantiles_approx(
    sf_dir: str, bins: int = 4096, qs: tuple[int, ...] = (50, 90, 99)
) -> pa.Table:
    """Approximate percentiles of the CONTINUOUS ``value`` column via a
    fixed-bin mergeable histogram sketch — the scale tool where value-domain
    counting (exact, integer domains) doesn't apply: state is O(bins) per
    batch regardless of row count, merge is a vector sum, and the answer's
    value-error is bounded by one bin width ((max-min)/bins).

    Two streaming passes: (1) global min/max (tiny per-batch partials);
    (2) per-batch ``np.bincount`` over bin indices → one (bin, cnt) partial
    table per batch → bucketed sum → driver cumsum over ``bins`` rows.
    Deterministic (no sampling), mergeable (sum), rows-only by design —
    pinned in pytest to within one bin width of exact numpy percentiles."""
    from ..bucket import bucketed_group_agg

    ds = _events(sf_dir, ["value"])

    def mm(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame({"lo": [np.min(v)], "hi": [np.max(v)]}) if len(v) else pd.DataFrame({"lo": [], "hi": []})

    mmt = _concat(ds.map_batches(mm, batch_format="pandas")).to_pandas()
    lo, hi = float(mmt["lo"].min()), float(mmt["hi"].max())
    if not np.isfinite(lo) or hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / bins

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy(dtype=np.float64)
        idx = np.minimum(((v - lo) / width).astype(np.int64), bins - 1)
        cnt = np.bincount(idx, minlength=bins)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"bin": nz.astype(np.int64), "cnt": cnt[nz].astype(np.int64)})

    parts = ds.map_batches(hist, batch_format="pandas")
    agg = _concat(
        bucketed_group_agg(parts, ["bin"], dict(cnt=("cnt", "sum")), num_buckets=8)
    ).to_pandas().sort_values("bin")
    b_idx = agg["bin"].to_numpy(dtype=np.int64)
    cum = agg["cnt"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for q in qs:
        if n == 0:
            out.append(float("nan"))
            continue
        i = int(np.searchsorted(cum * 100, q * n, side="left"))
        i = min(i, len(b_idx) - 1)
        # report the bin's UPPER edge: the smallest sketch value v with
        # rank(<= v) covering the target, mirroring the exact-quantile rule
        out.append(round(lo + (b_idx[i] + 1) * width, 6))
    return pa.table(
        {
            "q": pa.array([int(q) for q in qs], pa.int64()),
            "value_approx": pa.array(out, pa.float64()),
        }
    )


# --- sessionization labels (per-event session ids) -----------------------------


def sessionize(sf_dir: str, gap_us: int = 30 * 60 * US, buckets: int = 32) -> pa.Table:
    """Label EVERY event with its (user, session) id — the sessionization
    primitive downstream of which all session analytics hang (the session
    WINDOW operator emits aggregates; this emits the labeled stream itself).

    One user_id hash shuffle; per bucket one mergesort, one boundary-masked
    diff, one segmented cumsum — session_id = running count of gap-breaks
    within each user, 0-based in (ts, event_id) order. Bit-exact vs the SQL
    window oracle (integer microsecond arithmetic)."""
    from ..bucket import bucketed_apply

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        brk = np.concatenate(([False], np.diff(ts) > gap_us)) & ~new_user
        # segmented cumsum: absolute cumsum of breaks minus its value at the
        # user's first row
        c = np.cumsum(brk.astype(np.int64))
        first_idx = np.flatnonzero(new_user)
        sizes = np.diff(np.append(first_idx, len(uid)))
        sid = c - np.repeat(c[first_idx], sizes)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(dtype=np.int64),
                "user_id": uid,
                "session_id": sid.astype(np.int64),
            }
        )

    ds = _events(sf_dir, ["user_id", "event_id", "ts"])
    t = _concat(bucketed_apply(ds, ["user_id"], bucket_fn, num_buckets=buckets))
    return t.take(pc.sort_indices(t, sort_keys=[("event_id", "ascending")]))


SESSIONIZE_SQL = """
SELECT event_id, user_id,
       CAST(sum(CASE WHEN gap_us IS NULL OR gap_us <= 1800000000 THEN 0 ELSE 1 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM (
  SELECT event_id, user_id, ts,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_us
  FROM events
)
ORDER BY event_id
"""


# --- conversion latency (time-to-event, censored) --------------------------------


def conversion_latency(
    sf_dir: str, first: str = "view", then: str = "purchase", buckets: int = 32
) -> pa.Table:
    """TIME-TO-EVENT: per user who ever emitted a ``first`` event, the
    timestamp of their first ``first``, the timestamp of their first
    ``then`` AFTER it (strictly later, (ts, event_id) order), and the
    latency between the two — NULL latency = right-censored (never
    converted), the input row of every conversion-funnel survival curve.

    Shape: the event-type filter prunes the scan to two types; one
    user-hash shuffle; per bucket one mergesort + two vectorized
    first-per-user selections (the second constrained to rows after the
    user's first ``first``). Emits one row per ``first``-emitting user;
    the latency column is nullable int64 (the censored rows)."""
    import pyarrow.dataset as pads

    from ..bucket import bucketed_apply

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        df = pd.DataFrame({"u": uid, "ts": ts, "eid": eid, "et": et})
        f = (
            df[df["et"] == first]
            .groupby("u", as_index=False)
            .first()[["u", "ts", "eid"]]
            .rename(columns={"ts": "f_ts", "eid": "f_eid"})
        )
        if not len(f):
            return pd.DataFrame(
                {"user_id": pd.Series(dtype=np.int64),
                 "first_ts": pd.Series(dtype=np.int64),
                 "conv_ts": pd.Series(dtype="Int64")}
            )
        t = df[df["et"] == then].merge(f, on="u")
        t = t[(t["ts"] > t["f_ts"]) | ((t["ts"] == t["f_ts"]) & (t["eid"] > t["f_eid"]))]
        conv = t.groupby("u", as_index=False).agg(conv_ts=("ts", "min"))
        out = f.merge(conv, on="u", how="left")
        return pd.DataFrame(
            {
                "user_id": out["u"].to_numpy(dtype=np.int64),
                "first_ts": out["f_ts"].to_numpy(dtype=np.int64),
                "conv_ts": out["conv_ts"].astype("Int64"),
            }
        )

    ds = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
        filter=(
            (pads.field("event_type") == pads.scalar(first))
            | (pads.field("event_type") == pads.scalar(then))
        ),
    )
    t = _concat(bucketed_apply(ds, ["user_id"], bucket_fn, num_buckets=buckets))
    t = t.take(pc.sort_indices(t, sort_keys=[("user_id", "ascending")]))
    first_us = t.column("first_ts").cast(pa.int64())
    conv_us = t.column("conv_ts").cast(pa.int64())  # nullable
    lat = pc.subtract(conv_us, first_us)  # null-propagating
    return pa.Table.from_arrays(
        [
            t.column("user_id").cast(pa.int64()),
            first_us.cast(pa.timestamp("us")),
            conv_us.cast(pa.timestamp("us")),
            lat,
        ],
        names=["user_id", "first_ts", "conv_ts", "latency_us"],
    )


CONVERSION_LATENCY_SQL = """
WITH f AS (
  SELECT user_id, ts AS first_ts, event_id AS f_eid
  FROM (
    SELECT user_id, ts, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = 'view'
  ) WHERE rn = 1
)
SELECT f.user_id, f.first_ts,
       (SELECT min(p.ts) FROM events p
        WHERE p.user_id = f.user_id AND p.event_type = 'purchase'
          AND (p.ts > f.first_ts
               OR (p.ts = f.first_ts AND p.event_id > f.f_eid))) AS conv_ts,
       date_diff('microsecond', f.first_ts,
                 (SELECT min(p.ts) FROM events p
                  WHERE p.user_id = f.user_id AND p.event_type = 'purchase'
                    AND (p.ts > f.first_ts
                         OR (p.ts = f.first_ts AND p.event_id > f.f_eid)))
       ) AS latency_us
FROM f ORDER BY f.user_id
"""


# --- rolling 7-day active users (WAU per day) -----------------------------------


def rolling_wau(sf_dir: str, window_days: int = 7, buckets: int = 32) -> pa.Table:
    """ROLLING WEEKLY ACTIVE USERS — for every day, the exact distinct
    users active in the trailing ``window_days`` window (the WAU-per-day
    engagement curve; DAU/MAU's rolling sibling). A user active on day d
    counts toward days d .. d+6.

    Shape: per-batch (day, user) dedup collapses the stream to at most
    |days|x|users| pairs, a bounded 1->7 vectorized explode targets each
    trailing window, one bucketed pair-dedup shuffle (moves only key
    pairs), then a tiny per-day count. Emits only days with at least one
    active user in the window (both sides agree on the group set)."""
    from ..bucket import bucketed_apply, bucketed_group_agg

    DAY_US = 24 * HOUR_US

    def pre(batch: pa.Table) -> pd.DataFrame:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        df = pd.DataFrame(
            {"day": ts // DAY_US, "user_id": batch.column("user_id").to_numpy()}
        ).drop_duplicates()
        day = df["day"].to_numpy(dtype=np.int64)
        uid = df["user_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "t_day": np.repeat(day, window_days)
                + np.tile(np.arange(window_days, dtype=np.int64), len(day)),
                "user_id": np.repeat(uid, window_days),
            }
        ).drop_duplicates()

    pairs = bucketed_apply(
        _events(sf_dir, ["ts", "user_id"]).map_batches(
            pre, batch_format="pyarrow", batch_size=131072
        ),
        ["t_day", "user_id"],
        lambda g: g.drop_duplicates(["t_day", "user_id"]),
    )

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("t_day", as_index=False).agg(n_users=("user_id", "size"))

    out = _concat(
        bucketed_group_agg(
            pairs.map_batches(count_partial, batch_format="pandas"),
            ["t_day"],
            dict(n_users=("n_users", "sum")),
            num_buckets=8,
        )
    )
    out = out.take(pc.sort_indices(out, sort_keys=[("t_day", "ascending")]))
    day_us = out.column("t_day").cast(pa.int64()).to_numpy() * DAY_US
    return pa.table(
        {
            "day": pa.array(day_us, pa.int64()).cast(pa.timestamp("us")),
            "n_users": out.column("n_users").cast(pa.int64()),
        }
    )


ROLLING_WAU_SQL = """
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events
), ex AS (
  SELECT DISTINCT day + k AS t_day, user_id
  FROM du, generate_series(0, 6) AS g(k)
)
SELECT make_timestamp(t_day * 86400000000) AS day,
       count(DISTINCT user_id) AS n_users
FROM ex GROUP BY t_day ORDER BY t_day
"""


# --- in-session funnel conversion ----------------------------------------------


def session_conversion(
    sf_dir: str,
    first: str = "click",
    then: str = "purchase",
    gap_us: int = 30 * 60 * US,
    buckets: int = 32,
) -> pa.Table:
    """IN-SESSION funnel conversion — for every gap-sessionized
    (user, session) that contains a ``first`` event, whether a ``then``
    event follows it WITHIN THE SAME SESSION (strictly later by
    (ts, event_id)): the session-scoped conversion flag product analytics
    is built on (the plain funnel asks "ever"; this asks "in the same
    visit").

    One user-hash shuffle; per bucket the sessionize kernel (mergesort +
    gap-break cumsum) labels rows, then two vectorized per-(user, session)
    reductions: the first ``first`` position and whether any ``then``
    sorts strictly after it. Emits one row per session WITH a ``first``
    event: (user_id, session_id, start_ts, converted)."""
    from ..bucket import bucketed_apply

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        eid = g["event_id"].to_numpy(dtype=np.int64)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        brk = np.concatenate(([False], np.diff(ts) > gap_us)) & ~new_user
        c = np.cumsum(brk.astype(np.int64))
        first_idx = np.flatnonzero(new_user)
        sizes = np.diff(np.append(first_idx, len(uid)))
        sid = c - np.repeat(c[first_idx], sizes)
        df = pd.DataFrame(
            {"user_id": uid, "session_id": sid.astype(np.int64), "ts": ts,
             "event_id": eid, "et": et}
        )
        # first `first` row per session (rows already (ts, event_id)-sorted)
        f = df[df["et"] == first].groupby(
            ["user_id", "session_id"], as_index=False
        ).first()[["user_id", "session_id", "ts", "event_id"]].rename(
            columns={"ts": "f_ts", "event_id": "f_eid"}
        )
        if not len(f):
            return pd.DataFrame(
                {"user_id": pd.Series(dtype=np.int64),
                 "session_id": pd.Series(dtype=np.int64),
                 "start_ts": pd.Series(dtype=np.int64),
                 "converted": pd.Series(dtype=bool)}
            )
        starts = df.groupby(["user_id", "session_id"], as_index=False).agg(
            start_ts=("ts", "min")
        )
        t = df[df["et"] == then][["user_id", "session_id", "ts", "event_id"]]
        m = f.merge(t, on=["user_id", "session_id"], how="left")
        hit = (m["ts"] > m["f_ts"]) | (
            (m["ts"] == m["f_ts"]) & (m["event_id"] > m["f_eid"])
        )
        conv = (
            pd.DataFrame(
                {"user_id": m["user_id"], "session_id": m["session_id"],
                 "hit": hit.fillna(False)}
            )
            .groupby(["user_id", "session_id"], as_index=False)["hit"]
            .any()
        )
        out = f.merge(starts, on=["user_id", "session_id"]).merge(
            conv, on=["user_id", "session_id"]
        )
        return pd.DataFrame(
            {"user_id": out["user_id"].to_numpy(dtype=np.int64),
             "session_id": out["session_id"].to_numpy(dtype=np.int64),
             "start_ts": out["start_ts"].to_numpy(dtype=np.int64),
             "converted": out["hit"].to_numpy(dtype=bool)}
        )

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])
    t = _concat(bucketed_apply(ds, ["user_id"], bucket_fn, num_buckets=buckets))
    t = t.take(
        pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("session_id", "ascending")]
        )
    )
    return pa.Table.from_arrays(
        [
            t.column("user_id").cast(pa.int64()),
            t.column("session_id").cast(pa.int64()),
            t.column("start_ts").cast(pa.int64()).cast(pa.timestamp("us")),
            t.column("converted").cast(pa.bool_()),
        ],
        names=["user_id", "session_id", "start_ts", "converted"],
    )


SESSION_CONVERSION_SQL = """
WITH lab AS (
  SELECT event_id, user_id, ts, event_type,
         CAST(sum(CASE WHEN gap_us IS NULL OR gap_us <= 1800000000 THEN 0 ELSE 1 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM (
    SELECT event_id, user_id, ts, event_type,
           date_diff('microsecond',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) AS gap_us
    FROM events
  )
), f AS (
  SELECT user_id, session_id, ts AS f_ts, event_id AS f_eid
  FROM (
    SELECT user_id, session_id, ts, event_id,
           row_number() OVER (PARTITION BY user_id, session_id
                              ORDER BY ts, event_id) AS rn
    FROM lab WHERE event_type = 'click'
  ) WHERE rn = 1
), s AS (
  SELECT user_id, session_id, min(ts) AS start_ts
  FROM lab GROUP BY user_id, session_id
)
SELECT f.user_id, f.session_id, s.start_ts,
       EXISTS (
         SELECT 1 FROM lab p
         WHERE p.user_id = f.user_id AND p.session_id = f.session_id
           AND p.event_type = 'purchase'
           AND (p.ts > f.f_ts OR (p.ts = f.f_ts AND p.event_id > f.f_eid))
       ) AS converted
FROM f JOIN s ON s.user_id = f.user_id AND s.session_id = f.session_id
ORDER BY f.user_id, f.session_id
"""


# --- event-type transition matrix (Markov counts) ------------------------------


def type_transitions(sf_dir: str, buckets: int = 32) -> pa.Table:
    """Corpus-wide event-type TRANSITION counts (the Markov matrix behind
    next-event prediction and anomaly scoring): count consecutive
    (from_type → to_type) steps per user in (ts, event_id) order.

    One user_id hash shuffle; per bucket one mergesort + one shifted
    compare + one grouped count — the shuffle output is at most
    |types|² partial rows per bucket, so the final reduce is tiny."""
    from ..bucket import bucketed_apply

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        return pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]}).groupby(
            ["from_type", "to_type"], as_index=False
        ).size().rename(columns={"size": "n"})

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])
    parts = _concat(bucketed_apply(ds, ["user_id"], bucket_fn, num_buckets=buckets))
    df = parts.to_pandas().groupby(["from_type", "to_type"], as_index=False)["n"].sum()
    df = df.sort_values(["from_type", "to_type"]).reset_index(drop=True)
    return pa.table(
        {
            "from_type": pa.array(df["from_type"].astype(str), pa.string()),
            "to_type": pa.array(df["to_type"].astype(str), pa.string()),
            "n": pa.array(df["n"].to_numpy(dtype=np.int64), pa.int64()),
        }
    )


TYPE_TRANSITIONS_SQL = """
WITH o AS (
  SELECT user_id, event_type AS f,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
  FROM events
)
SELECT f AS from_type, t AS to_type, count(*) AS n
FROM o WHERE t IS NOT NULL
GROUP BY f, t
ORDER BY f, t
"""


# --- burst detection over tumbling windows -------------------------------------


def burst_windows(sf_dir: str, ratio: float = 2.0) -> pa.Table:
    """Hourly windows whose event count jumps ≥ ``ratio``× the SAME type's
    previous non-empty hourly window — the CEP burst/anomaly detector shape
    (windowed aggregate + per-key LAG + threshold predicate).

    Distributed part: the per-(type, hour) counts via pre-aggregated
    partials + one bucketed groupby (shuffle carries ≤ |types|·|hours|
    partial rows, never events). The LAG+filter runs on the driver over
    that aggregate — at 10^12 events the aggregate is still only
    |types| × |hours| rows (e.g. 1e3 types × 1e5 hours = 1e8 worst case;
    for larger key spaces the same lag is one more ``bucketed_apply`` on
    event_type, which ``type_hourly_stats`` already demonstrates)."""
    from ..bucket import bucketed_group_agg

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        df = pd.DataFrame(
            {
                "event_type": batch.column("event_type").to_numpy(),
                "w_start_us": _w_start_us(ts, HOUR_US),
            }
        )
        g = df.groupby(["event_type", "w_start_us"], as_index=False).agg(
            n=("w_start_us", "size")
        )
        return _from_pandas(g)

    parts = _events(sf_dir, ["event_type", "ts"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    )
    out = bucketed_group_agg(
        parts, ["event_type", "w_start_us"], dict(n=("n", "sum")), num_buckets=16
    )
    df = _concat(out).to_pandas()
    df = df.sort_values(["event_type", "w_start_us"], kind="mergesort").reset_index(drop=True)
    et = df["event_type"].to_numpy()
    n = df["n"].to_numpy(dtype=np.int64)
    same = np.concatenate(([False], et[1:] == et[:-1]))
    prev = np.concatenate(([0], n[:-1]))
    keep = same & (n >= ratio * prev)
    out_df = df[keep]
    return pa.table(
        {
            "event_type": pa.array(out_df["event_type"].astype(str), pa.string()),
            "w_start": pa.array(
                out_df["w_start_us"].to_numpy(dtype=np.int64), pa.int64()
            ).cast(pa.timestamp("us")),
            "n": pa.array(out_df["n"].to_numpy(dtype=np.int64), pa.int64()),
            "prev_n": pa.array(prev[keep], pa.int64()),
        }
    )


BURST_WINDOWS_SQL = """
WITH c AS (
  SELECT event_type,
         make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS w_start,
         count(*) AS n
  FROM events GROUP BY 1, 2
), l AS (
  SELECT event_type, w_start, n,
         lag(n) OVER (PARTITION BY event_type ORDER BY w_start) AS prev_n
  FROM c
)
SELECT event_type, w_start, n, prev_n
FROM l WHERE prev_n IS NOT NULL AND n >= 2.0 * prev_n
"""


# --- event-type co-occurrence (distinct-user pair counts) ----------------------


def type_cooccurrence(sf_dir: str, buckets: int = 32) -> pa.Table:
    """For every unordered pair of event types, the number of DISTINCT users
    who did both — the audience-overlap / co-occurrence matrix.

    Per batch: dedup (user, type) pairs (cheap, |types| is small). One
    user_id hash shuffle; per bucket: global per-user dedup, then emit each
    user's C(k,2) type pairs via a segmented double-repeat (vectorized, no
    Python loop over users), partial-count pairs. Users never span buckets,
    so pair counts sum across buckets. Shuffle carries ≤ |users|·|types|
    dedup rows; the reduce output is ≤ |types|² rows."""
    from ..bucket import bucketed_apply

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates(["user_id", "event_type"])

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "event_type"]).sort_values(
            ["user_id", "event_type"], kind="mergesort"
        )
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(uid)))
        # within each user's sorted k types, emit (i<j) index pairs: one
        # triangular index template per distinct k, broadcast over every
        # user of that size (vectorized — no per-user loop; |distinct k|
        # ≤ |types|)
        a_idx, b_idx = [], []
        for k in np.unique(sizes):
            if k < 2:
                continue
            ii, jj = np.triu_indices(k, 1)
            s = starts[sizes == k]
            a_idx.append((s[:, None] + ii[None, :]).ravel())
            b_idx.append((s[:, None] + jj[None, :]).ravel())
        if not a_idx:
            return pd.DataFrame({"type_a": [], "type_b": [], "n_users": []})
        ai = np.concatenate(a_idx)
        bi = np.concatenate(b_idx)
        return (
            pd.DataFrame({"type_a": et[ai], "type_b": et[bi]})
            .groupby(["type_a", "type_b"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )

    ds = _events(sf_dir, ["user_id", "event_type"]).map_batches(
        pre, batch_format="pandas", batch_size=262144
    )
    parts = _concat(bucketed_apply(ds, ["user_id"], bucket_fn, num_buckets=buckets))
    df = parts.to_pandas().groupby(["type_a", "type_b"], as_index=False)["n_users"].sum()
    df = df.sort_values(["type_a", "type_b"]).reset_index(drop=True)
    return pa.table(
        {
            "type_a": pa.array(df["type_a"].astype(str), pa.string()),
            "type_b": pa.array(df["type_b"].astype(str), pa.string()),
            "n_users": pa.array(df["n_users"].to_numpy(dtype=np.int64), pa.int64()),
        }
    )


TYPE_COOCCURRENCE_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_users
FROM ut a JOIN ut b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- windowed distinct users (tumbling hour × COUNT DISTINCT) ------------------


def windowed_distinct_users(sf_dir: str) -> pa.Table:
    """COUNT(DISTINCT user_id) per tumbling hourly window — the windowed
    cardinality shape (unique visitors per hour). Two-level: per-batch dedup
    of (window, user) pairs, one bucketed pair-dedup shuffle (moves only key
    pairs, never full events), then a tiny per-window count. The exact
    counterpart of the sketch in ``distinct_users_per_type_approx``: use
    this while |windows|·|users| pairs fit a shuffle, the HLL form past it."""
    from ..bucket import bucketed_apply

    def pre(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        df = pd.DataFrame(
            {
                "w_start_us": _w_start_us(ts, HOUR_US),
                "user_id": batch.column("user_id").to_numpy(),
            }
        ).drop_duplicates()
        return _from_pandas(df)

    pairs = bucketed_apply(
        _events(sf_dir, ["ts", "user_id"]).map_batches(
            pre, batch_format="pyarrow", batch_size=131072
        ),
        ["w_start_us", "user_id"],
        lambda g: g.drop_duplicates(["w_start_us", "user_id"]),
    )

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("w_start_us", as_index=False).agg(n_users=("user_id", "size"))

    from ..bucket import bucketed_group_agg

    out = bucketed_group_agg(
        pairs.map_batches(count_partial, batch_format="pandas"),
        ["w_start_us"],
        dict(n_users=("n_users", "sum")),
        num_buckets=8,
    )
    t = _concat(out)
    t = t.take(pc.sort_indices(t, sort_keys=[("w_start_us", "ascending")]))
    return pa.Table.from_arrays(
        [
            t.column("w_start_us").cast(pa.int64()).cast(pa.timestamp("us")),
            t.column("n_users").cast(pa.int64()),
        ],
        names=["w_start", "n_users"],
    )


WINDOWED_DISTINCT_SQL = """
SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS w_start,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1 ORDER BY 1
"""


# --- CUMULATE windows (Flink window TVF): expanding steps within a period ------


def cumulate_windows(
    sf_dir: str, period_us: int = HOUR_US, step_us: int = 15 * 60 * US
) -> pa.Table:
    """CUMULATE window TVF (Flink's third window function next to TUMBLE
    and HOP): within each ``period`` an event belongs to every expanding
    window ``[p0, p0 + k*step)`` whose end is strictly after its
    timestamp — the early-firing "counts so far this hour, every 15 min"
    shape dashboards poll. Emits per (w_start = p0, w_end = p0 + k*step):
    the exact event count and the exact distinct-user count.

    Shape: a bounded 1→≤(period/step) explode per batch (vectorized — one
    mask per k, never per row), then the two-level exact machinery:
    per-batch partial counts → tiny bucketed sum for n_events; per-batch
    (window, user) dedup → one bucketed pair-dedup shuffle → per-window
    count for n_users (moves only key pairs). The driver joins the two
    O(windows) results."""
    from ..bucket import bucketed_apply, bucketed_group_agg

    K = period_us // step_us
    assert K * step_us == period_us, "step must divide period"

    def explode(batch: pa.Table) -> pd.DataFrame:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        uid = batch.column("user_id").to_numpy()
        p0 = ts // period_us * period_us
        k_min = (ts - p0) // step_us + 1
        parts = []
        for k in range(1, K + 1):
            sel = np.flatnonzero(k_min <= k)
            if len(sel):
                parts.append(
                    pd.DataFrame(
                        {"p0": p0[sel], "k": np.int64(k), "user_id": uid[sel]}
                    )
                )
        if not parts:
            return pd.DataFrame(
                {"p0": pd.Series(dtype=np.int64), "k": pd.Series(dtype=np.int64),
                 "user_id": pd.Series(dtype=np.int64)}
            )
        return pd.concat(parts, ignore_index=True)

    ex = _events(sf_dir, ["ts", "user_id"]).map_batches(
        explode, batch_format="pyarrow", batch_size=131072
    )

    # n_events: per-batch partial counts -> tiny bucketed sum
    def ev_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["p0", "k"], as_index=False).agg(n_events=("user_id", "size"))

    ev_counts = _concat(
        bucketed_group_agg(
            ex.map_batches(ev_partial, batch_format="pandas"),
            ["p0", "k"],
            dict(n_events=("n_events", "sum")),
            num_buckets=8,
        )
    ).to_pandas()

    # n_users: per-batch pair dedup -> bucketed global pair dedup -> count
    def pre_pairs(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["p0", "k", "user_id"])

    pairs = bucketed_apply(
        ex.map_batches(pre_pairs, batch_format="pandas"),
        ["p0", "k", "user_id"],
        lambda g: g.drop_duplicates(["p0", "k", "user_id"]),
    )

    def u_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["p0", "k"], as_index=False).agg(n_users=("user_id", "size"))

    u_counts = _concat(
        bucketed_group_agg(
            pairs.map_batches(u_partial, batch_format="pandas"),
            ["p0", "k"],
            dict(n_users=("n_users", "sum")),
            num_buckets=8,
        )
    ).to_pandas()

    df = ev_counts.merge(u_counts, on=["p0", "k"])
    df = df.sort_values(["p0", "k"]).reset_index(drop=True)
    p0a = df["p0"].to_numpy(dtype=np.int64)
    ka = df["k"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "w_start": pa.array(p0a, pa.int64()).cast(pa.timestamp("us")),
            "w_end": pa.array(p0a + ka * step_us, pa.int64()).cast(pa.timestamp("us")),
            "n_events": pa.array(df["n_events"].to_numpy(dtype=np.int64), pa.int64()),
            "n_users": pa.array(df["n_users"].to_numpy(dtype=np.int64), pa.int64()),
        }
    )


CUMULATE_WINDOWS_SQL = """
WITH base AS (
  SELECT user_id,
         epoch_us(ts) // 3600000000 * 3600000000 AS p0,
         (epoch_us(ts) - epoch_us(ts) // 3600000000 * 3600000000)
           // 900000000 + 1 AS k_min
  FROM events
), ex AS (
  SELECT user_id, p0, unnest(range(k_min, 5)) AS k
  FROM base
)
SELECT make_timestamp(p0) AS w_start,
       make_timestamp(p0 + k * 900000000) AS w_end,
       CAST(count(*) AS BIGINT) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM ex
GROUP BY p0, k
ORDER BY w_start, w_end
"""


# --- per-user first/last event summary (argmin/argmax merge) -------------------


def user_first_last(sf_dir: str) -> pa.Table:
    """Per user: first and last event's type + timestamps + event count —
    the argmin/argmax-by-(ts, event_id) aggregate (mergeable: each partial
    carries its candidate row; combine keeps the lexicographic winner).

    Per batch: one lexsort + boundary mask → ≤ |users| candidate rows per
    side; one user_id-bucketed reduce applies the same rule globally. The
    shuffle carries only (user, first/last candidates, count) partials."""
    from ..bucket import bucketed_apply

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch.column("user_id").to_numpy(),
                "event_id": batch.column("event_id").to_numpy(),
                "ts": batch.column("ts").cast(pa.int64()).to_numpy(),
                "event_type": batch.column("event_type").to_numpy(),
            }
        )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        last = np.concatenate((uid[1:] != uid[:-1], [True]))
        f, l = df[first], df[last]
        out = pd.DataFrame(
            {
                "user_id": f["user_id"].to_numpy(),
                "n_events": np.diff(
                    np.append(np.flatnonzero(first), len(uid))
                ).astype(np.int64),
                "first_ts": f["ts"].to_numpy(),
                "first_event_id": f["event_id"].to_numpy(),
                "first_type": f["event_type"].to_numpy(),
                "last_ts": l["ts"].to_numpy(),
                "last_event_id": l["event_id"].to_numpy(),
                "last_type": l["event_type"].to_numpy(),
            }
        )
        return _from_pandas(out)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "first_ts", "first_event_id"], kind="mergesort"
        )
        uid = g["user_id"].to_numpy()
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        starts = np.flatnonzero(first)
        n = np.add.reduceat(g["n_events"].to_numpy(dtype=np.int64), starts)
        f = g[first]
        gl = g.sort_values(["user_id", "last_ts", "last_event_id"], kind="mergesort")
        glu = gl["user_id"].to_numpy()
        l = gl[np.concatenate((glu[1:] != glu[:-1], [True]))]
        return pd.DataFrame(
            {
                "user_id": f["user_id"].to_numpy(),
                "n_events": n,
                "first_type": f["first_type"].to_numpy(),
                "first_ts": f["first_ts"].to_numpy(),
                "last_type": l["last_type"].to_numpy(),
                "last_ts": l["last_ts"].to_numpy(),
            }
        )

    parts = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"]).map_batches(
        partial, batch_format="pyarrow", batch_size=131072
    )
    t = _concat(bucketed_apply(parts, ["user_id"], reduce_fn, num_buckets=32))
    t = t.take(pc.sort_indices(t, sort_keys=[("user_id", "ascending")]))
    return pa.Table.from_arrays(
        [
            t.column("user_id").cast(pa.int64()),
            t.column("n_events").cast(pa.int64()),
            t.column("first_type").cast(pa.string()),
            t.column("first_ts").cast(pa.int64()).cast(pa.timestamp("us")),
            t.column("last_type").cast(pa.string()),
            t.column("last_ts").cast(pa.int64()).cast(pa.timestamp("us")),
        ],
        names=["user_id", "n_events", "first_type", "first_ts", "last_type", "last_ts"],
    )


USER_FIRST_LAST_SQL = """
WITH o AS (
  SELECT user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rf,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rl,
         count(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
)
SELECT f.user_id, f.n_events,
       f.event_type AS first_type, f.ts AS first_ts,
       l.event_type AS last_type, l.ts AS last_ts
FROM (SELECT * FROM o WHERE rf = 1) f
JOIN (SELECT * FROM o WHERE rl = 1) l USING (user_id)
ORDER BY f.user_id
"""


# --- DAU/MAU stickiness (two-granularity distinct + ratio join) ----------------


def dau_mau_stickiness(sf_dir: str) -> pa.Table:
    """Per calendar day: distinct active users, the containing month's
    distinct actives, and the DAU/MAU stickiness ratio — two exact
    distinct-counts at different granularities joined on the coarser one.

    Both sides are the bucketed pair-dedup shape (shuffle carries only
    (grain, user) pairs); the day→month join runs on the driver over the
    O(#days) aggregate."""
    from ..bucket import bucketed_apply

    def pairs(grain: str):
        def fn(batch: pa.Table) -> pa.Table:
            ts = batch.column("ts").cast(pa.int64()).to_numpy()
            g = (
                ts.astype("datetime64[us]")
                .astype(f"datetime64[{grain}]")
                .astype("datetime64[us]")
                .astype(np.int64)
            )
            df = pd.DataFrame(
                {"g_us": g, "user_id": batch.column("user_id").to_numpy()}
            ).drop_duplicates()
            return _from_pandas(df)

        return fn

    def count_per_grain(ds: rd.Dataset) -> pd.DataFrame:
        dedup = bucketed_apply(
            ds, ["g_us", "user_id"], lambda g: g.drop_duplicates(["g_us", "user_id"])
        )
        part = dedup.map_batches(
            lambda b: b.groupby("g_us", as_index=False).agg(n=("user_id", "size")),
            batch_format="pandas",
        )
        from ..bucket import bucketed_group_agg

        return (
            _concat(bucketed_group_agg(part, ["g_us"], dict(n=("n", "sum")), num_buckets=8))
            .to_pandas()
        )

    ev = _events(sf_dir, ["ts", "user_id"])
    dau = count_per_grain(ev.map_batches(pairs("D"), batch_format="pyarrow", batch_size=131072))
    mau = count_per_grain(ev.map_batches(pairs("M"), batch_format="pyarrow", batch_size=131072))
    day = dau["g_us"].to_numpy(dtype=np.int64)
    month_of_day = (
        day.astype("datetime64[us]").astype("datetime64[M]").astype("datetime64[us]").astype(np.int64)
    )
    mau_map = dict(zip(mau["g_us"].to_numpy(dtype=np.int64), mau["n"].to_numpy(dtype=np.int64)))
    mau_v = np.array([mau_map[m] for m in month_of_day], dtype=np.int64)
    order = np.argsort(day, kind="stable")
    day, dau_v, mau_v = day[order], dau["n"].to_numpy(dtype=np.int64)[order], mau_v[order]
    return pa.table(
        {
            "day": pa.array(day, pa.int64()).cast(pa.timestamp("us")),
            "dau": pa.array(dau_v, pa.int64()),
            "mau": pa.array(mau_v, pa.int64()),
            "stickiness": pa.array(np.round(dau_v / mau_v, 6), pa.float64()),
        }
    )


DAU_MAU_SQL = """
WITH d AS (
  SELECT date_trunc('day', ts) AS day, count(DISTINCT user_id) AS dau
  FROM events GROUP BY 1
), m AS (
  SELECT date_trunc('month', ts) AS month, count(DISTINCT user_id) AS mau
  FROM events GROUP BY 1
)
SELECT d.day, d.dau, m.mau,
       round(CAST(d.dau AS DOUBLE) / m.mau, 6) AS stickiness
FROM d JOIN m ON date_trunc('month', d.day) = m.month
ORDER BY d.day
"""


# --- bounded-frame moving average ---------------------------------------------


def user_moving_avg(sf_dir: str, window: int = 3, buckets: int | None = None) -> pa.Table:
    """Moving AVG(value) per user over the last ``window`` events — the
    bounded window frame ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW``
    (``user_running_sum`` covers the unbounded frame).

    Shape: one hash shuffle on user_id (``bucketed_apply``); inside each
    bucket one mergesort, then the frame sum is cumsum minus the
    group-shifted cumsum — vectorized over every user in the bucket at
    once. Sums run in integer micro-units so addition is order-free and the
    engine agrees bit-for-bit with the oracle's window-frame tree; the
    single float division per row happens identically on both sides."""
    from ..bucket import bucketed_apply

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        vu = np.round(g["value"].to_numpy() * 1e6).astype(np.int64)
        grp = pd.Series(vu).groupby(u)
        cs = grp.cumsum().to_numpy()
        shifted = pd.Series(cs).groupby(u).shift(window, fill_value=0).to_numpy()
        pos = pd.DataFrame({"u": u}).groupby("u").cumcount().to_numpy()
        cnt = np.minimum(pos + 1, window)
        return pd.DataFrame(
            {
                "user_id": u,
                "event_id": g["event_id"].to_numpy(),
                "ts": g["ts"].to_numpy(),
                "moving_avg": (cs - shifted) / (1e6 * cnt),
            }
        )

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])
    t = _concat(bucketed_apply(ds, ["user_id"], bucket_fn, num_buckets=buckets))
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]
        )
    )


USER_MOVING_AVG_SQL = """
SELECT user_id, event_id, ts,
       sum(CAST(round(value * 1000000) AS BIGINT)) OVER w
         / (1000000.0 * count(*) OVER w) AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts, event_id
"""


# --- EXACT distributed quantiles per type (integer-cent histograms) -----------


def _cent_hist_by_type(sf_dir: str) -> pd.DataFrame:
    """Per-(event_type, integer-cent) EXACT count histogram of `value` —
    the shared distributed pass behind the exact quantile and robust-stats
    operators. Values carry two decimal digits, so the cent histogram is
    lossless and its size is bounded by the VALUE RANGE (tens of thousands
    of bins), not the row count.

    Per-batch partials: one bincount per (type, cent) -> nonzero
    (event_type, cent, n) rows; one bucketed shuffle sums histograms."""
    from ..bucket import bucketed_group_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["value"].to_numpy() * 100).astype(np.int64)
        et = b["event_type"].astype(str)
        g = pd.DataFrame({"event_type": et, "cent": cents}).groupby(
            ["event_type", "cent"], as_index=False
        ).size()
        return pd.DataFrame(
            {
                "event_type": g["event_type"].astype(str),
                "cent": g["cent"].to_numpy(dtype=np.int64),
                "n": g["size"].to_numpy(dtype=np.int64),
            }
        )

    return _concat(
        bucketed_group_agg(
            _events(sf_dir, ["event_type", "value"]).map_batches(
                partial, batch_format="pandas", batch_size=262144
            ),
            ["event_type", "cent"],
            dict(n=("n", "sum")),
        )
    ).to_pandas()


def _hist_disc(cents: np.ndarray, cum: np.ndarray, q100: int) -> int:
    """DuckDB quantile_disc over a sorted histogram: the value at 0-based
    index ceil(q*n)-1 — integer q (x100), no float arithmetic."""
    n = int(cum[-1])
    target = -(-q100 * n // 100)
    return int(cents[np.searchsorted(cum, target)])


def value_quantiles_by_type(sf_dir: str) -> pa.Table:
    """EXACT p50/p90/p99 of `value` per event_type — the complement of the
    approximate sketch (`value_quantiles_approx`), via the shared
    ``_cent_hist_by_type`` pass: no global sort at any scale; the
    driver-side selection walks each type's cumulative histogram and picks
    index ceil(q*n)-1 — bit-identical to DuckDB's quantile_disc."""
    hist = _cent_hist_by_type(sf_dir)
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("cent", kind="mergesort")
        cents = g["cent"].to_numpy(dtype=np.int64)
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        qs = [_hist_disc(cents, cum, q100) / 100.0 for q100 in (50, 90, 99)]
        rows.append((et, n, *qs))
    rows.sort()
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n_events": pa.array([r[1] for r in rows], pa.int64()),
            "p50": pa.array([r[2] for r in rows], pa.float64()),
            "p90": pa.array([r[3] for r in rows], pa.float64()),
            "p99": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


VALUE_QUANTILES_BY_TYPE_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(quantile_disc(round(value * 100) / 100.0, 0.50), 2) AS p50,
       round(quantile_disc(round(value * 100) / 100.0, 0.90), 2) AS p90,
       round(quantile_disc(round(value * 100) / 100.0, 0.99), 2) AS p99
FROM events
GROUP BY 1 ORDER BY 1
"""


def value_anomalies_mad(sf_dir: str) -> pa.Table:
    """EXACT robust anomaly statistics per event_type: median, median
    absolute deviation, and the count of events beyond 4.5x MAD — the
    outlier monitor of a metrics pipeline, with NO global sort and NO
    second pass: the |x - med| histogram is the value histogram FOLDED
    around the median, so median, MAD and the anomaly count all come from
    the one shared ``_cent_hist_by_type`` exchange.

    Every comparison is integer (`2*dev > 9*mad` is 'dev > 4.5x MAD'
    cross-multiplied), so the distributed result is bit-equal to the
    sequential SQL oracle built from two chained quantile_disc calls."""
    hist = _cent_hist_by_type(sf_dir)
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("cent", kind="mergesort")
        cents = g["cent"].to_numpy(dtype=np.int64)
        cnt = g["n"].to_numpy(dtype=np.int64)
        cum = cnt.cumsum()
        n = int(cum[-1])
        med = _hist_disc(cents, cum, 50)
        # fold around the median: dev histogram = value histogram re-keyed
        # by |cent - med| (bins at equal dev merge)
        dev = np.abs(cents - med)
        order = np.argsort(dev, kind="stable")
        dsort, csort = dev[order], cnt[order]
        starts = np.concatenate(([True], dsort[1:] != dsort[:-1]))
        dvals = dsort[starts]
        dcnt = np.add.reduceat(csort, np.flatnonzero(starts))
        dcum = dcnt.cumsum()
        mad = _hist_disc(dvals, dcum, 50)
        n_anom = int(dcnt[2 * dvals > 9 * mad].sum())
        rows.append((et, n, med / 100.0, mad / 100.0, n_anom))
    rows.sort()
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n_events": pa.array([r[1] for r in rows], pa.int64()),
            "med": pa.array([r[2] for r in rows], pa.float64()),
            "mad": pa.array([r[3] for r in rows], pa.float64()),
            "n_anomalies": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


VALUE_ANOMALIES_MAD_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), m AS (
  SELECT event_type, quantile_disc(cents, 0.5) AS med FROM c GROUP BY 1
), d AS (
  SELECT c.event_type, c.cents, m.med, abs(c.cents - m.med) AS dev
  FROM c JOIN m USING (event_type)
), md AS (
  SELECT event_type, quantile_disc(dev, 0.5) AS mad FROM d GROUP BY 1
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(min(d.med) / 100.0, 2) AS med,
       round(min(md.mad) / 100.0, 2) AS mad,
       CAST(sum(CASE WHEN 2 * d.dev > 9 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalies
FROM d JOIN md USING (event_type)
GROUP BY 1 ORDER BY 1
"""


# --- calendar profile: activity heat-map by (weekday, hour) -------------------


def weekday_hour_profile(sf_dir: str) -> pa.Table:
    """Event count + exact value stats per (day-of-week, hour-of-day) — the
    calendar heat-map aggregate (traffic shaping, anomaly baselines).

    Per-batch partials collapse each batch to <= 168 rows before the tiny
    bucketed reduce, so the all-to-all moves KBs at any scale. dow follows
    DuckDB's ``dayofweek`` convention (Sunday=0; epoch day 0 was a
    Thursday=4). The avg is computed entirely in integer micro-units
    ((2*sum_u + n) // (2n), round-half-up) and divided once — order-free,
    bit-identical to the sequential oracle at every scale."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        dow = ((ts // 86_400_000_000) + 4) % 7
        hour = (ts // HOUR_US) % 24
        val_u = np.round(batch.column("value").to_numpy() * 1e6).astype(np.int64)
        df = pd.DataFrame({"dow": dow, "hour": hour, "value_u": val_u})
        g = df.groupby(["dow", "hour"], as_index=False).agg(
            n=("value_u", "size"), sum_value_u=("value_u", "sum")
        )
        return _from_pandas(g)

    from ..bucket import bucketed_group_agg

    partials = _events(sf_dir, ["ts", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=131072
    )
    t = _concat(
        bucketed_group_agg(
            partials,
            ["dow", "hour"],
            dict(n=("n", "sum"), sum_value_u=("sum_value_u", "sum")),
            num_buckets=8,
        )
    )
    su = t.column("sum_value_u").cast(pa.int64()).to_numpy()
    n = t.column("n").cast(pa.int64()).to_numpy()
    avg = pa.array(((2 * su + n) // (2 * n)) / 1e6, pa.float64())
    out = pa.Table.from_arrays(
        [
            t.column("dow").cast(pa.int64()),
            t.column("hour").cast(pa.int64()),
            t.column("n").cast(pa.int64()),
            pa.array(su / 1e6, pa.float64()),
            avg,
        ],
        names=["dow", "hour", "n", "sum_value", "avg_value"],
    )
    return out.take(
        pc.sort_indices(out, sort_keys=[("dow", "ascending"), ("hour", "ascending")])
    )


WEEKDAY_HOUR_SQL = """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       count(*) AS n,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0
         AS sum_value,
       ((2 * CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
         + count(*)) // (2 * count(*))) / 1000000.0 AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- distribution-rank window: per-event percentile within its type -----------


def value_percentile_rank(sf_dir: str) -> pa.Table:
    """Per event: the ``cume_dist()`` of its value within its event_type —
    the distribution-rank window (``cume_dist() OVER (PARTITION BY type
    ORDER BY value)``) WITHOUT a global sort: values carry 2 decimals, so
    the per-type cumulative integer-cent histogram (the shared
    ``_cent_hist_by_type`` exchange — bounded by the VALUE RANGE, not the
    row count) is broadcast once via ``ray.put`` and each batch looks its
    ranks up with one searchsorted per type present. cume_dist = (rows with
    value <= v) / n_type: an exact-integer ratio whose float64 division is
    IEEE-identical everywhere, so the distributed result is bit-equal to
    the sequential window oracle."""
    import ray

    from ..broadcast import cached_get as _cget

    hist = _cent_hist_by_type(sf_dir)
    lut: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("cent", kind="mergesort")
        cents = g["cent"].to_numpy(dtype=np.int64)
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        lut[str(et)] = (cents, cum, int(cum[-1]))
    ref = ray.put(lut)

    def rank(batch: pa.Table) -> pa.Table:
        m = _cget(ref)
        et = np.asarray(batch.column("event_type").to_pandas())
        cents = np.round(batch.column("value").to_numpy() * 100).astype(np.int64)
        out = np.empty(len(et), dtype=np.float64)
        for t in np.unique(et):
            sel = np.flatnonzero(et == t)
            tc, tcum, n = m[str(t)]
            idx = np.searchsorted(tc, cents[sel], side="right") - 1
            # every batch cent exists in the global histogram by construction
            out[sel] = tcum[idx] / n
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "value": batch.column("value"),
                "pct_rank": pa.array(out, pa.float64()),
            }
        )

    t = _concat(
        _events(sf_dir, ["event_id", "event_type", "value"]).map_batches(
            rank, batch_format="pyarrow", batch_size=131072
        )
    )
    return t.take(pc.sort_indices(t, sort_keys=[("event_id", "ascending")]))


VALUE_PERCENTILE_RANK_SQL = """
SELECT event_id, event_type, value,
       cume_dist() OVER (
         PARTITION BY event_type
         ORDER BY CAST(round(value * 100) AS BIGINT)
       ) AS pct_rank
FROM events
ORDER BY event_id
"""
