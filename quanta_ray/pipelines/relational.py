"""Relational pipelines over the TPC-H-ish tables — pure Ray Data.

Demonstrates the engine's general query capability with scale-correct join
strategies:

- **broadcast join** for small sides (dimension tables): ``ray.put`` the
  small table ONCE on the driver; every map task reads it zero-copy from the
  object store and merges per batch — no shuffle, no per-batch re-shipping;
- **partitioned hash join** for two large sides: ``Dataset.join`` (hash
  shuffle on the key) when available, else an explicit bucket-groupby join;
- **pre-aggregated groupby** everywhere (partials inside map_batches, the
  all-to-all moves partial aggregates only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..broadcast import cached_get as _cached_get
from ..schema import from_pandas as _from_pandas, read_parquet_clean as _read_pq


def _read(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    return _read_pq(f"{sf_dir}/{name}.parquet", columns=columns)


def _concat(ds: rd.Dataset) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


def _broadcast_limit() -> int:
    """Max rows a 'dimension' side may have and still be broadcast.

    `customer` is only a dimension at small SF — at 100 TB-equivalent scale
    it is a 1.5 B-row fact table, and broadcasting a custkey-keyed map would
    ship tens of GB to every task. Joins below count the dimension side
    first (parquet metadata count, no data read) and fall back to the
    explicit hash-bucket shuffle join past this limit. Env-overridable for
    tests and deployment tuning."""
    import os

    return int(os.environ.get("QUANTA_BROADCAST_ROW_LIMIT", 2_000_000))


# --- TPC-H Q1-style pricing summary ------------------------------------------


def pricing_summary(sf_dir: str) -> pa.Table:
    """Aggregate lineitem by (returnflag, linestatus) with computed measures.

    Columns pruned at the read; per-batch partial aggregation; the global
    groupby shuffles ~6 rows per batch instead of 6M rows per SF.

    All measures sum in INTEGER units (qty is integer-valued; price has 2
    decimals -> cents; disc_price has 4 decimals and charge 6 -> both
    micro-units, tie-free *1e6): distributed float partial sums are
    order-dependent and diverge from the oracle in the last ulp."""

    def partial(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        tax = batch.column("l_tax").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        disc_price = price * (1.0 - disc)
        df = pd.DataFrame(
            {
                "l_returnflag": batch.column("l_returnflag").to_numpy(),
                "l_linestatus": batch.column("l_linestatus").to_numpy(),
                "qty": np.round(qty).astype(np.int64),
                "price_c": np.round(price * 100.0).astype(np.int64),
                "disc_u": np.round(disc_price * 1_000_000.0).astype(np.int64),
                "charge_u": np.round(
                    disc_price * (1.0 + tax) * 1_000_000.0
                ).astype(np.int64),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"),
            sum_base_price=("price_c", "sum"),
            sum_disc_price=("disc_u", "sum"),
            sum_charge=("charge_u", "sum"),
            count_order=("qty", "size"),
        )
        return _from_pandas(g)

    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    ).map_batches(partial, batch_format="pyarrow", batch_size=131072)
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("sum_charge", alias_name="sum_charge"),
        Sum("count_order", alias_name="count_order"),
    )
    t = _concat(out)
    return pa.Table.from_arrays(
        [
            t.column("l_returnflag"),
            t.column("l_linestatus"),
            t.column("sum_qty").cast(pa.float64()),
            pc.divide(t.column("sum_base_price").cast(pa.float64()), 100.0),
            pc.divide(t.column("sum_disc_price").cast(pa.float64()), 1_000_000.0),
            pc.divide(t.column("sum_charge").cast(pa.float64()), 1_000_000.0),
            t.column("count_order").cast(pa.int64()),
        ],
        names=[
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            "count_order",
        ],
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         / 100.0 AS sum_base_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                     AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_disc_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           * 1000000) AS BIGINT)) AS BIGINT)
         / 1000000.0 AS sum_charge,
       count(*) AS count_order
FROM lineitem
GROUP BY 1, 2
"""


# --- broadcast join: orders ⋈ customer ⋈ nation ------------------------------


def revenue_by_nation(sf_dir: str) -> pa.Table:
    """Total order value per customer nation.

    When customer is genuinely small (≤ ``_broadcast_limit()``, counted from
    parquet metadata): broadcast once via ``ray.put``; each orders batch does
    an in-memory merge — no shuffle on the big side until the final (tiny)
    groupby of partials. Past the limit customer is fact-scale, and the join
    falls back to the explicit hash-bucket shuffle join (nation — 25 rows —
    stays broadcast onto customer batches either way)."""
    from ray.data.aggregate import Sum

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    if n_cust <= _broadcast_limit():
        customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
        nation_of_cust = customer["c_nationkey"].map(
            nation.set_index("n_nationkey")["n_name"]
        )
        names, codes_per_cust = np.unique(
            nation_of_cust.to_numpy(dtype=object), return_inverse=True
        )
        ck = customer["c_custkey"].to_numpy(dtype=np.int64)
        if ck.max() <= 4 * len(ck) + 1024:
            # dense-key fast path (region_revenue idiom): fancy-index join
            dense = np.full(int(ck.max()) + 1, -1, dtype=np.int16)
            dense[ck] = codes_per_cust
            ref = ray.put((names, dense, None))
        else:
            order = np.argsort(ck)
            ref = ray.put((names, codes_per_cust[order].astype(np.int16), ck[order]))

        def join_agg(batch: pa.Table) -> pa.Table:
            """Arrow-native broadcast join + partial aggregate: custkey →
            nation code via fancy-index (or searchsorted), one bincount —
            a ≤25-row partial per batch, no pandas in the hot path."""
            names, codes, keys = _cached_get(ref)
            N = len(names)
            ck_b = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            tp = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            if keys is None:
                code = codes[ck_b]
            else:
                pos = np.searchsorted(keys, ck_b)
                pos = np.minimum(pos, len(keys) - 1)
                code = np.where(keys[pos] == ck_b, codes[pos], -1)
            code = code.astype(np.int64) + 1  # slot 0 = FK miss
            # integer CENTS (2-decimal source, *100 tie-free): float
            # bincount weights are order-dependent across the partial tree
            tp_c = np.round(tp * 100.0).astype(np.int64)
            rev_c = np.zeros(N + 1, dtype=np.int64)
            np.add.at(rev_c, code, tp_c)
            hit = np.bincount(code, minlength=N + 1)[1:] > 0
            return pa.table(
                {
                    "n_name": pa.array(names[hit], pa.string()),
                    "rev_c": pa.array(rev_c[1:][hit], pa.int64()),
                }
            )

        out = (
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .map_batches(join_agg, batch_format="pyarrow", batch_size=131072)
            .groupby("n_name")
            .aggregate(Sum("rev_c", alias_name="rev_c"))
        )
    else:
        nref = ray.put(nation.set_index("n_nationkey")["n_name"])

        def cust_nation(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "c_custkey": batch["c_custkey"].to_numpy(),
                    "n_name": batch["c_nationkey"].map(_cached_get(nref)),
                }
            )

        cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            cust_nation, batch_format="pandas", batch_size=131072
        )
        joined = _bucket_join(
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
            cust_ds,
            "o_custkey",
            "c_custkey",
            16,
        )

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.assign(
                rev_c=np.round(
                    batch["o_totalprice"].to_numpy(np.float64) * 100.0
                ).astype(np.int64)
            )
            return batch.groupby("n_name", as_index=False)["rev_c"].sum()

        out = (
            joined.map_batches(partial, batch_format="pandas", batch_size=262144)
            .groupby("n_name")
            .aggregate(Sum("rev_c", alias_name="rev_c"))
        )
    t = _concat(out)
    return pa.Table.from_arrays(
        [t.column("n_name"), pc.divide(t.column("rev_c").cast(pa.float64()), 100.0)],
        names=["n_name", "revenue"],
    )


REVENUE_BY_NATION_SQL = """
SELECT n.n_name,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""


# --- large-large hash join: lineitem ⋈ orders --------------------------------


def revenue_by_orderpriority(sf_dir: str) -> pa.Table:
    """lineitem ⋈ orders on orderkey (both large) → revenue per priority.

    Primary path: explicit hash-bucket join (tag both sides with
    hash(key) % B → one bucket groupby → vectorized pandas merge per
    bucket) — same shuffle volume as ``Dataset.join`` but measured ~1.5×
    faster here (3.2 s vs 4.5–5.7 s at sf0.1/32 cpu, identical output);
    set ``QUANTA_USE_DATASET_JOIN=1`` to use Ray's native join instead."""
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(batch: pa.Table) -> pa.Table:
        # integer MICRO-units (4-decimal product *1e6 is tie-free):
        # distributed float partial sums are order-dependent and diverge
        # from the oracle in the last ulp
        r = pc.round(
            pc.multiply(
                pc.multiply(
                    batch.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
                ),
                pa.scalar(1_000_000.0),
            )
        ).cast(pa.int64())
        return pa.Table.from_arrays(
            [batch.column("l_orderkey"), r], names=["l_orderkey", "rev_u"]
        )

    lineitem = lineitem.map_batches(rev, batch_format="pyarrow", batch_size=131072)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    from ray.data.aggregate import Sum

    import os

    if os.environ.get("QUANTA_USE_DATASET_JOIN") and hasattr(lineitem, "join"):
        joined = lineitem.join(
            orders,
            join_type="inner",
            on=("l_orderkey",),
            right_on=("o_orderkey",),
            num_partitions=16,
        )
    else:
        joined = _bucket_join(lineitem, orders, "l_orderkey", "o_orderkey", 16)

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native partial: dictionary-encode the 5-value priority
        # column (zero-copy in) + one int64 scatter-add (np.add.at keeps
        # exactness where float bincount weights would lose bits past
        # 2^53) — no pandas block consolidation on the shuffle side
        enc = batch.column("o_orderpriority").combine_chunks().dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        rev_u = batch.column("rev_u").to_numpy(zero_copy_only=False)
        sums = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.add.at(sums, idx, rev_u)
        return pa.table(
            {"o_orderpriority": enc.dictionary, "rev_u": pa.array(sums, pa.int64())}
        )

    out = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("o_orderpriority")
        .aggregate(Sum("rev_u", alias_name="rev_u"))
    )
    t = _concat(out)
    return pa.Table.from_arrays(
        [
            t.column("o_orderpriority"),
            pc.divide(t.column("rev_u").cast(pa.float64()), 1_000_000.0),
        ],
        names=["o_orderpriority", "revenue"],
    )


def _bucket_join(left: rd.Dataset, right: rd.Dataset, lkey: str, rkey: str, buckets: int) -> rd.Dataset:
    """Explicit partitioned hash join: tag both sides with hash-bucket, union,
    per-bucket pandas merge inside map_groups."""
    import pandas as pd

    def tag(key: str, side: int):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            # nullable Int64 so the union's schema alignment pads missing
            # columns with NA instead of upcasting int64 → float64 (which
            # silently degrades join keys/ids in the output)
            for c in batch.columns:
                if pd.api.types.is_integer_dtype(batch[c].dtype):
                    batch[c] = batch[c].astype("Int64")
            batch["_bucket"] = pd.array(
                pd.util.hash_array(batch[key].to_numpy(dtype="int64")) % buckets,
                dtype="Int64",
            )
            batch["_side"] = pd.array([side] * len(batch), dtype="Int64")
            return batch

        return fn

    lt = left.map_batches(tag(lkey, 0), batch_format="pandas")
    rt = right.map_batches(tag(rkey, 1), batch_format="pandas")
    both = lt.union(rt)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0].dropna(axis=1, how="all")
        rg = g[g["_side"] == 1].dropna(axis=1, how="all")
        if lg.empty or rg.empty:
            # a one-sided bucket (sparse side missed it entirely): dropna
            # erased the absent side's columns, so build the empty inner-join
            # result from the union schema instead of merging
            return g.drop(columns=["_bucket", "_side"]).iloc[0:0]
        m = lg.merge(rg, left_on=lkey, right_on=rkey)
        return m.drop(columns=[c for c in ("_bucket_x", "_bucket_y", "_side_x", "_side_y", "_bucket", "_side") if c in m.columns])

    return both.groupby("_bucket").map_groups(merge, batch_format="pandas")


REVENUE_BY_ORDERPRIORITY_SQL = """
SELECT o.o_orderpriority,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000)
                     AS BIGINT)) AS BIGINT) / 1000000.0 AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


# --- filtered semi-join: orders by high-balance customers --------------------


def orders_of_top_customers(sf_dir: str, min_acctbal: float = 5000.0) -> pa.Table:
    """Semi-join: broadcast key set while customer is small (Bloom-filter
    pattern at scale); hash-bucket shuffle semi-join past the broadcast
    limit (key rows shuffle, orders never broadcast)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    if _read(sf_dir, "customer", ["c_custkey"]).count() <= _broadcast_limit():
        cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).to_pandas()
        keys = frozenset(cust.loc[cust["c_acctbal"] > min_acctbal, "c_custkey"])
        ref = ray.put(keys)

        def semi_filter(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch["o_custkey"].isin(_cached_get(ref))]

        out = orders.map_batches(
            semi_filter, batch_format="pandas", batch_size=131072
        )
    else:
        import pyarrow.dataset as pads

        # the filter column must be in the read schema for the scanner to
        # bind it; project it away immediately after the filtered read
        keys_ds = _read_pq(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_acctbal"],
            filter=(pads.field("c_acctbal") > pads.scalar(min_acctbal)),
        ).select_columns(["c_custkey"])
        joined = _bucket_join(orders, keys_ds, "o_custkey", "c_custkey", 16)
        out = joined.map_batches(
            lambda df: df[["o_orderkey", "o_custkey", "o_totalprice"]],
            batch_format="pandas",
        )
    t = _concat(out)
    idx = pc.sort_indices(t, sort_keys=[("o_orderkey", "ascending")])
    return t.take(idx)


ORDERS_OF_TOP_CUSTOMERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
ORDER BY o_orderkey
"""


# --- additional SQL-checkable operators --------------------------------------


def orders_by_month(sf_dir: str) -> pa.Table:
    """Order count + revenue per calendar month (pandas Period per batch —
    calendar arithmetic is not a fixed-size window). Revenue sums in
    integer CENTS (o_totalprice is a 2-decimal source column, so *100 is
    tie-free): float partial sums are order-dependent across the
    distributed tree and diverge from the oracle in the last ulp."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            month=batch["o_orderdate"].dt.to_period("M").dt.to_timestamp(),
            rev_c=np.round(
                batch["o_totalprice"].to_numpy(np.float64) * 100.0
            ).astype(np.int64),
        )
        return batch.groupby("month", as_index=False).agg(
            n_orders=("o_orderkey", "size"), rev_c=("rev_c", "sum")
        )

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pandas", batch_size=131072)
        .groupby("month")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("rev_c", alias_name="rev_c"),
        )
    )
    t = _concat(out)
    return pa.Table.from_arrays(
        [
            t.column("month").cast(pa.timestamp("us")),
            t.column("n_orders").cast(pa.int64()),
            pc.divide(t.column("rev_c").cast(pa.float64()), 100.0),
        ],
        names=["month", "n_orders", "revenue"],
    )


ORDERS_BY_MONTH_SQL = """
SELECT date_trunc('month', o_orderdate) AS month,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS revenue
FROM orders GROUP BY 1
"""


def shipped_qty_by_flag(sf_dir: str, before: str = "1997-01-01") -> pa.Table:
    """Filter (predicate pushed to the parquet read) + grouped aggregate."""
    import pyarrow.dataset as pads

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_shipdate"],
        filter=(pads.field("l_shipdate") < pads.scalar(pd.Timestamp(before))),
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # qty is integer-valued: sum as int64 (order-free; float sums of
        # large integer totals lose bits past 2^53 at full scale)
        batch = batch.assign(
            qty_i=np.round(batch["l_quantity"].to_numpy(np.float64)).astype(
                np.int64
            )
        )
        return batch.groupby("l_returnflag", as_index=False).agg(
            sum_qty=("qty_i", "sum"), n=("qty_i", "size")
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("l_returnflag")
        .aggregate(Sum("sum_qty", alias_name="sum_qty"), Sum("n", alias_name="n"))
    )
    t = _concat(out)
    return pa.Table.from_arrays(
        [
            t.column("l_returnflag"),
            t.column("sum_qty").cast(pa.float64()),
            t.column("n").cast(pa.int64()),
        ],
        names=["l_returnflag", "sum_qty", "n"],
    )


SHIPPED_QTY_SQL = """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS sum_qty,
       count(*) AS n
FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


def top_parts_by_price(sf_dir: str, k: int = 15) -> pa.Table:
    """Global sort + limit (top-k)."""
    out = (
        _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
        .sort(["p_retailprice", "p_partkey"], descending=[True, False])
        .limit(k)
    )
    return _concat(out)


TOP_PARTS_SQL = """
SELECT p_partkey, p_name, p_retailprice
FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 15
"""


def region_revenue(sf_dir: str) -> pa.Table:
    """Revenue per region: a 4-way star join (orders ⋈ customer ⋈ nation ⋈
    region). While customer is genuinely small the three lookups COMPOSE
    into one broadcast custkey→region map on the driver, so the fact table
    does zero shuffles before the (5-row) final aggregate; past the
    broadcast limit, customer (fact-scale at real SF) goes through the
    hash-bucket shuffle join — only nation⋈region (≤ 25 rows) stays
    broadcast."""
    from ray.data.aggregate import Sum

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nat_region = nation.merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    ).set_index("n_nationkey")["r_name"]
    if _read(sf_dir, "customer", ["c_custkey"]).count() <= _broadcast_limit():
        customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
        region_of_cust = customer["c_nationkey"].map(nat_region)
        names, codes_per_cust = np.unique(
            region_of_cust.to_numpy(dtype=object), return_inverse=True
        )
        ck = customer["c_custkey"].to_numpy(dtype=np.int64)
        if ck.max() <= 4 * len(ck) + 1024:
            # dense-key fast path: one O(max_key) int8 array, broadcast once;
            # per batch the join is a direct fancy-index (no hashing at all)
            dense = np.full(int(ck.max()) + 1, -1, dtype=np.int16)
            dense[ck] = codes_per_cust
            ref = ray.put((names, dense, None))
        else:
            # sparse keys: sorted-key searchsorted lookup (still vectorized)
            order = np.argsort(ck)
            ref = ray.put((names, codes_per_cust[order].astype(np.int16), ck[order]))

        def join_agg(batch: pa.Table) -> pa.Table:
            """Arrow-native broadcast join + partial aggregate: fancy-index
            (or searchsorted) the custkey→region code, then two bincounts.
            One (R+1)-row partial per batch; no pandas in the hot path."""
            names, codes, keys = _cached_get(ref)
            R = len(names)
            ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            tp = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            if keys is None:
                code = codes[ck]
            else:
                pos = np.searchsorted(keys, ck)
                pos = np.minimum(pos, len(keys) - 1)
                code = np.where(keys[pos] == ck, codes[pos], -1)
            code = code.astype(np.int64) + 1  # slot 0 = unmatched (FK miss)
            # integer CENTS (2-decimal source, *100 tie-free): float
            # bincount weights are order-dependent across the partial tree
            tp_c = np.round(tp * 100.0).astype(np.int64)
            rev_c = np.zeros(R + 1, dtype=np.int64)
            np.add.at(rev_c, code, tp_c)
            n = np.bincount(code, minlength=R + 1)[1:]
            hit = n > 0  # inner-join semantics: no zero rows for
            # regions unseen in this batch (or in the data at all)
            return pa.table(
                {
                    "r_name": pa.array(names[hit], pa.string()),
                    "rev_c": pa.array(rev_c[1:][hit], pa.int64()),
                    "n_orders": pa.array(n[hit], pa.int64()),
                }
            )

        out = (
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .map_batches(join_agg, batch_format="pyarrow", batch_size=131072)
            .groupby("r_name")
            .aggregate(Sum("rev_c", alias_name="rev_c"), Sum("n_orders", alias_name="n_orders"))
        )
    else:
        nref = ray.put(nat_region)

        def cust_region(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "c_custkey": batch["c_custkey"].to_numpy(),
                    "r_name": batch["c_nationkey"].map(_cached_get(nref)),
                }
            )

        cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            cust_region, batch_format="pandas", batch_size=131072
        )
        joined = _bucket_join(
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
            cust_ds,
            "o_custkey",
            "c_custkey",
            16,
        )

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.assign(
                rev_c=np.round(
                    batch["o_totalprice"].to_numpy(np.float64) * 100.0
                ).astype(np.int64)
            )
            return batch.groupby("r_name", as_index=False).agg(
                rev_c=("rev_c", "sum"), n_orders=("rev_c", "size")
            )

        out = (
            joined.map_batches(partial, batch_format="pandas", batch_size=262144)
            .groupby("r_name")
            .aggregate(Sum("rev_c", alias_name="rev_c"), Sum("n_orders", alias_name="n_orders"))
        )
    t = _concat(out)
    return pa.Table.from_arrays(
        [
            t.column("r_name"),
            pc.divide(t.column("rev_c").cast(pa.float64()), 100.0),
            t.column("n_orders").cast(pa.int64()),
        ],
        names=["r_name", "revenue", "n_orders"],
    )


REGION_REVENUE_SQL = """
SELECT r.r_name,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1
"""


def customer_order_stats(sf_dir: str, min_orders: int = 5) -> pa.Table:
    """Per-customer order count + spend, HAVING count ≥ N — a
    high-cardinality groupby (every customer is a group) through the
    hash-bucketed aggregation path. Spend sums in integer CENTS
    (2-decimal source column, tie-free *100): distributed float partial
    sums are order-dependent and diverge from the oracle in the last ulp."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            total_c=np.round(
                batch["o_totalprice"].to_numpy(np.float64) * 100.0
            ).astype(np.int64)
        )
        return batch.groupby("o_custkey", as_index=False).agg(
            n_orders=("total_c", "size"), total_c=("total_c", "sum")
        )

    from ..bucket import bucketed_group_agg

    partials = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        partial, batch_format="pandas", batch_size=131072
    )
    agg = bucketed_group_agg(
        partials, ["o_custkey"], dict(n_orders=("n_orders", "sum"), total_c=("total_c", "sum"))
    )
    filtered = agg.map_batches(
        lambda df: df[df["n_orders"] >= min_orders], batch_format="pandas"
    )
    t = _concat(filtered)
    out = pa.Table.from_arrays(
        [
            t.column("o_custkey"),
            t.column("n_orders").cast(pa.int64()),
            pc.divide(t.column("total_c").cast(pa.float64()), 100.0),
        ],
        names=["o_custkey", "n_orders", "total"],
    )
    return out.take(pc.sort_indices(out, sort_keys=[("o_custkey", "ascending")]))


CUSTOMER_ORDER_STATS_SQL = """
SELECT o_custkey, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS total
FROM orders GROUP BY 1 HAVING count(*) >= 5
ORDER BY o_custkey
"""


# --- AS-OF join: events ⋈ latest prior order ---------------------------------


def asof_latest_order(sf_dir: str, buckets: int | None = None) -> pa.Table:
    """AS-OF join — the time-series point-in-time lookup Ray Data lacks
    natively: each event ⋈ the latest order of the same user with
    o_orderdate <= event ts (tie on o_orderdate broken by max o_orderkey,
    making the result deterministic where SQL ASOF would be ambiguous).

    Distributed shape: hash-bucket BOTH sides on the user key (one
    all-to-all moving only pruned columns), then per bucket one vectorized
    ``pd.merge_asof`` (per-key via ``by=``) over bucket-locally time-sorted
    frames. Partitioning assumption: every row of one user lands in one
    bucket; no global sort is needed. Left-outer semantics: events with no
    prior order keep nulls.

    Shuffle width: the two sides are PACKED into one narrow union schema
    (key, k1, t1, v1) — event_id/o_orderkey share k1, ts/o_orderdate share
    t1 — instead of padding each side with the other's null columns, so
    every shuffled row is fully utilized (~half the bytes of the padded
    form). Tag stages are zero-copy Arrow column selection."""
    import numpy as np

    events = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    if buckets is None:
        from ..bucket import auto_buckets

        buckets = max(auto_buckets(events), auto_buckets(orders))

    def _bk(uid: np.ndarray) -> pa.Array:
        return pa.array((pd.util.hash_array(uid) % buckets).astype(np.int64))

    def tag_ev(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "k1": b.column("event_id"),
                "t1": b.column("ts"),
                "v1": pa.nulls(b.num_rows, pa.float64()),
                "_side": pa.array(np.zeros(b.num_rows, np.int8)),
                "_bucket": _bk(b.column("user_id").to_numpy()),
            }
        )

    def tag_od(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("o_custkey"),
                "k1": b.column("o_orderkey"),
                "t1": b.column("o_orderdate"),
                "v1": b.column("o_totalprice"),
                "_side": pa.array(np.ones(b.num_rows, np.int8)),
                "_bucket": _bk(b.column("o_custkey").to_numpy()),
            }
        )

    both = events.map_batches(tag_ev, batch_format="pyarrow").union(
        orders.map_batches(tag_od, batch_format="pyarrow")
    )

    out_cols = ["event_id", "user_id", "last_orderkey", "last_orderdate", "last_totalprice"]

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        side = g["_side"].to_numpy()
        ev = g[side == 0]
        if not len(ev):
            return pd.DataFrame(
                {
                    "event_id": pd.array([], dtype="Int64"),
                    "user_id": pd.array([], dtype="Int64"),
                    "last_orderkey": pd.array([], dtype="Int64"),
                    "last_orderdate": pd.Series([], dtype="datetime64[us]"),
                    "last_totalprice": pd.Series([], dtype="float64"),
                }
            )
        ev = (
            pd.DataFrame(
                {
                    "event_id": ev["k1"].astype("int64"),
                    "ts": ev["t1"].astype("datetime64[us]"),
                    "user_id": ev["user_id"].astype("int64"),
                }
            )
            .sort_values("ts", kind="mergesort")
            .reset_index(drop=True)
        )
        od = g[side == 1]
        od = (
            pd.DataFrame(
                {
                    "user_id": od["user_id"].astype("int64"),
                    "o_orderdate": od["t1"].astype("datetime64[us]"),
                    "o_orderkey": od["k1"].astype("int64"),
                    "o_totalprice": od["v1"].astype("float64"),
                }
            )
            # merge_asof keeps the LAST right row among equal on-keys, so
            # sorting by (date, orderkey) realizes the max-orderkey tiebreak
            .sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
            .reset_index(drop=True)
        )
        m = pd.merge_asof(
            ev,
            od,
            left_on="ts",
            right_on="o_orderdate",
            by="user_id",
            direction="backward",
        )
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("Int64"),
                "user_id": m["user_id"].astype("Int64"),
                "last_orderkey": pd.array(m["o_orderkey"], dtype="Int64"),
                "last_orderdate": m["o_orderdate"].astype("datetime64[us]"),
                "last_totalprice": m["o_totalprice"],
            }
        )

    out = both.groupby("_bucket").map_groups(asof, batch_format="pandas")
    t = _concat(out).select(out_cols)
    return t.take(pc.sort_indices(t, sort_keys=[("event_id", "ascending")]))


# --- anti-join: customers with no orders -------------------------------------


def customers_without_orders(
    sf_dir: str, since: str = "2000-01-01", buckets: int | None = None
) -> pa.Table:
    """Distributed ANTI-join (NOT EXISTS): customers with no order on or
    after ``since``.

    Shape: the probe side's predicate is pushed down to the parquet scan
    (only qualifying order rows leave storage), then ships only its
    DISTINCT keys per batch (a partial dedup inside ``map_batches``, so the
    shuffle carries distinct custkeys per block, never order rows), both
    sides hash-bucket on the key, and each bucket does one vectorized
    ``isin`` negation. Every row of a key lands in one bucket, so the anti
    test is exact with no global build side and no broadcast."""
    import datetime as _dt

    import numpy as np
    import pyarrow.dataset as pads

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    okeys = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=(
            pads.field("o_orderdate")
            >= pads.scalar(_dt.datetime.fromisoformat(since))
        ),
    ).select_columns(["o_custkey"])
    if buckets is None:
        from ..bucket import auto_buckets

        buckets = max(auto_buckets(cust, floor=16), auto_buckets(okeys, floor=16))

    # Arrow-native tag stages: zero-copy column selection + one vectorized
    # hash; probe-side padding is NULL columns (no fabricated values). The
    # probe ships only per-batch-distinct keys, so the padded width rides
    # on the (already reduced) key rows, not order rows.
    def tag_c(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy()
        return pa.table(
            {
                "key": b.column("c_custkey"),
                "c_name": b.column("c_name"),
                "c_acctbal": b.column("c_acctbal"),
                "_side": pa.array(np.zeros(b.num_rows, np.int8)),
                "_bucket": pa.array((pd.util.hash_array(k) % buckets).astype(np.int64)),
            }
        )

    def tag_o(b: pa.Table) -> pa.Table:
        k = np.unique(b.column("o_custkey").to_numpy())
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "c_name": pa.nulls(len(k), pa.string()),
                "c_acctbal": pa.nulls(len(k), pa.float64()),
                "_side": pa.array(np.ones(len(k), np.int8)),
                "_bucket": pa.array((pd.util.hash_array(k) % buckets).astype(np.int64)),
            }
        )

    both = cust.map_batches(tag_c, batch_format="pyarrow").union(
        okeys.map_batches(tag_o, batch_format="pyarrow")
    )

    def anti(g: pd.DataFrame) -> pa.Table:
        c = g[g["_side"] == 0]
        have = g.loc[g["_side"] == 1, "key"].to_numpy(dtype=np.int64)
        keep = c[~c["key"].isin(have)]
        # explicit-schema Arrow output: a bucket whose customers ALL have
        # orders yields 0 rows, and the schema must survive that
        return pa.table(
            {
                "c_custkey": pa.array(keep["key"].to_numpy(dtype=np.int64), pa.int64()),
                "c_name": pa.array(keep["c_name"].astype(str), pa.string()),
                "c_acctbal": pa.array(
                    np.round(keep["c_acctbal"].to_numpy(dtype=np.float64), 4),
                    pa.float64(),
                ),
            }
        )

    out = both.groupby("_bucket").map_groups(anti, batch_format="pandas")
    t = _concat(out)
    if t.num_rows == 0:
        t = pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "c_name": pa.array([], pa.string()),
                "c_acctbal": pa.array([], pa.float64()),
            }
        )
    return t.take(pc.sort_indices(t, sort_keys=[("c_custkey", "ascending")]))


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, round(c_acctbal, 4) AS c_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= DATE '2000-01-01'
)
ORDER BY c_custkey
"""


ASOF_LATEST_ORDER_SQL = """
SELECT e.event_id, e.user_id,
       o.o_orderkey   AS last_orderkey,
       o.o_orderdate  AS last_orderdate,
       o.o_totalprice AS last_totalprice
FROM events e
LEFT JOIN LATERAL (
  SELECT o_orderkey, o_orderdate, o_totalprice
  FROM orders o
  WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
  ORDER BY o_orderdate DESC, o_orderkey DESC
  LIMIT 1
) o ON true
ORDER BY event_id
"""


# --- LEFT OUTER join: per-customer order stats incl. zero-order customers -----


def customer_order_counts_outer(sf_dir: str, buckets: int = 16) -> pa.Table:
    """Customer LEFT OUTER JOIN orders → order count + total spent per
    customer, INCLUDING customers with no orders (count 0, spend 0.0) —
    the outer-join member of the join family (reference chains transforms
    in-order, internal/pipeline/runner.go:123-205; the join itself is Ray-native).

    Shape: the fact side pre-aggregates per batch inside ``map_batches``
    (shuffle carries one (custkey, n, sum) partial row per batch-key, never
    order rows), both sides hash-bucket on the key, and each bucket does one
    vectorized left merge + zero-fill. No broadcast, no driver state; at
    fact scale both shuffles carry partial/dimension rows only."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def o_partial(b: pd.DataFrame) -> pd.DataFrame:
        # sum in integer CENTS: float addition is order-dependent across a
        # distributed partial tree, and a half-way rounding case could
        # diverge from the sequential oracle (same convention as
        # promo_share_by_month / top_unshipped_orders micro-units)
        b = b.assign(
            spent_c=np.round(b["o_totalprice"].to_numpy(np.float64) * 100.0).astype(
                np.int64
            )
        )
        g = b.groupby("o_custkey", as_index=False).agg(
            n_orders=("spent_c", "size"), spent_c=("spent_c", "sum")
        )
        g["_bucket"] = (
            pd.util.hash_array(g["o_custkey"].to_numpy(dtype="int64")) % buckets
        ).astype(np.int64)
        g["_side"] = np.int64(1)
        return g

    def c_tag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": b["c_custkey"].to_numpy(dtype=np.int64),
                "n_orders": np.int64(0),
                "spent_c": np.int64(0),
                "c_mktsegment": b["c_mktsegment"].astype(str),
                "_bucket": (
                    pd.util.hash_array(b["c_custkey"].to_numpy(dtype="int64"))
                    % buckets
                ).astype(np.int64),
                "_side": np.int64(0),
            }
        )

    both = cust.map_batches(c_tag, batch_format="pandas").union(
        orders.map_batches(o_partial, batch_format="pandas")
    )

    def outer(g: pd.DataFrame) -> pa.Table:
        c = g[g["_side"] == 0]
        o = (
            g[g["_side"] == 1]
            .groupby("o_custkey", as_index=False)
            .agg(n_orders=("n_orders", "sum"), spent_c=("spent_c", "sum"))
        )
        m = c[["o_custkey", "c_mktsegment"]].merge(o, on="o_custkey", how="left")
        return pa.table(
            {
                "c_custkey": pa.array(m["o_custkey"].to_numpy(dtype=np.int64), pa.int64()),
                "c_mktsegment": pa.array(m["c_mktsegment"].astype(str), pa.string()),
                "n_orders": pa.array(
                    m["n_orders"].fillna(0).to_numpy(dtype=np.int64), pa.int64()
                ),
                "total_spent": pa.array(
                    m["spent_c"].fillna(0).to_numpy(dtype=np.int64) / 100.0,
                    pa.float64(),
                ),
            }
        )

    t = _concat(both.groupby("_bucket").map_groups(outer, batch_format="pandas"))
    return t.take(pc.sort_indices(t, sort_keys=[("c_custkey", "ascending")]))


CUSTOMER_ORDER_COUNTS_OUTER_SQL = """
SELECT c.c_custkey, c.c_mktsegment,
       count(o.o_orderkey) AS n_orders,
       CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
            AS BIGINT) / 100.0 AS total_spent
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_mktsegment
ORDER BY c.c_custkey
"""


# --- TPC-H Q3-style: top unshipped orders by revenue --------------------------


def top_unshipped_orders(sf_dir: str, cutoff: str = "1998-06-01", k: int = 10) -> pa.Table:
    """Orders placed before ``cutoff`` with lineitems still shipping after
    it, ranked by outstanding revenue — the classic two-fact join + filtered
    group + top-k (TPC-H Q3 without the customer-segment leg).

    Both filters are pushed into the per-batch scan projection so only
    matching rows are tagged/shuffled. Revenue is summed in integer
    micro-units (order-free; see ``type_hourly_stats`` for the envelope),
    and since the join AND the group key are both l_orderkey, each group
    lives entirely inside one hash bucket — the per-bucket top-k partials
    (≤ B·k rows) are exact, and the driver merge is tiny."""
    import numpy as np

    cutoff_us = int(pd.Timestamp(cutoff).value // 1000)
    buckets = 16

    def tag_l(b: pd.DataFrame) -> pd.DataFrame:
        ship = b["l_shipdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        b = b[ship > cutoff_us]
        if not len(b):
            return pd.DataFrame(
                {"l_orderkey": pd.array([], dtype="Int64"),
                 "rev_u": pd.array([], dtype="Int64"),
                 "_bucket": pd.array([], dtype="Int64"),
                 "_side": pd.array([], dtype="Int64")}
            )
        rev_u = np.round(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy()) * 1e6
        ).astype(np.int64)
        key = b["l_orderkey"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "l_orderkey": pd.array(key, dtype="Int64"),
                "rev_u": pd.array(rev_u, dtype="Int64"),
                "_bucket": pd.array(pd.util.hash_array(key) % buckets, dtype="Int64"),
                "_side": pd.array(np.zeros(len(key), dtype=np.int64), dtype="Int64"),
            }
        )

    def tag_o(b: pd.DataFrame) -> pd.DataFrame:
        od = b["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        b = b[od < cutoff_us]
        key = b["o_orderkey"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "o_orderkey": pd.array(key, dtype="Int64"),
                "o_orderdate": b["o_orderdate"].to_numpy(),
                "o_orderpriority": b["o_orderpriority"].to_numpy(),
                "_bucket": pd.array(pd.util.hash_array(key) % buckets, dtype="Int64"),
                "_side": pd.array(np.ones(len(key), dtype=np.int64), dtype="Int64"),
            }
        )

    lt = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(tag_l, batch_format="pandas", batch_size=131072)
    ot = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(tag_o, batch_format="pandas", batch_size=131072)

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0]
        og = g[g["_side"] == 1]
        if not len(lg) or not len(og):
            return pd.DataFrame(
                {"l_orderkey": pd.array([], dtype="Int64"),
                 "rev_u": pd.array([], dtype="Int64"),
                 "o_orderdate": pd.array([], dtype="datetime64[us]"),
                 "o_orderpriority": pd.array([], dtype=object)}
            )
        grp = lg.groupby("l_orderkey", as_index=False)["rev_u"].sum()
        m = grp.merge(
            og[["o_orderkey", "o_orderdate", "o_orderpriority"]],
            left_on="l_orderkey",
            right_on="o_orderkey",
        )
        m = m.sort_values(
            ["rev_u", "l_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return m[["l_orderkey", "rev_u", "o_orderdate", "o_orderpriority"]]

    parts = _concat(
        lt.union(ot).groupby("_bucket").map_groups(bucket_topk, batch_format="pandas")
    ).to_pandas()
    parts = parts.sort_values(
        ["rev_u", "l_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pa.table(
        {
            "l_orderkey": pa.array(parts["l_orderkey"].to_numpy(dtype=np.int64), pa.int64()),
            "revenue": pa.array(
                parts["rev_u"].to_numpy(dtype=np.int64) / 1e6, pa.float64()
            ),
            "o_orderdate": pa.array(
                parts["o_orderdate"].to_numpy().astype("datetime64[us]")
            ),
            "o_orderpriority": pa.array(
                parts["o_orderpriority"].astype(str), pa.string()
            ),
        }
    )


TOP_UNSHIPPED_SQL = """
SELECT l.l_orderkey,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000) AS BIGINT))
         / 1000000.0 AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


# --- TPC-H Q14-style: promo revenue share per month ---------------------------


def promo_share_by_month(sf_dir: str) -> pa.Table:
    """Share of revenue from PROMO parts per ship month — the conditional-
    aggregate ratio (100 · Σ[promo rev] / Σ[rev]).

    The part side is partkey→is_promo — ONE BIT per part: at fact scale the
    bit-vector broadcast stays the right plan far longer than a row map
    (1 bit vs ~30 B/row; 1.5 B partkeys ≈ 190 MB, shipped once per actor).
    Guarded like every "dimension" join here: when the id space is too
    sparse for a bit-vector (max id > 8× row count) or the vector exceeds
    the broadcast budget (64 bits per `QUANTA_BROADCAST_ROW_LIMIT` row),
    fall back to the hash-bucket shuffle join of (partkey, is_promo) rows
    against per-batch lineitem partials.
    Both numerator and denominator are summed in integer micro-units per
    month — order-free, so the final single division is bit-identical to
    any sequential oracle."""
    import numpy as np
    import ray

    def rev_cols(batch: pd.DataFrame) -> tuple:
        ship = batch["l_shipdate"].to_numpy().astype("datetime64[M]")
        rev_u = np.round(
            batch["l_extendedprice"].to_numpy()
            * (1.0 - batch["l_discount"].to_numpy()) * 1e6
        ).astype(np.int64)
        return ship, rev_u

    part_ds = _read(sf_dir, "part", ["p_partkey", "p_type"])
    n_parts = part_ds.count()  # parquet metadata, no data read
    max_id = int(part_ds.max("p_partkey"))
    # dense needs BOTH: ids dense enough for a bit-vector (max id within
    # 8x the row count) AND total bits within the broadcast budget (64 bits
    # per row-equivalent of the configured limit, i.e. the vector may cost
    # at most what broadcasting `limit` 8-byte rows would)
    dense_ok = (max_id + 1) <= min(8 * n_parts, 64 * _broadcast_limit())

    from ..bucket import bucketed_group_agg

    if dense_ok:
        part = _concat(part_ds)
        pk = part.column("p_partkey").to_numpy()
        promo = np.zeros(max_id + 1, dtype=bool)
        promo[pk] = (
            np.asarray(part.column("p_type").to_numpy(zero_copy_only=False)) == "PROMO"
        )
        pref = ray.put(promo)

        def promo_partial(batch: pd.DataFrame) -> pd.DataFrame:
            ship, rev_u = rev_cols(batch)
            is_p = _cached_get(pref)[batch["l_partkey"].to_numpy(dtype=np.int64)]
            df = pd.DataFrame(
                {"month": ship, "rev_u": rev_u, "promo_u": np.where(is_p, rev_u, 0)}
            )
            return df.groupby("month", as_index=False).agg(
                rev_u=("rev_u", "sum"), promo_u=("promo_u", "sum")
            )

        parts = _read(
            sf_dir, "lineitem",
            ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        ).map_batches(promo_partial, batch_format="pandas", batch_size=131072)
    else:
        # shuffle path: per-batch (partkey, month) revenue partials joined
        # against (partkey, is_promo) via the explicit hash-bucket join,
        # then the same month reduce — shuffle carries partials, not rows
        def li_partial(batch: pd.DataFrame) -> pd.DataFrame:
            ship, rev_u = rev_cols(batch)
            df = pd.DataFrame(
                {
                    "l_partkey": batch["l_partkey"].to_numpy(dtype=np.int64),
                    "month": ship,
                    "rev_u": rev_u,
                }
            )
            return df.groupby(["l_partkey", "month"], as_index=False).agg(
                rev_u=("rev_u", "sum")
            )

        def p_flag(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "p_partkey": batch["p_partkey"].to_numpy(dtype=np.int64),
                    "is_promo": (batch["p_type"].to_numpy() == "PROMO").astype(np.int64),
                }
            )

        li = _read(
            sf_dir, "lineitem",
            ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        ).map_batches(li_partial, batch_format="pandas", batch_size=131072)
        pf = part_ds.map_batches(p_flag, batch_format="pandas")
        joined = _bucket_join(li, pf, "l_partkey", "p_partkey", 16)

        def month_partial(batch: pd.DataFrame) -> pd.DataFrame:
            rev = batch["rev_u"].to_numpy(dtype=np.int64)
            promo_u = np.where(batch["is_promo"].to_numpy(dtype=np.int64) > 0, rev, 0)
            df = pd.DataFrame(
                {"month": batch["month"].to_numpy(), "rev_u": rev, "promo_u": promo_u}
            )
            return df.groupby("month", as_index=False).agg(
                rev_u=("rev_u", "sum"), promo_u=("promo_u", "sum")
            )

        parts = joined.map_batches(month_partial, batch_format="pandas")
    out = _concat(
        bucketed_group_agg(
            parts, ["month"],
            dict(rev_u=("rev_u", "sum"), promo_u=("promo_u", "sum")),
            num_buckets=8,
        )
    ).to_pandas()
    out = out.sort_values("month").reset_index(drop=True)
    share = 100.0 * out["promo_u"].to_numpy(dtype=np.int64) / out["rev_u"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "month": pa.array(
                out["month"].to_numpy().astype("datetime64[us]")
            ),
            "promo_share": pa.array(np.round(share, 6), pa.float64()),
        }
    )


PROMO_SHARE_SQL = """
SELECT date_trunc('month', l.l_shipdate) AS month,
       round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000) AS BIGINT)
               ELSE 0 END)
         / sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000) AS BIGINT)),
         6) AS promo_share
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1 ORDER BY 1
"""


# --- TPC-H Q18-style: big-quantity orders (HAVING semi-join) ------------------


def big_spender_orders(sf_dir: str, min_qty: int = 300, k: int = 100) -> pa.Table:
    """Orders whose total lineitem quantity exceeds ``min_qty``, joined back
    to orders + customer (TPC-H Q18 shape: aggregate -> HAVING -> the
    filtered key set drives two joins).

    Scale shape: per-batch integer partial sums by orderkey (quantities are
    integral doubles -> int64, order-free addition), one bucketed group-agg
    whose shuffle carries partials only, then the HAVING filter. The
    surviving set is ~0.03% of orders at TPC-H skew, so it is broadcast
    (``ray.put`` once) to a streaming filter over orders, and the matched
    orders (tiny) drive a second broadcast filter over customer; past
    ``_broadcast_limit()`` both joins fall back to the hash-bucket shuffle
    join. Top-k by quantity is a driver-side sort of the HAVING survivors,
    never the corpus."""
    from ..bucket import bucketed_group_agg

    def qty_partial(batch: pa.Table) -> pd.DataFrame:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        q = np.round(batch.column("l_quantity").to_numpy(zero_copy_only=False)).astype(np.int64)
        df = pd.DataFrame({"l_orderkey": ok, "qty": q})
        return df.groupby("l_orderkey", as_index=False)["qty"].sum()

    parts = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        qty_partial, batch_format="pyarrow", batch_size=131072
    )
    agg = bucketed_group_agg(parts, ["l_orderkey"], {"total_qty": ("qty", "sum")})
    hot = agg.map_batches(
        lambda df: df[df["total_qty"] > min_qty], batch_format="pandas"
    )

    if _read(sf_dir, "orders", ["o_orderkey"]).count() <= _broadcast_limit():
        hot_df = _concat(hot).to_pandas()  # HAVING survivors: tiny by design
        qty_of = dict(zip(hot_df["l_orderkey"], hot_df["total_qty"]))
        ref = ray.put(qty_of)

        def order_filter(batch: pd.DataFrame) -> pd.DataFrame:
            lookup = _cached_get(ref)
            m = batch[batch["o_orderkey"].isin(lookup)].copy()
            m["total_qty"] = m["o_orderkey"].map(lookup).astype(np.int64)
            return m

        matched = _concat(
            _read(
                sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
            ).map_batches(order_filter, batch_format="pandas", batch_size=131072)
        ).to_pandas()
        if matched.empty:
            return pa.table(
                {"c_name": pa.array([], pa.string()),
                 "o_orderkey": pa.array([], pa.int64()),
                 "o_orderdate": pa.array([], pa.timestamp("us")),
                 "o_totalprice": pa.array([], pa.float64()),
                 "total_qty": pa.array([], pa.int64())}
            )
        ck_ref = ray.put(frozenset(matched["o_custkey"]))

        def cust_filter(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch["c_custkey"].isin(_cached_get(ck_ref))]

        cust = _concat(
            _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
                cust_filter, batch_format="pandas", batch_size=131072
            )
        ).to_pandas()
        out = matched.merge(cust, left_on="o_custkey", right_on="c_custkey")
    else:
        j1 = _bucket_join(
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
            hot,
            "o_orderkey",
            "l_orderkey",
            16,
        )
        j2 = _bucket_join(
            j1, _read(sf_dir, "customer", ["c_custkey", "c_name"]), "o_custkey", "c_custkey", 16
        )
        out = _concat(j2).to_pandas()
    out = out.sort_values(
        ["total_qty", "o_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return _from_pandas(
        pd.DataFrame(
            {
                "c_name": out["c_name"].to_numpy(),
                "o_orderkey": out["o_orderkey"].to_numpy(dtype=np.int64),
                "o_orderdate": out["o_orderdate"].to_numpy(),
                "o_totalprice": np.round(out["o_totalprice"].to_numpy(), 4),
                "total_qty": out["total_qty"].to_numpy(dtype=np.int64),
            }
        )
    )


BIG_SPENDER_ORDERS_SQL = """
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 4) AS o_totalprice,
       q.total_qty
FROM (
  SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300
) q
JOIN orders o ON o.o_orderkey = q.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY q.total_qty DESC, o.o_orderkey
LIMIT 100
"""


# --- TPC-H Q7-style: trade volume between nation pairs -----------------------


def nation_trade_volume(sf_dir: str) -> pa.Table:
    """Revenue shipped between (supplier nation, customer nation) pairs per
    ship-year — the 5-way join lineitem x supplier x orders x customer x
    nation(x2), TPC-H Q7 shape.

    Scale shape: supplier and customer reduce to key -> nation-code int
    maps broadcast once via ``ray.put`` (dense fancy-index when keys are
    dense; both guarded by ``_broadcast_limit()`` with the hash-bucket
    shuffle join as fallback); the only large-large exchange is ONE
    bucketed hash join of lineitem against orders on orderkey. Partials
    collapse each joined batch to <= nations^2 x years rows before the
    final tiny groupby. Revenue sums in integer MICRO-units (the 4-decimal
    product *1e6 is tie-free): distributed float partial sums are
    order-dependent and diverge from the oracle in the last ulp."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n_names = nation.sort_values("n_nationkey")["n_name"].to_numpy(dtype=object)
    nk = nation.sort_values("n_nationkey")["n_nationkey"].to_numpy(dtype=np.int64)
    dense_nation = np.full(int(nk.max()) + 1, -1, dtype=np.int32)
    dense_nation[nk] = np.arange(len(nk), dtype=np.int32)

    def _code_map(table: str, key: str, natkey: str) -> np.ndarray | None:
        """key -> nation-code dense int array (None past the broadcast
        limit; caller falls back to the shuffle join)."""
        if _read(sf_dir, table, [key]).count() > _broadcast_limit():
            return None
        df = _read(sf_dir, table, [key, natkey]).to_pandas()
        keys = df[key].to_numpy(dtype=np.int64)
        if len(keys) == 0 or keys.max() > 4 * len(keys) + 1024:
            return None  # sparse key space: dense table would blow up
        codes = dense_nation[df[natkey].to_numpy(dtype=np.int64)]
        dense = np.full(int(keys.max()) + 1, -1, dtype=np.int32)
        dense[keys] = codes
        return dense

    supp_map = _code_map("supplier", "s_suppkey", "s_nationkey")
    cust_map = _code_map("customer", "c_custkey", "c_nationkey")

    if supp_map is not None:
        sref = ray.put(supp_map)

        def line_side(batch: pa.Table) -> pd.DataFrame:
            sm = ray.get(sref)
            rev_u = np.round(
                batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
                * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False))
                * 1_000_000.0
            ).astype(np.int64)
            yr = (
                batch.column("l_shipdate")
                .cast(pa.timestamp("us"))
                .to_pandas()
                .dt.year.to_numpy(dtype=np.int32)
            )
            return pd.DataFrame(
                {
                    "l_orderkey": batch.column("l_orderkey").to_numpy(zero_copy_only=False),
                    "rev_u": rev_u,
                    "l_year": yr,
                    "sn": sm[batch.column("l_suppkey").to_numpy(zero_copy_only=False)],
                }
            )

        line = _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        ).map_batches(line_side, batch_format="pyarrow", batch_size=131072)
    else:
        supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
            lambda df: pd.DataFrame(
                {"s_suppkey": df["s_suppkey"].to_numpy(),
                 "sn": dense_nation[df["s_nationkey"].to_numpy(dtype=np.int64)]}
            ),
            batch_format="pandas",
        )

        def line_proj(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "l_orderkey": batch["l_orderkey"].to_numpy(),
                    "l_suppkey": batch["l_suppkey"].to_numpy(),
                    "rev_u": np.round(
                        batch["l_extendedprice"].to_numpy()
                        * (1.0 - batch["l_discount"].to_numpy())
                        * 1_000_000.0
                    ).astype(np.int64),
                    "l_year": batch["l_shipdate"].dt.year.to_numpy(dtype=np.int32),
                }
            )

        line = _bucket_join(
            _read(
                sf_dir, "lineitem",
                ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
            ).map_batches(line_proj, batch_format="pandas", batch_size=131072),
            supp,
            "l_suppkey",
            "s_suppkey",
            16,
        )

    if cust_map is not None:
        cref = ray.put(cust_map)

        def orders_side(batch: pa.Table) -> pd.DataFrame:
            cm = ray.get(cref)
            return pd.DataFrame(
                {
                    "o_orderkey": batch.column("o_orderkey").to_numpy(zero_copy_only=False),
                    "cn": cm[batch.column("o_custkey").to_numpy(zero_copy_only=False)],
                }
            )

        ords = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
            orders_side, batch_format="pyarrow", batch_size=131072
        )
    else:
        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            lambda df: pd.DataFrame(
                {"c_custkey": df["c_custkey"].to_numpy(),
                 "cn": dense_nation[df["c_nationkey"].to_numpy(dtype=np.int64)]}
            ),
            batch_format="pandas",
        )
        ords = _bucket_join(
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
            cust,
            "o_custkey",
            "c_custkey",
            16,
        )

    joined = _bucket_join(line, ords, "l_orderkey", "o_orderkey", 16)
    n_nat = len(n_names)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        sn = batch["sn"].to_numpy(dtype=np.int64)
        cn = batch["cn"].to_numpy(dtype=np.int64)
        yr = batch["l_year"].to_numpy(dtype=np.int64)
        rev_u = batch["rev_u"].to_numpy(dtype=np.int64)
        keep = sn != cn
        df = pd.DataFrame({"sn": sn[keep], "cn": cn[keep], "l_year": yr[keep],
                           "rev_u": rev_u[keep]})
        return df.groupby(["sn", "cn", "l_year"], as_index=False)["rev_u"].sum()

    from ..bucket import bucketed_group_agg

    out = bucketed_group_agg(
        joined.map_batches(partial, batch_format="pandas", batch_size=262144),
        ["sn", "cn", "l_year"],
        {"rev_u": ("rev_u", "sum")},
        num_buckets=8,
    )
    t = _concat(out)
    sn = t.column("sn").to_numpy(zero_copy_only=False).astype(np.int64)
    cn = t.column("cn").to_numpy(zero_copy_only=False).astype(np.int64)
    res = pa.table(
        {
            "supp_nation": pa.array(n_names[sn], pa.string()),
            "cust_nation": pa.array(n_names[cn], pa.string()),
            "l_year": t.column("l_year").cast(pa.int64()),
            "revenue": pc.divide(t.column("rev_u").cast(pa.float64()), 1_000_000.0),
        }
    )
    return res.take(
        pc.sort_indices(
            res,
            sort_keys=[("supp_nation", "ascending"), ("cust_nation", "ascending"),
                       ("l_year", "ascending")],
        )
    )


NATION_TRADE_VOLUME_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000)
                     AS BIGINT)) AS BIGINT) / 1000000.0 AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# --- TPC-H Q19-style: discounted revenue under an OR-of-ANDs predicate --------


def discounted_revenue(sf_dir: str) -> pa.Table:
    """Total discounted revenue of lineitems matching any of three
    (brand, size-range, quantity-range) clauses — the TPC-H Q19 shape: a
    fact x dimension join whose JOIN PREDICATE is a disjunction of
    conjunctions spanning both sides.

    Scale shape: the part side collapses to a 3-BIT CLAUSE MASK per partkey
    (which brand+size halves of each clause the part satisfies) broadcast
    once via ``ray.put`` — guarded by ``_broadcast_limit()`` with a
    hash-bucket shuffle join fallback; each lineitem batch computes its
    quantity-halves bitmask and keeps rows where the masks intersect.
    Revenue is summed in integer micro-units (order-free), one int64 per
    batch reaches the driver."""
    CL = (  # (brand, size_lo, size_hi, qty_lo, qty_hi)
        ("Brand#13", 1, 15, 1, 11),
        ("Brand#19", 10, 30, 10, 20),
        ("Brand#5", 20, 50, 20, 30),
    )

    def part_bits(df: pd.DataFrame) -> np.ndarray:
        brand = df["p_brand"].to_numpy(dtype=object)
        size = df["p_size"].to_numpy(dtype=np.int64)
        bits = np.zeros(len(df), dtype=np.uint8)
        for i, (b, lo, hi, _, _) in enumerate(CL):
            bits |= ((brand == b) & (size >= lo) & (size <= hi)).astype(
                np.uint8
            ) << i
        return bits

    def qty_bits(qty: np.ndarray) -> np.ndarray:
        bits = np.zeros(len(qty), dtype=np.uint8)
        for i, (_, _, _, lo, hi) in enumerate(CL):
            bits |= ((qty >= lo) & (qty <= hi)).astype(np.uint8) << i
        return bits

    def rev_u_sum(pk_bits: np.ndarray, qb: np.ndarray, price, disc) -> np.int64:
        keep = (pk_bits & qb) != 0
        return np.round(price[keep] * (1.0 - disc[keep]) * 1e6).astype(np.int64).sum()

    line_cols = ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    if _read(sf_dir, "part", ["p_partkey"]).count() <= _broadcast_limit():
        part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).to_pandas()
        pk = part["p_partkey"].to_numpy(dtype=np.int64)
        bits = part_bits(part)
        if len(pk) and pk.max() <= 4 * len(pk) + 1024:
            dense = np.zeros(int(pk.max()) + 1, dtype=np.uint8)  # miss = no bits
            dense[pk] = bits
            ref = ray.put((dense, None))
        else:
            order = np.argsort(pk)
            ref = ray.put((bits[order], pk[order]))

        def partial(batch: pa.Table) -> pd.DataFrame:
            bits, keys = _cached_get(ref)
            pkb = batch.column("l_partkey").to_numpy(zero_copy_only=False)
            if keys is None:
                pb = np.where(
                    (pkb >= 0) & (pkb < len(bits)),
                    bits[np.clip(pkb, 0, len(bits) - 1)],
                    0,
                )
            else:
                pos = np.minimum(np.searchsorted(keys, pkb), len(keys) - 1)
                pb = np.where(keys[pos] == pkb, bits[pos], 0)
            s = rev_u_sum(
                pb,
                qty_bits(batch.column("l_quantity").to_numpy(zero_copy_only=False)),
                batch.column("l_extendedprice").to_numpy(zero_copy_only=False),
                batch.column("l_discount").to_numpy(zero_copy_only=False),
            )
            return pd.DataFrame({"rev_u": [s]})

        parts = _read(sf_dir, "lineitem", line_cols).map_batches(
            partial, batch_format="pyarrow", batch_size=131072
        )
    else:
        pside = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
            lambda df: pd.DataFrame(
                {"p_partkey": df["p_partkey"].to_numpy(), "pb": part_bits(df)}
            ),
            batch_format="pandas",
            batch_size=131072,
        )

        def line_proj(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "l_partkey": df["l_partkey"].to_numpy(),
                    "qb": qty_bits(df["l_quantity"].to_numpy()),
                    "l_extendedprice": df["l_extendedprice"].to_numpy(),
                    "l_discount": df["l_discount"].to_numpy(),
                }
            )

        joined = _bucket_join(
            _read(sf_dir, "lineitem", line_cols).map_batches(
                line_proj, batch_format="pandas", batch_size=131072
            ),
            pside,
            "l_partkey",
            "p_partkey",
            16,
        )

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            s = rev_u_sum(
                df["pb"].to_numpy(dtype=np.uint8),
                df["qb"].to_numpy(dtype=np.uint8),
                df["l_extendedprice"].to_numpy(),
                df["l_discount"].to_numpy(),
            )
            return pd.DataFrame({"rev_u": [s]})

        parts = joined.map_batches(partial, batch_format="pandas", batch_size=262144)

    total = int(_concat(parts).column("rev_u").to_pandas().sum())
    return pa.table({"revenue": pa.array([total / 1e6], pa.float64())})


DISCOUNTED_REVENUE_SQL = """
SELECT coalesce(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000)
                      AS BIGINT)), 0) / 1000000.0 AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
"""


# --- TPC-H Q9-style: profit by supplier nation and order year ------------------


def profit_by_nation_year(sf_dir: str, name_substr: str = "widget") -> pa.Table:
    """Discounted revenue of lineitems whose PART NAME contains a substring,
    grouped by (supplier nation, order year) — the TPC-H Q9 shape (minus
    partsupp, which this dataset does not carry).

    Scale shape: part collapses to a 1-bit match mask and supplier to a
    nation-code map, each broadcast once via ``ray.put`` under
    ``_broadcast_limit()`` (hash-bucket shuffle join fallbacks past it);
    the only large-large exchange is ONE bucketed hash join of the
    pre-filtered lineitem partials against orders on orderkey. Batches
    collapse to <= nations x years rows before the final tiny reduce;
    revenue is summed in integer micro-units (order-free, bit-stable)."""
    from ..bucket import bucketed_group_agg

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n_names = nation.sort_values("n_nationkey")["n_name"].to_numpy(dtype=object)
    nk = nation.sort_values("n_nationkey")["n_nationkey"].to_numpy(dtype=np.int64)
    dense_nation = np.full(int(nk.max()) + 1, -1, dtype=np.int32)
    dense_nation[nk] = np.arange(len(nk), dtype=np.int32)

    def _dense_map(table, key, vals_fn, cols, fill):
        """key -> value dense array via one small-table read, or None when
        the table exceeds the broadcast limit / keys are sparse."""
        if _read(sf_dir, table, [key]).count() > _broadcast_limit():
            return None
        df = _read(sf_dir, table, cols).to_pandas()
        keys = df[key].to_numpy(dtype=np.int64)
        if len(keys) == 0 or keys.max() > 4 * len(keys) + 1024:
            return None
        vals = vals_fn(df)
        dense = np.full(int(keys.max()) + 1, fill, dtype=vals.dtype)
        dense[keys] = vals
        return dense

    part_mask = _dense_map(
        "part",
        "p_partkey",
        lambda df: df["p_name"].str.contains(name_substr, regex=False)
        .to_numpy()
        .astype(np.int8),
        ["p_partkey", "p_name"],
        np.int8(0),
    )
    supp_map = _dense_map(
        "supplier",
        "s_suppkey",
        lambda df: dense_nation[df["s_nationkey"].to_numpy(dtype=np.int64)],
        ["s_suppkey", "s_nationkey"],
        np.int32(-1),
    )

    line_cols = [
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount",
    ]

    if part_mask is not None and supp_map is not None:
        ref = ray.put((part_mask, supp_map))

        def line_side(batch: pa.Table) -> pd.DataFrame:
            pm, sm = _cached_get(ref)
            pkb = batch.column("l_partkey").to_numpy(zero_copy_only=False)
            skb = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            hit = (
                ((pkb >= 0) & (pkb < len(pm)))
                & (pm[np.clip(pkb, 0, len(pm) - 1)] > 0)
            )
            sn = np.where(
                (skb >= 0) & (skb < len(sm)), sm[np.clip(skb, 0, len(sm) - 1)], -1
            )
            keep = hit & (sn >= 0)
            rev_u = np.round(
                batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
                * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False)[keep])
                * 1e6
            ).astype(np.int64)
            df = pd.DataFrame(
                {
                    "l_orderkey": batch.column("l_orderkey").to_numpy(
                        zero_copy_only=False
                    )[keep],
                    "sn": sn[keep].astype(np.int64),
                    "rev_u": rev_u,
                }
            )
            return df.groupby(["l_orderkey", "sn"], as_index=False)["rev_u"].sum()

        line = _read(sf_dir, "lineitem", line_cols).map_batches(
            line_side, batch_format="pyarrow", batch_size=131072
        )
    else:
        pside = _read(sf_dir, "part", ["p_partkey", "p_name"]).map_batches(
            lambda df: pd.DataFrame(
                {"p_partkey": df["p_partkey"].to_numpy()}
            )[df["p_name"].str.contains(name_substr, regex=False).to_numpy()],
            batch_format="pandas",
            batch_size=131072,
        )
        sside = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
            lambda df: pd.DataFrame(
                {
                    "s_suppkey": df["s_suppkey"].to_numpy(),
                    "sn": dense_nation[df["s_nationkey"].to_numpy(dtype=np.int64)],
                }
            ),
            batch_format="pandas",
        )

        def line_proj(df: pd.DataFrame) -> pd.DataFrame:
            rev_u = np.round(
                df["l_extendedprice"].to_numpy()
                * (1.0 - df["l_discount"].to_numpy())
                * 1e6
            ).astype(np.int64)
            return pd.DataFrame(
                {
                    "l_orderkey": df["l_orderkey"].to_numpy(),
                    "l_partkey": df["l_partkey"].to_numpy(),
                    "l_suppkey": df["l_suppkey"].to_numpy(),
                    "rev_u": rev_u,
                }
            )

        line = _bucket_join(
            _bucket_join(
                _read(sf_dir, "lineitem", line_cols).map_batches(
                    line_proj, batch_format="pandas", batch_size=131072
                ),
                pside,
                "l_partkey",
                "p_partkey",
                16,
            ),
            sside,
            "l_suppkey",
            "s_suppkey",
            16,
        ).map_batches(
            # collapse to the broadcast path's (orderkey, sn) partial shape
            # before the orderkey exchange
            lambda df: df.groupby(["l_orderkey", "sn"], as_index=False)[
                "rev_u"
            ].sum(),
            batch_format="pandas",
            batch_size=262144,
        )

    def orders_proj(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": batch.column("o_orderkey").to_numpy(zero_copy_only=False),
                "o_year": batch.column("o_orderdate")
                .cast(pa.timestamp("us"))
                .to_pandas()
                .dt.year.to_numpy(dtype=np.int64),
            }
        )

    ords = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        orders_proj, batch_format="pyarrow", batch_size=131072
    )
    joined = _bucket_join(line, ords, "l_orderkey", "o_orderkey", 16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["sn", "o_year"], as_index=False)["rev_u"].sum()

    t = _concat(
        bucketed_group_agg(
            joined.map_batches(partial, batch_format="pandas", batch_size=262144),
            ["sn", "o_year"],
            {"rev_u": ("rev_u", "sum")},
            num_buckets=8,
        )
    )
    if t.num_rows == 0:
        return pa.table(
            {
                "n_name": pa.array([], pa.string()),
                "o_year": pa.array([], pa.int64()),
                "amount": pa.array([], pa.float64()),
            }
        )
    sn = t.column("sn").to_numpy(zero_copy_only=False).astype(np.int64)
    res = pa.table(
        {
            "n_name": pa.array(n_names[sn], pa.string()),
            "o_year": t.column("o_year").cast(pa.int64()),
            "amount": pa.array(
                t.column("rev_u").to_numpy(zero_copy_only=False).astype(np.int64)
                / 1e6,
                pa.float64(),
            ),
        }
    )
    return res.take(
        pc.sort_indices(
            res, sort_keys=[("n_name", "ascending"), ("o_year", "ascending")]
        )
    )


PROFIT_BY_NATION_YEAR_SQL = """
SELECT n.n_name,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000)
             AS BIGINT)) / 1000000.0 AS amount
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- TPC-H Q10-style: returned-item revenue by customer -----------------------


def returned_item_revenue(sf_dir: str, k: int = 20) -> pa.Table:
    """Top-k customers by revenue on RETURNED lineitems (l_returnflag='R')
    — the Q10 shape: filtered fact x fact join, re-keyed aggregate, top-k,
    then a name lookup on the k winners only.

    Scale shape: the returnflag filter runs inside the first scan (only
    matching rows are tagged/shuffled); one bucketed hash join on orderkey
    emits (custkey, rev_u int micro-unit) partials pre-reduced per bucket;
    a second bucketed shuffle on custkey reduces per customer AND emits only
    its bucket's exact top-k (groups are bucket-complete), so the driver
    merges <= buckets*k rows; the final c_name lookup streams customer once
    with the k custkeys broadcast — never the reverse."""
    from ..bucket import bucketed_apply

    def tag_l(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_returnflag"] == "R"]
        key = b["l_orderkey"].to_numpy(dtype=np.int64)
        rev_u = np.round(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy()) * 1e6
        ).astype(np.int64)
        return pd.DataFrame(
            {"l_orderkey": pd.array(key, dtype="Int64"),
             "rev_u": pd.array(rev_u, dtype="Int64")}
        )

    joined = _bucket_join(
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        ).map_batches(tag_l, batch_format="pandas", batch_size=131072),
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        "l_orderkey",
        "o_orderkey",
        16,
    )

    def cust_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_custkey", as_index=False)["rev_u"].sum()
        return pd.DataFrame(
            {"o_custkey": g["o_custkey"].to_numpy(dtype=np.int64),
             "rev_u": g["rev_u"].to_numpy(dtype=np.int64)}
        )

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("o_custkey", as_index=False)["rev_u"].sum()
        return r.sort_values(
            ["rev_u", "o_custkey"], ascending=[False, True], kind="mergesort"
        ).head(k)

    parts = _concat(
        bucketed_apply(
            joined.map_batches(cust_partial, batch_format="pandas", batch_size=262144),
            ["o_custkey"],
            bucket_topk,
            num_buckets=16,
        )
    ).to_pandas()
    if parts.empty:
        return pa.table(
            {"c_custkey": pa.array([], pa.int64()),
             "c_name": pa.array([], pa.string()),
             "revenue": pa.array([], pa.float64())}
        )
    top = parts.sort_values(
        ["rev_u", "o_custkey"], ascending=[False, True], kind="mergesort"
    ).head(k)

    ck_ref = ray.put(frozenset(top["o_custkey"].to_numpy(dtype=np.int64)))

    def name_lookup(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["c_custkey"].isin(_cached_get(ck_ref))]

    names = _concat(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
            name_lookup, batch_format="pandas", batch_size=131072
        )
    ).to_pandas()
    out = top.merge(names, left_on="o_custkey", right_on="c_custkey").sort_values(
        ["rev_u", "o_custkey"], ascending=[False, True], kind="mergesort"
    )
    return pa.table(
        {
            "c_custkey": pa.array(out["o_custkey"].to_numpy(dtype=np.int64), pa.int64()),
            "c_name": pa.array(out["c_name"].astype(str), pa.string()),
            "revenue": pa.array(out["rev_u"].to_numpy(dtype=np.int64) / 1e6, pa.float64()),
        }
    )


RETURNED_ITEM_REVENUE_SQL = """
SELECT c.c_custkey, c.c_name,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000) AS BIGINT))
         / 1000000.0 AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2
ORDER BY sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000) AS BIGINT)) DESC,
         c.c_custkey
LIMIT 20
"""


# --- ROLLUP / CUBE grouping-sets aggregates -------------------------------------


def _nation_year_fine(sf_dir: str) -> tuple[pd.DataFrame, np.ndarray]:
    """Finest-grain (nation-code, order-year) revenue in integer micro-units
    — the shared scan for the ROLLUP and CUBE grouping-sets queries. One
    corpus pass: per-batch partials -> one bucketed reduce; the returned
    frame is <= nations x years rows, so every coarser level is a free
    driver-side re-aggregation. FK-miss orders (custkey absent from
    customer) are dropped — inner-join semantics, matching the SQL oracle.

    customer is only broadcast under ``_broadcast_limit()``; past it the
    custkey→nation map is resolved by the hash-bucket shuffle join (the
    ``revenue_by_nation`` fallback shape)."""
    from ..bucket import bucketed_group_agg

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n_names = nation.sort_values("n_nationkey")["n_name"].to_numpy(dtype=object)
    nk = nation.sort_values("n_nationkey")["n_nationkey"].to_numpy(dtype=np.int64)
    dense_nation = np.full(int(nk.max()) + 1, -1, dtype=np.int32)
    dense_nation[nk] = np.arange(len(nk), dtype=np.int32)

    if _read(sf_dir, "customer", ["c_custkey"]).count() <= _broadcast_limit():
        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
        ck = cust["c_custkey"].to_numpy(dtype=np.int64)
        codes = dense_nation[cust["c_nationkey"].to_numpy(dtype=np.int64)]
        if len(ck) and ck.max() <= 4 * len(ck) + 1024:
            dense = np.full(int(ck.max()) + 1, -1, dtype=np.int32)
            dense[ck] = codes
            ref = ray.put((dense, None))
        else:
            order = np.argsort(ck)
            ref = ray.put((codes[order].astype(np.int32), ck[order]))

        def year_partial(batch: pa.Table) -> pd.DataFrame:
            codes, keys = _cached_get(ref)
            ckb = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            if keys is None:
                # clamp so FK-miss custkeys beyond the dense table read as
                # miss (-1) instead of indexing out of bounds
                cn = np.where(
                    (ckb >= 0) & (ckb < len(codes)),
                    codes[np.clip(ckb, 0, len(codes) - 1)],
                    -1,
                )
            else:
                pos = np.minimum(np.searchsorted(keys, ckb), len(keys) - 1)
                cn = np.where(keys[pos] == ckb, codes[pos], -1)
            yr = (
                batch.column("o_orderdate")
                .cast(pa.timestamp("us"))
                .to_pandas()
                .dt.year.to_numpy(dtype=np.int64)
            )
            rev_u = np.round(
                batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 1e6
            ).astype(np.int64)
            df = pd.DataFrame({"cn": cn.astype(np.int64), "o_year": yr, "rev_u": rev_u})
            return df.groupby(["cn", "o_year"], as_index=False)["rev_u"].sum()

        fine_ds = _read(
            sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]
        ).map_batches(year_partial, batch_format="pyarrow", batch_size=131072)
    else:
        dref = ray.put(dense_nation)

        def cust_code(batch: pd.DataFrame) -> pd.DataFrame:
            dn = _cached_get(dref)
            return pd.DataFrame(
                {
                    "c_custkey": batch["c_custkey"].to_numpy(),
                    "cn": dn[batch["c_nationkey"].to_numpy(dtype=np.int64)],
                }
            )

        cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            cust_code, batch_format="pandas", batch_size=131072
        )
        joined = _bucket_join(
            _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]),
            cust_ds,
            "o_custkey",
            "c_custkey",
            16,
        )

        def joined_partial(batch: pd.DataFrame) -> pd.DataFrame:
            yr = pd.to_datetime(batch["o_orderdate"]).dt.year.to_numpy(dtype=np.int64)
            rev_u = np.round(
                batch["o_totalprice"].to_numpy(dtype=np.float64) * 1e6
            ).astype(np.int64)
            df = pd.DataFrame(
                {"cn": batch["cn"].to_numpy(dtype=np.int64), "o_year": yr, "rev_u": rev_u}
            )
            return df.groupby(["cn", "o_year"], as_index=False)["rev_u"].sum()

        fine_ds = joined.map_batches(
            joined_partial, batch_format="pandas", batch_size=262144
        )

    fine = _concat(
        bucketed_group_agg(
            fine_ds, ["cn", "o_year"], {"rev_u": ("rev_u", "sum")}, num_buckets=8
        )
    ).to_pandas()
    # drop FK-miss orders (cn == -1): the SQL oracle's inner join excludes
    # them; without this they would wrap to n_names[-1] in the level maps
    return fine[fine["cn"] >= 0].reset_index(drop=True), n_names


def _rollup_levels(
    fine: pd.DataFrame, n_names: np.ndarray
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """The three ROLLUP grouping sets — (nation, year), (nation), () —
    derived driver-side from the <= nations x years finest grain. Shared by
    ``revenue_rollup`` and ``revenue_cube`` (cube adds the (year) set)."""
    lvl0 = fine.copy()
    lvl0["n_name"] = n_names[lvl0["cn"].to_numpy(dtype=np.int64)]
    lvl1 = fine.groupby("cn", as_index=False)["rev_u"].sum()
    lvl1["n_name"] = n_names[lvl1["cn"].to_numpy(dtype=np.int64)]
    lvl1["o_year"] = pd.NA
    lvl2 = pd.DataFrame(
        {"n_name": [pd.NA], "o_year": [pd.NA], "rev_u": [fine["rev_u"].sum()]}
    )
    return lvl0, lvl1, lvl2


def _grouping_levels_out(levels: list[pd.DataFrame]) -> pa.Table:
    out = pd.concat(
        [lvl[["n_name", "o_year", "rev_u"]] for lvl in levels], ignore_index=True
    )
    out["revenue"] = out["rev_u"].astype(np.int64) / 1e6
    out["o_year"] = out["o_year"].astype("Int64")
    out = out.sort_values(
        ["n_name", "o_year"], na_position="first", kind="mergesort"
    ).reset_index(drop=True)
    return _from_pandas(out[["n_name", "o_year", "revenue"]])


def revenue_rollup(sf_dir: str) -> pa.Table:
    """Order revenue by (nation, order-year) with ROLLUP subtotals — the
    grouping-sets pattern: compute the FINEST grain once (per-batch
    partials -> one bucketed reduce), then derive every coarser level by
    re-aggregating the tiny finest-grain result on the driver. The corpus
    is scanned once; subtotal levels cost nothing at scale.

    Revenue is summed in integer micro-units (order-free addition) so all
    three levels are bit-stable at any parallelism."""
    fine, n_names = _nation_year_fine(sf_dir)
    lvl0, lvl1, lvl2 = _rollup_levels(fine, n_names)
    return _grouping_levels_out([lvl0, lvl1, lvl2])


REVENUE_ROLLUP_SQL = """
SELECT n.n_name,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       sum(CAST(round(o.o_totalprice * 1000000) AS BIGINT)) / 1000000.0 AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY ROLLUP (n.n_name, o_year)
ORDER BY 1 NULLS FIRST, 2 NULLS FIRST
"""


def revenue_cube(sf_dir: str) -> pa.Table:
    """Order revenue by GROUP BY CUBE (nation, order-year): all four
    grouping sets — (nation, year), (nation), (year), () — from the SAME
    single corpus scan as ``revenue_rollup`` (the finest grain is computed
    distributed once; every grouping set is a driver-side re-aggregation
    of that <= nations x years frame)."""
    fine, n_names = _nation_year_fine(sf_dir)
    lvl0, lvl1, lvl2 = _rollup_levels(fine, n_names)
    lvl_year = fine.groupby("o_year", as_index=False)["rev_u"].sum()
    lvl_year["n_name"] = pd.NA
    return _grouping_levels_out([lvl0, lvl1, lvl_year, lvl2])


REVENUE_CUBE_SQL = """
SELECT n.n_name,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       sum(CAST(round(o.o_totalprice * 1000000) AS BIGINT)) / 1000000.0 AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY CUBE (n.n_name, o_year)
ORDER BY 1 NULLS FIRST, 2 NULLS FIRST
"""


# --- windowed rank: top-k orders per customer -----------------------------------


def top_orders_per_customer(sf_dir: str, k: int = 3) -> pa.Table:
    """Per-customer top-k orders by total price with rank — the windowed
    ``ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice
    DESC, o_orderkey)`` shape (reference has no window operator; this is
    the north-rule per-key ordered-state pattern applied to batch SQL).

    Scale shape: orders hash-bucket by o_custkey (every order of a
    customer meets in one bucket, ``auto_buckets`` bounds per-bucket
    memory), each bucket ranks all its customers VECTORIZED (one sort +
    groupby cumcount, no per-key loop) and emits <= k rows per customer.
    Output is proportional to customers, never orders; one shuffle, no
    broadcast, deterministic tie-break on o_orderkey."""
    from ..bucket import bucketed_apply

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g = g.assign(rnk=(g.groupby("o_custkey").cumcount() + 1).astype(np.int64))
        return g[g["rnk"] <= k]

    out = _concat(
        bucketed_apply(
            _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"]),
            ["o_custkey"],
            bucket_topk,
        )
    ).to_pandas()
    out = out.sort_values(["o_custkey", "rnk"], kind="mergesort").reset_index(drop=True)
    return _from_pandas(out[["o_custkey", "rnk", "o_orderkey", "o_totalprice"]])


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, rnk, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS BIGINT) AS rnk
  FROM orders
) t
WHERE rnk <= 3
ORDER BY o_custkey, rnk
"""


# --- Q15: top supplier(s) by quarterly revenue -------------------------------


def top_supplier_revenue(
    sf_dir: str, start: str = "1996-01-01", end: str = "1996-04-01"
) -> pa.Table:
    """Supplier(s) whose lineitem revenue over one ship-date quarter equals
    the global maximum (ties kept) — the TPC-H Q15 shape: a view-style
    per-supplier aggregate, a global MAX scalar, and a winners-only lookup.

    Scale shape: the quarter predicate is pushed into the parquet scan, so
    only qualifying rows leave storage; per-batch partials pre-reduce to
    (suppkey, rev_u int-micro) rows before ONE bucketed shuffle; the global
    max is taken over the already per-supplier-reduced output (rows ==
    suppliers, never lineitems); the s_name lookup streams supplier once
    with only the winner keys broadcast. Revenue in int micro-units end to
    end: the sum is order-free, so the distributed reduce is bit-equal to
    the sequential oracle."""
    import datetime as _dt

    import pyarrow.dataset as pads

    from ..bucket import bucketed_group_agg

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(
            (pads.field("l_shipdate") >= pads.scalar(_dt.datetime.fromisoformat(start)))
            & (pads.field("l_shipdate") < pads.scalar(_dt.datetime.fromisoformat(end)))
        ),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rev_u = np.round(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy()) * 1e6
        ).astype(np.int64)
        g = pd.DataFrame({"l_suppkey": b["l_suppkey"].to_numpy(dtype=np.int64),
                          "rev_u": rev_u}).groupby("l_suppkey", as_index=False)["rev_u"].sum()
        return g

    per_supp = _concat(
        bucketed_group_agg(
            li.map_batches(partial, batch_format="pandas", batch_size=131072),
            ["l_suppkey"],
            dict(rev_u=("rev_u", "sum")),
        )
    ).to_pandas()
    if per_supp.empty:
        return pa.table(
            {"s_suppkey": pa.array([], pa.int64()),
             "s_name": pa.array([], pa.string()),
             "total_revenue": pa.array([], pa.float64())}
        )
    best = int(per_supp["rev_u"].max())
    win = per_supp[per_supp["rev_u"] == best]
    keys_ref = ray.put(frozenset(win["l_suppkey"].to_numpy(dtype=np.int64)))

    def name_lookup(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["s_suppkey"].isin(_cached_get(keys_ref))]

    names = _concat(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
            name_lookup, batch_format="pandas", batch_size=131072
        )
    ).to_pandas()
    out = win.merge(names, left_on="l_suppkey", right_on="s_suppkey").sort_values(
        "s_suppkey", kind="mergesort"
    )
    return pa.table(
        {
            "s_suppkey": pa.array(out["s_suppkey"].to_numpy(dtype=np.int64), pa.int64()),
            "s_name": pa.array(out["s_name"].astype(str), pa.string()),
            "total_revenue": pa.array(
                out["rev_u"].to_numpy(dtype=np.int64) / 1e6, pa.float64()
            ),
        }
    )


TOP_SUPPLIER_REVENUE_SQL = """
WITH r AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT))
              AS BIGINT) AS rev_u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.rev_u / 1000000.0 AS total_revenue
FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev_u = (SELECT max(rev_u) FROM r)
ORDER BY s.s_suppkey
"""


# --- Q17: small-quantity-order "lost revenue" by brand ------------------------


def small_qty_order_revenue(sf_dir: str) -> pa.Table:
    """Per brand, the count and extended-price total of lineitems whose
    quantity is below 20% of that part's average quantity — the TPC-H Q17
    correlated-scalar shape (row vs its own group's aggregate).

    Scale shape: ONE hash-bucket shuffle on l_partkey co-locates every row
    of a part; inside each bucket the per-part (count, qty-sum) and the
    row-level threshold test are one vectorized groupby-transform — the
    comparison `qty * 5 * n < sum_qty` is all-integer (quantities are
    integral), so no float-average boundary can diverge from the oracle.
    Surviving rows reduce to per-part partials inside the bucket, then a
    second tiny shuffle joins p_brand (part pruned to two columns) and the
    25-row brand rollup finishes driver-side."""
    from ..bucket import bucketed_apply

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def bucket_small(g: pd.DataFrame) -> pd.DataFrame:
        qty = g["l_quantity"].to_numpy(dtype=np.int64)
        pk = g["l_partkey"].to_numpy(dtype=np.int64)
        grp = g.groupby("l_partkey")["l_quantity"]
        n = grp.transform("size").to_numpy(dtype=np.int64)
        s = grp.transform("sum").to_numpy(dtype=np.int64)
        keep = qty * 5 * n < s
        if not keep.any():
            return pd.DataFrame(
                {"l_partkey": pd.array([], dtype=np.int64),
                 "n_small": pd.array([], dtype=np.int64),
                 "rev_u": pd.array([], dtype=np.int64)}
            )
        rev_u = np.round(g["l_extendedprice"].to_numpy()[keep] * 1e6).astype(np.int64)
        out = pd.DataFrame({"l_partkey": pk[keep], "rev_u": rev_u})
        r = out.groupby("l_partkey", as_index=False).agg(
            n_small=("rev_u", "size"), rev_u=("rev_u", "sum")
        )
        r["n_small"] = r["n_small"].astype(np.int64)
        return r[["l_partkey", "n_small", "rev_u"]]

    per_part = bucketed_apply(li, ["l_partkey"], bucket_small)
    joined = _bucket_join(
        per_part, _read(sf_dir, "part", ["p_partkey", "p_brand"]), "l_partkey",
        "p_partkey", 16,
    )

    def brand_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("p_brand", as_index=False).agg(
            n_small=("n_small", "sum"), rev_u=("rev_u", "sum")
        )
        return pd.DataFrame(
            {"p_brand": g["p_brand"].astype(str),
             "n_small": g["n_small"].to_numpy(dtype=np.int64),
             "rev_u": g["rev_u"].to_numpy(dtype=np.int64)}
        )

    parts = _concat(
        joined.map_batches(brand_partial, batch_format="pandas", batch_size=262144)
    ).to_pandas()
    if parts.empty:
        return pa.table(
            {"p_brand": pa.array([], pa.string()),
             "n_small": pa.array([], pa.int64()),
             "lost_revenue": pa.array([], pa.float64())}
        )
    out = parts.groupby("p_brand", as_index=False).agg(
        n_small=("n_small", "sum"), rev_u=("rev_u", "sum")
    ).sort_values("p_brand", kind="mergesort")
    return pa.table(
        {
            "p_brand": pa.array(out["p_brand"].astype(str), pa.string()),
            "n_small": pa.array(out["n_small"].to_numpy(dtype=np.int64), pa.int64()),
            "lost_revenue": pa.array(
                out["rev_u"].to_numpy(dtype=np.int64) / 1e6, pa.float64()
            ),
        }
    )


SMALL_QTY_ORDER_REVENUE_SQL = """
WITH pq AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s
  FROM lineitem GROUP BY 1
)
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_small,
       CAST(sum(CAST(round(l.l_extendedprice * 1000000) AS BIGINT)) AS BIGINT)
         / 1000000.0 AS lost_revenue
FROM lineitem l
JOIN pq ON pq.l_partkey = l.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE CAST(l.l_quantity AS BIGINT) * 5 * pq.n < pq.s
GROUP BY 1 ORDER BY 1
"""


# --- Q22: idle rich customers (global scalar + NOT EXISTS + rollup) -----------


def idle_rich_customers(
    sf_dir: str, since: str = "2000-01-01", buckets: int | None = None
) -> pa.Table:
    """Per nation, the count and balance total of customers whose account
    balance exceeds the global positive-balance average AND who placed no
    order on or after ``since`` — the TPC-H Q22 shape: global-scalar
    filter + anti-join + tiny rollup (the recency predicate keeps the
    anti-join non-degenerate at every SF; with the synthetic order
    distribution every customer has SOME order).

    Scale shape: pass A streams customer once, reducing to ONE
    (cent-sum, count) pair per batch (the global average as exact
    integers — `cents * N > S` replaces the float-average comparison, so
    no summation-order boundary exists). Pass B reuses the bucketed
    anti-join: the qualifying-customer side ships (nationkey, cents) only,
    the probe side ships per-batch-DISTINCT custkeys, each bucket runs one
    vectorized isin-negation and pre-reduces to per-nation partials. The
    25-row nation rollup and name lookup finish driver-side."""
    import numpy as np

    cust_bal = _read(sf_dir, "customer", ["c_acctbal"])

    def bal_partial(b: pa.Table) -> pa.Table:
        bal = b.column("c_acctbal").to_numpy()
        pos = bal[bal > 0]
        cents = np.round(pos * 100).astype(np.int64)
        return pa.table(
            {"s": pa.array([int(cents.sum())], pa.int64()),
             "n": pa.array([len(cents)], pa.int64())}
        )

    tot = _concat(cust_bal.map_batches(bal_partial, batch_format="pyarrow")).to_pandas()
    S = int(tot["s"].sum())
    N = int(tot["n"].sum())

    import datetime as _dt

    import pyarrow.dataset as pads

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    okeys = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=(
            pads.field("o_orderdate") >= pads.scalar(_dt.datetime.fromisoformat(since))
        ),
    ).select_columns(["o_custkey"])
    if buckets is None:
        from ..bucket import auto_buckets

        buckets = max(auto_buckets(cust, floor=16), auto_buckets(okeys, floor=16))

    def tag_c(b: pa.Table) -> pa.Table:
        bal = b.column("c_acctbal").to_numpy()
        cents = np.round(bal * 100).astype(np.int64)
        keep = cents * N > S
        k = b.column("c_custkey").to_numpy()[keep]
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "nk": pa.array(
                    b.column("c_nationkey").to_numpy()[keep].astype(np.int64), pa.int64()
                ),
                "cents": pa.array(cents[keep], pa.int64()),
                "_side": pa.array(np.zeros(keep.sum(), np.int8)),
                "_bucket": pa.array((pd.util.hash_array(k) % buckets).astype(np.int64)),
            }
        )

    def tag_o(b: pa.Table) -> pa.Table:
        # sentinel zeros, NOT nulls: a nullable int64 degrades to float64
        # at the per-bucket arrow->pandas boundary, which would break the
        # documented exact-integer cents guarantee past 2^53; probe rows'
        # nk/cents are never read, only their keys
        k = np.unique(b.column("o_custkey").to_numpy())
        z = pa.array(np.zeros(len(k), np.int64), pa.int64())
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "nk": z,
                "cents": z,
                "_side": pa.array(np.ones(len(k), np.int8)),
                "_bucket": pa.array((pd.util.hash_array(k) % buckets).astype(np.int64)),
            }
        )

    both = cust.map_batches(tag_c, batch_format="pyarrow").union(
        okeys.map_batches(tag_o, batch_format="pyarrow")
    )

    def anti(g: pd.DataFrame) -> pa.Table:
        c = g[g["_side"] == 0]
        have = g.loc[g["_side"] == 1, "key"].to_numpy(dtype=np.int64)
        keep = c[~c["key"].isin(have)]
        if keep.empty:
            return pa.table(
                {"nk": pa.array([], pa.int64()),
                 "n_cust": pa.array([], pa.int64()),
                 "cents": pa.array([], pa.int64())}
            )
        r = keep.groupby("nk", as_index=False).agg(
            n_cust=("key", "size"), cents=("cents", "sum")
        )
        return pa.table(
            {"nk": pa.array(r["nk"].to_numpy(dtype=np.int64), pa.int64()),
             "n_cust": pa.array(r["n_cust"].to_numpy(dtype=np.int64), pa.int64()),
             "cents": pa.array(r["cents"].to_numpy(dtype=np.int64), pa.int64())}
        )

    parts = _concat(both.groupby("_bucket").map_groups(anti, batch_format="pandas"))
    df = parts.to_pandas()
    nat = _concat(_read(sf_dir, "nation", ["n_nationkey", "n_name"])).to_pandas()
    if df.empty:
        return pa.table(
            {"n_name": pa.array([], pa.string()),
             "n_cust": pa.array([], pa.int64()),
             "total_bal": pa.array([], pa.float64())}
        )
    agg = df.groupby("nk", as_index=False).agg(
        n_cust=("n_cust", "sum"), cents=("cents", "sum")
    )
    out = agg.merge(nat, left_on="nk", right_on="n_nationkey").sort_values(
        "n_name", kind="mergesort"
    )
    return pa.table(
        {
            "n_name": pa.array(out["n_name"].astype(str), pa.string()),
            "n_cust": pa.array(out["n_cust"].to_numpy(dtype=np.int64), pa.int64()),
            "total_bal": pa.array(
                out["cents"].to_numpy(dtype=np.int64) / 100.0, pa.float64()
            ),
        }
    )


IDLE_RICH_CUSTOMERS_SQL = """
WITH g AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS total_bal
FROM customer c, g
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * g.n > g.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1 ORDER BY 1
"""


# --- Q11-style: parts holding an outsized share of total value ----------------


def important_parts(sf_dir: str) -> pa.Table:
    """Parts whose lineitem revenue exceeds 1.5x the AVERAGE per-part
    revenue — the TPC-H Q11 HAVING-vs-global-scalar shape, with a
    scale-invariant threshold (a fixed fraction-of-total cutoff selects
    every part at small SF and none at large).

    Scale shape: per-batch partials pre-reduce to (partkey, rev_u) before
    ONE bucketed shuffle; the per-part reduced table (~30x smaller than
    lineitem) is materialized ONCE so the global total + part count (a
    streaming sum of its blocks) and the share filter read the same result
    without recomputing the scan — the materialized set is the REDUCED
    aggregate, never the input, and it spills rather than pinning heap.
    The comparison `2 * rev_u * n_parts > 3 * total` is all-Python-int
    exact at any scale (immune to int64 overflow at 100-TB revenue sums
    and free of float-average boundaries)."""
    from ..bucket import bucketed_group_agg

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rev_u = np.round(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy()) * 1e6
        ).astype(np.int64)
        return pd.DataFrame(
            {"l_partkey": b["l_partkey"].to_numpy(dtype=np.int64), "rev_u": rev_u}
        ).groupby("l_partkey", as_index=False)["rev_u"].sum()

    per_part = bucketed_group_agg(
        li.map_batches(partial, batch_format="pandas", batch_size=131072),
        ["l_partkey"],
        dict(rev_u=("rev_u", "sum")),
    ).materialize()

    def block_sum(b: pa.Table) -> pa.Table:
        col = b.column("rev_u").to_numpy()
        return pa.table(
            {"s": pa.array([int(col.sum())], pa.int64()),
             "c": pa.array([len(col)], pa.int64())}
        )

    tot = _concat(per_part.map_batches(block_sum, batch_format="pyarrow")).to_pandas()
    total = int(tot["s"].sum())
    n_parts = int(tot["c"].sum())
    if n_parts == 0:
        return pa.table(
            {"p_partkey": pa.array([], pa.int64()), "value": pa.array([], pa.float64())}
        )
    # 2*rev_u*n_parts > 3*total  <=>  rev_u > (3*total)//(2*n_parts) for
    # positive ints (strict > of an integer vs a real threshold is strict >
    # of its floor) — Python-int scalars, no overflow, no float boundary.
    thresh = (3 * total) // (2 * n_parts)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["rev_u"] > thresh]

    out = _concat(per_part.map_batches(keep, batch_format="pandas")).to_pandas()
    if out.empty:
        return pa.table(
            {"p_partkey": pa.array([], pa.int64()), "value": pa.array([], pa.float64())}
        )
    out = out.sort_values(
        ["rev_u", "l_partkey"], ascending=[False, True], kind="mergesort"
    )
    return pa.table(
        {
            "p_partkey": pa.array(out["l_partkey"].to_numpy(dtype=np.int64), pa.int64()),
            "value": pa.array(out["rev_u"].to_numpy(dtype=np.int64) / 1e6, pa.float64()),
        }
    )


IMPORTANT_PARTS_SQL = """
WITH pv AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT))
              AS BIGINT) AS v
  FROM lineitem GROUP BY 1
), tot AS (SELECT sum(v) AS t, count(*) AS c FROM pv)
SELECT pv.l_partkey AS p_partkey, pv.v / 1000000.0 AS value
FROM pv, tot
WHERE 2 * pv.v * tot.c > 3 * tot.t
ORDER BY pv.v DESC, pv.l_partkey
"""


# --- Q8: supplier-nation market share within a customer region ----------------


def nation_market_share(
    sf_dir: str, region: str = "ASIA", supp_nation: str = "NATION_3"
) -> pa.Table:
    """Per order-year: total revenue sold to customers of one REGION, the
    slice supplied by one NATION, and that nation's market share — the
    TPC-H Q8 two-fact multi-dimensional join (lineitem x orders x customer
    x supplier x nation x region).

    Scale shape: supplier collapses to a dense suppkey -> nation-code map
    and customer to a dense custkey -> in-region bit, each broadcast once
    via ``ray.put`` under ``_broadcast_limit()`` with a hash-bucket shuffle
    join fallback past it (customer IS a fact table at 100 TB); the only
    large-large exchange is ONE bucketed join of pre-reduced lineitem
    (orderkey, supp-nation, rev_u) partials against in-region-filtered
    (orderkey, year) order rows. Batches collapse to <= years x nations
    rows before the tiny final reduce; the share divides two order-free
    integer micro-unit sums once, driver-side."""
    from ..bucket import bucketed_group_agg

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rk = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    nation = nation.sort_values("n_nationkey")
    nk = nation["n_nationkey"].to_numpy(dtype=np.int64)
    dense_code = np.full(int(nk.max()) + 1, -1, dtype=np.int32)
    dense_code[nk] = np.arange(len(nk), dtype=np.int32)
    dense_inreg = np.zeros(int(nk.max()) + 1, dtype=np.int8)
    dense_inreg[nk] = (nation["n_regionkey"].to_numpy(dtype=np.int64) == rk).astype(
        np.int8
    )
    target_code = int(
        dense_code[int(nation.loc[nation["n_name"] == supp_nation, "n_nationkey"].iloc[0])]
    )

    def _dense(table, key, vals_fn, cols, fill):
        if _read(sf_dir, table, [key]).count() > _broadcast_limit():
            return None
        df = _read(sf_dir, table, cols).to_pandas()
        keys = df[key].to_numpy(dtype=np.int64)
        if len(keys) == 0 or keys.max() > 4 * len(keys) + 1024:
            return None
        vals = vals_fn(df)
        dense = np.full(int(keys.max()) + 1, fill, dtype=vals.dtype)
        dense[keys] = vals
        return dense

    supp_map = _dense(
        "supplier", "s_suppkey",
        lambda df: dense_code[df["s_nationkey"].to_numpy(dtype=np.int64)],
        ["s_suppkey", "s_nationkey"], np.int32(-1),
    )
    cust_map = _dense(
        "customer", "c_custkey",
        lambda df: dense_inreg[df["c_nationkey"].to_numpy(dtype=np.int64)],
        ["c_custkey", "c_nationkey"], np.int8(0),
    )

    # --- lineitem side: pre-reduced (orderkey, supp-nation-code, rev_u) ---
    line_cols = ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    if supp_map is not None:
        sref = ray.put(supp_map)

        def line_side(batch: pa.Table) -> pd.DataFrame:
            sm = _cached_get(sref)
            skb = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            sn = np.where(
                (skb >= 0) & (skb < len(sm)), sm[np.clip(skb, 0, len(sm) - 1)], -1
            )
            keep = sn >= 0
            rev_u = np.round(
                batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
                * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False)[keep])
                * 1e6
            ).astype(np.int64)
            df = pd.DataFrame(
                {
                    "l_orderkey": batch.column("l_orderkey").to_numpy(
                        zero_copy_only=False
                    )[keep],
                    "sn": sn[keep].astype(np.int64),
                    "rev_u": rev_u,
                }
            )
            return df.groupby(["l_orderkey", "sn"], as_index=False)["rev_u"].sum()

        line = _read(sf_dir, "lineitem", line_cols).map_batches(
            line_side, batch_format="pyarrow", batch_size=131072
        )
    else:
        sside = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
            lambda df: pd.DataFrame(
                {
                    "s_suppkey": df["s_suppkey"].to_numpy(),
                    "sn": dense_code[df["s_nationkey"].to_numpy(dtype=np.int64)].astype(
                        np.int64
                    ),
                }
            ),
            batch_format="pandas",
        )

        def line_proj(df: pd.DataFrame) -> pd.DataFrame:
            rev_u = np.round(
                df["l_extendedprice"].to_numpy()
                * (1.0 - df["l_discount"].to_numpy()) * 1e6
            ).astype(np.int64)
            return pd.DataFrame(
                {
                    "l_orderkey": df["l_orderkey"].to_numpy(),
                    "l_suppkey": df["l_suppkey"].to_numpy(),
                    "rev_u": rev_u,
                }
            )

        line = _bucket_join(
            _read(sf_dir, "lineitem", line_cols).map_batches(
                line_proj, batch_format="pandas", batch_size=131072
            ),
            sside, "l_suppkey", "s_suppkey", 16,
        ).map_batches(
            lambda df: df.groupby(["l_orderkey", "sn"], as_index=False)["rev_u"].sum(),
            batch_format="pandas", batch_size=262144,
        )

    # --- orders side: in-region (orderkey, year) rows ---
    if cust_map is not None:
        cref = ray.put(cust_map)

        def orders_side(batch: pa.Table) -> pd.DataFrame:
            cm = _cached_get(cref)
            ckb = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            keep = (ckb >= 0) & (ckb < len(cm)) & (
                cm[np.clip(ckb, 0, len(cm) - 1)] > 0
            )
            return pd.DataFrame(
                {
                    "o_orderkey": batch.column("o_orderkey").to_numpy(
                        zero_copy_only=False
                    )[keep],
                    "o_year": batch.column("o_orderdate")
                    .cast(pa.timestamp("us"))
                    .to_pandas()
                    .dt.year.to_numpy(dtype=np.int64)[keep],
                }
            )

        ords = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            orders_side, batch_format="pyarrow", batch_size=131072
        )
    else:
        cside = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            lambda df: df[
                dense_inreg[df["c_nationkey"].to_numpy(dtype=np.int64)] > 0
            ][["c_custkey"]],
            batch_format="pandas",
        )

        def orders_proj(batch: pa.Table) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "o_orderkey": batch.column("o_orderkey").to_numpy(
                        zero_copy_only=False
                    ),
                    "o_custkey": batch.column("o_custkey").to_numpy(
                        zero_copy_only=False
                    ),
                    "o_year": batch.column("o_orderdate")
                    .cast(pa.timestamp("us"))
                    .to_pandas()
                    .dt.year.to_numpy(dtype=np.int64),
                }
            )

        ords = _bucket_join(
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
                orders_proj, batch_format="pyarrow", batch_size=131072
            ),
            cside, "o_custkey", "c_custkey", 16,
        ).map_batches(
            lambda df: df[["o_orderkey", "o_year"]], batch_format="pandas"
        )

    joined = _bucket_join(line, ords, "l_orderkey", "o_orderkey", 16)

    def year_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_year", "sn"], as_index=False)["rev_u"].sum()
        return pd.DataFrame(
            {
                "o_year": g["o_year"].to_numpy(dtype=np.int64),
                "sn": g["sn"].to_numpy(dtype=np.int64),
                "rev_u": g["rev_u"].to_numpy(dtype=np.int64),
            }
        )

    parts = _concat(
        joined.map_batches(year_partial, batch_format="pandas", batch_size=262144)
    ).to_pandas()
    if parts.empty:
        return pa.table(
            {"o_year": pa.array([], pa.int64()),
             "total_revenue": pa.array([], pa.float64()),
             "nation_revenue": pa.array([], pa.float64()),
             "mkt_share": pa.array([], pa.float64())}
        )
    agg = parts.groupby(["o_year", "sn"], as_index=False)["rev_u"].sum()
    tot = agg.groupby("o_year", as_index=False)["rev_u"].sum().rename(
        columns={"rev_u": "tot_u"}
    )
    nat = (
        agg[agg["sn"] == target_code]
        .groupby("o_year", as_index=False)["rev_u"]
        .sum()
        .rename(columns={"rev_u": "nat_u"})
    )
    # left-merge NaNs would upcast nat_u to float64 (precision loss past
    # 2^53 micro-units at extreme scale) — keep it a nullable Int64
    nat["nat_u"] = nat["nat_u"].astype("Int64")
    out = tot.merge(nat, on="o_year", how="left")
    out["nat_u"] = out["nat_u"].fillna(0)
    out = out.sort_values("o_year", kind="mergesort")
    tot_u = out["tot_u"].to_numpy(dtype=np.int64)
    nat_u = out["nat_u"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "o_year": pa.array(out["o_year"].to_numpy(dtype=np.int64), pa.int64()),
            "total_revenue": pa.array(tot_u / 1e6, pa.float64()),
            "nation_revenue": pa.array(nat_u / 1e6, pa.float64()),
            "mkt_share": pa.array(np.round(nat_u / tot_u, 6), pa.float64()),
        }
    )


NATION_MARKET_SHARE_SQL = """
WITH t AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000) AS BIGINT)
           AS rev_u,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
)
SELECT o_year,
       CAST(sum(rev_u) AS BIGINT) / 1000000.0 AS total_revenue,
       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_u ELSE 0 END)
            AS BIGINT) / 1000000.0 AS nation_revenue,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_u ELSE 0 END) * 1.0
             / sum(rev_u), 6) AS mkt_share
FROM t GROUP BY 1 ORDER BY 1
"""


# --- window-ratio: supplier revenue share within its nation -------------------


def supplier_share_in_nation(sf_dir: str) -> pa.Table:
    """Per supplier: total lineitem revenue and its share of the supplier's
    NATION total, in integer parts-per-million — the ``sum() OVER
    (PARTITION BY nation)`` window-ratio shape (TPC-H Q15 flavoured, but
    ratio-to-group-total rather than argmax).

    Scale shape: lineitem collapses per batch to (suppkey, rev_u) partials
    in integer MICRO-units (price*(1-disc) has exactly 4 decimals, so
    *1e6 is tie-free — *100 would leave exact .5 ties where numpy rounds
    half-even and DuckDB half-away; see rel_nation_market_share for the
    same convention), one bucketed group-agg on suppkey (shuffle carries
    suppliers-count rows, not lineitem rows); supplier -> nation is a
    broadcast of the small dimension pair; nation totals fold from the
    per-supplier aggregate driver-side (suppliers-count rows — at 100 TB a
    few million rows, fine on the driver; the heavy fact table never
    leaves the cluster un-reduced). The ppm share divides two order-free
    integer sums once: share_ppm = round-half-up(1e6 * rev_u / tot_u) via
    (2*1e6*rev_u + tot_u) // (2*tot_u) — computed in arbitrary-precision
    Python ints on the driver-side supplier rows (2e6 * micro-units
    overflows int64 past ~$4.6M/supplier; the SQL mirror casts HUGEINT)."""
    from ..bucket import bucketed_group_agg

    def partial(batch: pa.Table) -> pa.Table:
        rev_u = np.round(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False))
            * 1_000_000.0
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_suppkey": batch.column("l_suppkey").to_numpy(
                    zero_copy_only=False
                ),
                "rev_u": rev_u,
            }
        )
        return _from_pandas(df.groupby("l_suppkey", as_index=False)["rev_u"].sum())

    per_supp = _concat(
        bucketed_group_agg(
            _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
            .map_batches(partial, batch_format="pyarrow", batch_size=131072),
            ["l_suppkey"],
            dict(rev_u=("rev_u", "sum")),
        )
    ).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    j = per_supp.merge(
        supp, left_on="l_suppkey", right_on="s_suppkey", how="inner"
    ).merge(nation, left_on="s_nationkey", right_on="n_nationkey", how="inner")
    tot = j.groupby("n_name", as_index=False).agg(tot_u=("rev_u", "sum"))
    j = j.merge(tot, on="n_name", how="left").sort_values(
        ["n_name", "s_suppkey"], kind="mergesort"
    )
    rev_u = j["rev_u"].to_numpy(dtype=np.int64)
    tot_u = j["tot_u"].to_numpy(dtype=np.int64)
    share_ppm = np.fromiter(
        (
            (2 * 1_000_000 * int(r) + int(t)) // (2 * int(t))
            for r, t in zip(rev_u, tot_u)
        ),
        dtype=np.int64,
        count=len(rev_u),
    )
    return pa.table(
        {
            "n_name": pa.array(j["n_name"].astype(str), pa.string()),
            "s_suppkey": pa.array(j["s_suppkey"].to_numpy(dtype=np.int64), pa.int64()),
            "s_name": pa.array(j["s_name"].astype(str), pa.string()),
            "revenue": pa.array(rev_u / 1_000_000.0, pa.float64()),
            "share_ppm": pa.array(share_ppm, pa.int64()),
        }
    )


SUPPLIER_SHARE_SQL = """
WITH s AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                       AS BIGINT)) AS BIGINT) AS rev_u
  FROM lineitem GROUP BY l_suppkey
), j AS (
  SELECT n_name, su.s_suppkey, su.s_name, rev_u
  FROM s
  JOIN supplier su ON su.s_suppkey = s.l_suppkey
  JOIN nation n ON n.n_nationkey = su.s_nationkey
), t AS (
  SELECT n_name, CAST(sum(rev_u) AS BIGINT) AS tot_u FROM j GROUP BY n_name
)
SELECT j.n_name, j.s_suppkey, j.s_name,
       rev_u / 1000000.0 AS revenue,
       CAST((2 * 1000000 * CAST(rev_u AS HUGEINT) + tot_u) // (2 * tot_u)
            AS BIGINT) AS share_ppm
FROM j JOIN t ON t.n_name = j.n_name
ORDER BY j.n_name, j.s_suppkey
"""


# --- lag window: per-customer order-over-order deltas -------------------------


def customer_order_deltas(sf_dir: str) -> pa.Table:
    """Per order (for customers with a prior order): days since the
    customer's PREVIOUS order and the price delta in integer cents — the
    ``lag() OVER (PARTITION BY custkey ORDER BY orderdate, orderkey)``
    window on the relational side (churn / reorder-cadence features).

    One hash shuffle of 3 projected columns on custkey (bucket count sized
    to input bytes); inside each bucket one mergesort + vectorized diff
    masked at customer boundaries — no per-key loop, no driver-side
    window. Deltas are int64 (days, cents): association-free, so the
    distributed result is bit-identical to the sequential window oracle."""
    from ..bucket import bucketed_apply

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
        )
        ck = g["o_custkey"].to_numpy(dtype=np.int64)
        day = (
            g["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        price_c = np.round(g["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        ok = g["o_orderkey"].to_numpy(dtype=np.int64)
        same = ck[1:] == ck[:-1]
        return pd.DataFrame(
            {
                "o_custkey": ck[1:][same],
                "o_orderkey": ok[1:][same],
                "gap_days": (day[1:] - day[:-1])[same],
                "delta_c": (price_c[1:] - price_c[:-1])[same],
            }
        )

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    t = _concat(bucketed_apply(ds, ["o_custkey"], bucket_fn))
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("o_custkey", "ascending"), ("o_orderkey", "ascending")]
        )
    )


CUSTOMER_ORDER_DELTAS_SQL = """
WITH w AS (
  SELECT o_custkey, o_orderkey,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
         lag(CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS prev_day,
         lag(CAST(round(o_totalprice * 100) AS BIGINT))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS prev_c
  FROM orders
)
SELECT o_custkey, o_orderkey,
       day - prev_day AS gap_days,
       price_c - prev_c AS delta_c
FROM w WHERE prev_day IS NOT NULL
ORDER BY o_custkey, o_orderkey
"""


# --- exact grouped quantiles without a global sort -----------------------------


def order_price_quantiles(sf_dir: str) -> pa.Table:
    """EXACT p25/p50/p75 of order totalprice per order priority — grouped
    quantiles with NO global sort at any scale: per-batch (priority,
    integer-cent) count histograms (lossless: prices carry 2 decimals, so
    histogram size is bounded by the PRICE RANGE, not the row count), one
    bucketed shuffle sums them, and the driver walks each priority's
    cumulative histogram picking index ceil(q*n)-1 — bit-identical to
    DuckDB's quantile_disc (same rule as ``ev_value_quantiles_by_type``)."""
    from ..bucket import bucketed_group_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g = pd.DataFrame(
            {"o_orderpriority": b["o_orderpriority"].astype(str), "cent": cents}
        ).groupby(["o_orderpriority", "cent"], as_index=False).size()
        return pd.DataFrame(
            {
                "o_orderpriority": g["o_orderpriority"].astype(str),
                "cent": g["cent"].to_numpy(dtype=np.int64),
                "n": g["size"].to_numpy(dtype=np.int64),
            }
        )

    hist = _concat(
        bucketed_group_agg(
            _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]).map_batches(
                partial, batch_format="pandas", batch_size=262144
            ),
            ["o_orderpriority", "cent"],
            dict(n=("n", "sum")),
        )
    ).to_pandas()

    def _disc(cents: np.ndarray, cum: np.ndarray, q100: int) -> int:
        n = int(cum[-1])
        target = -(-q100 * n // 100)
        return int(cents[np.searchsorted(cum, target)])

    rows = []
    for prio, g in hist.groupby("o_orderpriority"):
        g = g.sort_values("cent", kind="mergesort")
        cents = g["cent"].to_numpy(dtype=np.int64)
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        qs = [_disc(cents, cum, q) / 100.0 for q in (25, 50, 75)]
        rows.append((prio, int(cum[-1]), *qs))
    rows.sort()
    return pa.table(
        {
            "o_orderpriority": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "p25": pa.array([r[2] for r in rows], pa.float64()),
            "p50": pa.array([r[3] for r in rows], pa.float64()),
            "p75": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


ORDER_PRICE_QUANTILES_SQL = """
SELECT o_orderpriority, count(*) AS n,
       quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.25) / 100.0 AS p25,
       quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.50) / 100.0 AS p50,
       quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.75) / 100.0 AS p75
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- Q12: shipping-speed vs order priority (join + conditional counts) --------


def ship_speed_priority(sf_dir: str) -> pa.Table:
    """Lineitems shipped in 1997 bucketed by shipping delay (FAST <= 30 d,
    MEDIUM <= 90 d, SLOW beyond), counting high- vs low-priority order lines
    per bucket — the TPC-H Q12 shape with the delay bucket standing in for
    ``l_shipmode`` (the synthetic lineitem has no ship mode column).

    Scale shape: while the orders side fits ``_broadcast_limit()`` and its
    keys are dense, it collapses to ONE packed int32 per order
    (orderdate-day * 2 + priority-bit) broadcast once via ``ray.put`` —
    lineitem is then a single no-shuffle pass emitting <= 3 count rows per
    batch. Past the limit (100-TB orders is a fact table) the bit-identical
    fallback prunes and projects both sides BEFORE one orderkey hash-bucket
    join. Delays are whole days (all stamps are midnight), making the
    bucket edges exact integer comparisons on both engines."""
    from ..bucket import bucketed_group_agg

    lo = np.datetime64("1997-01-01")
    hi = np.datetime64("1998-01-01")

    def _speed_counts(ship, od_day, high):
        delay = ship.astype("datetime64[D]").astype(np.int64) - od_day
        speed = np.where(delay <= 30, "FAST", np.where(delay <= 90, "MEDIUM", "SLOW"))
        return pd.DataFrame(
            {"ship_speed": speed, "h": high.astype(np.int64),
             "l": (~high).astype(np.int64)}
        ).groupby("ship_speed", as_index=False).agg(
            high_line_count=("h", "sum"), low_line_count=("l", "sum")
        )

    packed = None
    if _read(sf_dir, "orders", ["o_orderkey"]).count() <= _broadcast_limit():
        odf = _read(
            sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).to_pandas()
        keys = odf["o_orderkey"].to_numpy(dtype=np.int64)
        if len(keys) and keys.max() <= 4 * len(keys) + 1024:
            od_day = odf["o_orderdate"].to_numpy().astype("datetime64[D]").astype(
                np.int64
            )
            high = odf["o_orderpriority"].astype(str).isin(
                ["1-URGENT", "2-HIGH"]
            ).to_numpy()
            dense = np.full(int(keys.max()) + 1, np.iinfo(np.int32).min, np.int32)
            dense[keys] = (od_day * 2 + high).astype(np.int32)
            packed = ray.put(dense)

    if packed is not None:
        def fused(df: pd.DataFrame) -> pd.DataFrame:
            ship = df["l_shipdate"].to_numpy()
            keep = (ship >= lo) & (ship < hi)
            pm = _cached_get(packed)
            p = pm[df["l_orderkey"].to_numpy(dtype=np.int64)[keep]]
            return _speed_counts(ship[keep], p >> 1, (p & 1).astype(bool))

        partials = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
            fused, batch_format="pandas", batch_size=262144
        )
    else:
        def li_proj(df: pd.DataFrame) -> pd.DataFrame:
            ship = df["l_shipdate"].to_numpy()
            keep = (ship >= lo) & (ship < hi)
            return pd.DataFrame(
                {"l_orderkey": df["l_orderkey"].to_numpy(dtype=np.int64)[keep],
                 "ship": ship[keep]}
            )

        def ord_proj(df: pd.DataFrame) -> pd.DataFrame:
            prio = df["o_orderpriority"].astype(str)
            return pd.DataFrame(
                {"o_orderkey": df["o_orderkey"].to_numpy(dtype=np.int64),
                 "od": df["o_orderdate"].to_numpy(),
                 "high": prio.isin(["1-URGENT", "2-HIGH"]).to_numpy()}
            )

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
            li_proj, batch_format="pandas", batch_size=262144
        )
        ords = _read(
            sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).map_batches(ord_proj, batch_format="pandas", batch_size=262144)
        joined = _bucket_join(li, ords, "l_orderkey", "o_orderkey", 16)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            od_day = df["od"].to_numpy().astype("datetime64[D]").astype(np.int64)
            return _speed_counts(
                df["ship"].to_numpy(), od_day, df["high"].to_numpy(dtype=bool)
            )

        partials = joined.map_batches(
            partial, batch_format="pandas", batch_size=262144
        )

    out = _concat(
        bucketed_group_agg(
            partials,
            ["ship_speed"],
            dict(high_line_count=("high_line_count", "sum"),
                 low_line_count=("low_line_count", "sum")),
        )
    ).to_pandas().sort_values("ship_speed", kind="mergesort")
    return pa.table(
        {"ship_speed": pa.array(out["ship_speed"].astype(str), pa.string()),
         "high_line_count": pa.array(
             out["high_line_count"].to_numpy(dtype=np.int64), pa.int64()),
         "low_line_count": pa.array(
             out["low_line_count"].to_numpy(dtype=np.int64), pa.int64())}
    )


SHIP_SPEED_PRIORITY_SQL = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 'FAST'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN 'MEDIUM'
            ELSE 'SLOW' END AS ship_speed,
       CAST(count(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH'))
            AS BIGINT) AS high_line_count,
       CAST(count(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1
"""


# --- Q16: distinct supplier counts per part attribute (double distinct) -------


def part_supplier_counts(sf_dir: str) -> pa.Table:
    """Per (p_brand, p_size) of non-PROMO parts, the number of DISTINCT
    suppliers that ever shipped the part — TPC-H Q16's
    count(distinct suppkey) with its supplier-exclusion subquery, adapted:
    the excluded set is suppliers whose account balance is strictly below
    the global supplier average (the synthetic table has no comment field
    to grep for complaints).

    Scale shape: the below-average test is two broadcast SCALARS (integer
    cent sum + count, reduced from per-batch partials) applied as a
    cross-multiplied integer filter on the supplier side — no quantile, no
    float average, no supplier-list broadcast. The (partkey, suppkey) pair
    set is deduped map-side per batch, then exactly in one pair-keyed
    bucket shuffle; two bucket joins (qualifying suppliers, non-PROMO
    parts) and a (brand, size)-bucketed second distinct finish it. No stage
    holds more than one hash bucket."""
    from ..bucket import bucketed_apply

    # global scalar: sum/count of supplier acctbal in integer cents
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])

    def acct_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.round(df["s_acctbal"].to_numpy() * 100).astype(np.int64)
        return pd.DataFrame({"sum_c": [int(c.sum())], "n": [len(c)]})

    sc = _concat(
        sup.map_batches(acct_partial, batch_format="pandas", batch_size=262144)
    ).to_pandas()
    sum_c, n_sup = int(sc["sum_c"].sum()), int(sc["n"].sum())

    def ok_suppliers(df: pd.DataFrame) -> pd.DataFrame:
        c = np.round(df["s_acctbal"].to_numpy() * 100).astype(np.int64)
        keep = c * n_sup >= sum_c
        return pd.DataFrame(
            {"s_suppkey": df["s_suppkey"].to_numpy(dtype=np.int64)[keep]}
        )

    ok = sup.map_batches(ok_suppliers, batch_format="pandas")

    pairs = bucketed_apply(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
            lambda df: df.drop_duplicates(["l_partkey", "l_suppkey"]),
            batch_format="pandas", batch_size=262144,
        ),
        ["l_partkey", "l_suppkey"],
        lambda g: g.drop_duplicates(["l_partkey", "l_suppkey"]),
    )
    pairs_ok = _bucket_join(pairs, ok, "l_suppkey", "s_suppkey", 16)

    pf = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size", "p_type"]).map_batches(
        lambda df: df[df["p_type"].astype(str) != "PROMO"][
            ["p_partkey", "p_brand", "p_size"]
        ],
        batch_format="pandas",
    )
    tagged = _bucket_join(pairs_ok, pf, "l_partkey", "p_partkey", 16)

    def brand_size_count(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["p_brand", "p_size", "l_suppkey"])
        r = d.groupby(["p_brand", "p_size"], as_index=False).agg(
            supplier_cnt=("l_suppkey", "size")
        )
        return pd.DataFrame(
            {"p_brand": r["p_brand"].astype(str),
             "p_size": r["p_size"].to_numpy(dtype=np.int64),
             "supplier_cnt": r["supplier_cnt"].to_numpy(dtype=np.int64)}
        )

    out = _concat(
        bucketed_apply(tagged, ["p_brand", "p_size"], brand_size_count)
    ).to_pandas()
    out = out.sort_values(
        ["supplier_cnt", "p_brand", "p_size"],
        ascending=[False, True, True], kind="mergesort",
    )
    return pa.table(
        {"p_brand": pa.array(out["p_brand"].astype(str), pa.string()),
         "p_size": pa.array(out["p_size"].to_numpy(dtype=np.int64), pa.int64()),
         "supplier_cnt": pa.array(
             out["supplier_cnt"].to_numpy(dtype=np.int64), pa.int64())}
    )


PART_SUPPLIER_COUNTS_SQL = """
WITH sc AS (
  SELECT CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_c,
         CAST(count(*) AS BIGINT) AS n
  FROM supplier
), ok AS (
  SELECT s_suppkey FROM supplier, sc
  WHERE CAST(round(s_acctbal * 100) AS BIGINT) * sc.n >= sc.sum_c
), ps AS (
  SELECT DISTINCT l_partkey, l_suppkey
  FROM lineitem JOIN ok ON ok.s_suppkey = l_suppkey
)
SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON p_partkey = l_partkey
WHERE p_type <> 'PROMO'
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


def _supplier_named_count(partials, sf_dir: str, count_col: str) -> pd.DataFrame:
    """Shared tail for the per-supplier count queries (Q20/Q21 shapes): sum
    per-batch (``wk`` = suppkey, count) partials in a suppkey-bucketed
    reduce, attach supplier names with a bucket join, and return the tiny
    (<= |supplier| rows) driver-side frame for the caller to sort."""
    from ..bucket import bucketed_group_agg

    per_sup = bucketed_group_agg(partials, ["wk"], {count_col: (count_col, "sum")})
    return _concat(
        _bucket_join(
            per_sup, _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
            "wk", "s_suppkey", 16,
        )
    ).to_pandas()


# --- Q21: suppliers who were the sole late shipper of multi-supplier orders ---


def waiting_suppliers(sf_dir: str) -> pa.Table:
    """Per supplier, the number of finished ('F') multi-supplier orders in
    which THIS supplier shipped late (> 60 days after the order date) and
    no other supplier did — TPC-H Q21's exists/not-exists pair, with the
    late test on l_shipdate vs o_orderdate (the synthetic lineitem has no
    commit/receipt dates).

    Scale shape: one orderkey bucket join (lineitem pruned to 3 columns,
    'F' orders to 2), then ONE orderkey-bucketed pass computes, per order,
    the distinct-supplier count and the distinct LATE-supplier set
    vectorized, emitting at most one (suppkey) row per order; the final
    per-supplier count is a bucketed group-agg over those partials and a
    bucket join to supplier names. Late = whole-day integer comparison."""
    from ..bucket import bucketed_apply

    def ord_proj(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["o_orderstatus"].astype(str).to_numpy() == "F"
        return pd.DataFrame(
            {"o_orderkey": df["o_orderkey"].to_numpy(dtype=np.int64)[keep],
             "od": df["o_orderdate"].to_numpy()[keep]}
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    ords = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"]
    ).map_batches(ord_proj, batch_format="pandas", batch_size=262144)
    joined = _bucket_join(li, ords, "l_orderkey", "o_orderkey", 16)

    def sole_late(g: pd.DataFrame) -> pd.DataFrame:
        ok = g["l_orderkey"].to_numpy(dtype=np.int64)
        sk = g["l_suppkey"].to_numpy(dtype=np.int64)
        late = g["l_shipdate"].to_numpy() > g["od"].to_numpy() + np.timedelta64(60, "D")
        d = pd.DataFrame({"ok": ok, "sk": sk}).drop_duplicates()
        ns = d.groupby("ok")["sk"].size()
        dl = pd.DataFrame({"ok": ok[late], "sk": sk[late]}).drop_duplicates()
        nl = dl.groupby("ok")["sk"].agg(["size", "first"])
        hit = nl[(nl["size"] == 1) & (ns.reindex(nl.index).to_numpy() >= 2)]
        return pd.DataFrame({"s_suppkey": hit["first"].to_numpy(dtype=np.int64)})

    hits = bucketed_apply(joined, ["l_orderkey"], sole_late).map_batches(
        lambda df: df.groupby("s_suppkey", as_index=False)
        .agg(numwait=("s_suppkey", "size"))
        .rename(columns={"s_suppkey": "wk"}),
        batch_format="pandas", batch_size=262144,
    )
    named = _supplier_named_count(hits, sf_dir, "numwait")
    named = named.sort_values(
        ["numwait", "s_name"], ascending=[False, True], kind="mergesort"
    )
    return pa.table(
        {"s_name": pa.array(named["s_name"].astype(str), pa.string()),
         "numwait": pa.array(named["numwait"].to_numpy(dtype=np.int64), pa.int64())}
    )


WAITING_SUPPLIERS_SQL = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS ns,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nl,
         max(CASE WHEN late THEN l_suppkey END) AS ls
  FROM lo GROUP BY 1
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per JOIN supplier ON s_suppkey = ls
WHERE ns >= 2 AND nl = 1
GROUP BY 1 ORDER BY numwait DESC, s_name
"""


# --- Q20: suppliers dominating a part's 1997 volume (nested aggregates) -------


def dominant_part_suppliers(sf_dir: str) -> pa.Table:
    """Per supplier, how many contested parts (>= 2 suppliers shipped it in
    1997) they DOMINATED — shipped strictly more than half the part's 1997
    quantity. TPC-H Q20's nested half-of-total-quantity correlation,
    re-based on lineitem because the synthetic schema has no partsupp.

    Scale shape: one partkey-bucketed pass computes per-(part, supplier)
    integer quantity sums AND the per-part total/supplier-count in the same
    vectorized groupby-transform, emitting only the dominating (suppkey)
    rows; a bucketed per-supplier count and a supplier-name bucket join
    finish it. The dominance test is all-integer (2*q > total)."""
    from ..bucket import bucketed_apply

    lo = np.datetime64("1997-01-01")
    hi = np.datetime64("1998-01-01")

    def li_proj(df: pd.DataFrame) -> pd.DataFrame:
        ship = df["l_shipdate"].to_numpy()
        keep = (ship >= lo) & (ship < hi)
        return pd.DataFrame(
            {"pk": df["l_partkey"].to_numpy(dtype=np.int64)[keep],
             "sk": df["l_suppkey"].to_numpy(dtype=np.int64)[keep],
             "q": np.round(df["l_quantity"].to_numpy()[keep]).astype(np.int64)}
        )

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
    ).map_batches(li_proj, batch_format="pandas", batch_size=262144)

    def dominate(g: pd.DataFrame) -> pd.DataFrame:
        ps = g.groupby(["pk", "sk"], as_index=False)["q"].sum()
        grp = ps.groupby("pk")["q"]
        tq = grp.transform("sum").to_numpy(dtype=np.int64)
        nsup = grp.transform("size").to_numpy(dtype=np.int64)
        win = (ps["q"].to_numpy(dtype=np.int64) * 2 > tq) & (nsup >= 2)
        return pd.DataFrame({"wk": ps["sk"].to_numpy(dtype=np.int64)[win]})

    wins = bucketed_apply(li, ["pk"], dominate).map_batches(
        lambda df: df.groupby("wk", as_index=False).agg(n_parts=("wk", "size")),
        batch_format="pandas", batch_size=262144,
    )
    named = _supplier_named_count(wins, sf_dir, "n_parts").sort_values(
        "s_name", kind="mergesort"
    )
    return pa.table(
        {"s_name": pa.array(named["s_name"].astype(str), pa.string()),
         "n_parts": pa.array(named["n_parts"].to_numpy(dtype=np.int64), pa.int64())}
    )


DOMINANT_PART_SUPPLIERS_SQL = """
WITH s AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
), t AS (
  SELECT l_partkey, CAST(sum(q) AS BIGINT) AS tq,
         CAST(count(*) AS BIGINT) AS nsup
  FROM s GROUP BY 1
)
SELECT s_name, CAST(count(*) AS BIGINT) AS n_parts
FROM s JOIN t USING (l_partkey) JOIN supplier ON s_suppkey = l_suppkey
WHERE s.q * 2 > t.tq AND t.nsup >= 2
GROUP BY 1 ORDER BY 1
"""


# --- Q2: cheapest supplier per part (grouped argmin with tie-break) -----------


def min_cost_supplier(sf_dir: str, max_size: int = 15) -> pa.Table:
    """For every part of size <= ``max_size`` that ever shipped, the
    supplier offering the minimum observed unit price (extendedprice /
    quantity over lineitem, the synthetic stand-in for partsupp's
    supplycost), ties broken by the lower suppkey — TPC-H Q2's grouped
    argmin shape.

    Scale shape: the argmin runs inside ONE partkey-bucketed pass (all
    rows of a part are co-located, per-(part, supplier) min then a sorted
    drop_duplicates argmin, all vectorized); part-filter and supplier-name
    attachment are bucket joins. While the part dimension fits the
    broadcast limit, the qualifying (size <= max) key set is shipped once
    via ``ray.put`` and prunes the fact projection MAP-SIDE — with uniform
    sizes 1..50 and max_size=15 that keeps ~70 % of lineitem out of the
    partkey shuffle; past the limit the unpruned shuffle + filter join is
    the bit-identical fallback. Unit price is a single float64 division
    then min — order-free, so bit-identical to the SQL oracle."""
    from ..bucket import bucketed_apply

    prune_ref = None
    if _read(sf_dir, "part", ["p_partkey"]).count() <= _broadcast_limit():
        pdim = _read(sf_dir, "part", ["p_partkey", "p_size"]).to_pandas()
        prune_ref = ray.put(
            frozenset(pdim.loc[pdim["p_size"] <= max_size, "p_partkey"].astype(int))
        )

    def li_proj(df: pd.DataFrame) -> pd.DataFrame:
        if prune_ref is not None:
            df = df[df["l_partkey"].isin(_cached_get(prune_ref))]
        return pd.DataFrame(
            {"pk": df["l_partkey"].to_numpy(dtype=np.int64),
             "sk": df["l_suppkey"].to_numpy(dtype=np.int64),
             "u": df["l_extendedprice"].to_numpy() / df["l_quantity"].to_numpy()}
        )

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]
    ).map_batches(li_proj, batch_format="pandas", batch_size=262144)

    def argmin(g: pd.DataFrame) -> pd.DataFrame:
        ps = g.groupby(["pk", "sk"], as_index=False)["u"].min()
        best = ps.sort_values(["pk", "u", "sk"], kind="mergesort").drop_duplicates(
            "pk", keep="first"
        )
        return pd.DataFrame(
            {"pk": best["pk"].to_numpy(dtype=np.int64),
             "wk": best["sk"].to_numpy(dtype=np.int64),
             "unit_cost": best["u"].to_numpy(dtype=np.float64)}
        )

    best = bucketed_apply(li, ["pk"], argmin)
    pf = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda df: df[df["p_size"].to_numpy(dtype=np.int64) <= max_size][
            ["p_partkey", "p_brand"]
        ],
        batch_format="pandas",
    )
    withpart = _bucket_join(best, pf, "pk", "p_partkey", 16)
    named = _concat(
        _bucket_join(
            withpart, _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
            "wk", "s_suppkey", 16,
        )
    ).to_pandas().sort_values("p_partkey", kind="mergesort")
    return pa.table(
        {"p_partkey": pa.array(named["p_partkey"].to_numpy(dtype=np.int64), pa.int64()),
         "p_brand": pa.array(named["p_brand"].astype(str), pa.string()),
         "s_name": pa.array(named["s_name"].astype(str), pa.string()),
         "unit_cost": pa.array(named["unit_cost"].to_numpy(dtype=np.float64),
                               pa.float64())}
    )


MIN_COST_SUPPLIER_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS u
  FROM lineitem GROUP BY 1, 2
), best AS (
  SELECT l_partkey, l_suppkey, u,
         row_number() OVER (PARTITION BY l_partkey ORDER BY u, l_suppkey) AS rn
  FROM cost
)
SELECT p.p_partkey, p.p_brand, s.s_name, b.u AS unit_cost
FROM best b
JOIN part p ON p.p_partkey = b.l_partkey AND p.p_size <= 15
JOIN supplier s ON s.s_suppkey = b.l_suppkey
WHERE b.rn = 1
ORDER BY p.p_partkey
"""


# --- Q6: forecasting revenue change (pure filtered aggregate) -----------------


def forecast_revenue(sf_dir: str) -> pa.Table:
    """Revenue that would be recovered by dropping the 5-7 % discount band
    on small (< 24 qty) 1997 shipments: ``sum(extendedprice * discount)``
    under three conjunctive predicates — TPC-H Q6, the pure
    filtered-aggregate shape with no join at all.

    Scale shape: every predicate is pushed INTO the parquet scan
    (row-group statistics prune whole groups; only 4 columns are read and
    2 leave the scan), the product is summed per batch in exact integer
    cent*cent units (order-free), and only one (sum, count) pair per batch
    reaches the driver. A 100-TB lineitem reads the 1997 row groups only."""
    import pyarrow.dataset as pads

    lo = np.datetime64("1997-01-01")
    f = (
        (pads.field("l_shipdate") >= pads.scalar(pd.Timestamp("1997-01-01")))
        & (pads.field("l_shipdate") < pads.scalar(pd.Timestamp("1998-01-01")))
        & (pads.field("l_quantity") < pads.scalar(24.0))
    )
    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_shipdate", "l_quantity"],
        filter=f,
    ).select_columns(["l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pd.DataFrame:
        d_c = np.round(t.column("l_discount").to_numpy() * 100).astype(np.int64)
        keep = (d_c >= 5) & (d_c <= 7)
        ep_c = np.round(
            t.column("l_extendedprice").to_numpy()[keep] * 100
        ).astype(np.int64)
        # cent*cent units: exact int64 (ep < 10^6 cents, d <= 10 -> < 10^7
        # per row; 2^63 allows ~10^12 such rows per partial)
        return pd.DataFrame(
            {"s": [int((ep_c * d_c[keep]).sum())], "n": [int(keep.sum())]}
        )

    sc = _concat(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
    ).to_pandas()
    return pa.table(
        {"revenue": pa.array([sc["s"].sum() / 1e4], pa.float64()),
         "n_items": pa.array([int(sc["n"].sum())], pa.int64())}
    )


FORECAST_REVENUE_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) / 1e4
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_quantity < 24
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
"""


# --- Q4: order-priority checking (EXISTS semi-join, distinct orders) ----------


def late_order_priority(sf_dir: str) -> pa.Table:
    """Per order priority, how many Q1-1997 orders had AT LEAST ONE
    lineitem shipped more than 45 days after the order date — TPC-H Q4's
    EXISTS-semi-join + distinct-order count (late = shipdate vs orderdate;
    the synthetic lineitem has no commit/receipt dates).

    Scale shape: orders are pruned to the quarter AT THE SCAN (row-group
    statistics). While the quarter's orders fit ``_broadcast_limit()`` and
    keys are dense, they collapse to ONE packed int32 per order
    (orderdate-day * 8 + priority-code, -1 elsewhere) broadcast once via
    ``ray.put`` — lineitem is then a single pass emitting per-batch-deduped
    LATE (order, priority) pairs only, so the orderkey-bucketed distinct
    shuffles late orders, not the join. Past the limit the bit-identical
    fallback is ONE orderkey bucket join with the per-order EXISTS
    collapsed map-side. Late is a whole-day integer comparison on both
    engines."""
    import pyarrow.dataset as pads

    from ..bucket import bucketed_group_agg

    f = (
        (pads.field("o_orderdate") >= pads.scalar(pd.Timestamp("1997-01-01")))
        & (pads.field("o_orderdate") < pads.scalar(pd.Timestamp("1997-04-01")))
    )
    ords = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=f,
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    prios = np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], dtype=object
    )
    packed = None
    n_ord = _read(sf_dir, "orders", ["o_orderkey"]).count()
    if n_ord <= _broadcast_limit():
        odf = ords.to_pandas()
        keys = odf["o_orderkey"].to_numpy(dtype=np.int64)
        # density guard on the FILTERED key range (<= global max, so no
        # extra full-column max scan); out-of-range lineitem keys are
        # clipped and masked at lookup
        mx = int(keys.max()) if len(keys) else -1
        if 0 <= mx <= 4 * n_ord + 1024:
            od_day = odf["o_orderdate"].to_numpy().astype("datetime64[D]").astype(
                np.int64
            )
            pcode = pd.Categorical(
                odf["o_orderpriority"].astype(str), categories=list(prios)
            ).codes.astype(np.int64)
            dense = np.full(mx + 1, -1, np.int32)
            dense[keys] = (od_day * 8 + pcode).astype(np.int32)
            packed = ray.put(dense)

    if packed is not None:
        def late_pairs(df: pd.DataFrame) -> pd.DataFrame:
            pm = _cached_get(packed)
            ok = df["l_orderkey"].to_numpy(dtype=np.int64)
            p = pm[np.minimum(ok, len(pm) - 1)]
            hit = (ok < len(pm)) & (p >= 0)
            late = hit & (
                df["l_shipdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
                > (p >> 3) + 45
            )
            g = pd.DataFrame(
                {"o_orderkey": ok[late],
                 "o_orderpriority": prios[(p[late] & 7).astype(np.int64)],
                 "late": np.ones(int(late.sum()), dtype=np.int64)}
            ).drop_duplicates("o_orderkey")
            return g

        late_ds = li.map_batches(
            late_pairs, batch_format="pandas", batch_size=262144
        )
    else:
        joined = _bucket_join(li, ords, "l_orderkey", "o_orderkey", 16)

        def exists_partial(df: pd.DataFrame) -> pd.DataFrame:
            late = (
                df["l_shipdate"].to_numpy()
                > df["o_orderdate"].to_numpy() + np.timedelta64(45, "D")
            ).astype(np.int64)
            g = pd.DataFrame(
                {"o_orderkey": df["o_orderkey"].to_numpy(dtype=np.int64),
                 "o_orderpriority": df["o_orderpriority"].astype(str),
                 "late": late}
            ).groupby(["o_orderkey", "o_orderpriority"], as_index=False).agg(
                late=("late", "max")
            )
            return g

        late_ds = joined.map_batches(
            exists_partial, batch_format="pandas", batch_size=262144
        )

    per_order = bucketed_group_agg(
        late_ds,
        ["o_orderkey", "o_orderpriority"],
        dict(late=("late", "max")),
    )
    counts = per_order.map_batches(
        lambda df: df[df["late"] > 0]
        .groupby("o_orderpriority", as_index=False)
        .agg(n_orders=("o_orderpriority", "size")),
        batch_format="pandas", batch_size=262144,
    )
    out = _concat(
        bucketed_group_agg(counts, ["o_orderpriority"], dict(n_orders=("n_orders", "sum")))
    ).to_pandas().sort_values("o_orderpriority", kind="mergesort")
    return pa.table(
        {"o_orderpriority": pa.array(out["o_orderpriority"].astype(str), pa.string()),
         "n_orders": pa.array(out["n_orders"].to_numpy(dtype=np.int64), pa.int64())}
    )


LATE_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 45 DAY)
GROUP BY 1 ORDER BY 1
"""


# --- order fan-out histogram (join-cardinality profiling) -----------------------


def order_fanout_histogram(sf_dir: str) -> pa.Table:
    """LINEITEMS-PER-ORDER distribution — the join-FANOUT histogram a
    planner (or a skew-aware shuffle) profiles before choosing a join
    strategy: for each fan-out n, how many orders have exactly n line
    items. Exact integer counts end to end.

    Shape: one pruned column scan (l_orderkey only); per-batch
    value_counts partials -> one orderkey-bucketed exact sum (the shuffle
    carries (key, partial_count) pairs, never rows) -> per-bucket
    histogram partials (O(distinct fan-outs) rows) -> tiny final sum."""
    from ..bucket import bucketed_group_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["l_orderkey"].value_counts()
        return pd.DataFrame(
            {"l_orderkey": vc.index.to_numpy(dtype=np.int64),
             "n": vc.to_numpy(dtype=np.int64)}
        )

    per_order = bucketed_group_agg(
        _read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["l_orderkey"],
        dict(n=("n", "sum")),
    )

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["n"].value_counts()
        return pd.DataFrame(
            {"n_lines": vc.index.to_numpy(dtype=np.int64),
             "n_orders": vc.to_numpy(dtype=np.int64)}
        )

    t = _concat(
        bucketed_group_agg(
            per_order.map_batches(hist_partial, batch_format="pandas"),
            ["n_lines"],
            dict(n_orders=("n_orders", "sum")),
            num_buckets=4,
        )
    )
    t = t.take(pc.sort_indices(t, sort_keys=[("n_lines", "ascending")]))
    return pa.Table.from_arrays(
        [t.column("n_lines").cast(pa.int64()), t.column("n_orders").cast(pa.int64())],
        names=["n_lines", "n_orders"],
    )


ORDER_FANOUT_HISTOGRAM_SQL = """
SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
FROM (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey
)
GROUP BY n_lines ORDER BY n_lines
"""
