"""Broadcast-size guard: the relational joins that broadcast a
customer-keyed map must fall back to the explicit hash-bucket shuffle join
when the 'dimension' side exceeds the limit — same results either way.

(Float sums are order-dependent across the two physical plans, so revenue
columns compare with a 1e-3 absolute tolerance; keys/counts compare exact.)
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

SF = "/root/testdata/sf0.001"

FNS = ["revenue_by_nation", "region_revenue", "orders_of_top_customers"]


def _sorted(t: pa.Table) -> pa.Table:
    keys = [(t.column_names[0], "ascending")]
    if len(t.column_names) > 1 and t.column_names[1] in ("o_custkey",):
        keys.append((t.column_names[1], "ascending"))
    return t.take(pc.sort_indices(t, sort_keys=keys)).combine_chunks()


@pytest.mark.parametrize("fn_name", FNS)
def test_bucket_join_fallback_matches_broadcast(ray_session, monkeypatch, fn_name):
    from quanta_ray.pipelines import relational as rel

    fn = getattr(rel, fn_name)
    monkeypatch.delenv("QUANTA_BROADCAST_ROW_LIMIT", raising=False)
    broadcast = _sorted(fn(SF))
    monkeypatch.setenv("QUANTA_BROADCAST_ROW_LIMIT", "0")  # force shuffle path
    shuffled = _sorted(fn(SF))
    assert broadcast.column_names == shuffled.column_names
    assert broadcast.num_rows == shuffled.num_rows
    for col in broadcast.column_names:
        a, b = broadcast.column(col), shuffled.column(col)
        if pa.types.is_floating(a.type):
            assert np.max(np.abs(a.to_numpy() - b.to_numpy())) <= 1e-3, col
        else:
            assert a.equals(b), col


@pytest.mark.parametrize(
    "fn_name",
    ["revenue_rollup", "revenue_cube", "discounted_revenue", "profit_by_nation_year",
     "nation_market_share", "min_cost_supplier", "ship_speed_priority",
     "late_order_priority"],
)
def test_grouping_sets_broadcast_vs_shuffle(ray_session, monkeypatch, fn_name):
    """ROLLUP/CUBE/Q19/Q9: the broadcast plan and the forced hash-bucket
    shuffle plan are bit-identical (integer micro-unit sums are order-free)."""
    from quanta_ray.pipelines import relational as rel

    fn = getattr(rel, fn_name)
    monkeypatch.delenv("QUANTA_BROADCAST_ROW_LIMIT", raising=False)
    broadcast = fn(SF)
    monkeypatch.setenv("QUANTA_BROADCAST_ROW_LIMIT", "0")
    assert broadcast.equals(fn(SF))


def test_promo_share_dense_vs_shuffle(ray_session, monkeypatch):
    """promo_share_by_month: the dense bit-vector plan and the forced
    hash-bucket shuffle plan are bit-identical (integer micro-unit sums are
    order-free, so no tolerance is needed)."""
    from quanta_ray.pipelines import relational as rel

    monkeypatch.delenv("QUANTA_BROADCAST_ROW_LIMIT", raising=False)
    dense = rel.promo_share_by_month(SF)
    monkeypatch.setenv("QUANTA_BROADCAST_ROW_LIMIT", "1")  # 64-bit budget
    shuffled = rel.promo_share_by_month(SF)
    assert dense.equals(shuffled)


def test_rollup_drops_fk_miss_orders(ray_session, tmp_path):
    """An order whose custkey is absent from customer must be excluded from
    every grouping level (inner-join semantics), not wrapped to the last
    nation via n_names[-1]."""
    import pandas as pd

    from quanta_ray.pipelines import relational as rel

    d = tmp_path / "sf"
    d.mkdir()
    pd.DataFrame({"n_nationkey": [0, 1], "n_name": ["ALGERIA", "ZAMBIA"]}).to_parquet(
        d / "nation.parquet"
    )
    pd.DataFrame({"c_custkey": [1, 2], "c_nationkey": [0, 1]}).to_parquet(
        d / "customer.parquet"
    )
    pd.DataFrame(
        {
            "o_custkey": [1, 2, 99],  # 99 has no customer row
            "o_orderdate": pd.to_datetime(["1995-01-01", "1996-06-01", "1995-03-01"]),
            "o_totalprice": [100.0, 200.0, 7777.0],
        }
    ).to_parquet(d / "orders.parquet")
    out = rel.revenue_rollup(str(d)).to_pandas()
    # grand total excludes the FK-miss order's 7777
    grand = out[out["n_name"].isna() & out["o_year"].isna()]["revenue"].iloc[0]
    assert grand == 300.0
    # and no level attributes the miss revenue to ZAMBIA (the n_names[-1] wrap)
    zam = out[(out["n_name"] == "ZAMBIA") & out["o_year"].isna()]["revenue"].iloc[0]
    assert zam == 200.0
