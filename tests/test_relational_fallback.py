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
