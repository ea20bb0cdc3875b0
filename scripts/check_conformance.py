"""Local stand-in for the driver's correctness gate: run every queries()
entry and compare against oracle_sql() via DuckDB (row count + schema +
order-insensitive value comparison). Usage:

    python scripts/check_conformance.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # ray Dataset


# Columns that are genuinely ANALYTIC floats (not an integer-unit division):
# only these get an rtol comparison; every other float column must be
# bit-identical to the oracle, exactly as the driver's value hash demands.
# Keep this list empty unless a column provably cannot be made integer-exact.
ANALYTIC_FLOAT_COLS: dict[str, set] = {}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            # NO rounding: the driver hashes exact values. A 2-cent error on
            # a 2.9e7 value is 7e-10 relative and must FAIL here, not pass.
            df[c] = df[c].astype("float64")
        elif isinstance(df[c].dtype, pd.Int64Dtype) or pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    sortable = [
        c
        for c in df.columns
        if not df[c].map(lambda v: isinstance(v, (list, dict, np.ndarray))).any()
    ]
    return df.sort_values(sortable).reset_index(drop=True) if sortable else df


def compare_values(name: str, got: pd.DataFrame, want: pd.DataFrame) -> str | None:
    """Strict value comparison emulating the driver's hash: bit-exact for
    every column, except floats explicitly allowlisted in
    ANALYTIC_FLOAT_COLS[name], which get rtol=1e-6 (and are flagged as such
    in the ok line). Returns an error string or None."""
    analytic = ANALYTIC_FLOAT_COLS.get(name, set())
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = g.to_numpy(dtype=np.float64, na_value=np.nan)
            wa = w.to_numpy(dtype=np.float64, na_value=np.nan)
            if c in analytic:
                ok = np.allclose(ga, wa, rtol=1e-6, atol=1e-9, equal_nan=True)
            else:
                ok = np.array_equal(ga, wa, equal_nan=True)
            if not ok:
                bad = np.nonzero(
                    ~((ga == wa) | (np.isnan(ga) & np.isnan(wa)))
                )[0][:3]
                detail = "; ".join(
                    f"row {i}: {ga[i]!r} != {wa[i]!r}" for i in bad
                )
                return f"float column {c} not bit-exact ({detail})"
        else:
            try:
                pd.testing.assert_series_equal(
                    g, w, check_dtype=False, check_names=False, check_exact=True
                )
            except AssertionError as ex:
                return f"column {c}: {str(ex)[:300]}"
    return None


def _dtype_kind(s: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if isinstance(s.dtype, pd.Int64Dtype) or pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def strict_hash_amber(got_raw: pd.DataFrame, want_raw: pd.DataFrame) -> str | None:
    """Emulate the driver's value-hash sensitivity. Calibrated against three
    rounds of CORRECTNESS_r*.json: the driver unifies integer widths
    (int32 vs int64 hash-green: ev_funnel r3) and float widths (float32
    cosine hash-green: emb_knn r1/r2), but an int-kind column paired with a
    float-kind oracle column (pandas Int64 vs DuckDB nullable-BIGINT float64,
    r3 ev_next_event_join; int64 vs HUGEINT float64, ev_type_hourly_pivot)
    hash-ambers. Flag exactly the kind-level mismatches."""
    g = got_raw[sorted(got_raw.columns)]
    w = want_raw[sorted(want_raw.columns)]
    if list(g.columns) != list(w.columns) or len(g) != len(w):
        return None  # caught by the primary comparison
    for c in g.columns:
        gk, wk = _dtype_kind(g[c]), _dtype_kind(w[c])
        if gk != wk:
            return f"dtype kind {c}: {g[c].dtype} ({gk}) != {w[c].dtype} ({wk})"
    # exact equality for int/bool/object columns (floats already rtol-checked)
    sortable = [
        c
        for c in g.columns
        if not g[c].map(lambda v: isinstance(v, (list, dict, np.ndarray))).any()
    ]
    if sortable:
        g = g.sort_values(sortable).reset_index(drop=True)
        w = w.sort_values(sortable).reset_index(drop=True)
    for c in g.columns:
        if _dtype_kind(g[c]) in ("float", "datetime"):
            continue
        try:
            ga, wa = g[c], w[c]
            if _dtype_kind(ga) == "int":
                ga, wa = ga.astype("Int64"), wa.astype("Int64")
            if not ga.equals(wa):
                return f"exact values {c} differ"
        except Exception:
            pass
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got_raw = to_df(fn(sf_dir))
            got = canon(got_raw)
        except Exception:
            print(f"FAIL {name}: query raised\n{traceback.format_exc()}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows={len(got)} (rows-only, {dt:.1f}s)")
            continue
        try:
            want_raw = con.sql(sqls[name]).df()
            want = canon(want_raw)
        except Exception:
            print(f"FAIL {name}: oracle SQL raised\n{traceback.format_exc()}")
            failures.append(name)
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures.append(name)
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures.append(name)
            continue
        err = compare_values(name, got, want)
        if err:
            print(f"FAIL {name}: values differ: {err}")
            failures.append(name)
            continue
        amber = strict_hash_amber(got_raw, want_raw)
        if amber:
            print(f"AMBER {name}: values match but driver hash would differ: {amber}")
            failures.append(name)
            continue
        print(f"ok   {name}: rows={len(got)} ({dt:.1f}s)")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
