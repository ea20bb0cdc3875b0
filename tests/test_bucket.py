"""Unit tests for the hash-bucketed wide-aggregation helpers."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def rand_df():
    rng = np.random.default_rng(17)
    n = 5000
    return pd.DataFrame(
        {
            "k1": rng.integers(0, 300, n),
            "k2": rng.choice(np.array(["a", "b", "c", "d"], dtype=object), n),
            "v": rng.standard_normal(n),
        }
    )


def test_bucketed_group_agg_matches_pandas(ray_session, rand_df):
    import ray.data as rd

    from quanta_ray.bucket import bucketed_group_agg

    ds = rd.from_pandas(rand_df).repartition(7)
    out = bucketed_group_agg(
        ds,
        ["k1", "k2"],
        dict(n=("v", "size"), s=("v", "sum"), mn=("v", "min"), mx=("v", "max")),
        num_buckets=16,
    )
    got = pd.concat(
        [b for b in out.iter_batches(batch_format="pandas", batch_size=None)]
    )
    want = rand_df.groupby(["k1", "k2"], as_index=False).agg(
        n=("v", "size"), s=("v", "sum"), mn=("v", "min"), mx=("v", "max")
    )
    key = ["k1", "k2"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_like=True, rtol=1e-12)


def test_bucketed_apply_key_completeness(ray_session, rand_df):
    """Every row of a key lands in exactly one bucket invocation (the whole
    point: per-key logic can run inside the bucket)."""
    import ray.data as rd

    from quanta_ray.bucket import bucketed_apply

    ds = rd.from_pandas(rand_df).repartition(5)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one output row per key with the count seen IN THIS BUCKET CALL
        return g.groupby(["k1", "k2"], as_index=False).agg(n=("v", "size"))

    out = pd.concat(
        [b for b in bucketed_apply(ds, ["k1", "k2"], per_bucket, num_buckets=8)
         .iter_batches(batch_format="pandas", batch_size=None)]
    )
    # if a key were split across buckets it would appear twice with partial counts
    assert not out.duplicated(["k1", "k2"]).any()
    want = rand_df.groupby(["k1", "k2"], as_index=False).agg(n=("v", "size"))
    got = out.sort_values(["k1", "k2"]).reset_index(drop=True)
    want = want.sort_values(["k1", "k2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_auto_buckets_grows_with_input(ray_session, tmp_path):
    """Bucket count must scale with input bytes (per-bucket memory =
    input/num_buckets), falling back to the floor for in-memory data."""
    import numpy as np
    import pyarrow.parquet as pq
    import pyarrow as pa
    import ray.data as rd

    from quanta_ray.bucket import auto_buckets

    rng = np.random.default_rng(7)
    small = tmp_path / "small.parquet"
    big = tmp_path / "big.parquet"
    pq.write_table(
        pa.table({"x": rng.integers(0, 1 << 60, 20_000)}), small, compression="none"
    )
    pq.write_table(
        pa.table({"x": rng.integers(0, 1 << 60, 2_000_000)}), big, compression="none"
    )
    target = 64 * 1024  # tiny target so the growth shows at test scale
    n_small = auto_buckets(rd.read_parquet(str(small)), target_bytes=target)
    n_big = auto_buckets(rd.read_parquet(str(big)), target_bytes=target)
    assert n_big > n_small >= 32
    assert n_big >= (2_000_000 * 8) // target  # ~bytes/target

    # in-memory dataset: no input files -> floor
    import pandas as pd

    assert auto_buckets(rd.from_pandas(pd.DataFrame({"x": [1]}))) == 32
