"""Embedding clustering — spherical k-means, iterative Lloyd over Ray Data.

The canonical iterative-ML-at-scale pattern on this engine:

- per iteration, the k×d centroid matrix is broadcast ONCE via ``ray.put``
  (every map task reads it zero-copy from the object store — never
  re-shipped per batch);
- ``map_batches`` computes per-batch PARTIAL sums/counts per centroid
  (vectorized: one matmul + per-dimension ``bincount``);
- a bucketed reduce collapses the partials to k rows (shuffle volume =
  k × #batches rows, never the corpus), and the driver touches only k×d
  floats per iteration;
- assignment is a final stateless map.

Deterministic: seeded sample init + fixed iteration count → rows-only
check (iterative refinement has no SQL form); pinned by a planted-cluster
pytest. Dimensions are carried as ``s0..s{d-1}`` float columns through the
reduce — fine for embedding dims up to a few thousand; a fixed-size-list
Arrow sum kernel is the swap-in past that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .simsearch import _batch_matrix, _concat, _emb


def _partials_fn(cref, k: int, d: int):
    def partial(batch: pa.Table) -> pd.DataFrame:
        _, mat = _batch_matrix(batch)
        c = ray.get(cref)  # zero-copy object-store read, once per task call
        if len(mat) == 0:
            return pd.DataFrame(
                {"cluster": np.empty(0, np.int64), "cnt": np.empty(0, np.int64),
                 **{f"s{j}": np.empty(0, np.float64) for j in range(d)}}
            )
        a = np.argmax(mat @ c.T, axis=1)
        cnt = np.bincount(a, minlength=k)
        cols = {
            "cluster": np.arange(k, dtype=np.int64),
            "cnt": cnt.astype(np.int64),
        }
        for j in range(d):
            cols[f"s{j}"] = np.bincount(a, weights=mat[:, j], minlength=k)
        return pd.DataFrame(cols)

    return partial


def fit_centroids(
    sf_dir: str, k: int = 8, iters: int = 5, seed: int = 11
) -> np.ndarray:
    """Fit spherical k-means centroids (unit-normalized, cosine assignment)
    by ``iters`` Lloyd iterations; returns the k x d centroid matrix (empty
    array when the table is empty).

    The pruned (vec_id, embedding) working set STREAMS from parquet on
    every iteration: each Lloyd pass is a fresh lazy scan -> map_batches
    (partials) -> reduce, so nothing row-proportional is ever pinned in the
    object store — at 100-TB embeddings a materialized working set would
    live in spill for the whole job, while iters+1 streaming scans read at
    storage bandwidth with backpressure and free blocks as they go. The
    only cross-iteration state is the k x d centroid matrix (broadcast once
    per iteration via ``ray.put``). Per-iteration partials are k rows per
    block; they are combined on the driver while k x #blocks stays small
    and via the bucketed shuffle reduce beyond that."""
    import os as _os

    from ..bucket import bucketed_group_agg

    ds = _emb(sf_dir).select_columns(["vec_id", "embedding"])
    # Seeded init sample: first 2048 rows read straight off the parquet file
    # on the driver — ``Dataset.limit`` over materialized blocks returns rows
    # in nondeterministic order, which would permute the seeded centroid
    # choice run-to-run. One tiny scale-independent driver read.
    import pyarrow.parquet as _pq

    rbs, n = [], 0
    for rb in _pq.ParquetFile(f"{sf_dir}/embeddings.parquet").iter_batches(
        batch_size=2048, columns=["vec_id", "embedding"]
    ):
        rbs.append(rb)
        n += len(rb)
        if n >= 2048:
            break
    sample = pa.Table.from_batches(rbs).slice(0, 2048) if rbs else pa.table({})
    _, mat0 = _batch_matrix(sample) if rbs else (None, np.empty((0, 0)))
    if len(mat0) == 0:
        return np.empty((0, 0))
    d = mat0.shape[1]
    k = min(k, len(mat0))
    rng = np.random.default_rng(seed)
    centroids = mat0[rng.choice(len(mat0), size=k, replace=False)].copy()

    agg_spec = {"cnt": ("cnt", "sum"), **{f"s{j}": (f"s{j}", "sum") for j in range(d)}}
    # k rows per block x (d+2) float64 cols: combine on the driver while that
    # stays under ~64 MB; the bucketed shuffle reduce is the 100-TB path.
    # Block count is estimated from file bytes (the dataset stays lazy).
    est_blocks = max(
        8, _os.path.getsize(f"{sf_dir}/embeddings.parquet") // (32 * 1024 * 1024) + 1
    )
    small_partials = k * est_blocks * (d + 2) * 8 < 64 * 1024 * 1024
    for _ in range(iters):
        cref = ray.put(centroids)
        parts = ds.map_batches(
            _partials_fn(cref, k, d), batch_format="pyarrow", batch_size=4096
        )
        if small_partials:
            red = _concat(parts)
            # sort before summing: block ARRIVAL order is nondeterministic,
            # and float addition order must not be
            df = (
                red.to_pandas()
                .sort_values(["cluster", "cnt", "s0"], kind="mergesort")
                .groupby("cluster", as_index=True)
                .sum()
                .sort_index()
            )
        else:
            red = _concat(bucketed_group_agg(parts, ["cluster"], agg_spec, num_buckets=8))
            df = red.to_pandas().set_index("cluster").sort_index()
        sums = df[[f"s{j}" for j in range(d)]].to_numpy()
        cnt = df["cnt"].to_numpy()
        new = centroids.copy()
        nz = cnt > 0
        new[df.index.to_numpy()[nz]] = sums[nz] / cnt[nz, None]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        centroids = new / norms
    return centroids


def kmeans_embeddings(
    sf_dir: str, k: int = 8, iters: int = 5, seed: int = 11
) -> pa.Table:
    """(vec_id, cluster) assignment after ``iters`` Lloyd iterations of
    spherical k-means — ``fit_centroids`` for the iterative fit (see its
    docstring for the streaming-scan shape), then one stateless assignment
    map over a final scan."""
    centroids = fit_centroids(sf_dir, k=k, iters=iters, seed=seed)
    if centroids.size == 0:
        return pa.table(
            {"vec_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
        )
    ds = _emb(sf_dir).select_columns(["vec_id", "embedding"])
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pd.DataFrame:
        ids, mat = _batch_matrix(batch)
        c = ray.get(cref)
        a = (
            np.argmax(mat @ c.T, axis=1)
            if len(mat)
            else np.empty(0, np.int64)
        )
        return pd.DataFrame(
            {"vec_id": ids.astype(np.int64), "cluster": a.astype(np.int64)}
        )

    out = _concat(ds.map_batches(assign, batch_format="pyarrow", batch_size=4096))
    return out.take(pc.sort_indices(out, sort_keys=[("vec_id", "ascending")]))


def semdedup(
    sf_dir: str, k: int = 8, iters: int = 3, tau: float = 0.92, seed: int = 11
) -> pa.Table:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    cluster the embedding space with spherical k-means, then detect
    near-duplicates ONLY within a cluster (pairwise cosine >= ``tau``),
    keeping the lowest ``vec_id`` of every duplicate set.

    Scale shape: the iterative fit streams the corpus per Lloyd pass
    (``fit_centroids``); assignment is one stateless map with the k x d
    centroid matrix broadcast once via ``ray.put``; the pairwise step is a
    single hash shuffle on cluster id (``bucketed_apply`` — every vector of
    one cluster meets in one task). The m x m per-cluster similarity matmul
    never sees the corpus: cluster size is bounded by choosing k
    proportional to corpus size / target cluster size (SemDeDup uses k in
    the tens of thousands at web scale). Greedy lowest-id-wins inside a
    cluster is order-deterministic, so reruns are byte-identical.

    Returns (vec_id, cluster, kept, dup_of): ``dup_of`` is the kept
    lower-id member that shadowed a dropped row (null on kept rows).
    Iterative k-means has no SQL form -> rows-only driver check; pinned by
    the planted-duplicate pytest."""
    centroids = fit_centroids(sf_dir, k=k, iters=iters, seed=seed)
    if centroids.size == 0:
        return pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "kept": pa.array([], pa.bool_()),
                "dup_of": pa.array([], pa.int64()),
            }
        )
    from ..bucket import bucketed_apply

    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pd.DataFrame:
        ids, mat = _batch_matrix(batch)
        c = ray.get(cref)
        a = np.argmax(mat @ c.T, axis=1) if len(mat) else np.empty(0, np.int64)
        return pd.DataFrame(
            {
                "vec_id": ids.astype(np.int64),
                "cluster": a.astype(np.int64),
                # row-normalized vectors ride the shuffle so the pairwise
                # stage needs no second read / join back to the corpus
                "embedding": list(mat),
            }
        )

    def cluster_fn(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, sub in g.groupby("cluster", sort=True):
            sub = sub.sort_values("vec_id", kind="mergesort")
            ids = sub["vec_id"].to_numpy()
            mat = np.stack(sub["embedding"].to_numpy())
            sims = mat @ mat.T
            m = len(ids)
            kept_idx: list[int] = []
            dup_of = np.full(m, -1, dtype=np.int64)
            for i in range(m):
                if kept_idx:
                    s = sims[i, kept_idx]
                    hits = np.nonzero(s >= tau)[0]
                    if len(hits):
                        dup_of[i] = ids[kept_idx[int(hits[0])]]
                        continue
                kept_idx.append(i)
            dup = pd.Series(dup_of, dtype="int64").astype("Int64")
            dup[dup_of < 0] = pd.NA
            frames.append(
                pd.DataFrame(
                    {
                        "vec_id": ids,
                        "cluster": sub["cluster"].to_numpy(),
                        "kept": dup_of < 0,
                        "dup_of": dup,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    ds = _emb(sf_dir).select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow", batch_size=4096
    )
    out = _concat(bucketed_apply(ds, ["cluster"], cluster_fn))
    return out.take(pc.sort_indices(out, sort_keys=[("vec_id", "ascending")]))


def outlier_scores(
    sf_dir: str, k: int = 8, iters: int = 5, seed: int = 11,
    tail_frac: float = 0.05,
) -> pa.Table:
    """Per-vector cosine distance to its nearest k-means prototype, plus an
    exact global top-``tail_frac`` outlier flag — the data-pruning signal
    of SSL-prototype / D4-style curation (Sorscher et al. 2022 "Beyond
    neural scaling laws"; Tirumala et al. 2023 D4): vectors far from every
    prototype are noise/outlier candidates, vectors nearest are the
    prototypical redundant core.

    Shape: ``fit_centroids`` (iters streaming scans, centroids broadcast
    per iteration); then ONE scan emitting per-batch exact integer
    histograms of quantized distances (milli-units, domain [0, 2000] —
    O(2001) ints per batch, corpus-size independent) which the driver
    folds into the exact top-tail threshold; then ONE stateless assign
    scan with (centroids, threshold) broadcast once. Nothing
    row-proportional touches the driver; quantized thresholding is
    bit-stable at any parallelism. Rows-only check (iterative fit has no
    SQL form); pinned by the planted far-vector pytest."""
    centroids = fit_centroids(sf_dir, k=k, iters=iters, seed=seed)
    if centroids.size == 0:
        return pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "cluster": pa.array([], pa.int64()),
             "cos_dist": pa.array([], pa.float64()),
             "is_outlier": pa.array([], pa.bool_())}
        )
    cref = ray.put(centroids)

    def _dist_milli(batch: pa.Table):
        ids, mat = _batch_matrix(batch)
        c = ray.get(cref)
        if not len(ids):
            return ids, np.empty(0, np.int64), np.empty(0, np.int64)
        sims = mat @ c.T
        a = np.argmax(sims, axis=1)
        d = 1.0 - sims[np.arange(len(ids)), a]
        return ids, a.astype(np.int64), np.clip(
            np.round(d * 1000.0).astype(np.int64), 0, 2000
        )

    def hist_partial(batch: pa.Table) -> pd.DataFrame:
        _, _, dm = _dist_milli(batch)
        h = np.bincount(dm, minlength=2001)
        u = np.flatnonzero(h)
        return pd.DataFrame({"q": u.astype(np.int64), "n": h[u].astype(np.int64)})

    from ..bucket import bucketed_group_agg

    hist = _concat(
        bucketed_group_agg(
            _emb(sf_dir).select_columns(["vec_id", "embedding"]).map_batches(
                hist_partial, batch_format="pyarrow", batch_size=4096
            ),
            ["q"],
            {"n": ("n", "sum")},
            num_buckets=2,
        )
    ).to_pandas().sort_values("q")
    n_total = int(hist["n"].sum())
    # exact threshold: smallest quantized distance d* such that the count of
    # vectors with dist > d* is <= tail_frac * n (outlier = dist > d*)
    tail_target = int(tail_frac * n_total)
    above = n_total - hist["n"].cumsum().to_numpy()
    thr = int(hist["q"].to_numpy()[np.searchsorted(-above, -tail_target)])

    def assign(batch: pa.Table) -> pd.DataFrame:
        ids, a, dm = _dist_milli(batch)
        return pd.DataFrame(
            {
                "vec_id": ids.astype(np.int64),
                "cluster": a,
                "cos_dist": dm / 1000.0,
                "is_outlier": dm > thr,
            }
        )

    out = _concat(
        _emb(sf_dir).select_columns(["vec_id", "embedding"]).map_batches(
            assign, batch_format="pyarrow", batch_size=4096
        )
    )
    return out.take(pc.sort_indices(out, sort_keys=[("vec_id", "ascending")]))


def cluster_balanced_sample(
    sf_dir: str, k: int = 8, per_cluster: int = 20, iters: int = 3, seed: int = 11
) -> pa.Table:
    """CLUSTER-BALANCED curation sample — at most ``per_cluster`` vectors
    from each spherical-k-means cluster (the diversity-preserving sample
    behind SemDeDup-style curation and DataComp-style pool balancing:
    uniform sampling over-represents dense regions; per-cluster caps keep
    the tails).

    Deterministic and shuffle-free: membership is "the ``per_cluster``
    lowest ``hash(vec_id)`` of each cluster" (consistent sampling, stable
    under any partitioning / re-run); every batch emits only its local
    per-cluster lowest-hash rows (<= k * per_cluster rows per batch) and
    the driver folds the tiny partials exactly. Rows-only oracle (cluster
    ids come from the iterative fit); pinned by the planted pytest."""
    centroids = fit_centroids(sf_dir, k=k, iters=iters, seed=seed)
    if centroids.size == 0:
        return pa.table(
            {"vec_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
        )
    ds = _emb(sf_dir).select_columns(["vec_id", "embedding"])
    cref = ray.put(centroids)

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids, mat = _batch_matrix(batch)
        if not len(ids):
            return pd.DataFrame(
                {"vec_id": pd.Series(dtype=np.int64),
                 "cluster": pd.Series(dtype=np.int64),
                 "h": pd.Series(dtype=np.uint64)}
            )
        c = ray.get(cref)
        a = np.argmax(mat @ c.T, axis=1).astype(np.int64)
        h = pd.util.hash_array(ids.astype(np.int64))
        df = pd.DataFrame({"vec_id": ids.astype(np.int64), "cluster": a, "h": h})
        return (
            df.sort_values(["cluster", "h", "vec_id"], kind="mergesort")
            .groupby("cluster", as_index=False)
            .head(per_cluster)
        )

    df = _concat(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    ).to_pandas()
    df = (
        df.sort_values(["cluster", "h", "vec_id"], kind="mergesort")
        .groupby("cluster", as_index=False)
        .head(per_cluster)
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "vec_id": pa.array(df["vec_id"].to_numpy(dtype=np.int64), pa.int64()),
            "cluster": pa.array(df["cluster"].to_numpy(dtype=np.int64), pa.int64()),
        }
    )
