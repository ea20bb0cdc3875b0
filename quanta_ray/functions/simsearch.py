"""Similarity search over the ``embeddings`` table (``list<float>`` column).

- ``knn_bruteforce``: exact cosine top-k per query — per-batch numpy matmul
  against a broadcast query matrix (``ray.put`` once, fetched in each actor's
  ``__init__``), partial top-k per batch, merge at the end. SQL-checkable via
  DuckDB ``list_cosine_similarity``.
- ``knn_ivf``: IVF-bucketed approximate variant — k-means-lite coarse
  centroids (seeded, few iterations) as the scale path: probe only the
  nearest ``nprobe`` buckets. Rows-only oracle (approximate by design).
- ``near_dup_cosine``: embedding near-duplicate pairs above a cosine
  threshold, LSH-bucketed by random-hyperplane signatures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _concat(ds: rd.Dataset) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(ids, row-normalized float64 matrix) from an Arrow batch."""
    ids = batch.column("vec_id").to_numpy()
    emb = batch.column("embedding")
    mat = np.asarray(emb.to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def knn_bruteforce(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2, 3), k: int = 10) -> pa.Table:
    """Exact cosine top-k of each query vector against the whole table.

    The query matrix is broadcast once; each batch computes a (batch × query)
    matmul and emits its local top-k; the driver merges tiny partials.
    Self-matches excluded. Ties broken by vec_id (stable across engines)."""
    # fetch query vectors (tiny read, filtered at the source)
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    qt = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        filter=pads.field("vec_id").isin(list(query_ids)),
    )
    q_tbl = _concat(qt)
    q_ids, q_mat = _batch_matrix(q_tbl)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    ref = ray.put((q_ids, q_mat))

    class PartialTopK:
        def __init__(self):
            self.q_ids, self.q_mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids, mat = _batch_matrix(batch)
            sims = mat @ self.q_mat.T  # (n, q)
            out = []
            for qi, qid in enumerate(self.q_ids):
                s = sims[:, qi]
                mask = ids != qid
                cand_idx = np.nonzero(mask)[0]
                if len(cand_idx) == 0:
                    continue
                top = cand_idx[np.lexsort((ids[cand_idx], -s[cand_idx]))][:k]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[top],
                            "cosine": s[top],
                        }
                    )
                )
            if not out:
                return pd.DataFrame(columns=["query_id", "neighbor_id", "cosine"])
            return pd.concat(out, ignore_index=True)

    partials = _emb(sf_dir).map_batches(
        PartialTopK, batch_format="pyarrow", batch_size=4096, concurrency=2
    )
    df = _concat(partials).to_pandas()
    df = df.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", as_index=False).head(k)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df["cosine"] = df["cosine"].round(4)
    return pa.Table.from_pandas(
        df[["query_id", "rank", "neighbor_id", "cosine"]].reset_index(drop=True),
        preserve_index=False,
    )


KNN_BRUTEFORCE_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe
  FROM embeddings WHERE vec_id IN (0, 1, 2, 3)
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding) AS cos_raw
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, round(cos_raw, 4) AS cosine
FROM ranked WHERE rank <= 10
"""


def knn_ivf(
    sf_dir: str,
    query_ids: tuple[int, ...] = (0, 1, 2, 3),
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 11,
) -> pa.Table:
    """IVF approximate top-k: coarse centroids from a seeded sample, vectors
    assigned to nearest centroid (one pass), queries probe ``nprobe``
    buckets. The scale path for 10^9+ vectors; approximate → rows-only check.
    """
    # build centroids from a deterministic sample (driver-side, tiny)
    sample = _concat(_emb(sf_dir).limit(2048))
    ids, mat = _batch_matrix(sample)
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(5):  # few Lloyd iterations, deterministic
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(len(centroids)):
            sel = mat[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    cref = ray.put(centroids)

    q_tbl = _concat(_emb(sf_dir))  # queries from the same table
    q_ids_all, q_mat_all = _batch_matrix(q_tbl)
    sel = np.isin(q_ids_all, query_ids)
    q_ids, q_mat = q_ids_all[sel], q_mat_all[sel]
    probe = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]
    qref = ray.put((q_ids, q_mat, probe))

    class ProbeTopK:
        def __init__(self):
            self.centroids = ray.get(cref)
            self.q_ids, self.q_mat, self.probe = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids, mat = _batch_matrix(batch)
            assign = np.argmax(mat @ self.centroids.T, axis=1)
            out = []
            for qi, qid in enumerate(self.q_ids):
                mask = np.isin(assign, self.probe[qi]) & (ids != qid)
                if not mask.any():
                    continue
                s = (mat[mask] @ self.q_mat[qi])
                sub_ids = ids[mask]
                top = np.lexsort((sub_ids, -s))[:k]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": sub_ids[top], "cosine": s[top]}
                    )
                )
            if not out:
                return pd.DataFrame(columns=["query_id", "neighbor_id", "cosine"])
            return pd.concat(out, ignore_index=True)

    partials = _emb(sf_dir).map_batches(
        ProbeTopK, batch_format="pyarrow", batch_size=4096, concurrency=2
    )
    df = _concat(partials).to_pandas()
    df = df.sort_values(["query_id", "cosine", "neighbor_id"], ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df["cosine"] = df["cosine"].round(4)
    return pa.Table.from_pandas(
        df[["query_id", "rank", "neighbor_id", "cosine"]].reset_index(drop=True),
        preserve_index=False,
    )


def near_dup_cosine(sf_dir: str, threshold: float = 0.95, n_planes: int = 16, seed: int = 13) -> pa.Table:
    """Embedding near-dup pairs (cosine ≥ threshold) via random-hyperplane
    LSH buckets + exact verification inside buckets. Rows-only oracle."""
    rng = np.random.default_rng(seed)
    t = _concat(_emb(sf_dir))
    ids, mat = _batch_matrix(t)
    planes = rng.standard_normal((mat.shape[1], n_planes))
    sig = (mat @ planes > 0).astype(np.uint8)
    keys = np.packbits(sig, axis=1)
    key_ints = np.array([int.from_bytes(k.tobytes(), "big") for k in keys])
    df = pd.DataFrame({"vec_id": ids, "bucket": key_ints})
    rows = []
    for _, g in df.groupby("bucket"):
        gids = np.sort(g["vec_id"].to_numpy())
        if len(gids) < 2:
            continue
        pos = {v: i for i, v in enumerate(ids)}
        sub = mat[[pos[v] for v in gids]]
        sims = sub @ sub.T
        for i in range(len(gids)):
            for j in range(i + 1, len(gids)):
                if sims[i, j] >= threshold:
                    rows.append(
                        {"a": int(gids[i]), "b": int(gids[j]), "cosine": round(float(sims[i, j]), 4)}
                    )
    if not rows:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
    out = pd.DataFrame(rows).sort_values(["a", "b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
