"""Similarity search over the ``embeddings`` table (``list<float>`` column).

- ``knn_bruteforce``: brute-force top-k per query — per-batch matmul against
  a broadcast query matrix (``ray.put`` once, fetched in each actor's
  ``__init__``), partial top-k per batch, merge at the end. Ranked on the
  integer ``score_ppm`` key (hash-stable vs the DuckDB oracle);
  ``knn_bruteforce_exact`` keeps the float-cosine ranking as
  ``recall_eval``'s ground truth.
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

from ..schema import from_pandas as _from_pandas, read_parquet_clean as _read_pq


def _emb(sf_dir: str) -> rd.Dataset:
    return _read_pq(f"{sf_dir}/embeddings.parquet")


def _concat(ds: rd.Dataset) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


def _corpus_shard_rows() -> int:
    """Max corpus rows broadcast whole via ``ray.put`` by the
    corpus-as-query-side searches (range_search / knn_graph /
    knn_graph_search). Above this the broadcast side is SHARDED: one
    ``ray.put`` + one streaming pass per shard, results merged — so no
    single object ever holds the whole corpus matrix (the 100-TB
    scale-killer the single-shard path documents). Env-overridable for
    tests (force a tiny limit to exercise the sharded path) and
    deployment tuning."""
    import os

    return int(os.environ.get("QUANTA_CORPUS_BROADCAST_LIMIT", 2_000_000))


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(ids, row-normalized float64 matrix) from an Arrow batch.

    Zero-copy flatten of the fixed-dim list column (``to_pylist`` would
    build millions of Python floats per batch)."""
    ids = batch.column("vec_id").to_numpy()
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    if len(ids) == 0:
        return ids, np.empty((0, 0), dtype=np.float64)
    assert len(flat) % len(ids) == 0, "embedding column must be fixed-dim"
    mat = flat.astype(np.float64, copy=True).reshape(len(ids), -1)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def knn_bruteforce_exact(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2, 3), k: int = 10) -> pa.Table:
    """Exact FLOAT cosine top-k of each query vector against the whole table
    — the ground-truth ranking ``recall_eval`` scores every ANN engine
    against. NOT oracle-registered: float cosine ranks can flip at the
    last ulp between numpy and DuckDB kernels (the instability that
    ambered ``knn_graph`` at 2,500 rows), so the driver-facing
    ``knn_bruteforce`` ranks on the integer ``score_ppm`` key instead and
    this exact variant stays the internal truth.

    The query matrix is broadcast once; each batch computes a (batch × query)
    matmul and emits its local top-k; the driver merges tiny partials.
    Self-matches excluded. Ties broken by vec_id (stable across engines)."""
    # fetch query vectors (tiny read, filtered at the source)
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    qt = _read_pq(
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
    return _from_pandas(df[["query_id", "rank", "neighbor_id", "cosine"]].reset_index(drop=True))


def knn_bruteforce(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2, 3), k: int = 10) -> pa.Table:
    """Brute-force top-k per query over the whole corpus, ranked on the
    INTEGER-EXACT ``score_ppm`` key (quantize q = floor(x*30 + 0.5),
    sign(dot) * (10^6*dot^2) // (na*nb), neighbor_id tie-break) — the
    shared exactness convention of ``knn_filtered`` / ``knn_graph`` /
    ``range_search``, immune to the last-ulp float-rank flips that make
    float cosine ranks oracle-unstable across engines. The float-exact
    ranking lives in ``knn_bruteforce_exact`` (recall_eval's truth).

    Same scale shape as the exact variant: query matrix broadcast once
    via ``ray.put``, one int64 matmul per batch, tiny per-batch top-k
    partials merged on the driver."""
    import pyarrow.dataset as pads

    qt = _read_pq(
        f"{sf_dir}/embeddings.parquet",
        filter=pads.field("vec_id").isin(list(query_ids)),
    )
    q_tbl = _concat(qt)
    q_ids, q_mat = _quant_matrix(q_tbl, 30.0)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    q_norm2 = (q_mat * q_mat).sum(axis=1)
    ref = ray.put((q_ids, q_mat, q_norm2))
    cols = ["query_id", "neighbor_id", "score_ppm"]

    class PartialTopKInt:
        def __init__(self):
            self.q_ids, self.q_mat, self.q_norm2 = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids, mat = _quant_matrix(batch, 30.0)
            if len(ids) == 0:
                return pd.DataFrame(columns=cols)
            n2 = (mat * mat).sum(axis=1)
            ok_n = n2 > 0
            ids, mat, n2 = ids[ok_n], mat[ok_n], n2[ok_n]
            if len(ids) == 0:
                return pd.DataFrame(columns=cols)
            score = _score_ppm(mat @ self.q_mat.T, n2, self.q_norm2)
            out = []
            for qi, qid in enumerate(self.q_ids):
                s = score[:, qi]
                cand = np.nonzero(ids != qid)[0]
                if len(cand) == 0:
                    continue
                top = cand[np.lexsort((ids[cand], -s[cand]))][:k]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": ids[top],
                         "score_ppm": s[top]}
                    )
                )
            if not out:
                return pd.DataFrame(columns=cols)
            return pd.concat(out, ignore_index=True)

    partials = _emb(sf_dir).map_batches(
        PartialTopKInt, batch_format="pyarrow", batch_size=4096, concurrency=2
    )
    df = _concat(partials).to_pandas()
    df = df.sort_values(
        ["query_id", "score_ppm", "neighbor_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", as_index=False).head(k)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    out = df[["query_id", "rank", "neighbor_id", "score_ppm"]].reset_index(drop=True)
    out["rank"] = out["rank"].astype(np.int64)
    return _from_pandas(out)


KNN_BRUTEFORCE_SQL = """
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(x * 30 + 0.5) AS BIGINT)) AS qq
  FROM embeddings
), scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(list_inner_product(a.qq, b.qq) AS BIGINT) AS dot,
         CAST(list_inner_product(a.qq, a.qq) AS BIGINT) AS na,
         CAST(list_inner_product(b.qq, b.qq) AS BIGINT) AS nb
  FROM qv a JOIN qv b ON b.vec_id != a.vec_id
  WHERE a.vec_id IN (0, 1, 2, 3)
    AND CAST(list_inner_product(b.qq, b.qq) AS BIGINT) > 0
), keyed AS (
  SELECT query_id, neighbor_id,
         CASE WHEN dot >= 0
              THEN (1000000 * dot * dot) // (CASE WHEN na = 0 THEN 1 ELSE na END * nb)
              ELSE -((1000000 * dot * dot) // (CASE WHEN na = 0 THEN 1 ELSE na END * nb))
         END AS score_ppm
  FROM scored
), ranked AS (
  SELECT query_id, neighbor_id, score_ppm,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_ppm DESC, neighbor_id) AS rank
  FROM keyed
)
SELECT query_id, rank, neighbor_id, score_ppm
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""


def _quant_matrix(batch: pa.Table, scale: float) -> tuple[np.ndarray, np.ndarray]:
    """(ids, integer-quantized matrix) — ``q = floor(x*scale + 0.5)`` with
    an op sequence DuckDB's ``floor(x*scale + 0.5)`` reproduces bit-for-bit
    (float32 -> float64 exact, one multiply, one add, floor), the shared
    exactness contract of range_search / knn_graph / knn_filtered."""
    ids = batch.column("vec_id").to_numpy()
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    if len(ids) == 0:
        return ids, np.empty((0, 0), dtype=np.int64)
    mat = flat.astype(np.float64, copy=True).reshape(len(ids), -1)
    return ids, np.floor(mat * scale + 0.5).astype(np.int64)


def _score_ppm(dots: np.ndarray, n2: np.ndarray, q_norm2: np.ndarray) -> np.ndarray:
    """Signed integer ranking key ``sign(dot) * (10^6*dot^2)//(na*nb)`` —
    a ppm-quantized cos^2 surrogate whose every term fits int64 at the
    scale-30 quantization, with floor division identical in numpy and
    DuckDB (order-exact on both sides)."""
    den = n2[:, None] * q_norm2[None, :]
    den = np.where(den == 0, 1, den)
    mag = (1_000_000 * dots * dots) // den
    return np.where(dots >= 0, mag, -mag)


def knn_filtered(
    sf_dir: str,
    query_ids: tuple[int, ...] = (0, 1, 2, 3),
    k: int = 10,
    label_mod: int = 3,
) -> pa.Table:
    """FILTERED vector search — top-k restricted by a metadata predicate
    (here ``label % 3 == 0``): the filtered-ANN shape every vector store
    exposes (pre-filter, not post-filter: the predicate prunes candidates
    BEFORE ranking, so k survivors are guaranteed when the filtered corpus
    has k rows). Ranking uses the same INTEGER-EXACT ``score_ppm`` key as
    ``knn_graph`` (quantize at 30, sign(dot)*(10^6*dot^2)//(na*nb),
    neighbor_id tie-break) — immune to the last-ulp float-rank flips that
    make float cosine ranks oracle-unstable.

    Same broadcast-query / per-batch-matmul / tiny-partial-merge shape as
    ``knn_bruteforce``; the predicate is applied per batch as a vectorized
    mask (at scale: pushed to the parquet scan when the filter column is a
    partition or row-group stat)."""
    import pyarrow.dataset as pads

    qt = _read_pq(
        f"{sf_dir}/embeddings.parquet",
        filter=pads.field("vec_id").isin(list(query_ids)),
    )
    q_tbl = _concat(qt)
    q_ids, q_mat = _quant_matrix(q_tbl, 30.0)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    q_norm2 = (q_mat * q_mat).sum(axis=1)
    ref = ray.put((q_ids, q_mat, q_norm2))
    cols = ["query_id", "neighbor_id", "score_ppm"]

    class FilteredTopK:
        def __init__(self):
            self.q_ids, self.q_mat, self.q_norm2 = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            lab = batch.column("label").to_numpy()
            sel = np.flatnonzero(lab % label_mod == 0)
            if len(sel) == 0:
                return pd.DataFrame(columns=cols)
            batch = batch.take(pa.array(sel))
            ids, mat = _quant_matrix(batch, 30.0)
            n2 = (mat * mat).sum(axis=1)
            ok_n = n2 > 0
            ids, mat, n2 = ids[ok_n], mat[ok_n], n2[ok_n]
            if len(ids) == 0:
                return pd.DataFrame(columns=cols)
            score = _score_ppm(mat @ self.q_mat.T, n2, self.q_norm2)
            out = []
            for qi, qid in enumerate(self.q_ids):
                s = score[:, qi]
                cand = np.nonzero(ids != qid)[0]
                if len(cand) == 0:
                    continue
                top = cand[np.lexsort((ids[cand], -s[cand]))][:k]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": ids[top],
                         "score_ppm": s[top]}
                    )
                )
            if not out:
                return pd.DataFrame(columns=cols)
            return pd.concat(out, ignore_index=True)

    partials = _emb(sf_dir).map_batches(
        FilteredTopK, batch_format="pyarrow", batch_size=4096, concurrency=2
    )
    df = _concat(partials).to_pandas()
    df = df.sort_values(
        ["query_id", "score_ppm", "neighbor_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", as_index=False).head(k)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    out = df[["query_id", "rank", "neighbor_id", "score_ppm"]].reset_index(drop=True)
    out["rank"] = out["rank"].astype(np.int64)
    return _from_pandas(out)


KNN_FILTERED_SQL = """
WITH qv AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> CAST(floor(x * 30 + 0.5) AS BIGINT)) AS qq
  FROM embeddings
), scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(list_inner_product(a.qq, b.qq) AS BIGINT) AS dot,
         CAST(list_inner_product(a.qq, a.qq) AS BIGINT) AS na,
         CAST(list_inner_product(b.qq, b.qq) AS BIGINT) AS nb
  FROM qv a JOIN qv b ON b.vec_id != a.vec_id
  WHERE a.vec_id IN (0, 1, 2, 3) AND b.label % 3 = 0
    AND CAST(list_inner_product(b.qq, b.qq) AS BIGINT) > 0
), keyed AS (
  SELECT query_id, neighbor_id,
         CASE WHEN dot >= 0
              THEN (1000000 * dot * dot) // (CASE WHEN na = 0 THEN 1 ELSE na END * nb)
              ELSE -((1000000 * dot * dot) // (CASE WHEN na = 0 THEN 1 ELSE na END * nb))
         END AS score_ppm
  FROM scored
), ranked AS (
  SELECT query_id, neighbor_id, score_ppm,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_ppm DESC, neighbor_id) AS rank
  FROM keyed
)
SELECT query_id, rank, neighbor_id, score_ppm
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""


def _knn_edges(
    sf_dir: str,
    q_ids: np.ndarray,
    q_mat: np.ndarray,
    q_norm2: np.ndarray,
    k: int,
    member_lo: int | None = None,
    member_hi: int | None = None,
) -> pd.DataFrame:
    """One distributed top-k edge pass: the given pre-quantized query rows
    (one broadcast shard, ``ray.put`` once, fetched per actor) against the
    streamed corpus. Each query's top-k completes within this pass, so
    concatenating passes over disjoint query shards is bit-identical to a
    single whole-corpus broadcast (pinned by
    test_sharded_paths_bit_identical).

    ``member_lo``/``member_hi`` (inclusive id range) restrict the CORPUS
    side — the shard-LOCAL graph build used by ``knn_graph_search``'s
    sharded path, where neighbors must stay within the shard."""
    ref = ray.put((q_ids, q_mat, q_norm2))

    class GraphTopK:
        def __init__(self):
            self.q_ids, self.q_mat, self.q_norm2 = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids, mat = _quant_matrix(batch, 30.0)
            cols = ["query_id", "neighbor_id", "score_ppm"]
            if member_lo is not None:
                in_rng = (ids >= member_lo) & (ids <= member_hi)
                ids, mat = ids[in_rng], mat[in_rng]
            if len(ids) == 0:
                return pd.DataFrame(columns=cols)
            n2 = (mat * mat).sum(axis=1)
            ok_n = n2 > 0
            ids, mat, n2 = ids[ok_n], mat[ok_n], n2[ok_n]
            if len(ids) == 0:
                return pd.DataFrame(columns=cols)
            score = _score_ppm(mat @ self.q_mat.T, n2, self.q_norm2)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.q_ids)):
                s = score[:, qi]
                keep = np.flatnonzero(ids != self.q_ids[qi])
                rows_k = keep[np.lexsort((ids[keep], -s[keep]))][:k]
                out_q.append(np.full(len(rows_k), self.q_ids[qi], dtype=np.int64))
                out_n.append(ids[rows_k])
                out_s.append(s[rows_k])
            return pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "score_ppm": np.concatenate(out_s),
                }
            )

    partials = _emb(sf_dir).map_batches(
        GraphTopK, batch_format="pyarrow", batch_size=4096, concurrency=2
    )
    df = _concat(partials).to_pandas()
    if member_lo is not None:
        # per-batch partials can exceed k for a query once the corpus is
        # filtered thin; fold to the true per-query top-k here
        df = df.sort_values(
            ["query_id", "score_ppm", "neighbor_id"],
            ascending=[True, False, True],
        )
        df = df.groupby("query_id", as_index=False).head(k)
    return df


def knn_graph(sf_dir: str, k: int = 5) -> pa.Table:
    """k-NN GRAPH construction — the top-k of EVERY vector against the
    corpus (the adjacency list SemDeDup-style clustering, label
    propagation and graph-based ANN indexes build on) — with a FULLY
    integer-exact ranking so the distributed result is bit-identical to
    the SQL oracle.

    Exactness convention (float cosine ranks can flip at the last-ulp
    boundary between numpy float64 and DuckDB's kernel): both sides
    quantize q = floor(x*30 + 0.5) (identical float64 op sequence) and
    rank by the signed integer score
        score_ppm = sign(dot) * ((10^6 * dot^2) // (na * nb))
    — every term fits int64 (dot <= ~1.6e4 here), `//` is the same floor
    division in numpy and DuckDB, ties break on neighbor_id. The score is
    a ppm-quantized cos^2 with sign: a coarser but ORDER-EXACT surrogate.

    Shape: the quantized corpus matrix doubles as the query matrix.
    Up to ``_corpus_shard_rows()`` rows it is broadcast ONCE via
    ``ray.put``; past the guard the query side is SHARDED — one
    ``ray.put`` + one streaming corpus pass per shard (each query's
    top-k completes within its shard's pass, so the union over shards
    is bit-identical to the single broadcast; pinned by
    test_sharded_paths_bit_identical). Every batch does one int64
    matmul and keeps its per-query top-k partial; the driver merges
    tiny partials."""
    q_tbl = _concat(_emb(sf_dir))
    q_ids, q_mat = _quant_matrix(q_tbl, 30.0)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    q_norm2 = (q_mat * q_mat).sum(axis=1)

    shard = _corpus_shard_rows()
    df = pd.concat(
        [
            _knn_edges(sf_dir, q_ids[lo : lo + shard], q_mat[lo : lo + shard],
                       q_norm2[lo : lo + shard], k)
            for lo in range(0, len(q_ids), shard)
        ],
        ignore_index=True,
    )
    df = df.sort_values(
        ["query_id", "score_ppm", "neighbor_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", as_index=False).head(k)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    out = df[["query_id", "rank", "neighbor_id", "score_ppm"]].reset_index(drop=True)
    out["rank"] = out["rank"].astype(np.int64)
    return _from_pandas(out)


KNN_GRAPH_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(x * 30 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
), scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(list_inner_product(a.qv, b.qv) AS BIGINT) AS dot,
         CAST(list_inner_product(a.qv, a.qv) AS BIGINT) AS na,
         CAST(list_inner_product(b.qv, b.qv) AS BIGINT) AS nb
  FROM q a JOIN q b ON b.vec_id != a.vec_id
  WHERE CAST(list_inner_product(b.qv, b.qv) AS BIGINT) > 0
), keyed AS (
  SELECT query_id, neighbor_id,
         CASE WHEN dot >= 0
              THEN (1000000 * dot * dot) // (CASE WHEN na = 0 THEN 1 ELSE na END * nb)
              ELSE -((1000000 * dot * dot) // (CASE WHEN na = 0 THEN 1 ELSE na END * nb))
         END AS score_ppm
  FROM scored
), ranked AS (
  SELECT query_id, neighbor_id, score_ppm,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_ppm DESC, neighbor_id) AS rank
  FROM keyed
)
SELECT query_id, rank, neighbor_id, score_ppm
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


def range_search(sf_dir: str, tau_num: int = 7, tau_den: int = 20) -> pa.Table:
    """Exact cosine RANGE search (radius query): every unordered vector
    pair with cosine similarity >= tau (default 7/20 = 0.35) over
    INTEGER-QUANTIZED embeddings — the "all neighbors within a radius"
    primitive (the pair-generation step of SemDeDup-style dedup and graph
    building), with a full DuckDB oracle.

    Exactness convention: both sides quantize q = floor(x*100 + 0.5) as
    int64 (identical float64 op sequence -> bit-identical quantization),
    then test  dot > 0  AND  den^2 * dot^2 >= num^2 * |qa|^2 * |qb|^2  in
    exact integer arithmetic (dot <= ~2e5 here, every term < 2^53, so the
    numpy int64 and DuckDB HUGEINT/double paths are all exact; the
    emitted dot is an exact int). Zero-norm quantized vectors never match
    (dot > 0 fails), identically on both sides.

    Shape: the quantized corpus matrix doubles as the query matrix.
    Up to ``_corpus_shard_rows()`` rows it is broadcast ONCE via
    ``ray.put``; past the guard the broadcast ('a') side is SHARDED —
    one ``ray.put`` + one streaming pass per shard; each unordered pair
    (a < b) is emitted exactly once, in the shard containing a, so the
    union over shards is bit-identical to the single broadcast (pinned
    by test_sharded_paths_bit_identical). A corpus-scale radius query
    with a LOW threshold should still prefer the LSH-bucketed
    ``near_dup_cosine`` path, which avoids the S corpus passes."""
    q_tbl = _concat(_emb(sf_dir))
    q_ids, q_mat = _quant_matrix(q_tbl, 100.0)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    q_norm2 = (q_mat * q_mat).sum(axis=1)  # int64, exact
    num2, den2 = tau_num * tau_num, tau_den * tau_den

    def shard_pass(sh_ids, sh_mat, sh_norm2) -> pd.DataFrame:
        ref = ray.put((sh_ids, sh_mat, sh_norm2))

        class RangePairs:
            def __init__(self):
                self.q_ids, self.q_mat, self.q_norm2 = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pd.DataFrame:
                ids, mat = _quant_matrix(batch, 100.0)
                if len(ids) == 0:
                    return pd.DataFrame(
                        {"a_id": pd.Series(dtype=np.int64),
                         "b_id": pd.Series(dtype=np.int64),
                         "dot": pd.Series(dtype=np.int64)}
                    )
                dots = mat @ self.q_mat.T  # (n, q) int64, exact
                n2 = (mat * mat).sum(axis=1)
                # a < b emits each unordered pair exactly once; dot > 0
                # guards the squared comparison's sign (and zero-norm rows)
                ok = (
                    (self.q_ids[None, :] < ids[:, None])
                    & (dots > 0)
                    & (den2 * dots * dots
                       >= num2 * n2[:, None] * self.q_norm2[None, :])
                )
                bi, qi = np.nonzero(ok)
                return pd.DataFrame(
                    {
                        "a_id": self.q_ids[qi].astype(np.int64),
                        "b_id": ids[bi].astype(np.int64),
                        "dot": dots[bi, qi].astype(np.int64),
                    }
                )

        out = _emb(sf_dir).map_batches(
            RangePairs, batch_format="pyarrow", batch_size=4096, concurrency=2
        )
        return _concat(out).to_pandas()

    shard = _corpus_shard_rows()
    df = pd.concat(
        [
            shard_pass(q_ids[lo : lo + shard], q_mat[lo : lo + shard],
                       q_norm2[lo : lo + shard])
            for lo in range(0, len(q_ids), shard)
        ],
        ignore_index=True,
    )
    df = df.sort_values(["a_id", "b_id"]).reset_index(drop=True)
    return _from_pandas(df[["a_id", "b_id", "dot"]])


RANGE_SEARCH_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(x * 100 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         CAST(list_inner_product(a.qv, b.qv) AS HUGEINT) AS dot,
         CAST(list_inner_product(a.qv, a.qv) AS HUGEINT) AS na,
         CAST(list_inner_product(b.qv, b.qv) AS HUGEINT) AS nb
  FROM q a JOIN q b ON a.vec_id < b.vec_id
)
SELECT a_id, b_id, CAST(dot AS BIGINT) AS dot
FROM pairs
WHERE dot > 0 AND 400 * dot * dot >= 49 * na * nb
ORDER BY a_id, b_id
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

    # query vectors via a pushed-down source filter (same pattern as
    # knn_bruteforce) — never the whole table on the driver
    import pyarrow.dataset as pads

    q_tbl = _concat(
        _read_pq(
            f"{sf_dir}/embeddings.parquet",
            filter=pads.field("vec_id").isin(list(query_ids)),
        )
    )
    q_ids, q_mat = _batch_matrix(q_tbl)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
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
    return _from_pandas(df[["query_id", "rank", "neighbor_id", "cosine"]].reset_index(drop=True))


def near_dup_cosine(
    sf_dir: str,
    threshold: float = 0.4,
    n_planes: int = 8,
    n_bands: int = 32,
    seed: int = 13,
    max_bg_candidate_rate: float = 0.25,
) -> pa.Table:
    """Embedding near-dup pairs (cosine ≥ threshold) — fully distributed.

    Random-hyperplane LSH with ``n_bands`` independent bands of ``n_planes``
    planes each (multi-band OR: a pair collides if it agrees on ALL planes of
    ANY band — recall ≈ 1-(1-p^n_planes)^n_bands, p = 1-θ/π):

      band signatures (map_batches; planes re-derived from the seed in each
      actor __init__ — no broadcast) → bucket groupby pair-emit → fused
      route/verify (``dedup._route_verify``): candidate vectors shuffled by
      vec_id, routed to per-pair verify buckets, exact cosine vectorized per
      bucket (2 all-to-alls) — no candidate vector matrix on the driver.

    Default threshold 0.4: the synthetic embeddings are near-orthogonal
    (max off-diagonal cosine ≈0.5–0.6 at sf0.01/sf0.1), so the classic 0.95
    near-dup bar would trivially return zero rows and never exercise the
    operator. At cos 0.4 vs orthogonal the per-plane gap is small (0.63 vs
    0.5): the 8×32 default trades recall (~0.56 at cos 0.4) for a bounded
    far-candidate rate (~12% of all pairs instead of ~65% with wide bands)
    — on genuinely near-dup data (cos ≥ 0.9, per-plane p ≥ 0.85) the same
    bands give ~99% recall. Approximate recall by design → rows-only
    oracle.

    OPERATING ENVELOPE: the background candidate rate for uncorrelated
    vectors is 1-(1-2^-n_planes)^n_bands (~11.8% at 8×32). The function
    computes this, logs it with the realized candidate-pair count, and warns
    when the configuration implies a background rate above
    ``max_bg_candidate_rate`` — a threshold/band combination past that bound
    is O(n²) pair emission wearing an LSH costume (the hot-bucket cap in
    ``_pairs_from_buckets`` bounds the damage but not the intent)."""
    import logging

    from .dedup import _pairs_from_buckets, _route_verify

    dim_probe = _concat(
        _read_pq(f"{sf_dir}/embeddings.parquet").limit(1)
    )
    dim = len(dim_probe.column("embedding")[0].as_py())

    log = logging.getLogger("quanta_ray.simsearch")
    bg_rate = 1.0 - (1.0 - 0.5 ** n_planes) ** n_bands
    if bg_rate > max_bg_candidate_rate:
        log.warning(
            "near_dup_cosine bands %dx%d imply a %.1f%% background candidate "
            "rate on uncorrelated vectors (> %.0f%% bound) — narrow the bands "
            "(more planes) or raise the threshold",
            n_bands, n_planes, 100 * bg_rate, 100 * max_bg_candidate_rate,
        )

    class BandSignatures:
        def __init__(self):
            rng = np.random.default_rng(seed)
            self.planes = rng.standard_normal((dim, n_bands * n_planes))
            self.pow2 = (1 << np.arange(n_planes, dtype=np.int64))

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids, mat = _batch_matrix(batch)
            n = len(ids)
            signs = (mat @ self.planes > 0).astype(np.int64)
            bval = signs.reshape(n, n_bands, n_planes) @ self.pow2  # (n, bands)
            return pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, n_bands),
                    "band": np.tile(np.arange(n_bands, dtype=np.int64), n),
                    "bval": bval.reshape(-1),
                }
            )

    bands_ds = _emb(sf_dir).map_batches(
        BandSignatures, batch_format="pyarrow", batch_size=4096, concurrency=2
    )
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())}
    )
    pairs_ds = _pairs_from_buckets(
        bands_ds, ["band", "bval"], "vec_id", global_dedup=False
    ).materialize()
    n_candidates = pairs_ds.count()  # pre-dedup band hits (≤ n_bands × pairs)
    log.info(
        "near_dup_cosine: %d candidate band-hit rows (background rate %.1f%%)",
        n_candidates, 100 * bg_rate,
    )
    if n_candidates == 0:
        return empty

    # (vec_id, normalized-vector bytes) — vectorized per batch; the fused
    # route/verify then ships only candidate vectors, all off-driver
    def vec_bytes(batch: pa.Table) -> pd.DataFrame:
        ids, mat = _batch_matrix(batch)
        return pd.DataFrame(
            {"doc_id": ids.astype(np.int64), "vb": [r.tobytes() for r in mat]}
        )

    vb_ds = _emb(sf_dir).map_batches(vec_bytes, batch_format="pyarrow", batch_size=4096)

    def verify(m: pd.DataFrame) -> pd.DataFrame:
        if not len(m):
            return pd.DataFrame(
                {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
                 "cosine": np.empty(0, np.float64)}
            )
        ma = np.stack([np.frombuffer(v, dtype=np.float64) for v in m["_pay_a"]])
        mb = np.stack([np.frombuffer(v, dtype=np.float64) for v in m["_pay_b"]])
        cos = np.round((ma * mb).sum(axis=1), 4)
        out = pd.DataFrame(
            {"a": m["a"].to_numpy(dtype=np.int64), "b": m["b"].to_numpy(dtype=np.int64),
             "cosine": cos}
        )
        return out[out["cosine"] >= threshold]

    verified = _route_verify(
        pairs_ds,
        vb_ds,
        {"vb": b""},
        lambda sel: sel["vb"].to_numpy(),
        verify,
    )
    t = _concat(verified)
    if t.num_rows == 0:
        return empty
    import pyarrow.compute as pc

    return t.take(
        pc.sort_indices(t, sort_keys=[("a", "ascending"), ("b", "ascending")])
    ).combine_chunks()


def norm_stats(sf_dir: str) -> pa.Table:
    """Per-label embedding diagnostics (count, mean L2 norm, mean first
    component) — the sanity pass before any vector pipeline (catches
    un-normalized or collapsed embeddings).

    Per-batch numpy partials (count / sum-of-norms / sum-of-dim0 per label)
    → tiny label-keyed sum — the shuffle carries one row per (batch, label),
    never vectors. Value-checked by a DuckDB list-kernel oracle."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("label").to_numpy()
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        if not len(ids):
            return pd.DataFrame(
                {"label": pd.array([], dtype=np.int32),
                 "n": pd.array([], dtype=np.int64),
                 "s_norm": pd.array([], dtype=np.float64),
                 "s_dim0": pd.array([], dtype=np.float64)}
            )
        mat = flat.astype(np.float64).reshape(len(ids), -1)
        norms = np.sqrt((mat * mat).sum(axis=1))
        labels, inv = np.unique(ids, return_inverse=True)
        return pd.DataFrame(
            {
                "label": labels,
                "n": np.bincount(inv).astype(np.int64),
                "s_norm": np.bincount(inv, weights=norms),
                "s_dim0": np.bincount(inv, weights=mat[:, 0]),
            }
        )

    from ..bucket import bucketed_group_agg

    parts = _emb(sf_dir).map_batches(partial, batch_format="pyarrow", batch_size=8192)
    agg = bucketed_group_agg(
        parts, ["label"], dict(n=("n", "sum"), s_norm=("s_norm", "sum"),
                               s_dim0=("s_dim0", "sum"))
    )
    df = _concat(agg).to_pandas().sort_values("label").reset_index(drop=True)
    out = pd.DataFrame(
        {
            "label": df["label"].astype(np.int32),
            "n": df["n"].astype(np.int64),
            "mean_norm": np.round(df["s_norm"] / df["n"], 6),
            "mean_dim0": np.round(df["s_dim0"] / df["n"], 6),
        }
    )
    return _from_pandas(out)


NORM_STATS_SQL = """
SELECT label, count(*) AS n,
       round(avg(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS mean_norm,
       round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS mean_dim0
FROM embeddings GROUP BY label ORDER BY label
"""


# --- cross-table: per-(label, lang) document stats ------------------------------


def label_lang_stats(sf_dir: str, buckets: int = 16) -> pa.Table:
    """Join `documents` with `embeddings` on id and aggregate per
    (cluster label, language) — the cross-modal reporting join (how does my
    embedding clustering interact with language mix?).

    Scale shape: BOTH scans are column-pruned — the wide `embedding`
    vector column never leaves storage (only (vec_id, label) does); the
    join is hash-bucketed on the id with NO broadcast; per-bucket partial
    (label, lang) aggregates ship one row per pair per bucket; the final
    reduce is |labels|x|langs| rows on the driver."""
    import pandas as pd

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    embs = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"])

    def tag_d(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id": b["doc_id"].to_numpy(dtype=np.int64),
                "lang": b["lang"].astype(str),
                "n_chars": b["n_chars"].to_numpy(dtype=np.int64),
                "label": np.int64(-1),
                "_side": np.int64(0),
            }
        )

    def tag_e(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id": b["vec_id"].to_numpy(dtype=np.int64),
                "lang": "",
                "n_chars": np.int64(0),
                "label": b["label"].to_numpy(dtype=np.int64),
                "_side": np.int64(1),
            }
        )

    from ..bucket import bucketed_apply

    both = docs.map_batches(tag_d, batch_format="pandas").union(
        embs.map_batches(tag_e, batch_format="pandas")
    )

    def join_agg(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["_side"] == 0][["id", "lang", "n_chars"]]
        e = g[g["_side"] == 1][["id", "label"]]
        m = d.merge(e, on="id")
        return m.groupby(["label", "lang"], as_index=False).agg(
            n_docs=("id", "size"), total_chars=("n_chars", "sum")
        )

    parts = _concat(bucketed_apply(both, ["id"], join_agg, num_buckets=buckets))
    df = (
        parts.to_pandas()
        .groupby(["label", "lang"], as_index=False)
        .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))
        .sort_values(["label", "lang"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "label": pa.array(df["label"].to_numpy(dtype=np.int64), pa.int64()),
            "lang": pa.array(df["lang"].astype(str), pa.string()),
            "n_docs": pa.array(df["n_docs"].to_numpy(dtype=np.int64), pa.int64()),
            "total_chars": pa.array(df["total_chars"].to_numpy(dtype=np.int64), pa.int64()),
        }
    )


LABEL_LANG_STATS_SQL = """
SELECT CAST(e.label AS BIGINT) AS label, d.lang,
       count(*) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
GROUP BY e.label, d.lang
ORDER BY label, lang
"""


def knn_pq(
    sf_dir: str,
    query_ids: tuple[int, ...] = (0, 1, 2, 3),
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    iters: int = 8,
    seed: int = 23,
) -> pa.Table:
    """Product-quantization ANN (Jegou, Douze & Schmid 2011, "Product
    Quantization for Nearest Neighbor Search"): split each row-normalized
    vector into ``m`` subspaces, k-means each subspace into ``ksub``
    centroids, and score by asymmetric distance computation (ADC) — per
    query an m x ksub lookup table of subspace dot products; per corpus
    vector the approximate cosine is a sum of m LUT reads.

    Why it is the 100-TB path: PQ memory per vector is m code bytes instead
    of d floats (here 64 floats -> 8 bytes), and scoring is integer-indexed
    adds, not a d-wide matmul — the standard billion-vector ANN layout.

    Scale shape: codebooks train on a bounded seeded driver sample (2048
    rows, the standard PQ practice — training is sample-based in FAISS
    too); codebooks + query LUTs broadcast ONCE via ``ray.put``; one
    streaming pass encodes each batch (argmin over ksub per subspace,
    vectorized) and emits its local top-k per query; the driver merges tiny
    partials. Approximate by construction -> rows-only driver check, pinned
    by the planted-neighbor pytest."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq

    # --- train codebooks on the seeded driver sample (bounded, scale-free)
    rbs, n = [], 0
    for rb in _pq.ParquetFile(f"{sf_dir}/embeddings.parquet").iter_batches(
        batch_size=2048, columns=["vec_id", "embedding"]
    ):
        rbs.append(rb)
        n += len(rb)
        if n >= 2048:
            break
    if not rbs:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "rank": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
        )
    _, smat = _batch_matrix(pa.Table.from_batches(rbs).slice(0, 2048))
    d = smat.shape[1]
    m = min(m, d)
    while d % m:  # subspaces must tile the dimension
        m -= 1
    dsub = d // m
    ksub = min(ksub, len(smat))
    rng = np.random.default_rng(seed)
    codebooks = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = smat[:, j * dsub : (j + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=ksub, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for c in range(ksub):
                mask = a == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
        codebooks[j] = cent

    # --- query LUTs: (n_queries, m, ksub) subspace dot products
    qt = _concat(
        _read_pq(
            f"{sf_dir}/embeddings.parquet",
            filter=pads.field("vec_id").isin(list(query_ids)),
        )
    )
    q_ids, q_mat = _batch_matrix(qt)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    luts = np.einsum(
        "qjd,jcd->qjc", q_mat.reshape(len(q_ids), m, dsub), codebooks
    )
    ref = ray.put((q_ids, codebooks, luts))

    class PQTopK:
        def __init__(self):
            self.q_ids, self.codebooks, self.luts = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids, mat = _batch_matrix(batch)
            if not len(ids):
                return pd.DataFrame(columns=["query_id", "neighbor_id", "cosine"])
            sub = mat.reshape(len(ids), m, dsub)
            # encode: per subspace, argmin ||x_sub - c||^2 via the dot trick
            codes = np.empty((len(ids), m), dtype=np.int64)
            for j in range(m):
                cb = self.codebooks[j]
                d2 = (sub[:, j, :] ** 2).sum(1)[:, None] - 2.0 * sub[:, j, :] @ cb.T \
                    + (cb**2).sum(1)[None, :]
                codes[:, j] = np.argmin(d2, axis=1)
            # ADC: approx cosine = sum_j LUT[q, j, code_j]
            out = []
            for qi, qid in enumerate(self.q_ids):
                s = self.luts[qi][np.arange(m)[None, :], codes].sum(axis=1)
                mask = ids != qid
                cand = np.nonzero(mask)[0]
                if not len(cand):
                    continue
                top = cand[np.lexsort((ids[cand], -s[cand]))][:k]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": ids[top], "cosine": s[top]}
                    )
                )
            if not out:
                return pd.DataFrame(columns=["query_id", "neighbor_id", "cosine"])
            return pd.concat(out, ignore_index=True)

    partials = _emb(sf_dir).map_batches(
        PQTopK, batch_format="pyarrow", batch_size=4096, concurrency=2
    )
    df = _concat(partials).to_pandas()
    df = df.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", as_index=False).head(k)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df["cosine"] = df["cosine"].round(4)
    return _from_pandas(
        df[["query_id", "rank", "neighbor_id", "cosine"]].reset_index(drop=True)
    )


def knn_ivfpq(
    sf_dir: str,
    query_ids: tuple[int, ...] = (0, 1, 2, 3),
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    iters: int = 6,
    seed: int = 29,
) -> pa.Table:
    """IVFADC (Jegou et al. 2011, section IV): coarse IVF centroids route
    vectors to inverted lists; within a probed list the RESIDUAL
    (x - coarse centroid) is product-quantized, and the approximate score
    decomposes as q.x ~= q.c_coarse + sum_j LUT[q, j, code_j] — one scalar
    per probed centroid plus m table adds per vector. The standard
    billion-scale ANN index layout (FAISS 'IVFx,PQy').

    Scale shape: coarse centroids AND residual codebooks train on one
    bounded seeded driver sample; everything broadcast once via
    ``ray.put``; one streaming pass assigns, encodes residuals and emits
    per-batch local top-k for the probed queries only. Approximate ->
    rows-only check, pinned by the planted-neighbor pytest."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq

    rbs, n = [], 0
    for rb in _pq.ParquetFile(f"{sf_dir}/embeddings.parquet").iter_batches(
        batch_size=2048, columns=["vec_id", "embedding"]
    ):
        rbs.append(rb)
        n += len(rb)
        if n >= 2048:
            break
    if not rbs:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "rank": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
        )
    _, smat = _batch_matrix(pa.Table.from_batches(rbs).slice(0, 2048))
    d = smat.shape[1]
    m = min(m, d)
    while d % m:
        m -= 1
    dsub = d // m
    ksub = min(ksub, len(smat))
    rng = np.random.default_rng(seed)

    # --- coarse quantizer (spherical, cosine assignment) on the sample
    cents = smat[rng.choice(len(smat), size=min(n_centroids, len(smat)), replace=False)].copy()
    for _ in range(5):
        a = np.argmax(smat @ cents.T, axis=1)
        for c in range(len(cents)):
            sel = smat[a == c]
            if len(sel):
                v = sel.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = v / nv
    # --- residual PQ codebooks on the sample's residuals
    res = smat - cents[np.argmax(smat @ cents.T, axis=1)]
    codebooks = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = res[:, j * dsub : (j + 1) * dsub]
        cb = sub[rng.choice(len(sub), size=ksub, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            aa = np.argmin(d2, axis=1)
            for c in range(ksub):
                mask = aa == c
                if mask.any():
                    cb[c] = sub[mask].mean(axis=0)
        codebooks[j] = cb

    qt = _concat(
        _read_pq(
            f"{sf_dir}/embeddings.parquet",
            filter=pads.field("vec_id").isin(list(query_ids)),
        )
    )
    q_ids, q_mat = _batch_matrix(qt)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    probe = np.argsort(-(q_mat @ cents.T), axis=1)[:, :nprobe]
    # residual LUTs: q . codebook entry, per subspace
    luts = np.einsum("qjd,jcd->qjc", q_mat.reshape(len(q_ids), m, dsub), codebooks)
    qcoarse = q_mat @ cents.T  # (q, centroids): the scalar term per list
    ref = ray.put((q_ids, cents, codebooks, probe, luts, qcoarse))

    class IVFPQTopK:
        def __init__(self):
            (self.q_ids, self.cents, self.codebooks, self.probe,
             self.luts, self.qcoarse) = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids, mat = _batch_matrix(batch)
            if not len(ids):
                return pd.DataFrame(columns=["query_id", "neighbor_id", "cosine"])
            assign = np.argmax(mat @ self.cents.T, axis=1)
            resid = mat - self.cents[assign]
            sub = resid.reshape(len(ids), m, dsub)
            codes = np.empty((len(ids), m), dtype=np.int64)
            for j in range(m):
                cb = self.codebooks[j]
                d2 = (sub[:, j, :] ** 2).sum(1)[:, None] - 2.0 * sub[:, j, :] @ cb.T \
                    + (cb**2).sum(1)[None, :]
                codes[:, j] = np.argmin(d2, axis=1)
            out = []
            for qi, qid in enumerate(self.q_ids):
                mask = np.isin(assign, self.probe[qi]) & (ids != qid)
                if not mask.any():
                    continue
                s = self.qcoarse[qi][assign[mask]] + self.luts[qi][
                    np.arange(m)[None, :], codes[mask]
                ].sum(axis=1)
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
        IVFPQTopK, batch_format="pyarrow", batch_size=4096, concurrency=2
    )
    df = _concat(partials).to_pandas()
    df = df.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", as_index=False).head(k)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df["cosine"] = df["cosine"].round(4)
    return _from_pandas(
        df[["query_id", "rank", "neighbor_id", "cosine"]].reset_index(drop=True)
    )


# --- PCA projection ---------------------------------------------------------------


def pca_project(sf_dir: str, n_components: int = 2) -> pa.Table:
    """Project every embedding onto the corpus' top principal components —
    the dimensionality-reduction / visualization primitive of an embedding
    pipeline (and the whitening step before many ANN indexes).

    Scale shape (two streaming passes, nothing row-proportional anywhere):
      1. MOMENTS — per batch: count, coordinate sums and X^T X partials,
         quantized to integer MICRO-units (integer folding is order-free,
         so results are bit-identical at any parallelism for a given batch
         layout; re-batching can move moments by ~1e-6, which the rounded
         output absorbs); partials are one (1 + d + d^2)-value row per
         batch, folded by a tiny bucketed reduce, never the vectors.
      2. The driver eigendecomposes the d x d covariance (d is model
         width, not corpus size), fixes each eigenvector's sign so its
         largest-|coordinate| entry is positive (removes eigh's sign
         ambiguity -> deterministic output), broadcasts the d x k loading
         matrix once, and a stateless map projects each batch.
    PCA is over the ROW-NORMALIZED embeddings (the family's shared
    ``_batch_matrix`` convention — cosine geometry, like every other op on
    this table). Rows-only check (eigenvectors are not SQL-expressible),
    pinned by the planted-variance pytest."""
    from ..bucket import bucketed_group_agg
    from ..broadcast import cached_get

    U = 1e6  # micro-unit scale for order-free integer moment sums

    def moments(batch: pa.Table) -> pd.DataFrame:
        ids, mat = _batch_matrix(batch)
        if not len(ids):
            return pd.DataFrame(
                {"i": np.empty(0, np.int64), "v": np.empty(0, np.int64)}
            )
        d = mat.shape[1]
        mu = np.round(mat.sum(axis=0) * U).astype(np.int64)          # d sums
        xtx = np.round((mat.T @ mat).ravel() * U).astype(np.int64)   # d^2 sums
        v = np.concatenate(([np.int64(len(ids))], mu, xtx))
        return pd.DataFrame({"i": np.arange(len(v), dtype=np.int64), "v": v})

    folded = _concat(
        bucketed_group_agg(
            _emb(sf_dir).map_batches(moments, batch_format="pyarrow", batch_size=8192),
            ["i"],
            {"v": ("v", "sum")},
            num_buckets=4,
        )
    ).to_pandas().sort_values("i")
    if folded.empty:
        return pa.table(
            {"vec_id": pa.array([], pa.int64()),
             **{f"pc{j + 1}": pa.array([], pa.float64()) for j in range(n_components)}}
        )
    v = folded["v"].to_numpy(np.int64)
    n = int(v[0])
    # solve d from 1 + d + d^2 = len(v)
    d = int((-1 + (1 + 4 * (len(v) - 1)) ** 0.5) / 2)
    mean = v[1 : 1 + d] / (U * n)
    xtx = v[1 + d :].reshape(d, d) / (U * n)
    cov = xtx - np.outer(mean, mean)
    w, vecs = np.linalg.eigh(cov)                       # ascending eigenvalues
    comps = vecs[:, ::-1][:, :n_components]             # top-k columns
    # sign convention: largest-|coordinate| entry of each component positive
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    comps = comps * flip
    load_ref = ray.put((mean, comps))

    def project(batch: pa.Table) -> pd.DataFrame:
        mean_, comps_ = cached_get(load_ref)
        ids, mat = _batch_matrix(batch)
        if not len(ids):
            return pd.DataFrame(
                {"vec_id": np.empty(0, np.int64),
                 **{f"pc{j + 1}": np.empty(0, np.float64)
                    for j in range(comps_.shape[1])}}
            )
        proj = (mat - mean_) @ comps_
        out = {"vec_id": ids.astype(np.int64)}
        for j in range(comps_.shape[1]):
            out[f"pc{j + 1}"] = np.round(proj[:, j], 6)
        return pd.DataFrame(out)

    t = _concat(
        _emb(sf_dir).map_batches(project, batch_format="pyarrow", batch_size=8192)
    )
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=[("vec_id", "ascending")]))


# --- per-label centroids (vector aggregate with a real SQL oracle) ------------


def centroid_per_label(sf_dir: str) -> pa.Table:
    """Per-(label, dimension) mean of the RAW embedding vectors — the
    distributed vector-mean every clustering/recall pipeline starts from.

    Per-batch numpy partials: one (labels x dims) float64 sum matrix +
    per-label counts via a single ``np.add.at`` scatter, emitted as
    (label, dim, s, n) rows — the shuffle carries labels*dims rows per
    batch, never vectors. The tiny driver-side reduce divides once and
    rounds to 6 decimals (the established float-avg oracle convention,
    cf. ``norm_stats``). DuckDB oracle uses positionally-aligned
    ``unnest(embedding) / unnest(range(...))`` to reproduce the same
    (label, dim) grid."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        lab = batch.column("label").to_numpy()
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        if not len(lab):
            return pd.DataFrame(
                {"label": np.empty(0, np.int64), "dim": np.empty(0, np.int64),
                 "s": np.empty(0, np.float64), "n": np.empty(0, np.int64)}
            )
        d = len(flat) // len(lab)
        mat = flat.astype(np.float64).reshape(len(lab), d)
        labels, inv = np.unique(lab, return_inverse=True)
        acc = np.zeros((len(labels), d), np.float64)
        np.add.at(acc, inv, mat)
        cnt = np.bincount(inv).astype(np.int64)
        return pd.DataFrame(
            {
                "label": np.repeat(labels.astype(np.int64), d),
                "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), len(labels)),
                "s": acc.ravel(),
                "n": np.repeat(cnt, d),
            }
        )

    ds = _read_pq(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])
    pt = _concat(ds.map_batches(partial, batch_format="pyarrow"))
    if pt.num_rows == 0:
        return pa.table(
            {"label": pa.array([], pa.int64()),
             "dim": pa.array([], pa.int64()),
             "centroid": pa.array([], pa.float64())}
        )
    parts = pt.to_pandas()
    g = parts.groupby(["label", "dim"], as_index=False).agg(
        s=("s", "sum"), n=("n", "sum")
    )
    g = g.sort_values(["label", "dim"], kind="mergesort")
    return pa.table(
        {
            "label": pa.array(g["label"].to_numpy(dtype=np.int64), pa.int64()),
            "dim": pa.array(g["dim"].to_numpy(dtype=np.int64), pa.int64()),
            "centroid": pa.array(
                np.round(g["s"].to_numpy() / g["n"].to_numpy(), 6), pa.float64()
            ),
        }
    )


CENTROID_PER_LABEL_SQL = """
SELECT label, dim, round(sum(val) / count(*), 6) AS centroid
FROM (
  SELECT label, unnest(embedding) AS val,
         unnest(range(1, len(embedding) + 1)) AS dim
  FROM embeddings
)
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- ANN index-quality evaluation (recall@k vs exact) --------------------------


def matryoshka_recall(
    sf_dir: str,
    query_ids: tuple[int, ...] = (0, 1, 2, 3),
    k: int = 10,
    fractions: tuple[float, ...] = (1.0, 0.5, 0.25, 0.125),
) -> pa.Table:
    """Recall@k of TRUNCATED-dimension exact search vs the full-dimension
    truth — the Matryoshka-embedding question (Kusupati et al. 2022): how
    many dims can a pipeline drop (for 2-8x cheaper storage/ANN) before
    neighbor quality degrades?

    ONE streaming pass over the embeddings computes every truncation level
    at once: per batch, the row block is L2-normalized per level on its
    first ``d`` dims (a slice of the same zero-copy matrix — the matmul is
    the cost, and it shrinks with d) and emits a per-(level, query) local
    top-k; the driver merges tiny partials and intersects each level's
    top-k with the full-dim set. Corpus-size-independent driver work;
    query matrix broadcast once via ``ray.put``. Deterministic (vec_id
    tie-breaks); the full-dim row's recall is 1.0 by construction (the
    pinned invariant)."""
    import pyarrow.dataset as pads

    qt = _read_pq(
        f"{sf_dir}/embeddings.parquet",
        filter=pads.field("vec_id").isin(list(query_ids)),
    )
    q_tbl = _concat(qt)
    q_ids, q_mat = _batch_matrix(q_tbl)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    dim = q_mat.shape[1]
    dims = sorted({max(1, int(dim * f)) for f in fractions}, reverse=True)
    ref = ray.put((q_ids, q_mat, dims))

    def _rownorm(m: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    class LevelTopK:
        def __init__(self):
            self.q_ids, q_mat, self.dims = ray.get(ref)
            self.q_by_dim = {d: _rownorm(q_mat[:, :d]) for d in self.dims}

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids, mat = _batch_matrix(batch)
            out = []
            for d in self.dims:
                sims = _rownorm(mat[:, :d]) @ self.q_by_dim[d].T
                for qi, qid in enumerate(self.q_ids):
                    s = sims[:, qi]
                    cand = np.nonzero(ids != qid)[0]
                    if len(cand) == 0:
                        continue
                    top = cand[np.lexsort((ids[cand], -s[cand]))][:k]
                    out.append(
                        pd.DataFrame(
                            {"dims": np.int64(d), "query_id": np.int64(qid),
                             "neighbor_id": ids[top], "cosine": s[top]}
                        )
                    )
            if not out:
                return pd.DataFrame(
                    columns=["dims", "query_id", "neighbor_id", "cosine"]
                )
            return pd.concat(out, ignore_index=True)

    partials = _emb(sf_dir).map_batches(
        LevelTopK, batch_format="pyarrow", batch_size=4096, concurrency=2
    )
    df = _concat(partials).to_pandas()
    df = df.sort_values(
        ["dims", "query_id", "cosine", "neighbor_id"],
        ascending=[True, True, False, True],
    )
    df = df.groupby(["dims", "query_id"], as_index=False).head(k)
    truth = {
        qid: set(g["neighbor_id"].to_numpy())
        for qid, g in df[df["dims"] == dim].groupby("query_id")
    }
    rows = []
    for (d, qid), g in df.groupby(["dims", "query_id"]):
        t = truth.get(qid, set())
        got = set(g["neighbor_id"].to_numpy())
        rows.append(
            (int(d), int(qid), len(t), len(got & t),
             round(len(got & t) / len(t), 6) if t else 1.0)
        )
    rows.sort(key=lambda r: (-r[0], r[1]))
    return pa.table(
        {
            "dims": pa.array([r[0] for r in rows], pa.int64()),
            "query_id": pa.array([r[1] for r in rows], pa.int64()),
            "k_truth": pa.array([r[2] for r in rows], pa.int64()),
            "n_hit": pa.array([r[3] for r in rows], pa.int64()),
            "recall": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


def recall_eval(
    sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2, 3), k: int = 10
) -> pa.Table:
    """Recall@k of each approximate index (IVF, PQ, IVF+PQ, PQ+rerank, SQ8,
    graph beam search) against the
    exact brute-force cosine top-k — the index-quality report every vector
    pipeline needs before trusting an ANN path at scale.

    Each engine runs its normal distributed search (brute force is the
    oracle and ships only tiny per-block top-k partials driver-side); the
    comparison is a per-query set intersection over <= |queries| x k rows —
    corpus-size independent. Deterministic: all four searches share the
    seeded codebooks/permutations and vec_id tie-breaks. Rows-only
    (the ANN outputs themselves have no SQL form); pinned by the
    brute-vs-brute == 1.0 invariant and planted-neighbor tests of the
    underlying searches."""
    exact = knn_bruteforce_exact(sf_dir, query_ids=query_ids, k=k).to_pandas()
    truth = {
        qid: set(g["neighbor_id"].to_numpy())
        for qid, g in exact.groupby("query_id")
    }
    engines = {
        "ivf": knn_ivf(sf_dir, query_ids=query_ids, k=k),
        "pq": knn_pq(sf_dir, query_ids=query_ids, k=k),
        "ivfpq": knn_ivfpq(sf_dir, query_ids=query_ids, k=k),
        "pq_rerank": knn_pq_rerank(sf_dir, query_ids=query_ids, k=k),
        "sq8": knn_sq8(sf_dir, query_ids=query_ids, k=k),
        "graph": knn_graph_search(sf_dir, query_ids=query_ids, k=k),
    }
    rows = []
    for name in sorted(engines):
        got = engines[name].to_pandas()
        for qid in sorted(truth):
            t = truth[qid]
            g = set(got.loc[got["query_id"] == qid, "neighbor_id"].to_numpy())
            rows.append(
                (name, int(qid), len(t), len(g & t),
                 round(len(g & t) / len(t), 6) if t else 1.0)
            )
    return pa.table(
        {
            "engine": pa.array([r[0] for r in rows], pa.string()),
            "query_id": pa.array([r[1] for r in rows], pa.int64()),
            "k_truth": pa.array([r[2] for r in rows], pa.int64()),
            "n_hit": pa.array([r[3] for r in rows], pa.int64()),
            "recall": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


def knn_pq_rerank(
    sf_dir: str,
    query_ids: tuple[int, ...] = (0, 1, 2, 3),
    k: int = 10,
    depth: int = 50,
) -> pa.Table:
    """Two-stage retrieval — the standard production ANN shape: a cheap PQ
    ADC pass produces a ``depth``-deep shortlist per query, then the
    shortlist (and ONLY the shortlist) is exactly re-scored against the
    raw query vectors. Recovers most of brute-force recall at PQ scan
    cost: the exact stage touches <= |queries| x depth vectors regardless
    of corpus size (fetched via a pushed-down id filter, never a second
    full scan on the driver).

    Approximate by construction (stage-1 recall) -> rows-only check,
    pinned by the planted-neighbor + recall-dominance pytest."""
    import pyarrow.dataset as pads

    short = knn_pq(sf_dir, query_ids=query_ids, k=depth)
    if short.num_rows == 0:
        return short
    cand_ids = sorted(
        set(short.column("neighbor_id").to_pylist()) | set(query_ids)
    )
    fetched = _concat(
        _read_pq(
            f"{sf_dir}/embeddings.parquet",
            filter=pads.field("vec_id").isin(cand_ids),
        )
    )
    ids, mat = _batch_matrix(fetched)
    pos = {int(v): i for i, v in enumerate(ids)}
    q_ids = sorted(q for q in query_ids if q in pos)
    rows = []
    sdf = short.to_pandas()
    for qid in q_ids:
        qv = mat[pos[qid]]
        cands = [
            int(c)
            for c in sdf.loc[sdf["query_id"] == qid, "neighbor_id"]
            if int(c) in pos and int(c) != qid
        ]
        if not cands:
            continue
        cm = mat[[pos[c] for c in cands]]
        s = cm @ qv
        order = np.lexsort((np.asarray(cands, dtype=np.int64), -s))[:k]
        for r, i in enumerate(order, 1):
            rows.append((qid, r, cands[i], round(float(s[i]), 4)))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "rank": pa.array([r[1] for r in rows], pa.int64()),
            "neighbor_id": pa.array([r[2] for r in rows], pa.int64()),
            "cosine": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def knn_sq8(
    sf_dir: str,
    query_ids: tuple[int, ...] = (0, 1, 2, 3),
    k: int = 10,
    sample_rows: int = 2048,
    seed: int = 31,
) -> pa.Table:
    """Scalar-quantized (SQ8) ANN: each row-normalized dimension is affinely
    mapped to one uint8 code (FAISS 'SQ8' — the memory middle ground: 1
    byte/dim vs float32's 4, no codebook training beyond per-dim ranges,
    higher fidelity than PQ at the same byte budget for moderate d).

    The approximate cosine decomposes affinely: with x ~= off + code*step
    per dim, q.x ~= q.off (one scalar per query) + (q*step).codes (one
    matvec over the uint8 code matrix) — so scoring is a single matmul per
    batch against the broadcast (q*step) matrix, exactly the brute-force
    shape at a quarter of the memory traffic.

    Scale shape: per-dim min/max train on a bounded seeded driver sample
    (clipping handles out-of-sample tails); (offsets, steps, query mats)
    broadcast ONCE via ``ray.put``; one streaming pass quantizes each batch
    and emits its local top-k per query; the driver merges tiny partials.
    Approximate by construction -> rows-only driver check, pinned by the
    recall_eval bounds test."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq

    rbs, n = [], 0
    for rb in _pq.ParquetFile(f"{sf_dir}/embeddings.parquet").iter_batches(
        batch_size=sample_rows, columns=["vec_id", "embedding"]
    ):
        rbs.append(rb)
        n += len(rb)
        if n >= sample_rows:
            break
    if not rbs:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "rank": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
        )
    _, smat = _batch_matrix(pa.Table.from_batches(rbs).slice(0, sample_rows))
    off = smat.min(axis=0)
    rng_d = smat.max(axis=0) - off
    step = np.where(rng_d > 0, rng_d / 255.0, 1.0)

    qt = _concat(
        _read_pq(
            f"{sf_dir}/embeddings.parquet",
            filter=pads.field("vec_id").isin(list(query_ids)),
        )
    )
    q_ids, q_mat = _batch_matrix(qt)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], q_mat[order]
    q_base = q_mat @ off            # (n_queries,) scalar terms
    q_step = q_mat * step[None, :]  # (n_queries, d) matvec terms
    ref = ray.put((q_ids, off, step, q_base, q_step))

    class SQ8TopK:
        def __init__(self):
            (self.q_ids, self.off, self.step,
             self.q_base, self.q_step) = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids, mat = _batch_matrix(batch)
            if not len(ids):
                return pd.DataFrame(columns=["query_id", "neighbor_id", "cosine"])
            codes = np.clip(
                np.round((mat - self.off[None, :]) / self.step[None, :]),
                0, 255,
            ).astype(np.float64)
            scores = codes @ self.q_step.T + self.q_base[None, :]
            out = []
            for qi, qid in enumerate(self.q_ids):
                s = scores[:, qi]
                cand = np.nonzero(ids != qid)[0]
                if not len(cand):
                    continue
                top = cand[np.lexsort((ids[cand], -s[cand]))][:k]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": ids[top], "cosine": s[top]}
                    )
                )
            if not out:
                return pd.DataFrame(columns=["query_id", "neighbor_id", "cosine"])
            return pd.concat(out, ignore_index=True)

    partials = _emb(sf_dir).map_batches(
        SQ8TopK, batch_format="pyarrow", batch_size=4096, concurrency=2
    )
    df = _concat(partials).to_pandas()
    df = df.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", as_index=False).head(k)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df["cosine"] = df["cosine"].round(4)
    return _from_pandas(
        df[["query_id", "rank", "neighbor_id", "cosine"]].reset_index(drop=True)
    )


def knn_graph_search(
    sf_dir: str,
    query_ids: tuple[int, ...] = tuple(range(0, 200, 7)),
    k: int = 10,
    graph_k: int = 8,
    beam: int = 24,
) -> pa.Table:
    """GRAPH-based ANN search (the NSW/HNSW family, single-layer): greedy
    best-first BEAM search over the exact k-NN graph — visit the best
    unexpanded node, expand its adjacency, keep the ``beam`` best
    candidates, stop when the beam is stable; return each query's top-k
    among visited nodes. The index-backed search path next to the
    IVF/PQ/SQ8 quantization engines: sublinear visits per query instead
    of a full scan.

    Shape: the graph (built by the ``knn_graph`` machinery — one linear
    corpus pass) and the normalized corpus matrix are broadcast ONCE via
    ``ray.put``; queries fan out over an actor pool, each query's walk is
    O(visits * graph_k) lookups into the shared read-only arrays. Past
    ``_corpus_shard_rows()`` the corpus is SHARDED (contiguous vec_id
    ranges): each shard builds its LOCAL k-NN graph (corpus stream
    filtered to the shard's id range via ``_knn_edges``), every query
    beam-searches every shard, and per-query top-k merges across shards
    by (cosine desc, neighbor_id) — the same merge shape as the IVF
    probe merge, so no single ``ray.put`` ever holds the whole corpus.
    Approximate by design -> rows-only oracle; recall vs the exact scan
    is pinned by the planted pytest (both regimes)."""
    q_tbl = _concat(_emb(sf_dir))
    ids, mat = _batch_matrix(q_tbl)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    # dense position index: vec_id -> row (ids are small ints here; a
    # sparse corpus would keep the id->pos dict instead)
    pos = {int(v): i for i, v in enumerate(ids)}
    shard = _corpus_shard_rows()
    qset = [int(q) for q in query_ids if int(q) in pos]
    # the query vectors ride WITH the query rows (a shard's matrix only
    # holds its own members, so qv can't be looked up shard-side)
    q_vecs = [mat[pos[q]] for q in qset]
    if len(ids) > shard:  # sharded regime: quantize once for the graph builds
        _qi_all, _qm_all = _quant_matrix(q_tbl, 30.0)
        _o2 = np.argsort(_qi_all)
        _qi_all, _qm_all = _qi_all[_o2], _qm_all[_o2]

    def shard_pass(lo: int, hi: int) -> pd.DataFrame:
        sh_ids, sh_mat = ids[lo:hi], mat[lo:hi]
        if hi - lo == len(ids):
            g = knn_graph(sf_dir, k=graph_k)  # global = integer-exact build
        else:
            qi, qm = _qi_all[lo:hi], _qm_all[lo:hi]
            qn2 = (qm * qm).sum(axis=1)
            g = _from_pandas(
                _knn_edges(sf_dir, qi, qm, qn2, graph_k,
                           member_lo=int(sh_ids[0]), member_hi=int(sh_ids[-1]))
            )
        gq = g.column("query_id").to_numpy()
        gn = g.column("neighbor_id").to_numpy()
        sh_pos = {int(v): i for i, v in enumerate(sh_ids)}
        adj = np.full((len(sh_ids), graph_k), -1, dtype=np.int64)
        fill = np.zeros(len(sh_ids), dtype=np.int64)
        for a, b in zip(gq, gn):
            i = sh_pos[int(a)]
            if fill[i] < graph_k:
                adj[i, fill[i]] = sh_pos[int(b)]
                fill[i] += 1
        entry = 0  # deterministic entry point: lowest vec_id's row
        ref = ray.put((sh_ids, sh_mat, adj))

        class GraphSearch:
            def __init__(self):
                self.ids, self.mat, self.adj = ray.get(ref)

            def _search(self, qid: int, qv: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
                mat_, adj_ = self.mat, self.adj
                visited = {entry}
                beam_idx = [entry]
                beam_sim = [float(mat_[entry] @ qv)]
                expanded: set[int] = set()
                while True:
                    # expand the best not-yet-expanded beam member
                    cand = [
                        (s, i)
                        for s, i in zip(beam_sim, beam_idx)
                        if i not in expanded
                    ]
                    if not cand:
                        break
                    s_best, i_best = max(cand, key=lambda t: (t[0], -t[1]))
                    expanded.add(i_best)
                    nbrs = [j for j in adj_[i_best] if j >= 0 and j not in visited]
                    if nbrs:
                        visited.update(nbrs)
                        sims = mat_[nbrs] @ qv
                        beam_idx.extend(nbrs)
                        beam_sim.extend(sims.tolist())
                        # trim to beam best (deterministic: sim desc, row asc)
                        order_b = sorted(
                            range(len(beam_idx)),
                            key=lambda t: (-beam_sim[t], beam_idx[t]),
                        )[:beam]
                        beam_idx = [beam_idx[t] for t in order_b]
                        beam_sim = [beam_sim[t] for t in order_b]
                vis = np.fromiter(visited, dtype=np.int64)
                sims = mat_[vis] @ qv
                keep = self.ids[vis] != qid
                vis, sims = vis[keep], sims[keep]
                top = np.lexsort((self.ids[vis], -sims))[:k]
                return vis[top], sims[top]

            def __call__(self, batch: pa.Table) -> pd.DataFrame:
                out_q, out_n, out_s = [], [], []
                qv_col = batch.column("qv").to_numpy(zero_copy_only=False)
                for qid, qv in zip(batch.column("vec_id").to_pylist(), qv_col):
                    rows, sims = self._search(int(qid), np.asarray(qv))
                    out_q.extend([qid] * len(rows))
                    out_n.extend(self.ids[rows].tolist())
                    out_s.extend(sims.tolist())
                return pd.DataFrame(
                    {"query_id": out_q, "neighbor_id": out_n, "cosine": out_s}
                )

        import ray.data as rd_

        q_ds = rd_.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(qset, pa.int64()),
                    "qv": pa.array([v.tolist() for v in q_vecs],
                                   pa.list_(pa.float64())),
                }
            )
        )
        return _concat(
            q_ds.map_batches(GraphSearch, batch_format="pyarrow",
                             batch_size=64, concurrency=2)
        ).to_pandas()

    out = pd.concat(
        [shard_pass(lo, min(lo + shard, len(ids)))
         for lo in range(0, len(ids), shard)],
        ignore_index=True,
    )
    # merge per-query top-k across shards; for a single shard this is a
    # no-op re-rank identical to the in-actor lexsort (sim desc, id asc)
    out = out.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    out = out.groupby("query_id", as_index=False).head(k)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out["cosine"] = np.round(out["cosine"].to_numpy(), 4)
    out = out.reset_index(drop=True)
    return _from_pandas(out[["query_id", "rank", "neighbor_id", "cosine"]])
