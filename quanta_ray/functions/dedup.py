"""Deduplication operators over the ``documents`` table.

The full large-scale dedup family, each expressed shuffle-consciously:

- **exact**: content-hash column (vectorized) → hash-partition groupby →
  per-group first. SQL-checkable.
- **MinHash + LSH near-dup**: shingle → minhash signature (numpy, per batch)
  → explode to (band, band_hash, doc_id) rows → groupby band buckets →
  candidate pairs → Jaccard verify. Only bucket rows shuffle, never text.
- **SimHash**: 64-bit simhash per doc; near-dups = banded hamming buckets.
- **n-gram Jaccard verify**: exact pairwise verification of candidates.
- **embedding cosine near-dup**: see ``simsearch.near_dup_cosine``.

All candidate generation is per-batch vectorized. Pair verification is a
fused SHUFFLE JOIN (``_route_verify``): candidate payloads (shingles /
signatures / vectors) are computed where the docs hash and routed to
per-pair verify buckets — two all-to-alls total, and no candidate-keyed map
is ever built on the driver or broadcast, so the path holds at web-corpus
dup rates (30–50%) where candidates grow with the corpus.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..hashutil import md5_hex
from ..schema import read_parquet_clean as _read_pq

MERSENNE = (1 << 61) - 1


def _docs(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return _read_pq(f"{sf_dir}/documents.parquet", columns=columns)


def _concat(ds: rd.Dataset) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


# --- exact dedup --------------------------------------------------------------


def dedup_exact(sf_dir: str) -> pa.Table:
    """Keep the lowest doc_id per exact text content (md5 key).

    Pattern: vectorized hash column → groupby(hash) → per-group min —
    the shuffle moves (hash, doc_id) pairs, not text."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch["md5"] = md5_hex(batch["text"].to_numpy(dtype=object))
        # per-batch partial: one survivor per md5 per batch
        return batch.groupby("md5", as_index=False)["doc_id"].min()

    from ..bucket import bucketed_group_agg

    partials = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_hash, batch_format="pandas", batch_size=8192
    )
    out = bucketed_group_agg(partials, ["md5"], dict(doc_id=("doc_id", "min")))
    t = _concat(out).select(["doc_id", "md5"])
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, md5(text) AS md5
FROM documents
GROUP BY md5(text)
ORDER BY doc_id
"""


def _text_hash(texts: pd.Series) -> np.ndarray:
    """Vectorized 64-bit content hash (the dedup fast path's key)."""
    return pd.util.hash_array(texts.to_numpy(dtype=object))


def dedup_exact_fast(sf_dir: str, _hash_fn: Callable | None = None) -> pa.Table:
    """Exact dedup keyed on a VECTORIZED 64-bit hash instead of per-row
    Python md5 — the hot path when the output needs survivors, not
    SQL-checkable fingerprints (``dedup_exact`` keeps md5 for the oracle's
    md5 column; this one's survivor set is itself SQL-checkable via
    GROUP BY text).

    64-bit collisions are REAL at 10^10 docs (~3/billion-pairs birthday
    rate), so the reduce disambiguates by text equality: each per-batch
    partial carries one representative (min-doc_id) text per distinct hash,
    and the bucket groups by (hash, text) — two different texts that collide
    keep separate survivors. Shuffle volume = one (hash, doc_id, text) row
    per distinct-per-batch hash (≤ corpus; shrinks with dup rate).

    ``_hash_fn`` is test injection (a constant hash forces the collision
    branch)."""
    hash_fn = _hash_fn or _text_hash

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "h": hash_fn(batch["text"]).astype(np.uint64),
                "doc_id": batch["doc_id"].to_numpy(),
                "text": batch["text"].to_numpy(),
            }
        )
        # one survivor (min doc_id) per DISTINCT TEXT per batch (grouping on
        # the hash alone would merge colliding non-duplicates already here)
        return df.groupby(["h", "text"], as_index=False)["doc_id"].min()

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # text equality separates true duplicates from hash collisions
        out = g.groupby(["h", "text"], as_index=False)["doc_id"].min()
        return out[["doc_id"]]

    from ..bucket import bucketed_apply

    partials = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )
    t = _concat(bucketed_apply(partials, ["h"], resolve))
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


DEDUP_EXACT_FAST_SQL = """
SELECT min(doc_id) AS doc_id
FROM documents
GROUP BY text
ORDER BY doc_id
"""


# --- minhash machinery (shared with LSH) --------------------------------------


P31 = (1 << 31) - 1  # 31-bit prime field: a*x+b fits uint64, fully vectorized

# position coefficients for the rolling k-gram combine (odd 64-bit constants;
# uint64 arithmetic wraps deterministically)
_GRAM_MULT = np.uint64(0x9E3779B97F4A7C15)


def _gram_coeffs(k: int) -> np.ndarray:
    c = np.empty(k, dtype=np.uint64)
    c[0] = np.uint64(1)
    with np.errstate(over="ignore"):  # wrapping uint64 is the point
        for i in range(1, k):
            c[i] = c[i - 1] * _GRAM_MULT
    return c


def _roll_grams(wh: np.ndarray, k: int) -> np.ndarray:
    """Combine k consecutive word hashes into gram hashes (wrapping uint64);
    for < k words, combine what exists into one gram."""
    coef = _gram_coeffs(k)
    if len(wh) < k:
        return (wh * coef[: len(wh)]).sum(keepdims=True, dtype=np.uint64)
    n = len(wh) - k + 1
    g = np.zeros(n, dtype=np.uint64)
    for i in range(k):
        g += wh[i : i + n] * coef[i]
    return g


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles → deterministic 64-bit hashes via rolling
    word-hash combination (same scheme as the batched ``MinHasher``, so
    candidate generation and exact-Jaccard verification agree)."""
    words = text.split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    wh = pd.util.hash_array(np.asarray(words, dtype=object))
    return np.unique(_roll_grams(wh, k))


def _shingle_hashes_batch(texts: pd.Series, k: int = 3) -> list[np.ndarray]:
    """Batch-vectorized ``_shingle_hashes``: one explode + one hash_array +
    one rolling-gram pass for the whole frame, split per doc at the end —
    identical output (sorted unique gram hashes per doc), no per-doc Python
    in the payload hot path."""
    texts = texts.reset_index(drop=True)
    n = len(texts)
    empty = np.empty(0, dtype=np.uint64)
    out: list[np.ndarray] = [empty] * n
    words = texts.str.split().explode().dropna()
    if len(words) == 0:
        return out
    doc = words.index.to_numpy()
    wh = pd.util.hash_array(words.to_numpy(dtype=object))
    if len(wh) >= k:
        g = np.zeros(len(wh) - k + 1, dtype=np.uint64)
        coef = _gram_coeffs(k)
        for i in range(k):
            g += wh[i : i + len(g)] * coef[i]
        valid = doc[: len(g)] == doc[k - 1 :]
        g, gd = g[valid], doc[: len(g)][valid]
    else:
        g = np.empty(0, dtype=np.uint64)
        gd = np.empty(0, dtype=np.int64)
    lens = np.bincount(doc, minlength=n)
    short = np.flatnonzero((lens > 0) & (lens < k))
    if len(short):
        starts_w = np.searchsorted(doc, short)
        sg = [_roll_grams(wh[s : s + lens[d]], k)[0] for s, d in zip(starts_w, short)]
        g = np.concatenate([g, np.asarray(sg, dtype=np.uint64)])
        gd = np.concatenate([gd, short])
    if len(g) == 0:
        return out
    order = np.lexsort((g, gd))
    g, gd = g[order], gd[order]
    keep = np.concatenate(([True], (gd[1:] != gd[:-1]) | (g[1:] != g[:-1])))
    g, gd = g[keep], gd[keep]
    starts = np.flatnonzero(np.concatenate(([True], gd[1:] != gd[:-1])))
    ends = np.append(starts[1:], len(gd))
    for s, e in zip(starts, ends):
        out[gd[s]] = g[s:e]
    return out


def _shingles(text: str, k: int = 3) -> set[int]:
    return set(_shingle_hashes(text, k).tolist())


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    # multiply-shift (Dietzfelbinger) family: odd 64-bit multiplier + offset,
    # top 31 bits kept. No modulo — uint64 % prime is the hot op at scale.
    a = rng.integers(1, 1 << 62, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 62, size=num_perm, dtype=np.uint64)
    return a, b


def _minhash_sig(sh, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = sh if isinstance(sh, np.ndarray) else np.fromiter(sh, dtype=np.uint64)
    if len(x) == 0:
        return np.full(len(a), np.uint64(P31), dtype=np.uint64)
    # wrapping multiply-shift: (a*x + b) >> 33 keeps the top 31 bits, so the
    # empty-set sentinel P31 = 2^31 - 1 is the maximum attainable value
    vals = (a[:, None] * x[None, :] + b[:, None]) >> np.uint64(33)
    return vals.min(axis=1)


class MinHasher:
    """Per-batch minhash signatures → exploded LSH band rows, fully
    vectorized: words exploded once per batch (`Series.explode` +
    `hash_array`), k-gram shingles by rolling word-hash combination,
    per-doc signature minima via `np.minimum.reduceat` over doc segments,
    band hashes as wrapping polynomials over signature segments (an LSH
    bucket key only needs segment-equality ⇒ any injective-enough mix
    works; spurious collisions are killed by the exact-Jaccard verify).

    Stateful actor: permutation params generated once per actor (identical
    across actors — seeded)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        self.a, self.b = _minhash_params(num_perm)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k
        self.band_coef = _gram_coeffs(self.rows_per_band)

    def _signatures(self, texts: pd.Series) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix."""
        n = len(texts)
        sig = np.full((n, self.num_perm), np.uint64(P31), dtype=np.uint64)
        words = texts.str.split().explode().dropna()
        if len(words) == 0:
            return sig
        doc_flat = words.index.to_numpy()  # positional row index per word
        wh = pd.util.hash_array(words.to_numpy(dtype=object))
        k = self.k
        # rolling grams across the flat word array; drop windows that cross
        # doc boundaries
        if len(wh) >= k:
            g = np.zeros(len(wh) - k + 1, dtype=np.uint64)
            coef = _gram_coeffs(k)
            for i in range(k):
                g += wh[i : i + len(g)] * coef[i]
            valid = doc_flat[: len(g)] == doc_flat[k - 1 :]
            g, gd = g[valid], doc_flat[: len(g)][valid]
        else:
            g = np.empty(0, dtype=np.uint64)
            gd = np.empty(0, dtype=np.int64)
        # docs with < k words fall back to one whole-doc gram
        lens = np.bincount(doc_flat, minlength=n)
        short = np.flatnonzero((lens > 0) & (lens < k))
        if len(short):
            sg = []
            starts = np.searchsorted(doc_flat, short)
            for s, d in zip(starts, short):
                sg.append(_roll_grams(wh[s : s + lens[d]], k)[0])
            g = np.concatenate([g, np.asarray(sg, dtype=np.uint64)])
            gd = np.concatenate([gd, short])
        if len(g) == 0:
            return sig
        # dedupe (doc, gram) and segment per doc
        order = np.lexsort((g, gd))
        g, gd = g[order], gd[order]
        keep = np.concatenate(([True], (gd[1:] != gd[:-1]) | (g[1:] != g[:-1])))
        g, gd = g[keep], gd[keep]
        starts = np.flatnonzero(np.concatenate(([True], gd[1:] != gd[:-1])))
        # per-doc minima, one permutation at a time into a REUSED buffer:
        # a (num_perm, G) broadcast materializes num_perm fresh G-sized
        # temporaries, and first-touch page faults dominate on this host —
        # the loop does the same flops with O(G) resident memory
        mins = np.empty((self.num_perm, len(starts)), dtype=np.uint64)
        tmp = np.empty(len(g), dtype=np.uint64)
        s33 = np.uint64(33)
        for pi in range(self.num_perm):
            np.multiply(g, self.a[pi], out=tmp)
            np.add(tmp, self.b[pi], out=tmp)
            np.right_shift(tmp, s33, out=tmp)
            mins[pi] = np.minimum.reduceat(tmp, starts)
        sig[gd[starts]] = mins.T
        return sig

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].reset_index(drop=True)
        sig = self._signatures(texts)
        n = len(batch)
        seg = sig.reshape(n, self.bands, self.rows_per_band)
        bh = (seg * self.band_coef).sum(axis=2, dtype=np.uint64)  # wrapping mix
        bh ^= bh >> np.uint64(29)
        bh = (bh * _GRAM_MULT) >> np.uint64(1)  # fits int64
        return pd.DataFrame(
            {
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), self.bands),
                "band": np.tile(np.arange(self.bands, dtype=np.int64), n),
                "band_hash": bh.reshape(-1).astype(np.int64),
            }
        )


def _pairs_from_buckets(
    rows_ds: rd.Dataset,
    bucket_keys: list[str],
    id_col: str,
    num_partitions: int | None = None,
    max_bucket: int = 256,
    global_dedup: bool = True,
) -> rd.Dataset:
    """(bucket, id) rows → deduped candidate (a, b) pairs, fully distributed.

    Both wide steps hash-bucket their key into ``num_partitions`` coarse
    groups and do the real per-key work vectorized in pandas INSIDE each
    group: Ray group counts stay bounded (group-count-proportional engine
    overhead measured ~50s for a 22k-group ``aggregate`` at sf0.01), while
    all rows of one bucket / one pair still meet in one group.

      stage 1: groupby(hash(bucket) % NP).map_groups → per-bucket pair emit
               (only multi-member buckets emit; partition-local dedup)
      stage 2: groupby(hash(a,b) % NP).map_groups → global pair dedup
               (a pair found by several bands lands in ONE group)

    The shuffles move only key/id rows, never payloads. ``max_bucket`` is
    the HOT-BUCKET CAP (standard in production LSH dedup): a bucket larger
    than this means the band carries no discriminating information for that
    cluster, and emitting its O(n²) pairs would dominate the job. Over-cap
    buckets emit STAR pairs against the bucket's min id instead — O(n) pairs
    that preserve cluster membership. This matters precisely for exact-dup
    clusters (identical signatures ⇒ every band bucket is the whole cluster):
    skipping outright would lose the cluster entirely, because no band of an
    exact dup is ever discriminating. Lazy: callers decide when to
    ``materialize()``.

    ``num_partitions=None`` (default) data-sizes the partition count from
    the source bytes (8x damped: band rows are short key/id tuples, a small
    fraction of the source text bytes they derive from) so per-group memory
    stays bounded at 100-TB inputs instead of a fixed 32."""
    if num_partitions is None:
        from ..bucket import _TARGET_BUCKET_BYTES, auto_buckets

        num_partitions = auto_buckets(rows_ds, target_bytes=8 * _TARGET_BUCKET_BYTES)

    def add_pkey(batch: pd.DataFrame) -> pd.DataFrame:
        key = batch[bucket_keys[0]].to_numpy().astype(np.uint64)
        for k in bucket_keys[1:]:
            key = key * np.uint64(1_000_003) + batch[k].to_numpy().astype(np.uint64)
        batch = batch[[id_col] + bucket_keys].copy()
        batch["_pkey"] = (pd.util.hash_array(key) % num_partitions).astype(np.int64)
        return batch

    def emit_partition(g: pd.DataFrame) -> pd.DataFrame:
        outs_a: list[np.ndarray] = []
        outs_b: list[np.ndarray] = []
        for _, grp in g.groupby(bucket_keys, sort=False):
            ids = np.unique(grp[id_col].to_numpy())
            if len(ids) < 2:
                continue
            if len(ids) > max_bucket:
                # degenerate (hot) bucket: star pairs vs the min id keep the
                # cluster connected at O(n) cost — exact-dup clusters land
                # here by construction (every member pairs with the
                # representative; verify confirms each edge independently)
                outs_a.append(np.full(len(ids) - 1, ids[0], dtype=ids.dtype))
                outs_b.append(ids[1:])
                continue
            ii, jj = np.triu_indices(len(ids), k=1)
            outs_a.append(ids[ii])
            outs_b.append(ids[jj])
        if not outs_a:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
        u = np.unique(
            np.stack([np.concatenate(outs_a), np.concatenate(outs_b)], axis=1), axis=0
        )
        return pd.DataFrame({"a": u[:, 0], "b": u[:, 1]})

    def add_pair_pkey(batch: pd.DataFrame) -> pd.DataFrame:
        key = batch["a"].to_numpy().astype(np.uint64) * np.uint64(
            2_654_435_761
        ) + batch["b"].to_numpy().astype(np.uint64)
        batch = batch.copy()
        batch["_pkey"] = (pd.util.hash_array(key) % num_partitions).astype(np.int64)
        return batch

    def dedup_partition(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    pairs = (
        rows_ds.map_batches(add_pkey, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(emit_partition, batch_format="pandas")
    )
    if not global_dedup:
        # caller's next shuffle keys on `a`, which co-locates every copy of a
        # pair (same (a,b) from several bands), so the global dedup can fold
        # into that stage (`_attach_payload(dedup_pair_cols=...)`) — one
        # fewer all-to-all. Pair rows carry only two int64s; the ≤ #bands
        # duplication factor in the interim dataset is cheap.
        return pairs
    return (
        pairs.map_batches(add_pair_pkey, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(dedup_partition, batch_format="pandas")
    )


def _pair_vbucket(a: np.ndarray, b: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic verify-bucket id for a pair — computed identically where
    demand rows are emitted and where pair rows are tagged, so both meet."""
    key = a.astype(np.uint64) * np.uint64(2_654_435_761) + b.astype(np.uint64)
    return (pd.util.hash_array(key) % num_buckets).astype(np.int64)


def _route_verify(
    pairs_ds: rd.Dataset,
    src_ds: rd.Dataset,
    carry: dict[str, Any],
    payload_fn: Callable[[pd.DataFrame], Any],
    verify_fn: Callable[[pd.DataFrame], pd.DataFrame],
    payload_fill: Any = b"",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Fused shuffle-join verify — TWO all-to-alls, the structural minimum
    for "co-locate each candidate pair with both members' payloads".

    Replaces the former 3-shuffle chain (doc-id semi-join → attach payload
    on ``a`` → attach on ``b``):

      stage R (keyed by doc_id): each pair emits two DEMAND rows
        ``(doc, verify_bucket)`` (deduped per batch); ``src_ds`` rows meet
        them in the doc's hash bucket; payloads are computed ONCE per doc
        (``payload_fn``, vectorized over the selected src rows) and routed —
        one copy per distinct (doc, verify_bucket) — to where their pairs
        will be verified.
      stage V (keyed by pair hash): every copy of a pair lands in one bucket
        (global pair dedup folds in here — no dedicated dedup exchange), both
        payloads arrive by construction, and ``verify_fn`` runs vectorized
        per group on columns ``a, b, _pay_a, _pay_b``.

    Nothing driver-side grows with the corpus OR the candidate count; the
    shuffled payload volume is one copy per pair side, same as the unfused
    chain, minus the dedicated pair-dedup and semi-join exchanges.

    ``carry`` maps each ``src_ds`` column ``payload_fn`` needs (beyond
    doc_id) to the placeholder the demand side is padded with — union
    branches must keep identical schemas/dtypes. ``verify_fn`` must handle
    the empty frame (fixed output columns).

    ``num_buckets=None`` (default) data-sizes the bucket count from the
    payload-source bytes: stage R shuffles full payloads, so per-bucket
    memory tracks source/num_buckets directly."""
    if num_buckets is None:
        from ..bucket import auto_buckets

        num_buckets = auto_buckets(src_ds)

    cols_r = ["doc_id", "_vb"] + list(carry) + ["_side", "_pkey"]

    def tag_demand(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy().astype(np.int64)
        b = df["b"].to_numpy().astype(np.int64)
        vb = _pair_vbucket(a, b, num_buckets)
        out = pd.DataFrame(
            {"doc_id": np.concatenate([a, b]), "_vb": np.concatenate([vb, vb])}
        ).drop_duplicates()
        for c, fill in carry.items():
            out[c] = [fill] * len(out) if isinstance(fill, bytes) else fill
        out["_side"] = np.int64(0)
        out["_pkey"] = (
            pd.util.hash_array(out["doc_id"].to_numpy()) % num_buckets
        ).astype(np.int64)
        return out[cols_r]

    def tag_src(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id"] + list(carry)].copy()
        out["_vb"] = np.int64(-1)
        out["_side"] = np.int64(1)
        out["_pkey"] = (
            pd.util.hash_array(out["doc_id"].to_numpy()) % num_buckets
        ).astype(np.int64)
        return out[cols_r]

    def route(g: pd.DataFrame) -> pd.DataFrame:
        dem = g.loc[g["_side"] == 0, ["doc_id", "_vb"]].drop_duplicates()
        sel = g[(g["_side"] == 1) & g["doc_id"].isin(dem["doc_id"].unique())]
        if not len(sel) or not len(dem):
            return pd.DataFrame(
                {"_vb": np.empty(0, np.int64), "doc_id": np.empty(0, np.int64),
                 "_pay": pd.Series([], dtype=object)}
            )
        pay = pd.DataFrame(
            {"doc_id": sel["doc_id"].to_numpy(), "_pay": payload_fn(sel)}
        )
        out = dem.merge(pay, on="doc_id")
        return out[["_vb", "doc_id", "_pay"]]

    routed = (
        pairs_ds.map_batches(tag_demand, batch_format="pandas")
        .union(src_ds.map_batches(tag_src, batch_format="pandas"))
        .groupby("_pkey")
        .map_groups(route, batch_format="pandas")
    )

    def tag_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy().astype(np.int64)
        b = df["b"].to_numpy().astype(np.int64)
        out = pd.DataFrame({"a": a, "b": b})
        out["doc_id"] = np.int64(-1)
        out["_pay"] = (
            [payload_fill] * len(df) if isinstance(payload_fill, bytes) else payload_fill
        )
        out["_side"] = np.int64(0)
        out["_pkey"] = _pair_vbucket(a, b, num_buckets)
        return out

    def tag_routed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "a": np.full(len(df), -1, dtype=np.int64),
                "b": np.full(len(df), -1, dtype=np.int64),
                "doc_id": df["doc_id"].to_numpy(),
                "_pay": df["_pay"].to_numpy(),
            }
        )
        out["_side"] = np.int64(1)
        out["_pkey"] = df["_vb"].to_numpy()
        return out

    def join_verify(g: pd.DataFrame) -> pd.DataFrame:
        pg = g.loc[g["_side"] == 0, ["a", "b"]].drop_duplicates()
        pl = g.loc[g["_side"] == 1, ["doc_id", "_pay"]]
        m = pg.merge(
            pl.rename(columns={"doc_id": "a", "_pay": "_pay_a"}), on="a"
        ).merge(pl.rename(columns={"doc_id": "b", "_pay": "_pay_b"}), on="b")
        return verify_fn(m)

    return (
        pairs_ds.map_batches(tag_pairs, batch_format="pandas")
        .union(routed.map_batches(tag_routed, batch_format="pandas"))
        .groupby("_pkey")
        .map_groups(join_verify, batch_format="pandas")
    )


_EMPTY_JACCARD = pa.table(
    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
     "jaccard": pa.array([], pa.float64()),
     "containment": pa.array([], pa.float64())}
)

# verified-candidate cache: the expensive part of the pipeline (signatures,
# pair-emit, route, exact-Jaccard verify) is THRESHOLD-INDEPENDENT, and two
# public operators consume it (pair listing + near-dup removal, possibly at
# different thresholds). Keyed on source-file identity (path, mtime, size) +
# LSH params; holds small verified tables (one row per candidate pair).
_VERIFIED_CACHE: dict[tuple, pa.Table] = {}
_VERIFIED_CACHE_MAX = 8


def _source_key(sf_dir: str, table: str, *params: Any) -> tuple:
    p = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(p)
    return (os.path.abspath(p), st.st_mtime_ns, st.st_size) + params


def _cache_put(key: tuple, t: pa.Table) -> None:
    _VERIFIED_CACHE[key] = t
    while len(_VERIFIED_CACHE) > _VERIFIED_CACHE_MAX:
        _VERIFIED_CACHE.pop(next(iter(_VERIFIED_CACHE)))


def _minhash_verified(
    sf_dir: str, num_perm: int, bands: int, shingle_k: int
) -> pa.Table:
    """All LSH candidate pairs with their EXACT Jaccard (no threshold filter)
    — every stage distributed, verify via the fused 2-shuffle route join."""
    # a callable INSTANCE (not the class): Ray runs it as stateless tasks.
    # MinHasher state is ~1 KB of seeded permutation params, so shipping it
    # per task is free, while an actor pool would pay ~1 s of process spawn
    # per query invocation — the wrong trade for cheap-constructor stages
    # at any scale (heavy-init stages like model scoring keep the pool).
    bands_ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHasher(num_perm=num_perm, bands=bands, shingle_k=shingle_k),
        batch_format="pandas",
        batch_size=4096,  # signatures are batch-vectorized — bigger is better
    )

    # materialize the pair set (object store, not driver): it is consumed
    # twice (demand rows + verify input) and must not recompute the band
    # stage. Global pair dedup folds into the verify bucket (co-location).
    pairs_ds = _pairs_from_buckets(
        bands_ds, ["band", "band_hash"], "doc_id", global_dedup=False
    ).materialize()
    if pairs_ds.count() == 0:
        return _EMPTY_JACCARD

    def shingle_payload(sel: pd.DataFrame) -> list[bytes]:
        return [a.tobytes() for a in _shingle_hashes_batch(sel["text"], shingle_k)]

    def verify(m: pd.DataFrame) -> pd.DataFrame:
        jac = np.empty(len(m))
        cont = np.empty(len(m))
        for i, (ba, bb) in enumerate(zip(m["_pay_a"], m["_pay_b"])):
            sa = np.frombuffer(ba, dtype=np.uint64)
            sb = np.frombuffer(bb, dtype=np.uint64)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            jac[i] = 1.0 if union == 0 else inter / union
            # asymmetric CONTAINMENT of the smaller shingle set in the
            # larger (Broder'97): catches a short doc quoted verbatim
            # inside a long one, which Jaccard dilutes toward 0
            small = min(sa.size, sb.size)
            cont[i] = 1.0 if small == 0 else inter / small
        return pd.DataFrame(
            {
                "a": m["a"].to_numpy(dtype=np.int64),
                "b": m["b"].to_numpy(dtype=np.int64),
                "jaccard": np.round(jac, 6),
                "containment": np.round(cont, 6),
            }
        )

    verified = _route_verify(
        pairs_ds,
        _docs(sf_dir, ["doc_id", "text"]),
        {"text": ""},
        shingle_payload,
        verify,
    )
    t = _concat(verified)  # one row per candidate pair reaches the driver
    if t.num_rows == 0:
        return _EMPTY_JACCARD
    return t.take(
        pc.sort_indices(t, sort_keys=[("a", "ascending"), ("b", "ascending")])
    ).combine_chunks()


def minhash_lsh_pairs(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.7,
) -> pa.Table:
    """MinHash+LSH near-duplicate pairs with exact Jaccard verification.

    Every stage is distributed and the verify is a SHUFFLE JOIN, not a
    broadcast — nothing driver-side grows with the corpus OR the candidate
    count:

      signature+band explode (actor pool, seeded params in __init__)
      → groupby (band, band_hash) pair-emit (star pairs for hot buckets)
      → fused route/verify (``_route_verify``): payloads shuffled to the
        docs' hash buckets, computed once per doc, routed to per-pair verify
        buckets — 2 all-to-alls, global pair dedup folded in
      → exact-Jaccard per pair, vectorized per verify bucket.

    The one O(corpus) cost is the doc-keyed payload shuffle (text moved
    once); every later exchange is candidate-proportional and distributed.
    The verified candidate table (threshold-independent) is cached per
    source-file identity, so pair listing and near-dup removal at different
    thresholds share one computation. Rows-only oracle (no SQL form)."""
    key = _source_key(sf_dir, "documents", "minhash", num_perm, bands, shingle_k)
    t = _VERIFIED_CACHE.get(key)
    if t is None:
        t = _minhash_verified(sf_dir, num_perm, bands, shingle_k)
        _cache_put(key, t)
    return t.select(["a", "b", "jaccard"]).filter(
        pc.greater_equal(t.column("jaccard"), pa.scalar(float(jaccard_threshold)))
    ).combine_chunks()


def minhash_containment(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    containment_threshold: float = 0.8,
) -> pa.Table:
    """LSH candidate pairs whose smaller shingle set is >= threshold
    CONTAINED in the larger (Broder'97 containment) — the asymmetric
    near-dup detector (short doc quoted inside a long one; Jaccard dilutes
    such pairs toward 0 and misses them). Shares the cached verified-pair
    computation with ``minhash_lsh_pairs`` (one signature + route-verify
    pass serves both metrics). Rows-only oracle; planted pytest pins the
    quote-inside-document case.

    Honest recall note: candidates still come from MinHash-band LSH, whose
    collision probability tracks JACCARD — a tiny doc inside a huge one may
    never band-collide. At equal-ish sizes (the common curation case)
    recall matches the pairs query; a containment-optimal index would
    bucket by the smaller set's bands only."""
    key = _source_key(sf_dir, "documents", "minhash", num_perm, bands, shingle_k)
    t = _VERIFIED_CACHE.get(key)
    if t is None:
        t = _minhash_verified(sf_dir, num_perm, bands, shingle_k)
        _cache_put(key, t)
    return t.select(["a", "b", "containment"]).filter(
        pc.greater_equal(
            t.column("containment"), pa.scalar(float(containment_threshold))
        )
    ).combine_chunks()


# --- n-gram jaccard (exact, all-pairs within LSH buckets) ---------------------


def ngram_jaccard_dedup(sf_dir: str, threshold: float = 0.8, shingle_k: int = 3) -> pa.Table:
    """Docs surviving near-dup removal: drop every doc that has a
    higher-priority (lower doc_id) near-duplicate (LSH candidates + exact
    Jaccard ≥ threshold). Rows-only oracle.

    Scale shape: the drop set is CANDIDATE-proportional (30-50% of corpus
    ids at web dup rates), so it is NEVER broadcast — the dup ids enter the
    object store once as Dataset blocks and the removal is a bucketed
    ANTI-JOIN on doc_id (the ``dedup_incremental`` shape): both sides
    hash-shuffle to doc_id buckets, each bucket drops its own dups. Per-task
    memory is input/num_buckets, independent of the global dup count."""
    pairs = minhash_lsh_pairs(sf_dir, jaccard_threshold=threshold, shingle_k=shingle_k)
    # b > a always; b is the dup
    dup = rd.from_arrow(
        pa.table({"doc_id": pairs.column("b").cast(pa.int64()).combine_chunks()})
    ).map_batches(
        lambda b: b.assign(_dup=np.int8(1)), batch_format="pandas"
    )
    docs = _docs(sf_dir, ["doc_id"]).map_batches(
        lambda b: b.assign(_dup=np.int8(0)), batch_format="pandas"
    )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        dup_ids = g.loc[g["_dup"] == 1, "doc_id"]
        keep = g.loc[g["_dup"] == 0, ["doc_id"]]
        return keep[~keep["doc_id"].isin(set(dup_ids.to_numpy()))]

    from ..bucket import bucketed_apply

    t = _concat(bucketed_apply(docs.union(dup), ["doc_id"], anti))
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# --- simhash ------------------------------------------------------------------


class SimHasher:
    """64-bit simhash over unique word tokens, computed for a whole batch at
    once: explode words, hash vectorized, per-(doc, word) dedupe via
    lexsort, per-doc bit votes via ``add.reduceat`` over the unpacked bit
    matrix. No per-word Python in the hot path."""

    def __init__(self):
        pass

    @staticmethod
    def _batch_simhash(texts: pd.Series) -> np.ndarray:
        """(n,) uint64 simhash per text (0 for empty texts)."""
        n = len(texts)
        sig = np.zeros(n, dtype=np.uint64)
        words = texts.str.split().explode().dropna()
        if len(words) == 0:
            return sig
        doc = words.index.to_numpy()
        wh = pd.util.hash_array(words.to_numpy(dtype=object))
        # unique (doc, word-hash) pairs — simhash votes once per distinct word
        order = np.lexsort((wh, doc))
        doc, wh = doc[order], wh[order]
        keep = np.concatenate(([True], (doc[1:] != doc[:-1]) | (wh[1:] != wh[:-1])))
        doc, wh = doc[keep], wh[keep]
        bits = np.unpackbits(wh[:, None].view(np.uint8), axis=1)  # (W, 64)
        starts = np.flatnonzero(np.concatenate(([True], doc[1:] != doc[:-1])))
        ends = np.append(starts[1:], len(doc))
        # per-doc bit sums via slice loop: 2-D reduceat walks strided
        # columns (measured 2.8s for 116k x 64) while D short contiguous
        # sums cost microseconds each
        ones = np.empty((len(starts), 64), dtype=np.int64)
        for i in range(len(starts)):
            ones[i] = bits[starts[i] : ends[i]].sum(axis=0)
        counts = ends - starts
        majority = (2 * ones) > counts[:, None]  # vote: bit set iff sum(±1) > 0
        packed = np.packbits(majority.astype(np.uint8), axis=1)  # (D, 8) big-endian
        vals = packed.copy().view(">u8").reshape(-1).astype(np.uint64)
        sig[doc[starts]] = vals
        return sig

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sig = self._batch_simhash(batch["text"].reset_index(drop=True))
        # hex string: survives every (pandas / Arrow / driver-hash) round-trip
        # that a uint64 >= 2^63 would not
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "simhash": [f"{int(v):016x}" for v in sig],
            }
        )


def simhash_signatures(sf_dir: str) -> pa.Table:
    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pandas", batch_size=4096, concurrency=2
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


def simhash_near_dups(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs by simhash hamming distance — fully distributed.

    Candidates via 4×16-bit band buckets. Default ``max_hamming=3`` is the
    banding guarantee boundary (a pair within hamming ≤ 3 shares ≥ 1 of 4
    bands; wider distances need more bands — documented tradeoff). On
    clustered corpora (the synthetic docs share a small vocabulary) looser
    bounds are degenerate: at sf0.1, hamming ≤ 8 admits 2.6M of 12.5M
    possible pairs.

      signatures (actor pool) → materialize (8 B/doc, reused twice)
      → band explode → bucket groupby pair-emit
      → fused route/verify (``_route_verify``): candidate signatures
        shuffled by doc_id, routed to per-pair verify buckets, hamming
        computed vectorized per bucket — 2 all-to-alls, no candidate-keyed
        map on the driver or in a broadcast.

    Rows-only oracle."""
    sig_ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pandas", batch_size=4096, concurrency=2
    ).materialize()

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        sig = batch["simhash"].map(lambda h: int(h, 16)).to_numpy(dtype=np.uint64)
        n = len(sig)
        shifts = np.array([0, 16, 32, 48], dtype=np.uint64)
        bval = (sig[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), 4),
                "band": np.tile(np.arange(4, dtype=np.int64), n),
                "bval": bval.reshape(-1).astype(np.int64),
            }
        )

    bands_ds = sig_ds.map_batches(explode_bands, batch_format="pandas", batch_size=8192)
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "hamming": pa.array([], pa.int64())}
    )
    pairs_ds = _pairs_from_buckets(
        bands_ds, ["band", "bval"], "doc_id", global_dedup=False
    ).materialize()
    if pairs_ds.count() == 0:
        return empty

    def verify(m: pd.DataFrame) -> pd.DataFrame:
        if not len(m):
            return pd.DataFrame(
                {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
                 "hamming": np.empty(0, np.int64)}
            )
        sa = np.array([int(h, 16) for h in m["_pay_a"]], dtype=np.uint64)
        sb = np.array([int(h, 16) for h in m["_pay_b"]], dtype=np.uint64)
        x = (sa ^ sb).view(np.uint8).reshape(len(m), 8)
        ham = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)
        out = pd.DataFrame(
            {"a": m["a"].to_numpy(dtype=np.int64), "b": m["b"].to_numpy(dtype=np.int64),
             "hamming": ham}
        )
        return out[out["hamming"] <= max_hamming]

    verified = _route_verify(
        pairs_ds,
        sig_ds,
        {"simhash": ""},
        lambda sel: sel["simhash"].to_numpy(),
        verify,
        payload_fill="",
    )
    t = _concat(verified)
    if t.num_rows == 0:
        return empty
    return t.take(
        pc.sort_indices(t, sort_keys=[("a", "ascending"), ("b", "ascending")])
    ).combine_chunks()


# --- connected-components cluster assignment ----------------------------------


def cc_labels(
    edges: rd.Dataset,
    labels: rd.Dataset,
    max_rounds: int = 16,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Distributed connected components: min-label propagation with
    pointer-jumping over an ``edges`` Dataset (int columns ``src``/``dst``)
    and a ``labels`` Dataset (int columns ``node``/``label``, one row per
    node, initially label=node). Returns the converged labels Dataset.

    Each round routes every node's current label along all static edges
    (both directions) AND along the (v -> label(v)) pointer edges (both
    directions — contracting label chains, so rounds grow with LOG of the
    component diameter, not the diameter); new label = min received. One
    round = one bucketed route + one bucketed min-groupby — 2 all-to-alls
    over (node, label) int pairs, never payload data. Convergence is the
    (monotonically non-increasing) global label sum going unchanged;
    ``max_rounds`` caps adversarial graphs. Node ids must be >= 0 (-1 is
    the internal label-row marker)."""
    from ..bucket import bucketed_apply, bucketed_group_agg

    edges = edges.materialize()  # static across rounds; int pairs only

    def route(g: pd.DataFrame) -> pd.DataFrame:
        """Bucket keyed by src: label rows resolve L(src); edge rows emit
        the src's label to dst. Both edge orientations and both pointer
        orientations are materialized into the union upstream, so one
        directed route covers hash-to-min + pointer jumping."""
        is_lab = g["dst"].to_numpy() < 0
        lab = g.loc[is_lab].drop_duplicates("src").set_index("src")["label"]
        e = g.loc[~is_lab]
        out_lab = pd.DataFrame(
            {"node": lab.index.to_numpy(), "label": lab.to_numpy()}
        )
        sent = e["src"].map(lab).to_numpy()
        out_edge = pd.DataFrame({"node": e["dst"].to_numpy(), "label": sent})
        out = pd.concat([out_lab, out_edge], ignore_index=True)
        return out.dropna().astype({"node": np.int64, "label": np.int64})

    prev_sum = None
    for _ in range(max_rounds):
        lab_rows = labels.map_batches(
            lambda b: pd.DataFrame(
                {
                    # directed union: label row (src=node, dst=-1) + pointer
                    # edges node<->label (pointer-jumping contraction)
                    "src": np.concatenate(
                        [b["node"].to_numpy(), b["node"].to_numpy(), b["label"].to_numpy()]
                    ),
                    "dst": np.concatenate(
                        [
                            np.full(len(b), -1, np.int64),
                            b["label"].to_numpy(),
                            b["node"].to_numpy(),
                        ]
                    ),
                    "label": np.concatenate(
                        [b["label"].to_numpy(), np.full(2 * len(b), -1, np.int64)]
                    ),
                }
            ),
            batch_format="pandas",
        )
        edge_rows = edges.map_batches(
            lambda b: pd.DataFrame(
                {
                    "src": np.concatenate([b["src"].to_numpy(), b["dst"].to_numpy()]),
                    "dst": np.concatenate([b["dst"].to_numpy(), b["src"].to_numpy()]),
                    "label": np.full(2 * len(b), -1, np.int64),
                }
            ),
            batch_format="pandas",
        )
        routed = bucketed_apply(
            lab_rows.union(edge_rows), ["src"], route, num_buckets=num_buckets
        )
        labels = bucketed_group_agg(
            routed, ["node"], dict(label=("label", "min")), num_buckets=num_buckets
        ).materialize()
        s = int(labels.map_batches(
            lambda b: pd.DataFrame({"s": [int(b["label"].sum())]}),
            batch_format="pandas",
        ).sum("s"))
        if s == prev_sum:
            break
        prev_sum = s
    return labels


def _doc_id_labels(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id"]).map_batches(
        lambda b: pd.DataFrame(
            {"node": b["doc_id"].to_numpy(), "label": b["doc_id"].to_numpy()}
        ),
        batch_format="pandas",
    )


def dedup_clusters(
    sf_dir: str, max_rounds: int = 16, num_buckets: int | None = None
) -> pa.Table:
    """Assign every document a duplicate-CLUSTER id = min doc_id of its
    connected component in the duplicate graph — the step between pair
    emission (minhash/simhash/exact) and keep-one-per-cluster that a real
    dedup pipeline needs, since near-dup relations are not transitive and
    pairs chain (A~B, B~C but not A~C).

    Edges here come from exact-dup groups as CHAINS (consecutive doc_ids
    within each identical-text group), the worst multi-hop case: min-label
    information must propagate the full chain length, so this genuinely
    exercises distributed connected components (a star graph would converge
    in one round) while staying SQL-checkable (component == md5 group ==
    ``min(doc_id) OVER (PARTITION BY md5(text))``). The same propagation
    accepts any (a, b) pair set, e.g. ``minhash_lsh_pairs`` output.

    Propagation is ``cc_labels`` (hash-to-min + pointer-jumping; see its
    docstring for the round structure and convergence rule)."""
    from ..bucket import bucketed_apply

    def hash_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "md5": md5_hex(batch["text"].to_numpy(dtype=object)),
                "doc_id": batch["doc_id"].to_numpy(),
            }
        )

    def chain_edges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["md5", "doc_id"], kind="mergesort")
        d = g["doc_id"].to_numpy()
        same = g["md5"].to_numpy()[1:] == g["md5"].to_numpy()[:-1]
        return pd.DataFrame({"src": d[:-1][same], "dst": d[1:][same]})

    hashed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        hash_partial, batch_format="pandas", batch_size=8192
    )
    edges = bucketed_apply(hashed, ["md5"], chain_edges, num_buckets=num_buckets)
    labels = cc_labels(
        edges, _doc_id_labels(sf_dir), max_rounds=max_rounds, num_buckets=num_buckets
    )
    t = _concat(labels)
    t = pa.Table.from_arrays(
        [t.column("node").cast(pa.int64()), t.column("label").cast(pa.int64())],
        names=["doc_id", "cluster_id"],
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


DEDUP_CLUSTERS_SQL = """
SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS cluster_id
FROM documents
ORDER BY doc_id
"""


def near_dup_clusters(
    sf_dir: str,
    jaccard_threshold: float = 0.7,
    max_rounds: int = 16,
    num_buckets: int | None = None,
) -> pa.Table:
    """The end-to-end NEAR-dup pipeline composition: MinHash+LSH verified
    pairs -> distributed connected components -> per-doc (cluster_id, keep).

    Near-dup relations are NOT transitive (A~B, B~C need not imply A~C), so
    pairwise drop-the-higher-id (``ngram_jaccard_dedup``) and
    keep-one-per-component answer different questions; this one is the
    component form: every doc in a connected chain of near-dups collapses
    to one survivor (the component's min doc_id), which is what corpus
    curation usually wants (MinHashLSH dedup as in the Gopher/RefinedWeb
    pipelines). Approximate by LSH recall -> rows-only oracle; transitive
    folding pinned by a planted A~B~C chain test."""
    pairs = minhash_lsh_pairs(sf_dir, jaccard_threshold=jaccard_threshold)
    edges = rd.from_arrow(
        pa.Table.from_arrays(
            [pairs.column("a").cast(pa.int64()), pairs.column("b").cast(pa.int64())],
            names=["src", "dst"],
        )
    )
    labels = cc_labels(
        edges, _doc_id_labels(sf_dir), max_rounds=max_rounds, num_buckets=num_buckets
    )
    t = _concat(labels)
    doc = t.column("node").cast(pa.int64())
    lab = t.column("label").cast(pa.int64())
    t = pa.Table.from_arrays(
        [doc, lab, pc.equal(doc, lab)], names=["doc_id", "cluster_id", "keep"]
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# --- incremental (shard-vs-corpus) dedup --------------------------------------


def dedup_incremental(sf_dir: str, num_buckets: int | None = None) -> pa.Table:
    """Dedup a NEW shard against an EXISTING corpus in one shuffle: keep
    each new document only if its content never occurs in the existing
    corpus, and keep one survivor (min doc_id) among new-internal dups —
    the day-2 operation of every rolling web crawl (yesterday's corpus is
    immutable; today's shard must be deduped against it without re-reading
    it into the driver).

    The deterministic existing/new split here is doc_id parity (even =
    existing, odd = new) so the oracle is pure SQL; in production the two
    sides are two parquet directories unioned the same way.

    Shape: one pass, per-batch partial = one row per distinct md5 per
    batch carrying (min odd doc_id or NULL, any-even flag) -> hash-bucket
    by md5 -> per-group resolve (anti-join semantics: any even member
    kills the group). Shuffle volume <= one int+flag row per distinct
    content per batch; text never shuffles."""
    from ..bucket import bucketed_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "md5": md5_hex(batch["text"].to_numpy(dtype=object)),
                "doc_id": batch["doc_id"].to_numpy(),
            }
        )
        df["odd"] = df["doc_id"] % 2 == 1
        out = pd.DataFrame(
            {
                "min_odd": df["doc_id"].where(df["odd"]).groupby(df["md5"]).min(),
                "has_even": (~df["odd"]).groupby(df["md5"]).any(),
            }
        )
        out.index.name = "md5"
        return out.reset_index()

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("md5").agg(
            min_odd=("min_odd", "min"), has_even=("has_even", "any")
        )
        keep = agg[~agg["has_even"] & agg["min_odd"].notna()]
        return pd.DataFrame(
            {
                "doc_id": keep["min_odd"].to_numpy(dtype=np.int64),
                "md5": keep.index.to_numpy(dtype=object),
            }
        )

    parts = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )
    t = _concat(bucketed_apply(parts, ["md5"], resolve, num_buckets=num_buckets))
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


DEDUP_INCREMENTAL_SQL = """
SELECT min(doc_id) AS doc_id, md5(text) AS md5
FROM documents d
WHERE doc_id % 2 = 1
  AND NOT EXISTS (
    SELECT 1 FROM documents e WHERE e.doc_id % 2 = 0 AND e.text = d.text
  )
GROUP BY text
ORDER BY doc_id
"""


# --- quality-aware near-dup dedup (keep the BEST doc per cluster) --------------


def near_dup_keep_best(
    sf_dir: str,
    jaccard_threshold: float = 0.7,
    max_rounds: int = 16,
    num_buckets: int | None = None,
) -> pa.Table:
    """Near-dup cluster dedup that keeps the HIGHEST-QUALITY member per
    connected component (longest text, ties → min doc_id) instead of the
    min doc_id — the production curation rule: when a boilerplate-stripped
    page near-duplicates its full original, you keep the better copy, not
    the earlier-crawled one.

    Same distributed shape as ``near_dup_clusters`` (LSH pairs → connected
    components) plus one doc_id-bucketed join attaching ``n_chars`` and one
    cluster-bucketed vectorized argmax. Nothing driver-side grows with the
    corpus until the final result table. Rows-only (LSH recall); pinned by
    a planted chain where the longest member is NOT the min id."""
    from ..bucket import bucketed_apply

    pairs = minhash_lsh_pairs(sf_dir, jaccard_threshold=jaccard_threshold)
    edges = rd.from_arrow(
        pa.Table.from_arrays(
            [pairs.column("a").cast(pa.int64()), pairs.column("b").cast(pa.int64())],
            names=["src", "dst"],
        )
    )
    labels = cc_labels(
        edges, _doc_id_labels(sf_dir), max_rounds=max_rounds, num_buckets=num_buckets
    )

    def tag_lab(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["node"].to_numpy(dtype=np.int64),
                "cluster_id": b["label"].to_numpy(dtype=np.int64),
                "n_chars": np.int64(-1),
                "_side": np.int64(0),
            }
        )

    def tag_len(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(dtype=np.int64),
                "cluster_id": np.int64(-1),
                "n_chars": b["n_chars"].to_numpy(dtype=np.int64),
                "_side": np.int64(1),
            }
        )

    both = labels.map_batches(tag_lab, batch_format="pandas").union(
        _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(tag_len, batch_format="pandas")
    )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["_side"] == 0][["doc_id", "cluster_id"]]
        ln = g[g["_side"] == 1][["doc_id", "n_chars"]]
        return lab.merge(ln, on="doc_id", how="left")

    joined = bucketed_apply(both, ["doc_id"], attach, num_buckets=num_buckets)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-cluster argmax(n_chars), tie-break min doc_id:
        # one lexsort, first row per cluster wins
        order = np.lexsort(
            (
                g["doc_id"].to_numpy(dtype=np.int64),
                -g["n_chars"].to_numpy(dtype=np.int64),
                g["cluster_id"].to_numpy(dtype=np.int64),
            )
        )
        cl = g["cluster_id"].to_numpy(dtype=np.int64)[order]
        first = np.concatenate(([True], cl[1:] != cl[:-1]))
        keep = np.zeros(len(g), dtype=bool)
        keep[order[first]] = True
        out = g.copy()
        out["keep"] = keep
        return out[["doc_id", "cluster_id", "n_chars", "keep"]]

    t = _concat(bucketed_apply(joined, ["cluster_id"], pick, num_buckets=num_buckets))
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# --- exact substring-duplication spans (Lee et al. 2022) -------------------------


def dup_spans(
    sf_dir: str, width: int = 64, stride: int = 32, k: int = 8
) -> pa.Table:
    """Per-document count of fixed-width character windows that appear
    VERBATIM in at least one other document — the signal behind exact
    substring deduplication ("Deduplicating Training Data Makes Language
    Models Better", Lee et al. 2022: repeated 50+-token spans are memorized
    disproportionately; here the suffix-array is replaced by a
    shuffle-friendly sampled-window equivalent).

    Windows are CONTENT-ANCHORED (0-mod-p sampling, the winnowing family —
    Schleimer et al. 2003): position s starts a window iff
    md5(text[s : s+k]) ≡ 0 (mod ``stride``). Anchors are a function of
    LOCAL CONTENT only, so a span duplicated at ANY offset of another doc
    anchors at the same in-span positions — unlike a doc-relative strided
    grid, which only sees duplication whose offsets agree mod stride
    (~1/stride of shifted duplication). Expected window rate is 1/stride,
    i.e. the same shuffle volume as the grid it replaces; a shared span of
    length L contains an anchor with prob ≈ 1-(1-1/stride)^(L-width+k).

    Shape (2 shuffles, no broadcast, no driver state):
      1. explode each doc into anchored windows — per batch ONE DuckDB
         query (C-vectorized substr/md5 over zero-copy Arrow, the
         ``hashutil.md5_hex`` idiom), bit-identical to the oracle's anchor
         predicate by construction;
      2. hash-shuffle on the WINDOW TEXT: all verbatim copies meet in one
         bucket, a per-bucket distinct-doc count flags cross-doc windows
         EXACTLY (strings compared, not hashes — no collision caveat), and
         the bucket collapses to per-doc (n_windows, n_dup) partials;
      3. one tiny doc-keyed reduce sums the partials.
    Docs with no anchored window are absent from the output (the SQL
    oracle's join shape)."""
    from ..bucket import bucketed_apply, bucketed_group_agg

    def explode_windows(batch: pa.Table) -> pd.DataFrame:
        import duckdb

        lens = pc.utf8_length(batch.column("text"))
        maxlen = pc.max(lens).as_py() if batch.num_rows else None
        if not maxlen or maxlen < width:
            return pd.DataFrame(
                {"doc_id": np.empty(0, np.int64), "win": np.empty(0, object)}
            )
        d = batch  # noqa: F841 - referenced by the DuckDB query below
        return duckdb.sql(
            f"""
            SELECT d.doc_id, substr(d.text, CAST(g.s AS INTEGER), {width}) AS win
            FROM d JOIN generate_series(1, {maxlen}) AS g(s)
              ON g.s <= length(d.text) - {width - 1}
            WHERE CAST(('0x' || left(
                      md5(substr(d.text, CAST(g.s AS INTEGER), {k})), 8))
                    AS BIGINT) % {stride} = 0
            """
        ).df()

    def flag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        nun = g.groupby("win")["doc_id"].transform("nunique")
        df = pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(np.int64),
             "dup": (nun > 1).to_numpy(np.int64)}
        )
        return df.groupby("doc_id", as_index=False).agg(
            n_windows=("dup", "size"), n_dup_windows=("dup", "sum")
        )

    wins = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode_windows, batch_format="pyarrow", batch_size=32768
    )
    parts = bucketed_apply(wins, ["win"], flag_bucket)
    out = _concat(
        bucketed_group_agg(
            parts,
            ["doc_id"],
            {"n_windows": ("n_windows", "sum"), "n_dup_windows": ("n_dup_windows", "sum")},
            num_buckets=8,
        )
    )
    res = pa.table(
        {
            "doc_id": out.column("doc_id").cast(pa.int64()),
            "n_windows": out.column("n_windows").cast(pa.int64()),
            "n_dup_windows": out.column("n_dup_windows").cast(pa.int64()),
        }
    )
    return res.take(pc.sort_indices(res, sort_keys=[("doc_id", "ascending")]))


# static series bound: the driver's synthetic docs are well under 32 Ki
# chars (DuckDB <=1.1 rejects lateral column bounds in generate_series)
DUP_SPANS_SQL = """
WITH w AS (
  SELECT d.doc_id, substr(d.text, CAST(g.s AS INTEGER), 64) AS win
  FROM documents d JOIN generate_series(1, 32768) AS g(s)
    ON g.s <= d.n_chars - 63
  WHERE CAST(('0x' || left(md5(substr(d.text, CAST(g.s AS INTEGER), 8)), 8))
          AS BIGINT) % 32 = 0
),
dupwin AS (
  SELECT win FROM w GROUP BY win HAVING count(DISTINCT doc_id) > 1
)
SELECT w.doc_id,
       count(*) AS n_windows,
       count(*) FILTER (WHERE w.win IN (SELECT win FROM dupwin)) AS n_dup_windows
FROM w GROUP BY 1 ORDER BY 1
"""


# --- incremental NEAR-dup: new shard vs immutable corpus ----------------------


def near_dup_incremental(
    sf_dir: str, jaccard_threshold: float = 0.7, num_buckets: int | None = None
) -> pa.Table:
    """NEAR-duplicate dedup of a NEW shard against an EXISTING corpus — the
    day-2 MinHash operation of a rolling crawl (``dedup_incremental`` is
    the exact-hash form; real crawls also need today's near-rewrites of
    yesterday's pages dropped). Split is doc_id parity (even = existing
    corpus, odd = new shard), matching ``dedup_incremental``'s convention.

    A new document survives iff it has NO verified near-dup (exact Jaccard
    >= threshold on the LSH candidates) in the existing corpus AND no
    lower-id near-dup within the new shard.

    Scale shape: rides the fully distributed ``minhash_lsh_pairs``
    (signatures -> band buckets -> shuffle-join verify; the threshold-
    independent verified-pair cache is shared with the other minhash
    consumers); per verified pair the doomed id is computed vectorized
    (parity rules, no chain logic); removal is the bucketed ANTI-JOIN on
    doc_id — doomed ids enter the object store as Dataset blocks, never a
    driver broadcast. Rows-only oracle (LSH recall); pinned by the planted
    corpus-dup / in-shard-dup / fresh-doc pytest."""
    from ..bucket import bucketed_apply

    pairs = minhash_lsh_pairs(sf_dir, jaccard_threshold=jaccard_threshold)
    a = pairs.column("a").cast(pa.int64()).to_numpy()
    b = pairs.column("b").cast(pa.int64()).to_numpy()
    a_odd = (a % 2) == 1
    b_odd = (b % 2) == 1
    # even-even pairs doom nothing (the corpus is immutable); odd-even dooms
    # the odd side; odd-odd dooms the larger id (b: pairs are a<b)
    doomed = np.concatenate(
        [a[a_odd & ~b_odd], b[b_odd & ~a_odd], b[a_odd & b_odd]]
    )
    dup = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.unique(doomed), pa.int64())})
    ).map_batches(lambda t: t.assign(_dup=np.int8(1)), batch_format="pandas")
    new_docs = _docs(sf_dir, ["doc_id"]).map_batches(
        lambda t: t[t["doc_id"] % 2 == 1].assign(_dup=np.int8(0)),
        batch_format="pandas",
    )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        dup_ids = g.loc[g["_dup"] == 1, "doc_id"]
        keep = g.loc[g["_dup"] == 0, ["doc_id"]]
        return keep[~keep["doc_id"].isin(set(dup_ids.to_numpy()))]

    t = _concat(
        bucketed_apply(new_docs.union(dup), ["doc_id"], anti, num_buckets=num_buckets)
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# --- winnowing fingerprints (MOSS-style positional near-dup) -------------------


def _winnow_doc(b: np.ndarray, k: int, w: int) -> np.ndarray:
    """Winnowing fingerprint selection for ONE document's byte array
    (Schleimer, Wilkerson & Aiken, SIGMOD'03): k-byte-gram rolling hashes,
    then the minimum of every w-hash window (leftmost tie — any selection
    that is a pure function of window content preserves the guarantee that
    two documents sharing a substring of >= w+k-1 bytes share >= 1
    fingerprint). Returns the UNIQUE selected hashes. All-numpy: k vector
    multiply-adds for the gram hashes, one strided-view argmin for the
    window minima — no per-char Python."""
    n = len(b) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    h = np.zeros(n, dtype=np.uint64)
    B = np.uint64(1000003)
    for j in range(k):
        h = h * B + b[j : j + n].astype(np.uint64)
    # mix: distinct grams should not collide on low bytes (splitmix-ish)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    if n <= w:
        return np.unique(h[h.argmin() : h.argmin() + 1])
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    pos = np.arange(len(win)) + win.argmin(axis=1)
    return np.unique(h[np.unique(pos)])


def winnow_pairs(
    sf_dir: str, k: int = 8, w: int = 4, min_shared: int = 2, df_cap: int = 64
) -> pa.Table:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints —
    POSITIONAL near-duplication (shared verbatim passages: plagiarism,
    quotation, boilerplate reuse), complementary to MinHash's bag-of-
    shingles similarity which is blind to contiguity.

    Scale shape (the LSH-pairs shape, with counting semantics):

      per-batch numpy fingerprint extraction → explode (fp, doc_id) rows
      → groupby fp buckets: per-fingerprint pair emit, with a DF CAP —
        fingerprints appearing in > ``df_cap`` docs are dropped as
        non-discriminative boilerplate (the standard MOSS/index stopword
        rule; a cap keeps any one bucket from emitting O(n^2) pairs)
      → groupby (a, b) buckets: count distinct shared fingerprints,
        filter >= min_shared.

    Both all-to-alls move (hash, id) integer rows only — never text — and
    per-task memory is bucket-proportional. Rows-only oracle (no SQL
    form); the w+k-1 shared-substring guarantee is pinned by a planted
    pytest."""
    from ..bucket import bucketed_apply, bucketed_group_agg

    def extract(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        out_fp: list[np.ndarray] = []
        out_id: list[np.ndarray] = []
        for i, txt in enumerate(texts):
            fps = _winnow_doc(
                np.frombuffer(txt.encode("utf-8", "surrogatepass"), dtype=np.uint8),
                k,
                w,
            )
            if len(fps):
                out_fp.append(fps)
                out_id.append(np.full(len(fps), ids[i], dtype=np.int64))
        if not out_fp:
            return pa.table(
                {"fp": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "fp": pa.array(
                    np.concatenate(out_fp).view(np.int64), pa.int64()
                ),
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
            }
        )

    rows = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        extract, batch_format="pyarrow", batch_size=2048
    )

    def pair_emit(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _fp, grp in g.groupby("fp"):
            ids = np.unique(grp["doc_id"].to_numpy(dtype=np.int64))
            if len(ids) < 2 or len(ids) > df_cap:
                continue
            ai, bi = np.triu_indices(len(ids), 1)
            outs.append(pd.DataFrame({"a": ids[ai], "b": ids[bi]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    pairs = bucketed_apply(rows, ["fp"], pair_emit)
    counted = bucketed_group_agg(
        pairs.map_batches(
            lambda d: d.assign(n_shared=np.int64(1)), batch_format="pandas"
        ),
        ["a", "b"],
        dict(n_shared=("n_shared", "sum")),
    )
    t = _concat(counted)
    if t.num_rows == 0:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
            }
        )
    t = t.filter(pc.greater_equal(t.column("n_shared"), pa.scalar(min_shared)))
    t = pa.table(
        {
            "a": t.column("a").cast(pa.int64()),
            "b": t.column("b").cast(pa.int64()),
            "n_shared": t.column("n_shared").cast(pa.int64()),
        }
    )
    return t.take(
        pc.sort_indices(t, sort_keys=[("a", "ascending"), ("b", "ascending")])
    )
