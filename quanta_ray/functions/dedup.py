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

All candidate generation is per-batch vectorized; pair verification
re-reads only candidate docs (broadcast of the candidate id set).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

MERSENNE = (1 << 61) - 1


def _docs(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


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
        batch["md5"] = batch["text"].map(lambda s: hashlib.md5(s.encode()).hexdigest())
        # per-batch partial: one survivor per md5 per batch
        return batch.groupby("md5", as_index=False)["doc_id"].min()

    from ray.data.aggregate import Min

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(add_hash, batch_format="pandas", batch_size=8192)
        .repartition(8)
        .groupby("md5")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )
    t = _concat(out).select(["doc_id", "md5"])
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, md5(text) AS md5
FROM documents
GROUP BY md5(text)
ORDER BY doc_id
"""


# --- minhash machinery (shared with LSH) --------------------------------------


P31 = (1 << 31) - 1  # 31-bit prime field: a*x+b fits uint64, fully vectorized


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles → deterministic 31-bit hashes (vectorized
    ``pandas.util.hash_array`` over the gram strings)."""
    words = text.split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    if len(words) < k:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    h = pd.util.hash_array(np.asarray(grams, dtype=object))
    return np.unique(h % np.uint64(P31))


def _shingles(text: str, k: int = 3) -> set[int]:
    return set(_shingle_hashes(text, k).tolist())


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, P31, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, P31, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _minhash_sig(sh, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = sh if isinstance(sh, np.ndarray) else np.fromiter(sh, dtype=np.uint64)
    if len(x) == 0:
        return np.full(len(a), np.uint64(P31), dtype=np.uint64)
    # (a*x + b) mod p with 31-bit operands: products < 2^62, no overflow
    vals = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(P31)
    return vals.min(axis=1)


class MinHasher:
    """Per-batch minhash signatures → exploded LSH band rows.

    Stateful actor: permutation params generated once per actor (identical
    across actors — seeded)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        self.a, self.b = _minhash_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sig = _minhash_sig(_shingle_hashes(text, self.k), self.a, self.b)
            for band in range(self.bands):
                seg = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                h = hashlib.blake2b(seg.tobytes(), digest_size=8).digest()
                out_doc.append(doc_id)
                out_band.append(band)
                out_hash.append(int.from_bytes(h, "big") >> 1)
        return pd.DataFrame(
            {"doc_id": out_doc, "band": out_band, "band_hash": out_hash}
        )


def minhash_lsh_pairs(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.7,
) -> pa.Table:
    """MinHash+LSH near-duplicate pairs with exact Jaccard verification.

    Stages: signature+band explode (actor pool) → groupby (band, band_hash)
    → emit candidate pairs per bucket → dedup pairs → verify Jaccard on the
    candidate docs only (broadcast candidate texts; at 100 TB this becomes a
    re-read of just the candidate ids). Rows-only oracle (no SQL form)."""

    bands_ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
        batch_format="pandas",
        batch_size=1024,
        # autoscaling pool: scales to 8 on the bench cluster, fits the
        # 4-cpu test cluster (a fixed 8 would deadlock actor placement)
        concurrency=(1, 8),
    )

    # candidate buckets: almost every (band, band_hash) bucket is a
    # singleton; collect the band rows (docs × bands, tiny vs the corpus)
    # and find multi-member buckets in one vectorized pass. At 10^9+ docs
    # this becomes groupby(count)→filter(n>1)→semi-join before collecting.
    bdf = _concat(bands_ds).to_pandas()
    dup = bdf[bdf.duplicated(["band", "band_hash"], keep=False)]
    pairs: set[tuple[int, int]] = set()
    for _, g in dup.groupby(["band", "band_hash"], sort=False):
        ids = sorted(set(g["doc_id"]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    if not pairs:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    cand_df = pd.DataFrame(sorted(pairs), columns=["a", "b"])

    # verify: fetch candidate texts once (ids are few), compute exact Jaccard
    import ray

    ids = frozenset(cand_df["a"]) | frozenset(cand_df["b"])
    ids_ref = ray.put(ids)

    class FilterDocs:
        def __init__(self):
            self.ids = ray.get(ids_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch["doc_id"].isin(self.ids)]

    texts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(FilterDocs, batch_format="pandas", batch_size=8192, concurrency=2)
    )
    tdf = _concat(texts).to_pandas().set_index("doc_id")["text"]
    sh = {i: _shingles(tdf.loc[i], shingle_k) for i in tdf.index}

    def jac(a: int, b: int) -> float:
        sa, sb = sh[a], sh[b]
        if not sa and not sb:
            return 1.0
        return len(sa & sb) / max(1, len(sa | sb))

    cand_df["jaccard"] = [jac(a, b) for a, b in zip(cand_df["a"], cand_df["b"])]
    keep = cand_df[cand_df["jaccard"] >= jaccard_threshold].sort_values(["a", "b"])
    keep["jaccard"] = keep["jaccard"].round(6)
    return pa.Table.from_pandas(keep.reset_index(drop=True), preserve_index=False)


# --- n-gram jaccard (exact, all-pairs within LSH buckets) ---------------------


def ngram_jaccard_dedup(sf_dir: str, threshold: float = 0.8, shingle_k: int = 3) -> pa.Table:
    """Docs surviving near-dup removal: drop every doc that has a
    higher-priority (lower doc_id) near-duplicate (LSH candidates + exact
    Jaccard ≥ threshold). Rows-only oracle."""
    pairs = minhash_lsh_pairs(sf_dir, jaccard_threshold=threshold, shingle_k=shingle_k)
    dup_b = set(pairs.column("b").to_pylist())  # b > a always; b is the dup

    import ray

    ref = ray.put(frozenset(dup_b))

    class DropDups:
        def __init__(self):
            self.dups = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch[~batch["doc_id"].isin(self.dups)]

    out = _docs(sf_dir, ["doc_id"]).map_batches(
        DropDups, batch_format="pandas", batch_size=8192, concurrency=2
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# --- simhash ------------------------------------------------------------------


class SimHasher:
    """64-bit simhash over word tokens (vectorized bit-vote per batch)."""

    def __init__(self):
        pass

    @staticmethod
    def _simhash(text: str) -> int:
        v = np.zeros(64, dtype=np.int64)
        for w in set(text.split()):
            h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
            v += np.where(bits > 0, 1, -1)
        out = np.packbits((v > 0).astype(np.uint8))
        return int.from_bytes(out.tobytes(), "big")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # hex string: survives every (pandas / Arrow / driver-hash) round-trip
        # that a uint64 >= 2^63 would not
        batch["simhash"] = batch["text"].map(lambda s: f"{self._simhash(s):016x}")
        return batch[["doc_id", "simhash"]]


def simhash_signatures(sf_dir: str) -> pa.Table:
    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pandas", batch_size=4096, concurrency=2
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


def simhash_near_dups(sf_dir: str, max_hamming: int = 8) -> pa.Table:
    """Near-dup pairs by simhash hamming distance, candidates via 4×16-bit
    band buckets (a pair within hamming ≤ 3 shares ≥ 1 band; wider distances
    need more bands — documented tradeoff). Rows-only oracle."""
    sig = simhash_signatures(sf_dir).to_pandas()
    sig["simhash"] = sig["simhash"].map(lambda h: int(h, 16)).astype("uint64")
    rows = []
    for shift in (0, 16, 32, 48):
        sig[f"band_{shift}"] = (sig["simhash"] >> np.uint64(shift)) & np.uint64(0xFFFF)
    cand = set()
    for shift in (0, 16, 32, 48):
        for _, g in sig.groupby(f"band_{shift}"):
            ids = sorted(g["doc_id"])
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    cand.add((ids[i], ids[j]))
    by_id = sig.set_index("doc_id")["simhash"]
    for a, b in sorted(cand):
        d = bin(int(by_id.loc[a]) ^ int(by_id.loc[b])).count("1")
        if d <= max_hamming:
            rows.append({"a": a, "b": b, "hamming": d})
    if not rows:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64())}
        )
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
