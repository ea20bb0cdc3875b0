"""Benchmark decontamination and blocklist filtering — the "don't train on
this" operators of a training-data pipeline.

Both assume the *removal spec* (benchmark phrases, blocked-content hashes)
is small relative to the corpus — the real-world contract (a benchmark is
thousands of documents; the corpus is billions). The corpus side streams;
the spec side is broadcast once via ``ray.put`` and fetched once per actor:

- ``decontaminate``: drop every corpus document whose text contains any
  benchmark phrase as a substring (the standard exact-overlap
  decontamination rule). One combined compiled regex per actor → a single
  vectorized scan per batch, regardless of phrase count.
- ``blocklist_filter``: drop documents whose content hash appears in a
  blocklist. Broadcasts only a BLOOM bitset (bits, not hashes) for the
  streaming prefilter; the rare bloom-positives — true hits plus the
  false-positive tail — are exact-checked by a hash-bucketed shuffle
  anti-join against the blocklist dataset, so the result is EXACT while
  the broadcast stays O(bits) and the shuffle stays O(positives).

Both results are value-checked by DuckDB oracles (the synthetic spec —
"benchmark = every 997th doc", "blocklist = every 101st doc's hash" — is
closed-form so the SQL can re-derive it).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..hashutil import md5_hex
from ..schema import read_parquet_clean as _read_pq


def _docs(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return _read_pq(f"{sf_dir}/documents.parquet", columns=columns)


def _concat(ds: rd.Dataset) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


# --- benchmark decontamination -------------------------------------------------


def _bench_phrases(sf_dir: str, every: int, phrase_chars: int) -> list[str]:
    """The synthetic stand-in for a benchmark set: every ``every``-th doc
    contributes its first ``phrase_chars`` chars as a contamination phrase.
    Benchmark-sized by contract (1/997 of the corpus here; a real benchmark
    is a fixed external list) — the collect is of the SPEC, not the corpus."""

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        sel = batch["doc_id"].to_numpy() % every == 0
        return pd.DataFrame({"phrase": batch["text"].str.slice(0, phrase_chars).to_numpy()[sel]})

    rows = _concat(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            project, batch_format="pandas", batch_size=8192
        )
    )
    return rows.column("phrase").to_pylist() if rows.num_rows else []


class _PhraseScanner:
    """Actor-pool stage: one combined regex compiled once per actor; each
    batch is a single vectorized contains() pass no matter how many phrases."""

    def __init__(self, phrases_ref):
        phrases = ray.get(phrases_ref)
        self.rx = (
            re.compile("|".join(re.escape(p) for p in phrases)) if phrases else None
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.rx is None:
            keep = np.ones(len(batch), dtype=bool)
        else:
            keep = ~batch["text"].str.contains(self.rx, regex=True).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[keep],
                "source": batch["source"].to_numpy()[keep],
            }
        )


def decontaminate(sf_dir: str, every: int = 997, phrase_chars: int = 64) -> pa.Table:
    """Exact-substring benchmark decontamination: keep documents containing
    no benchmark phrase. Spec broadcast once (``ray.put``), corpus streams
    through an actor pool — no shuffle at all."""
    phrases_ref = ray.put(_bench_phrases(sf_dir, every, phrase_chars))
    out = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        _PhraseScanner,
        fn_constructor_kwargs={"phrases_ref": phrases_ref},
        batch_format="pandas",
        batch_size=4096,
        concurrency=2,
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


DECONTAMINATE_SQL = """
WITH bench AS (
  SELECT substr(text, 1, 64) AS phrase FROM documents WHERE doc_id % 997 = 0
)
SELECT d.doc_id, d.source
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM bench b WHERE contains(d.text, b.phrase))
ORDER BY d.doc_id
"""


# --- bloom-prefiltered blocklist anti-join -------------------------------------

_BLOOM_BITS = 1 << 17
_BLOOM_K = 4


def _bloom_positions(hexs: np.ndarray) -> np.ndarray:
    """k deterministic bit positions per md5 hex (double hashing on two
    63-bit slices of the digest). Shape (n, k)."""
    a = np.fromiter((int(h[:15], 16) for h in hexs), dtype=np.int64, count=len(hexs))
    b = np.fromiter((int(h[15:30], 16) for h in hexs), dtype=np.int64, count=len(hexs))
    b |= 1
    i = np.arange(_BLOOM_K, dtype=np.int64)
    return (a[:, None] + i[None, :] * b[:, None]) % _BLOOM_BITS


def _md5_hex(texts: pd.Series) -> np.ndarray:
    # SQL-oracle-parity md5, through the shared vectorized DuckDB kernel
    return md5_hex(texts.to_numpy(dtype=object))


def blocklist_filter(sf_dir: str, every: int = 101) -> pa.Table:
    """Keep documents whose md5(text) is NOT in the blocklist (here: the
    hashes of every ``every``-th doc). Exact result; bloom-bounded cost:

    1. Build the blocklist (spec-sized) and its bloom bitset; broadcast
       ONLY the bitset to the streaming filter.
    2. Streaming pass: per batch, bloom-test each doc's hash. Negatives
       are definitively clean (no false negatives) and pass through.
    3. Bloom-positives (true hits + ~``n·(1-e^{-kn/m})^k`` false
       positives) go through a hash-bucketed shuffle ANTI-join against the
       blocklist dataset — the shuffle moves only the positive tail, never
       the corpus.

    The compact (doc_id, md5, flag) projection is materialized once so the
    negative/positive split does not recompute the md5 pass; its width is
    ~50 B/doc independent of document size (spillable at 100 TB scale)."""

    def project_blk(batch: pd.DataFrame) -> pd.DataFrame:
        sel = batch["doc_id"].to_numpy() % every == 0
        return pd.DataFrame({"md5": _md5_hex(batch["text"][sel])})

    blk = _concat(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            project_blk, batch_format="pandas", batch_size=8192
        )
    )
    blk_hexs = np.asarray(blk.column("md5").to_pylist(), dtype=object)
    bits = np.zeros(_BLOOM_BITS, dtype=bool)
    if len(blk_hexs):
        bits[_bloom_positions(blk_hexs).ravel()] = True
    bits_ref = ray.put(np.packbits(bits))

    class BloomTest:
        def __init__(self, bits_ref):
            self.bits = np.unpackbits(ray.get(bits_ref)).astype(bool)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            hexs = _md5_hex(batch["text"])
            pos = (
                self.bits[_bloom_positions(hexs)].all(axis=1)
                if len(hexs)
                else np.zeros(0, dtype=bool)
            )
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(),
                    "md5": hexs,
                    "bloom_pos": pos,
                }
            )

    tested = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            BloomTest,
            fn_constructor_kwargs={"bits_ref": bits_ref},
            batch_format="pandas",
            batch_size=4096,
            concurrency=2,
        )
        .materialize()
    )

    clean_neg = tested.filter(
        expr="bloom_pos == False"
    ).select_columns(["doc_id"])

    # exact anti-join of the positive tail against the blocklist dataset
    positives = tested.filter(expr="bloom_pos == True").select_columns(
        ["doc_id", "md5"]
    )
    blk_ds = rd.from_arrow(
        pa.table({"doc_id": np.full(len(blk_hexs), -1), "md5": blk_hexs.astype(str)})
    )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        blocked = set(g.loc[g["doc_id"] < 0, "md5"])
        left = g[g["doc_id"] >= 0]
        keep = ~left["md5"].isin(blocked).to_numpy()
        return pd.DataFrame({"doc_id": left["doc_id"].to_numpy()[keep]})

    from ..bucket import bucketed_apply

    verified = bucketed_apply(positives.union(blk_ds), ["md5"], anti)
    t = _concat(clean_neg.union(verified))
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


BLOCKLIST_FILTER_SQL = """
SELECT d.doc_id
FROM documents d
WHERE md5(d.text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id % 101 = 0)
ORDER BY d.doc_id
"""


# --- n-gram decontamination (the production form) ------------------------------


def _batch_grams(
    texts: pd.Series, k: int
) -> tuple[np.ndarray, pd.Series]:
    """(row index, gram string) for every word k-gram in the batch —
    built with k-1 vectorized shifted concats + a same-row validity mask,
    no per-row loops."""
    toks = texts.str.split(" ").reset_index(drop=True)
    ex = toks.explode()
    if not len(ex):
        return np.zeros(0, dtype=np.int64), pd.Series([], dtype=object)
    doc = ex.index.to_numpy()
    w = ex.to_numpy(dtype=object)
    n = len(w)
    if n < k:
        return np.zeros(0, dtype=np.int64), pd.Series([], dtype=object)
    m = n - k + 1
    valid = doc[: m] == doc[k - 1:]
    grams = pd.Series(w[:m])
    for j in range(1, k):
        grams = grams + " " + pd.Series(w[j : m + j])
    return doc[:m][valid], grams[valid].reset_index(drop=True)


def decontaminate_ngram(sf_dir: str, every: int = 997, k: int = 8) -> pa.Table:
    """N-GRAM-level benchmark decontamination — the production rule (e.g.
    13-gram overlap): drop a document if ANY word k-gram also occurs in the
    benchmark set. Stricter than substring matching (overlap may start
    mid-sentence, survive whitespace normalization, etc.).

    The benchmark gram set is spec-sized (benchmark docs × tokens) and
    broadcast once; the corpus streams through a pure map — per batch one
    explode + k-1 shifted vectorized concats + one hashed ``isin``. No
    shuffle at all."""

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        sel = batch["doc_id"].to_numpy() % every == 0
        _, grams = _batch_grams(batch["text"][sel].reset_index(drop=True), k)
        return pd.DataFrame({"gram": grams.unique()})

    bench = _concat(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            project, batch_format="pandas", batch_size=8192
        )
    )
    grams_ref = ray.put(frozenset(bench.column("gram").to_pylist()))

    class GramScanner:
        def __init__(self, grams_ref):
            self.grams = ray.get(grams_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            rows, grams = _batch_grams(batch["text"], k)
            bad = np.zeros(len(batch), dtype=bool)
            if len(rows):
                hit = grams.isin(self.grams).to_numpy()
                bad[rows[hit]] = True
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy()[~bad],
                    "source": batch["source"].to_numpy()[~bad],
                }
            )

    out = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        GramScanner,
        fn_constructor_kwargs={"grams_ref": grams_ref},
        batch_format="pandas",
        batch_size=4096,
        concurrency=2,
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


DECONTAMINATE_NGRAM_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 6),
                               i -> array_to_string(t[i:i+7], ' '))) AS gram
  FROM w WHERE len(t) >= 8
),
bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 997 = 0),
bad AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (gram))
SELECT d.doc_id, d.source FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM bad)
ORDER BY d.doc_id
"""
