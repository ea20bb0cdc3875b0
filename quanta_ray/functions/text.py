"""Text-analysis operators over the ``documents`` table.

Large-scale-training-pipeline text ops, each a vectorized ``map_batches``
stage (actor pool where there is per-actor setup such as compiled regexes):

- token counting (regex word tokens — SQL-checkable);
- quality scoring (length / distinct-token / avg-token-length — SQL-checkable);
- document fingerprinting (md5 + rolling 64-bit polynomial hash);
- language ID (character n-gram heuristic; rows-only check — a heuristic has
  no SQL oracle).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..hashutil import md5_hex
from ..broadcast import cached_get as _cached_get
from ..schema import from_pandas as _from_pandas, read_parquet_clean as _read_pq


def _docs(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return _read_pq(f"{sf_dir}/documents.parquet", columns=columns)


def _concat(ds: rd.Dataset) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


# --- token counting -----------------------------------------------------------


def _token_stats(toks: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized per-doc (n_tokens, n_unique_tokens, total_token_len) from a
    Series of token lists: one explode + hash_array + lexsort dedupe for the
    whole batch — no per-row ``set()``/``sum()`` lambdas in the hot path."""
    toks = toks.reset_index(drop=True)
    n_docs = len(toks)
    n = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
    ex = toks.explode().dropna()
    if not len(ex):
        z = np.zeros(n_docs, dtype=np.int64)
        return n, z, z
    doc = ex.index.to_numpy()
    total_len = np.bincount(
        doc, weights=ex.str.len().to_numpy(dtype=np.float64), minlength=n_docs
    ).astype(np.int64)
    wh = pd.util.hash_array(ex.to_numpy(dtype=object))
    order = np.lexsort((wh, doc))
    d, h = doc[order], wh[order]
    first = np.concatenate(([True], (d[1:] != d[:-1]) | (h[1:] != h[:-1])))
    uniq = np.bincount(d[first], minlength=n_docs).astype(np.int64)
    return n, uniq, total_len


def token_counts_batch(batch: pa.Table) -> pa.Table:
    """Word-token counts per document, Arrow-native end to end: RE2 does the
    tokenisation (``split_pattern_regex`` on the complement class ≡ DuckDB's
    ``regexp_extract_all('[A-Za-z0-9]+')``), C++ ``dictionary_encode`` does
    the token hashing, numpy bincounts the rest — no Python-level regex loop
    and no pandas consolidation on a zero-copy batch."""
    n_docs = batch.num_rows
    toks = pc.split_pattern_regex(batch.column("text"), "[^A-Za-z0-9]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "")  # split artifacts at string edges
    parent = parent[keep.to_numpy(zero_copy_only=False)]
    n = np.bincount(parent, minlength=n_docs).astype(np.int64)
    if parent.size:
        codes = flat.filter(keep).dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((codes, parent))
        d, c = parent[order], codes[order]
        first = np.concatenate(([True], (d[1:] != d[:-1]) | (c[1:] != c[:-1])))
        uniq = np.bincount(d[first], minlength=n_docs).astype(np.int64)
    else:
        uniq = np.zeros(n_docs, dtype=np.int64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n, pa.int64()),
            "n_unique_tokens": pa.array(uniq, pa.int64()),
        }
    )


def token_counts(sf_dir: str) -> pa.Table:
    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_counts_batch, batch_format="pyarrow", batch_size=8192
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


TOKEN_COUNTS_SQL = """
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
       len(list_distinct(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS n_unique_tokens
FROM documents
ORDER BY doc_id
"""


# --- quality scoring ----------------------------------------------------------


def quality_scores(sf_dir: str) -> pa.Table:
    """Heuristic quality features, all vectorized and SQL-expressible:
    char length, token count, type-token ratio, mean token length."""

    class Scorer:
        def __init__(self):
            import re

            self.word = re.compile(r"[A-Za-z0-9]+")

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            n, uniq, total_len = _token_stats(batch["text"].str.findall(self.word))
            n_safe = np.maximum(n, 1)
            out = pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(),
                    "n_chars_text": batch["text"].str.len().to_numpy(dtype=np.int64),
                    "n_tokens": n,
                    "ttr": np.round(uniq / n_safe, 6),
                    "mean_token_len": np.round(total_len / n_safe, 6),
                }
            )
            return out

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        Scorer, batch_format="pandas", batch_size=4096, concurrency=2
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


QUALITY_SCORES_SQL = """
SELECT doc_id,
       length(text) AS n_chars_text,
       len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
       round(len(list_distinct(regexp_extract_all(text, '[A-Za-z0-9]+')))
             / greatest(len(regexp_extract_all(text, '[A-Za-z0-9]+')), 1), 6) AS ttr,
       round(list_sum(list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                     x -> length(x)))
             / greatest(len(regexp_extract_all(text, '[A-Za-z0-9]+')), 1), 6)
         AS mean_token_len
FROM documents
ORDER BY doc_id
"""


# --- fingerprinting -----------------------------------------------------------


def fingerprints(sf_dir: str) -> pa.Table:
    """md5 content fingerprint (SQL-checkable) + 64-bit rolling polynomial
    hash (rows-only; used by dedup)."""

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        batch["md5"] = md5_hex(batch["text"].to_numpy(dtype=object))
        batch["rhash"] = _rolling_hash_batch(batch["text"])
        return batch[["doc_id", "md5", "rhash"]]

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pandas", batch_size=8192
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


def _rolling_hash_py(s: str, base: int = 1000003, mod: int = (1 << 61) - 1) -> int:
    """Reference form (per-char Python): kept as the parity pin for the
    vectorized ``_rolling_hash_batch``."""
    h = 0
    for ch in s.encode():
        h = (h * base + ch) % mod
    return h


def _rolling_hash_batch(texts: pd.Series, base: int = 1000003) -> np.ndarray:
    """Vectorized ``_rolling_hash_py`` over a batch: Horner's rule walks CHAR
    POSITIONS (≈ max doc length iterations), each step a handful of uint64
    vector ops across ALL docs — no per-char Python. Identical values.

    Modular arithmetic stays inside uint64 by splitting h = h1·2³¹ + h0 and
    reducing h1·base·2³¹ with the Mersenne identity 2⁶¹ ≡ 1 (mod 2⁶¹−1)."""
    P = np.uint64((1 << 61) - 1)
    enc = [s.encode() for s in texts]
    n = len(enc)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(enc):
        buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.zeros(n, dtype=np.uint64)
    base_u = np.uint64(base)
    m30, m31, s30, s31, s61 = (
        np.uint64((1 << 30) - 1), np.uint64((1 << 31) - 1),
        np.uint64(30), np.uint64(31), np.uint64(61),
    )
    for j in range(maxlen):
        h1 = h >> s31                       # < 2^30
        t = h1 * base_u                     # < 2^50
        t = ((t & m30) << s31) + (t >> s30)  # t·2^31 mod P, < 2^61 + 2^20
        nh = t + (h & m31) * base_u + buf[:, j].astype(np.uint64)  # < 2^62
        nh = (nh & P) + (nh >> s61)
        nh = np.where(nh >= P, nh - P, nh)
        h = np.where(j < lens, nh, h)
    return h


FINGERPRINTS_MD5_SQL = """
SELECT doc_id, md5(text) AS md5
FROM documents
ORDER BY doc_id
"""


def fingerprints_md5(sf_dir: str) -> pa.Table:
    t = fingerprints(sf_dir)
    return t.select(["doc_id", "md5"])


# --- language identification (heuristic; rows-only) ---------------------------

# tiny per-language character-trigram profiles over common function words;
# a real deployment would load fasttext-style models in the actor __init__.
_LANG_MARKERS = {
    "en": ("the", "and", "ing", "ion", " of", " to"),
    "fr": ("le ", "la ", "es ", "de ", "ent", "que"),
    "de": ("der", "die", "und", "ein", "sch", "cht"),
    "es": ("el ", "los", "de ", "ión", "que", "ar "),
    "zh": tuple(),  # non-latin scripts detected by codepoint range below
}


class LangId:
    """n-gram marker voting + script detection; setup once per actor."""

    def __init__(self):
        self.markers = {k: v for k, v in _LANG_MARKERS.items() if v}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def detect(s: str) -> str:
            if any("一" <= ch <= "鿿" for ch in s[:200]):
                return "zh"
            low = s.lower()
            scores = {
                lang: sum(low.count(m) for m in ms) for lang, ms in self.markers.items()
            }
            best = max(scores, key=lambda k: (scores[k], k))
            return best if scores[best] > 0 else "unknown"

        batch["lang_pred"] = batch["text"].map(detect)
        return batch[["doc_id", "lang_pred"]]


def lang_id(sf_dir: str) -> pa.Table:
    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pandas", batch_size=4096, concurrency=2
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


# --- per-language corpus stats (SQL-checkable groupby on documents) -----------


def lang_stats(sf_dir: str) -> pa.Table:
    """Per-language doc count + mean length: partial-agg then tiny groupby."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("lang", as_index=False).agg(
            n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum")
        )

    from ray.data.aggregate import Sum

    out = (
        _docs(sf_dir, ["doc_id", "lang", "n_chars"])
        .map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars"))
    )
    t = _concat(out)
    mean = pc.round(
        pc.divide(pc.cast(t.column("sum_chars"), pa.float64()),
                  pc.cast(t.column("n_docs"), pa.float64())), 6)
    res = pa.Table.from_arrays(
        [t.column("lang"), t.column("n_docs").cast(pa.int64()), mean],
        names=["lang", "n_docs", "mean_chars"],
    )
    return res.take(pc.sort_indices(res, sort_keys=[("lang", "ascending")]))


LANG_STATS_SQL = """
SELECT lang, count(*) AS n_docs,
       round(sum(n_chars) * 1.0 / count(*), 6) AS mean_chars
FROM documents GROUP BY 1 ORDER BY 1
"""


def _script_patterns():
    """Codepoint-range script patterns, compiled once per worker process."""
    import re

    return re.compile("[一-鿿]"), re.compile("[A-Za-z]")


def script_stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """Codepoint-range script classification — the SQL-checkable form of
    ``LangId``'s script-detection branch: 'cjk' if any CJK-unified char,
    else 'latin' if any ascii letter, else 'other'. Patterns compiled once
    per worker process (``cached_state``); classification via vectorized
    ``.str.contains``; per-batch partial aggregation."""
    from ..broadcast import cached_state

    cjk, latin = cached_state("script_patterns", _script_patterns)
    is_cjk = batch["text"].str.contains(cjk).to_numpy()
    is_latin = batch["text"].str.contains(latin).to_numpy()
    batch = batch.assign(
        script=np.where(is_cjk, "cjk", np.where(is_latin, "latin", "other"))
    )
    return batch.groupby("script", as_index=False).agg(n_docs=("text", "size"))


def script_stats(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    out = (
        _docs(sf_dir, ["text"])
        .map_batches(script_stats_partial, batch_format="pandas", batch_size=8192)
        .groupby("script")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )
    t = _concat(out)
    res = pa.Table.from_arrays(
        [t.column("script"), t.column("n_docs").cast(pa.int64())],
        names=["script", "n_docs"],
    )
    return res.take(pc.sort_indices(res, sort_keys=[("script", "ascending")]))


SCRIPT_STATS_SQL = """
SELECT CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'cjk'
            WHEN regexp_matches(text, '[A-Za-z]') THEN 'latin'
            ELSE 'other' END AS script,
       count(*) AS n_docs
FROM documents GROUP BY 1 ORDER BY script
"""


def quality_filter(sf_dir: str, min_tokens: int = 50, min_ttr: float = 0.3) -> pa.Table:
    """Quality-gated corpus: docs passing token-count + type-token-ratio
    thresholds (the canonical training-data quality filter), vectorized."""

    class Filter:
        def __init__(self):
            import re

            self.word = re.compile(r"[A-Za-z0-9]+")

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch["text"].str.findall(self.word)
            n = toks.str.len().astype("int64")
            uniq = toks.map(lambda ws: len(set(ws))).astype("int64")
            ttr = uniq / n.clip(lower=1)
            keep = (n >= min_tokens) & (ttr >= min_ttr)
            return batch.loc[keep, ["doc_id", "lang", "n_chars"]]

    out = _docs(sf_dir, ["doc_id", "text", "lang", "n_chars"]).map_batches(
        Filter, batch_format="pandas", batch_size=4096, concurrency=2
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


QUALITY_FILTER_SQL = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE len(regexp_extract_all(text, '[A-Za-z0-9]+')) >= 50
  AND len(list_distinct(regexp_extract_all(text, '[A-Za-z0-9]+'))) * 1.0
      / greatest(len(regexp_extract_all(text, '[A-Za-z0-9]+')), 1) >= 0.3
ORDER BY doc_id
"""


# --- global vocabulary statistics (token frequency top-k) ---------------------


def token_topk(sf_dir: str, k: int = 50) -> pa.Table:
    """Top-k most frequent whitespace tokens across the corpus — the vocab
    stats job of a training-data pipeline. Per-batch value_counts partials →
    hash-bucketed global sum → per-block local top-k → tiny driver merge.
    The shuffle moves (token, count) partials only, never text."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ").explode().dropna()
        toks = toks[toks != ""]
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.to_numpy(dtype=object), "n": vc.to_numpy()})

    from ..bucket import bucketed_group_agg

    partials = _docs(sf_dir, ["text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )
    agg = bucketed_group_agg(partials, ["token"], dict(n=("n", "sum")))
    local = agg.map_batches(
        lambda df: df.sort_values(["n", "token"], ascending=[False, True]).head(k),
        batch_format="pandas",
    )
    df = _concat(local).to_pandas()
    df = df.sort_values(["n", "token"], ascending=[False, True]).head(k)
    t = _from_pandas(df.reset_index(drop=True))
    return pa.Table.from_arrays(
        [t.column("token"), t.column("n").cast(pa.int64())], names=["token", "n"]
    )


TOKEN_TOPK_SQL = """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY 1 ORDER BY n DESC, token LIMIT 50
"""


# --- document length histogram ------------------------------------------------


def length_histogram(sf_dir: str, bucket_chars: int = 100) -> pa.Table:
    """Doc count + mean length per 100-char length bucket (corpus shape
    stats). Per-batch partials → tiny global sum."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch["n_chars"].to_numpy() // bucket_chars
        df = pd.DataFrame({"bucket": b, "n_chars": batch["n_chars"].to_numpy()})
        return df.groupby("bucket", as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )

    from ..bucket import bucketed_group_agg

    partials = _docs(sf_dir, ["n_chars"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )
    agg = bucketed_group_agg(
        partials,
        ["bucket"],
        dict(n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum")),
        num_buckets=8,
    )
    t = _concat(agg)
    avg = pc.round(
        pc.divide(
            pc.cast(t.column("sum_chars"), pa.float64()),
            pc.cast(t.column("n_docs"), pa.float64()),
        ),
        6,
    )
    out = pa.Table.from_arrays(
        [t.column("bucket").cast(pa.int64()), t.column("n_docs").cast(pa.int64()), avg],
        names=["bucket", "n_docs", "avg_chars"],
    )
    return out.take(pc.sort_indices(out, sort_keys=[("bucket", "ascending")]))


LENGTH_HISTOGRAM_SQL = """
SELECT CAST(floor(n_chars / 100.0) AS BIGINT) AS bucket,
       count(*) AS n_docs,
       round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
FROM documents GROUP BY 1 ORDER BY bucket
"""


# --- PII scrubbing ------------------------------------------------------------


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"[0-9][0-9 ()+.-]{7,}[0-9]"


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    """Redact email addresses and long digit runs (phone-ish) from text,
    Arrow-native: RE2 kernels (``replace_substring_regex`` /
    ``count_substring_regex``) run the patterns in C++ on zero-copy buffers —
    and RE2 is the exact engine the DuckDB oracle uses, so match semantics
    agree by construction (no lookaround, no backrefs)."""
    text = batch.column("text")
    n_red = pc.add(
        pc.count_substring_regex(text, PII_EMAIL),
        pc.count_substring_regex(text, PII_PHONE),
    )
    clean = pc.replace_substring_regex(text, PII_EMAIL, "<EMAIL>")
    clean = pc.replace_substring_regex(clean, PII_PHONE, "<PHONE>")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "text_clean": clean,
            "n_redactions": pc.cast(n_red, pa.int64()),
        }
    )


def pii_scrub(sf_dir: str) -> pa.Table:
    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        pii_scrub_batch, batch_format="pyarrow", batch_size=8192
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


PII_SCRUB_SQL = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '[0-9][0-9 ()+.-]{7,}[0-9]', '<PHONE>', 'g') AS text_clean,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
            + len(regexp_extract_all(text, '[0-9][0-9 ()+.-]{7,}[0-9]')) AS BIGINT) AS n_redactions
FROM documents ORDER BY doc_id
"""


# --- exact distributed percentiles --------------------------------------------


def _exact_int_quantiles(
    ds: rd.Dataset, col: str, qs: tuple[int, ...]
) -> list[int]:
    """EXACT distributed integer-percent quantiles of an int column via
    value-domain counting: per-batch value counts → bucketed count
    reduction keyed by VALUE (shuffle volume = number of distinct values,
    never the row count) → driver cumsum over the tiny distinct-value
    table. The q-th percentile is the smallest v with
    count(<= v) * 100 >= q * n — integer arithmetic both here and in every
    SQL oracle that uses it, so float rounding can never flip it."""
    from ..bucket import bucketed_group_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(col, as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=16384)
    agg = _concat(bucketed_group_agg(parts, [col], dict(cnt=("cnt", "sum"))))
    df = agg.to_pandas().sort_values(col).reset_index(drop=True)
    vals = df[col].to_numpy(dtype=np.int64)
    cum = df["cnt"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out_v = []
    for q in qs:
        if n == 0:
            out_v.append(0)
            continue
        idx = int(np.searchsorted(cum * 100, q * n, side="left"))
        out_v.append(int(vals[min(idx, len(vals) - 1)]))
    return out_v


def length_quantiles(sf_dir: str, qs: tuple[int, ...] = (50, 90, 99)) -> pa.Table:
    """EXACT distributed percentiles of document length (``n_chars``) —
    the value-domain counting form that stays exact at any corpus size:

      per-batch value counts (pandas groupby, vectorized partial)
      → bucketed count reduction keyed by VALUE (shuffle volume = number of
        distinct lengths, never the corpus)
      → driver cumsum over the tiny distinct-value table; the q-th
        percentile is the smallest value v with count(<= v) * 100 >= q * n
        (integer arithmetic on both engine and oracle side, so float
        rounding can never flip the comparison).

    ``qs`` are integer percents. SQL-checkable via a window-function oracle
    with the same integer inequality."""
    out_v = _exact_int_quantiles(_docs(sf_dir, ["n_chars"]), "n_chars", qs)
    return pa.table(
        {
            "q": pa.array([int(q) for q in qs], pa.int64()),
            "n_chars": pa.array(out_v, pa.int64()),
        }
    )


LENGTH_QUANTILES_SQL = """
SELECT q, min(v) AS n_chars
FROM (
  SELECT n_chars AS v,
         count(*) OVER (ORDER BY n_chars) AS c,
         (SELECT count(*) FROM documents) AS n
  FROM documents
) CROSS JOIN (VALUES (50), (90), (99)) t(q)
WHERE c * 100 >= q * n
GROUP BY q
ORDER BY q
"""


def grouped_length_quantiles(sf_dir: str, qs: tuple[int, ...] = (50, 90)) -> pa.Table:
    """EXACT per-group percentiles of document length, partitioned by
    ``lang`` — the grouped form of ``length_quantiles`` (same value-domain
    counting trick, keyed by (lang, n_chars)):

      per-batch (lang, n_chars) counts → bucketed count reduction (shuffle
      volume = distinct (lang, length) pairs, never the corpus) → per-lang
      cumsum on the tiny distinct table; percentile q is the smallest v
      with count(<= v) * 100 >= q * n_lang (integer arithmetic both sides).
    """
    from ..bucket import bucketed_group_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["lang", "n_chars"], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    parts = _docs(sf_dir, ["lang", "n_chars"]).map_batches(
        partial, batch_format="pandas", batch_size=16384
    )
    agg = _concat(
        bucketed_group_agg(parts, ["lang", "n_chars"], dict(cnt=("cnt", "sum")))
    )
    df = (
        agg.to_pandas()
        .sort_values(["lang", "n_chars"], kind="mergesort")
        .reset_index(drop=True)
    )
    out_lang, out_q, out_v = [], [], []
    for lang, g in df.groupby("lang", sort=True):
        vals = g["n_chars"].to_numpy(dtype=np.int64)
        cum = g["cnt"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        for q in qs:
            idx = int(np.searchsorted(cum * 100, q * n, side="left"))
            out_lang.append(lang)
            out_q.append(int(q))
            out_v.append(int(vals[min(idx, len(vals) - 1)]))
    return pa.table(
        {
            "lang": pa.array(out_lang, pa.string()),
            "q": pa.array(out_q, pa.int64()),
            "n_chars": pa.array(out_v, pa.int64()),
        }
    )


GROUPED_LENGTH_QUANTILES_SQL = """
SELECT lang, q, min(v) AS n_chars
FROM (
  SELECT lang, n_chars AS v,
         count(*) OVER (PARTITION BY lang ORDER BY n_chars) AS c,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
) CROSS JOIN (VALUES (50), (90)) t(q)
WHERE c * 100 >= q * n
GROUP BY lang, q
ORDER BY lang, q
"""


def stratified_sample(sf_dir: str, per_group: int = 20) -> pa.Table:
    """Deterministic per-group (per-``lang``) sample of ``per_group`` docs —
    the balanced-mixture sampling step of a training-data pipeline (equal
    doc counts per language regardless of corpus skew), made reproducible
    and SQL-checkable by hash ORDER instead of an RNG: each group keeps the
    ``per_group`` smallest md5(doc_id) values.

    Distributed as a per-group top-k: per-batch partial top-k per lang
    (each batch ships at most langs x k rows) → one bucketed shuffle on
    lang → final per-group top-k. md5-per-row is a Python-loop kernel kept
    for DuckDB parity (same trade as ``consistent_sample``); swap in
    ``pd.util.hash_array`` where parity is not needed."""
    import hashlib as _hl

    from ..bucket import bucketed_apply

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
            .groupby("lang")
            .head(per_group)
        )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = b["doc_id"].map(lambda i: _hl.md5(str(i).encode()).hexdigest())
        return topk(pd.DataFrame({"lang": b["lang"], "doc_id": b["doc_id"], "h": h}))

    parts = _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        partial, batch_format="pandas", batch_size=16384
    )
    out = _concat(bucketed_apply(parts, ["lang"], topk, num_buckets=8))
    t = out.select(["lang", "doc_id"])
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("lang", "ascending"), ("doc_id", "ascending")]
        )
    )


STRATIFIED_SAMPLE_SQL = """
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 20
ORDER BY lang, doc_id
"""


def token_topk_by_lang(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k most frequent tokens PER LANGUAGE — the grouped form of
    ``token_topk`` (per-language vocab stats for mixture curation).

    Per-batch (lang, token) value_counts partials → hash-bucketed global
    sum keyed by (lang, token) → per-bucket per-lang local top-k (a bucket
    holds complete (lang, token) keys but a lang spans buckets, so local
    winners are super-set candidates) → tiny driver merge re-ranking per
    lang. Shuffle moves (lang, token, count) partials only, never text."""
    from ..bucket import bucketed_group_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch.set_index("lang")["text"].str.split(" ").explode().dropna()
        toks = toks[toks != ""]
        vc = toks.groupby(level=0).value_counts()
        idx = vc.index
        return pd.DataFrame(
            {
                "lang": idx.get_level_values(0).to_numpy(dtype=object),
                "token": idx.get_level_values(1).to_numpy(dtype=object),
                "n": vc.to_numpy(),
            }
        )

    partials = _docs(sf_dir, ["lang", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )
    agg = bucketed_group_agg(partials, ["lang", "token"], dict(n=("n", "sum")))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["lang", "n", "token"], ascending=[True, False, True])
            .groupby("lang")
            .head(k)
        )

    df = _concat(agg.map_batches(local_topk, batch_format="pandas")).to_pandas()
    df = (
        df.sort_values(["lang", "n", "token"], ascending=[True, False, True])
        .groupby("lang")
        .head(k)
        .reset_index(drop=True)
    )
    df["rn"] = df.groupby("lang").cumcount() + 1
    t = _from_pandas(df)
    return pa.Table.from_arrays(
        [
            t.column("lang"),
            t.column("rn").cast(pa.int64()),
            t.column("token"),
            t.column("n").cast(pa.int64()),
        ],
        names=["lang", "rn", "token", "n"],
    )


TOKEN_TOPK_BY_LANG_SQL = """
SELECT lang, rn, token, n FROM (
  SELECT lang, token, count(*) AS n,
         row_number() OVER (
           PARTITION BY lang ORDER BY count(*) DESC, token
         ) AS rn
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
  GROUP BY lang, token
) WHERE rn <= 10
ORDER BY lang, rn
"""


def tfidf_topk(sf_dir: str, k: int = 5, num_buckets: int = 32) -> pa.Table:
    """Top-k TF-IDF terms per document — the two-sided global/local term
    statistic every curation pipeline needs (rare-term extraction, topic
    keying).

    Distributed shape (a SHUFFLE JOIN, no vocabulary broadcast):
    - pass 1 (map): per-batch token explode -> exact per-doc term counts
      (a document's text lives in one row, so tf is exact per batch) plus
      per-batch document-frequency partials (token, df_partial);
    - the tf rows AND df partials are unioned and hash-bucketed by TOKEN —
      a bucket holds every tf row and every df partial of its tokens, so
      df-sum + idf attach happen vectorized inside the bucket with no
      driver-side vocabulary map (vocab grows with the corpus; a broadcast
      here is the classic scale-killer);
    - re-bucket by DOC for the per-doc top-k (sort + head per group).

    The score is computed in integer micro-units
    (tf * round(ln(N/df)*1e6)) so the engine and any oracle rank and emit
    bit-identical doubles — float tf*idf differs in the last ulp between
    evaluation orders and flips ranks at ties (same protocol as
    ``type_hourly_stats``)."""
    from ..bucket import bucketed_apply

    n_docs = _docs(sf_dir, ["doc_id"]).count()

    class TermPartials:
        """(doc_id, token, tf) rows + (token, dfp) partials, one fused map."""

        def __init__(self):
            import re

            self.word = re.compile(r"[a-z0-9]+")

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch["text"].str.lower().str.findall(self.word)
            toks.index = batch["doc_id"].to_numpy()
            ex = toks.explode().dropna()
            tf = ex.groupby([ex.index, ex]).size()
            idx = tf.index
            doc = idx.get_level_values(0).to_numpy(dtype=np.int64)
            tok = idx.get_level_values(1).to_numpy(dtype=object)
            tfv = tf.to_numpy(dtype=np.int64)
            # df partial: each (doc, token) appears once above
            dfp = pd.Series(tok).value_counts()
            return pd.DataFrame(
                {
                    "token": np.concatenate([tok, dfp.index.to_numpy(dtype=object)]),
                    "doc_id": np.concatenate([doc, np.full(len(dfp), -1, np.int64)]),
                    "n": np.concatenate([tfv, dfp.to_numpy(dtype=np.int64)]),
                }
            )

    def attach_idf(g: pd.DataFrame) -> pd.DataFrame:
        is_df = g["doc_id"].to_numpy() < 0
        df_tot = g.loc[is_df].groupby("token")["n"].sum()
        tf = g.loc[~is_df]
        dfv = tf["token"].map(df_tot).to_numpy(dtype=np.float64)
        idf_u = np.round(np.log(float(n_docs) / dfv) * 1e6).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": tf["doc_id"].to_numpy(),
                "token": tf["token"].to_numpy(),
                "score_u": tf["n"].to_numpy(dtype=np.int64) * idf_u,
            }
        )

    def per_doc_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "score_u", "token"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        rn = g.groupby("doc_id").cumcount().to_numpy() + 1
        g = g.assign(rn=rn.astype(np.int64))
        return g[g["rn"] <= k]

    parts = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        TermPartials, batch_format="pandas", batch_size=4096, concurrency=2
    )
    scored = bucketed_apply(parts, ["token"], attach_idf, num_buckets=num_buckets)
    top = bucketed_apply(scored, ["doc_id"], per_doc_topk, num_buckets=num_buckets)
    df = _concat(top).to_pandas()
    df["tfidf"] = df["score_u"].to_numpy() / 1e6
    df = df.sort_values(["doc_id", "rn"]).reset_index(drop=True)
    t = _from_pandas(df)
    return pa.Table.from_arrays(
        [
            t.column("doc_id").cast(pa.int64()),
            t.column("rn").cast(pa.int64()),
            t.column("token"),
            t.column("tfidf").cast(pa.float64()),
        ],
        names=["doc_id", "rn", "token", "tfidf"],
    )


TFIDF_TOPK_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
), df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
), n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, rn, token, tfidf FROM (
  SELECT tf.doc_id, tf.token,
         tf.tf * CAST(round(ln(CAST(n.n AS DOUBLE) / df.df) * 1000000)
                      AS BIGINT) / 1000000.0 AS tfidf,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * CAST(round(ln(CAST(n.n AS DOUBLE) / df.df) * 1000000)
                                 AS BIGINT) DESC, tf.token
         ) AS rn
  FROM tf JOIN df USING (token) CROSS JOIN n
) WHERE rn <= 5
ORDER BY doc_id, rn
"""


def bigram_topk(sf_dir: str, k: int = 20) -> pa.Table:
    """Top-k most frequent word BIGRAMS corpus-wide — n-gram statistics
    for contamination screening and boilerplate detection.

    Per-batch vectorized bigram counts (token explode + same-doc adjacency
    mask; no per-row loops) -> hash-bucketed global sum keyed by bigram ->
    per-bucket local top-k -> tiny driver re-rank. Shuffle moves (bigram,
    count) partials only; ranking ties break on the bigram string, so
    the integer ordering is deterministic on both sides."""
    from ..bucket import bucketed_group_agg

    class BigramPartial:
        def __init__(self):
            import re

            self.word = re.compile(r"[a-z0-9]+")

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch["text"].str.lower().str.findall(self.word)
            toks = toks.reset_index(drop=True)
            ex = toks.explode().dropna()
            if len(ex) < 2:
                return pd.DataFrame({"bigram": pd.array([], dtype=object),
                                     "n": pd.array([], dtype=np.int64)})
            doc = ex.index.to_numpy()
            w = ex.to_numpy(dtype=object)
            same = doc[1:] == doc[:-1]
            lhs, rhs = w[:-1][same], w[1:][same]
            bg = pd.Series(lhs) + " " + pd.Series(rhs)
            vc = bg.value_counts()
            return pd.DataFrame(
                {"bigram": vc.index.to_numpy(dtype=object),
                 "n": vc.to_numpy(dtype=np.int64)}
            )

    parts = _docs(sf_dir, ["text"]).map_batches(
        BigramPartial, batch_format="pandas", batch_size=4096, concurrency=2
    )
    agg = bucketed_group_agg(parts, ["bigram"], dict(n=("n", "sum")))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "bigram"], ascending=[False, True]).head(k)

    df = _concat(agg.map_batches(local_topk, batch_format="pandas")).to_pandas()
    df = (
        df.sort_values(["n", "bigram"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    df["rn"] = np.arange(1, len(df) + 1, dtype=np.int64)
    t = _from_pandas(df)
    return pa.Table.from_arrays(
        [t.column("rn").cast(pa.int64()), t.column("bigram"),
         t.column("n").cast(pa.int64())],
        names=["rn", "bigram", "n"],
    )


BIGRAM_TOPK_SQL = """
WITH t AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
), bg AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t
)
SELECT row_number() OVER (ORDER BY count(*) DESC, bigram) AS rn,
       bigram, count(*) AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
"""


def pmi_collocations(
    sf_dir: str, k: int = 50, m_cand: int = 500, min_count: int = 5
) -> pa.Table:
    """Top-k PMI-scored word COLLOCATIONS among the corpus's ``m_cand``
    most frequent bigrams — the classic phrase/vocabulary-mining statistic
    (Church & Hanks 1990) a tokenizer-training pipeline runs before BPE.

    A bigram (x, y) qualifies when p(xy)/(p(x)p(y)) >= 7/5 (PMI >= ln 1.4)
    AND n_xy >= ``min_count``; emitted columns are the raw integer counts
    (n_xy, n_x, n_y) so any consumer can recompute PMI at full precision.
    The threshold is evaluated as the cross-multiplied INTEGER comparison
    5*n_xy*N^2 >= 7*B*n_x*n_y (python ints on the tiny candidate set; the
    SQL oracle uses HUGEINT) — order-free and bit-exact vs the oracle, the
    repo-wide exactness convention.

    Distributed shape (2 all-to-alls, no vocabulary broadcast, driver work
    O(m_cand x buckets)):
    - map: per-batch fused partials — bigram counts keyed by the LEFT word
      and unigram counts keyed by the token (the ``tfidf_topk`` union
      trick, so pass A's bucket holds every partial of its keys);
    - pass A (bucket by key): exact (w1, w2, n_xy) sums with n_x attached
      (w1 and its unigram rows share the bucket), cut to the bucket-local
      top-``m_cand`` by (n_xy desc, w1, w2) — a superset of the global cut
      — then REKEYED by w2; exact (token, c) unigram rows and two
      per-bucket scalar partials (total tokens N, total bigrams B) pass
      through;
    - pass B (bucket by key): attach n_y to the candidates;
    - driver: sum the scalar partials, take the global top-``m_cand``
      (deterministic (n_xy desc, w1, w2) order, matching the oracle's
      LIMIT), apply the integer PMI + min-count filter, emit the top-k.
    """
    from ..bucket import bucketed_apply

    class PmiPartials:
        """kind 0: (key=w1, w2, n)=bigram partial; kind 1: (key=token, n)."""

        def __init__(self):
            import re

            self.word = re.compile(r"[a-z0-9]+")

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch["text"].str.lower().str.findall(self.word)
            toks = toks.reset_index(drop=True)
            ex = toks.explode().dropna()
            uc = ex.value_counts()
            key = [uc.index.to_numpy(dtype=object)]
            w2 = [np.full(len(uc), "", dtype=object)]
            n = [uc.to_numpy(dtype=np.int64)]
            kind = [np.ones(len(uc), dtype=np.int64)]
            if len(ex) >= 2:
                doc = ex.index.to_numpy()
                w = ex.to_numpy(dtype=object)
                same = doc[1:] == doc[:-1]
                if same.any():
                    bg = pd.DataFrame({"w1": w[:-1][same], "w2": w[1:][same]})
                    bc = bg.groupby(["w1", "w2"]).size()
                    key.append(bc.index.get_level_values(0).to_numpy(dtype=object))
                    w2.append(bc.index.get_level_values(1).to_numpy(dtype=object))
                    n.append(bc.to_numpy(dtype=np.int64))
                    kind.append(np.zeros(len(bc), dtype=np.int64))
            return pd.DataFrame(
                {"key": np.concatenate(key), "w2": np.concatenate(w2),
                 "n": np.concatenate(n), "kind": np.concatenate(kind)}
            )

    parts = _docs(sf_dir, ["text"]).map_batches(
        PmiPartials, batch_format="pandas", batch_size=4096, concurrency=2
    )

    def join_left(g: pd.DataFrame) -> pd.DataFrame:
        uni = g[g["kind"] == 1].groupby("key", as_index=False)["n"].sum()
        big = g[g["kind"] == 0]
        out_key, out_w1, out_nxy, out_nx, out_kind = [], [], [], [], []
        # unigram pass-through (exact totals: a token lives in one bucket)
        out_key.append(uni["key"].to_numpy(dtype=object))
        out_w1.append(np.full(len(uni), "", dtype=object))
        out_nxy.append(uni["n"].to_numpy(dtype=np.int64))
        out_nx.append(np.zeros(len(uni), dtype=np.int64))
        out_kind.append(np.ones(len(uni), dtype=np.int64))
        # scalar partials: total tokens (kind 2) / total bigrams (kind 3)
        n_big_total = 0
        if len(big):
            bc = big.groupby(["key", "w2"], as_index=False)["n"].sum()
            n_big_total = int(bc["n"].sum())
            cmap = dict(zip(uni["key"], uni["n"]))
            bc = bc.sort_values(
                ["n", "key", "w2"], ascending=[False, True, True],
                kind="mergesort",
            ).head(m_cand)
            out_key.append(bc["w2"].to_numpy(dtype=object))  # REKEY by w2
            out_w1.append(bc["key"].to_numpy(dtype=object))
            out_nxy.append(bc["n"].to_numpy(dtype=np.int64))
            out_nx.append(
                bc["key"].map(cmap).to_numpy(dtype=np.int64)
            )
            out_kind.append(np.zeros(len(bc), dtype=np.int64))
        out_key.append(np.array(["", ""], dtype=object))
        out_w1.append(np.array(["", ""], dtype=object))
        out_nxy.append(
            np.array([int(uni["n"].sum()), n_big_total], dtype=np.int64)
        )
        out_nx.append(np.zeros(2, dtype=np.int64))
        out_kind.append(np.array([2, 3], dtype=np.int64))
        return pd.DataFrame(
            {"key": np.concatenate(out_key), "w1": np.concatenate(out_w1),
             "n_xy": np.concatenate(out_nxy), "n_x": np.concatenate(out_nx),
             "kind": np.concatenate(out_kind)}
        )

    def join_right(g: pd.DataFrame) -> pd.DataFrame:
        uni = g[g["kind"] == 1]
        cmap = dict(zip(uni["key"], uni["n_xy"]))
        cand = g[g["kind"] == 0].copy()
        scal = g[g["kind"] >= 2]
        cand["n_y"] = cand["key"].map(cmap).to_numpy(dtype=np.int64)
        scal = scal.assign(n_y=np.zeros(len(scal), dtype=np.int64))
        return pd.concat(
            [cand[["w1", "key", "n_xy", "n_x", "n_y", "kind"]].rename(
                columns={"key": "w2"}
            ),
             scal[["w1", "key", "n_xy", "n_x", "n_y", "kind"]].rename(
                 columns={"key": "w2"}
             )],
            ignore_index=True,
        )

    passed = bucketed_apply(
        bucketed_apply(parts, ["key"], join_left), ["key"], join_right
    )
    df = _concat(passed).to_pandas()
    n_tok = int(df.loc[df["kind"] == 2, "n_xy"].sum())
    n_bg = int(df.loc[df["kind"] == 3, "n_xy"].sum())
    cand = (
        df[df["kind"] == 0]
        .sort_values(["n_xy", "w1", "w2"], ascending=[False, True, True],
                     kind="mergesort")
        .head(m_cand)
    )
    keep = [
        5 * int(r.n_xy) * n_tok * n_tok >= 7 * n_bg * int(r.n_x) * int(r.n_y)
        and int(r.n_xy) >= min_count
        for r in cand.itertuples()
    ]
    out = cand[np.asarray(keep, dtype=bool)].head(k).reset_index(drop=True)
    return pa.table(
        {
            "w1": pa.array(out["w1"].to_numpy(dtype=object), pa.string()),
            "w2": pa.array(out["w2"].to_numpy(dtype=object), pa.string()),
            "n_xy": pa.array(out["n_xy"].to_numpy(dtype=np.int64), pa.int64()),
            "n_x": pa.array(out["n_x"].to_numpy(dtype=np.int64), pa.int64()),
            "n_y": pa.array(out["n_y"].to_numpy(dtype=np.int64), pa.int64()),
        }
    )


PMI_COLLOCATIONS_SQL = """
WITH t AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
), uni AS (
  SELECT unnest(toks) AS w FROM t
), ucnt AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY w
), bg AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                               i -> {'w1': toks[i], 'w2': toks[i + 1]})) AS b
  FROM t
), bg2 AS (
  SELECT b.w1 AS w1, b.w2 AS w2 FROM bg
), bcnt AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy FROM bg2 GROUP BY w1, w2
), tot AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM uni) AS n_tok,
         (SELECT CAST(count(*) AS BIGINT) FROM bg2) AS n_bg
), cand AS (
  SELECT w1, w2, n_xy FROM bcnt ORDER BY n_xy DESC, w1, w2 LIMIT 500
)
SELECT w1, w2, n_xy, u1.c AS n_x, u2.c AS n_y
FROM cand
JOIN ucnt u1 ON u1.w = cand.w1
JOIN ucnt u2 ON u2.w = cand.w2
CROSS JOIN tot
WHERE n_xy >= 5
  AND 5 * CAST(n_xy AS HUGEINT) * n_tok * n_tok
      >= 7 * CAST(n_bg AS HUGEINT) * u1.c * u2.c
ORDER BY n_xy DESC, w1, w2
LIMIT 50
"""


def repetition_stats(sf_dir: str) -> pa.Table:
    """Per-document REPETITION signals (Gopher-style quality rules):
    duplicate-bigram fraction and top-bigram fraction — high values flag
    boilerplate/spam for downstream quality filtering.

    Pure per-batch map (a document's bigrams live in its own row — no
    shuffle at all): token explode + same-doc adjacency mask builds every
    bigram in two vectorized passes, then ONE hash groupby per batch counts
    (doc, bigram) occurrences and a level-0 groupby folds them to per-doc
    sum/nunique/max. Exact string keys (no hash-collision risk), matching
    the DuckDB oracle bit-for-bit."""

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ").reset_index(drop=True)
        doc_ids = batch["doc_id"].to_numpy()
        n = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
        ex = toks.explode()
        doc = ex.index.to_numpy()
        w = ex.to_numpy(dtype=object)
        same = doc[1:] == doc[:-1] if len(doc) else np.zeros(0, dtype=bool)
        if not same.any():
            return pd.DataFrame(
                {"doc_id": pd.array([], dtype=np.int64),
                 "n_bigrams": pd.array([], dtype=np.int64),
                 "n_distinct_bigrams": pd.array([], dtype=np.int64),
                 "dup_bigram_frac": pd.array([], dtype=np.float64),
                 "top_bigram_frac": pd.array([], dtype=np.float64)}
            )
        d = doc[:-1][same]
        bg = pd.Series(w[:-1][same]) + " " + pd.Series(w[1:][same])
        cnt = (
            pd.DataFrame({"d": d, "bg": bg.to_numpy(dtype=object)})
            .groupby(["d", "bg"], sort=False)
            .size()
        )
        per_doc = cnt.groupby(level=0).agg(["sum", "count", "max"])
        rows = per_doc.index.to_numpy()
        total = per_doc["sum"].to_numpy(dtype=np.int64)
        distinct = per_doc["count"].to_numpy(dtype=np.int64)
        top = per_doc["max"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": doc_ids[rows],
                "n_bigrams": total,
                "n_distinct_bigrams": distinct,
                "dup_bigram_frac": np.round(1.0 - distinct / total, 6),
                "top_bigram_frac": np.round(top / total, 6),
            }
        )

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pandas", batch_size=4096
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


REPETITION_STATS_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
  FROM toks WHERE len(w) >= 2
),
cnt AS (SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY doc_id, bg)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
       round(1.0 - count(*) * 1.0 / sum(c), 6) AS dup_bigram_frac,
       round(max(c) * 1.0 / sum(c), 6) AS top_bigram_frac
FROM cnt GROUP BY doc_id ORDER BY doc_id
"""


def model_score(sf_dir: str, dim: int = 1024) -> pa.Table:
    """Batched MODEL INFERENCE over the corpus: a hashed-bag-of-words linear
    scorer (fastText-style hashing trick) — the shape of every quality /
    toxicity classifier pass in a training-data pipeline.

    The "model" is a weight table over ``dim`` hash buckets; a real
    checkpoint would be ``ray.put`` once and fetched per actor (the
    ``knn_bruteforce`` broadcast pattern) — here the weights are a
    closed-form function of the bucket id so the DuckDB oracle can re-derive
    them and value-check the inference. Integer milli-unit scores make the
    distributed sum association-free (bit-identical at any parallelism).

    Per actor: an md5→bucket memo dict (vocabulary-sized, like a real
    tokenizer's cache); per batch: one explode + unique + vectorized
    bincount — no per-token Python beyond first-seen hashing."""

    class Scorer:
        def __init__(self):
            import re

            self.word = re.compile(r"[a-z0-9]+")
            self.w_milli = (
                np.arange(dim, dtype=np.int64) * 2654435761 % 1000 - 500
            )
            self.memo: dict[str, int] = {}

        def _bucket(self, tok: str) -> int:
            b = self.memo.get(tok)
            if b is None:
                b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim
                self.memo[tok] = b
            return b

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch["text"].str.lower().str.findall(self.word)
            toks = toks.reset_index(drop=True)
            ex = toks.explode().dropna()
            n_docs = len(batch)
            if not len(ex):
                return pd.DataFrame(
                    {"doc_id": pd.array([], dtype=np.int64),
                     "score_milli": pd.array([], dtype=np.int64)}
                )
            doc = ex.index.to_numpy()
            uniq, inv = np.unique(ex.to_numpy(dtype=object), return_inverse=True)
            buckets = np.fromiter(
                (self._bucket(t) for t in uniq), dtype=np.int64, count=len(uniq)
            )
            w = self.w_milli[buckets[inv]]
            score = np.bincount(doc, weights=w, minlength=n_docs).astype(np.int64)
            # docs with zero tokens are absent from the oracle's GROUP BY too
            has_tok = np.zeros(n_docs, dtype=bool)
            has_tok[doc] = True
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy()[has_tok],
                    "score_milli": score[has_tok],
                }
            )

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        Scorer, batch_format="pandas", batch_size=4096, concurrency=2
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


MODEL_SCORE_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents
),
h AS (
  SELECT doc_id, (CAST(('0x' || left(md5(w), 8)) AS BIGINT) % 1024) AS b
  FROM tok
)
SELECT doc_id,
       CAST(sum((b * 2654435761) % 1000 - 500) AS BIGINT) AS score_milli
FROM h GROUP BY doc_id ORDER BY doc_id
"""


# --- corpus-level duplicate-line removal (CCNet-style boilerplate dedup) ------


def line_dedup(sf_dir: str, max_dups: int = 2, buckets: int = 32) -> pa.Table:
    """Remove lines that repeat more than ``max_dups`` times ACROSS the
    corpus — the CCNet / RefinedWeb boilerplate-removal pass (nav bars,
    cookie banners, footers repeat verbatim across pages; all copies of an
    over-threshold line are dropped from every document).

    Shape (2 shuffles, no driver state, no broadcast):
      1. explode docs into (doc_id, idx, line) rows — one vectorized
         ``str.split`` + ``np.repeat`` per batch;
      2. hash-shuffle on the LINE text: all copies of a line meet in one
         bucket, so a per-bucket ``value_counts`` is the exact corpus count;
         survivors (count <= max_dups) pass through;
      3. hash-shuffle back on doc_id: per-doc mergesort by line index and a
         C-level ``'\\n'.join`` reassembles the cleaned text.
    A document whose every line is boilerplate disappears entirely (exactly
    the SQL ``string_agg`` oracle's behavior). At web scale step 2's shuffle
    carries each line once; count state is per-bucket, never global."""
    from ..bucket import bucketed_apply

    ds = _docs(sf_dir, ["doc_id", "text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        parts = batch["text"].str.split("\n")
        n = parts.map(len).to_numpy(dtype=np.int64)
        doc = np.repeat(batch["doc_id"].to_numpy(dtype=np.int64), n)
        idx = np.concatenate([np.arange(k, dtype=np.int64) for k in n]) if len(n) else np.array([], dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": doc,
                "idx": idx,
                "line": np.concatenate(parts.to_numpy()) if len(n) else np.array([], dtype=object),
                "n_lines": np.repeat(n, n),
            }
        )

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        c = g["line"].value_counts()
        ok = g["line"].isin(c.index[c <= max_dups])
        return g[ok]

    lines = ds.map_batches(explode, batch_format="pandas")
    kept = bucketed_apply(lines, ["line"], survivors, num_buckets=buckets)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "idx"], kind="mergesort")
        by = g.groupby("doc_id", sort=False)
        text = by["line"].agg("\n".join)
        kept_n = by.size()
        total = by["n_lines"].first()
        return pd.DataFrame(
            {
                "doc_id": text.index.to_numpy(dtype=np.int64),
                "text": text.to_numpy(),
                "n_lines_kept": kept_n.to_numpy(dtype=np.int64),
                "n_lines_removed": (total - kept_n).to_numpy(dtype=np.int64),
            }
        )

    out = bucketed_apply(kept, ["doc_id"], reassemble, num_buckets=buckets)
    t = _concat(out)
    if t.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "n_lines_kept": pa.array([], pa.int64()),
                "n_lines_removed": pa.array([], pa.int64()),
            }
        )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


LINE_DEDUP_SQL = """
WITH parts AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
),
lines AS (
  SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS idx,
         len(ls) AS n_lines
  FROM parts
),
cnt AS (SELECT line, count(*) AS c FROM lines GROUP BY line),
keep AS (
  SELECT l.doc_id, l.idx, l.line, l.n_lines
  FROM lines l JOIN cnt ON l.line = cnt.line
  WHERE cnt.c <= 2
)
SELECT doc_id,
       string_agg(line, chr(10) ORDER BY idx) AS text,
       count(*) AS n_lines_kept,
       CAST(any_value(n_lines) - count(*) AS BIGINT) AS n_lines_removed
FROM keep
GROUP BY doc_id
ORDER BY doc_id
"""


# --- adaptive (corpus-relative) length filter ---------------------------------


def adaptive_length_filter(
    sf_dir: str, lo_q: int = 10, hi_q: int = 90
) -> pa.Table:
    """Keep documents whose length sits between the corpus's own p{lo_q}
    and p{hi_q} — the ADAPTIVE-threshold quality filter (fixed thresholds
    rot as the corpus mix shifts; production pipelines cut tails relative
    to the corpus itself).

    Two streaming passes: pass 1 computes the two EXACT percentiles by
    value-domain counting (driver holds two ints); pass 2 re-reads with the
    [lo, hi] predicate PUSHED DOWN to the parquet scan, so out-of-band rows
    never leave storage. No shuffle at all in pass 2."""
    import pyarrow.dataset as pads

    lo, hi = _exact_int_quantiles(
        _docs(sf_dir, ["n_chars"]), "n_chars", (lo_q, hi_q)
    )
    kept = _read_pq(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
        filter=(pads.field("n_chars") >= pads.scalar(lo))
        & (pads.field("n_chars") <= pads.scalar(hi)),
    )
    t = _concat(kept)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


ADAPTIVE_LENGTH_FILTER_SQL = """
WITH cdf AS (
  SELECT n_chars AS v,
         count(*) OVER (ORDER BY n_chars) AS c,
         (SELECT count(*) FROM documents) AS n
  FROM documents
),
lo AS (SELECT min(v) AS v FROM cdf WHERE c * 100 >= 10 * n),
hi AS (SELECT min(v) AS v FROM cdf WHERE c * 100 >= 90 * n)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d, lo, hi
WHERE d.n_chars >= lo.v AND d.n_chars <= hi.v
ORDER BY d.doc_id
"""


# --- corpus mix report ----------------------------------------------------------


def source_mix_report(sf_dir: str) -> pa.Table:
    """Per-(source, lang) corpus composition: doc count, total chars, and
    per-mille share of docs — the curation REPORT every mixture/rebalance
    decision reads. One partial-agg map (shuffle carries one row per
    (source, lang) per batch) + a tiny bucketed reduce; shares computed on
    the reduced table in integer per-mille (association-free)."""
    from ..bucket import bucketed_group_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("doc_id", "size"), total_chars=("n_chars", "sum")
        )

    parts = _docs(sf_dir, ["doc_id", "source", "lang", "n_chars"]).map_batches(
        partial, batch_format="pandas"
    )
    agg = _concat(
        bucketed_group_agg(
            parts,
            ["source", "lang"],
            dict(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum")),
            num_buckets=8,
        )
    ).to_pandas()
    total = int(agg["n_docs"].sum())
    agg["share_permille"] = (agg["n_docs"].to_numpy(dtype=np.int64) * 1000) // max(total, 1)
    agg = agg.sort_values(["source", "lang"]).reset_index(drop=True)
    return pa.table(
        {
            "source": pa.array(agg["source"].astype(str), pa.string()),
            "lang": pa.array(agg["lang"].astype(str), pa.string()),
            "n_docs": pa.array(agg["n_docs"].to_numpy(dtype=np.int64), pa.int64()),
            "total_chars": pa.array(agg["total_chars"].to_numpy(dtype=np.int64), pa.int64()),
            "share_permille": pa.array(agg["share_permille"].to_numpy(dtype=np.int64), pa.int64()),
        }
    )


SOURCE_MIX_REPORT_SQL = """
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(*) * 1000 // (SELECT count(*) FROM documents) AS BIGINT)
         AS share_permille
FROM documents
GROUP BY source, lang
ORDER BY source, lang
"""


# --- char-trigram LM perplexity (CCNet-style quality scoring) -------------------


_LM_H = 1 << 16  # hashed count-table width (bounded model, collision-tolerant)
_LM_P = np.uint64(1_000_003)



def _char_codes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(concatenated uint32 codepoints, per-doc lengths) for a string series.
    One encode of the joined text instead of per-row Python loops."""
    joined = "".join(texts.tolist())
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = texts.str.len().fillna(0).to_numpy(dtype=np.int64)
    return codes, lens


def _tri_bi_hashes(codes: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized trigram/bigram hash streams over concatenated docs, plus
    the doc index of each trigram. Windows crossing a doc boundary are
    masked out."""
    n = len(codes)
    if n < 3:
        e = np.empty(0, np.int64)
        return e, e, e
    c = codes.astype(np.uint64)
    h2 = (c[:-2] * _LM_P + c[1:-1]) & np.uint64(_LM_H - 1)
    h3 = ((c[:-2] * _LM_P + c[1:-1]) * _LM_P + c[2:]) & np.uint64(_LM_H - 1)
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    # a trigram starting at absolute position p is interior iff p+2 is in
    # the same doc: position-within-doc <= len-3
    pos = np.arange(n, dtype=np.int64) - starts[doc_of]
    ok = (pos[: n - 2] <= lens[doc_of[: n - 2]] - 3)
    return h3[ok].astype(np.int64), h2[ok].astype(np.int64), doc_of[: n - 2][ok]


_LM_MODEL_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray] | None] = {}


def _lm_cache_key(sf_dir: str) -> tuple:
    """Source-identity cache key (abspath + mtime_ns + size — the same
    convention as dedup's verified-pair cache), so a rewritten
    documents.parquet at the same path never serves a stale model."""
    import os

    p = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(p)
    return (os.path.abspath(p), st.st_mtime_ns, st.st_size)


def _lm_train(sf_dir: str) -> tuple[np.ndarray, np.ndarray] | None:
    """Distributed char-trigram LM train pass (shared by ``lm_perplexity``
    and ``perplexity_buckets``): per batch, vectorized trigram/bigram hash
    counting emits only the TOUCHED buckets as (bucket, cnt) partials; a
    bucketed reduce folds them; the driver assembles the two fixed-width
    (2^16) integer count tables. Returns None on an empty corpus.

    The trained tables are DETERMINISTIC for a given corpus (integer
    counts, order-free sums), so they are memoized per SOURCE IDENTITY
    (abspath + mtime + size) within the process — a sweep that runs both
    LM consumers pays the train pass once, and a rewritten file at the
    same path invalidates naturally."""
    key = _lm_cache_key(sf_dir)
    if key in _LM_MODEL_CACHE:
        return _LM_MODEL_CACHE[key]
    from ..bucket import bucketed_group_agg

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        codes, lens = _char_codes(batch["text"].fillna(""))
        h3, h2, _ = _tri_bi_hashes(codes, lens)
        if not len(h3):
            return pd.DataFrame(
                {"bucket": np.empty(0, np.int64), "kind": np.empty(0, np.int64),
                 "cnt": np.empty(0, np.int64)}
            )
        # bincount into the fixed 2^16-wide table beats sort-based unique on
        # the tens of millions of hashes a big batch produces (~3x train-pass)
        c3 = np.bincount(h3, minlength=_LM_H)
        c2 = np.bincount(h2, minlength=_LM_H)
        u3 = np.flatnonzero(c3)
        u2 = np.flatnonzero(c2)
        return pd.DataFrame(
            {
                "bucket": np.concatenate([u3, u2]),
                "kind": np.concatenate(
                    [np.zeros(len(u3), np.int64), np.ones(len(u2), np.int64)]
                ),
                "cnt": np.concatenate([c3[u3], c2[u2]]).astype(np.int64),
            }
        )

    parts = _docs(sf_dir, ["text"]).map_batches(
        count_partial, batch_format="pandas", batch_size=65536
    )
    folded = _concat(
        bucketed_group_agg(parts, ["bucket", "kind"], {"cnt": ("cnt", "sum")},
                           num_buckets=16)
    ).to_pandas()
    if folded.empty:
        _LM_MODEL_CACHE[key] = None
        return None
    tri = np.zeros(_LM_H, np.int64)
    bi = np.zeros(_LM_H, np.int64)
    t3 = folded[folded["kind"] == 0]
    t2 = folded[folded["kind"] == 1]
    tri[t3["bucket"].to_numpy()] = t3["cnt"].to_numpy()
    bi[t2["bucket"].to_numpy()] = t2["cnt"].to_numpy()
    _LM_MODEL_CACHE[key] = (tri, bi)
    return tri, bi


def _lm_doc_bits(model: tuple[np.ndarray, np.ndarray], texts: pd.Series):
    """(n_trigrams, mean -log2 p) per doc under the trained tables with
    add-one smoothing — the shared score kernel."""
    tri, bi = model
    codes, lens = _char_codes(texts.fillna(""))
    h3, h2, doc = _tri_bi_hashes(codes, lens)
    n_docs = len(texts)
    if not len(h3):
        return np.zeros(n_docs, np.int64), np.zeros(n_docs, np.float64)
    bits = -np.log2((tri[h3] + 1.0) / (bi[h2] + 256.0))
    tot = np.bincount(doc, weights=bits, minlength=n_docs)
    cnt = np.bincount(doc, minlength=n_docs)
    return cnt.astype(np.int64), np.divide(
        tot, cnt, out=np.zeros_like(tot), where=cnt > 0
    )


def lm_perplexity(sf_dir: str) -> pa.Table:
    """Per-document char-trigram language-model perplexity — the CCNet-style
    quality signal (Wenzek et al. 2020 score documents with a KenLM model;
    here the LM is trained on the corpus itself in one distributed pass).

    Two streaming passes, nothing row-proportional on the driver: TRAIN
    (``_lm_train``) then SCORE — per batch, mean -log2 p(c3|c1c2) per doc
    with add-one smoothing, reading the broadcast tables zero-copy.

    Integer count tables + deterministic hashing make reruns bit-identical.
    Hash collisions only smooth the model (both passes share them), so this
    is a scorer, not a probability oracle -> rows-only check, pinned by the
    planted repetitive-vs-gibberish pytest."""
    import ray

    model = _lm_train(sf_dir)
    if model is None:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_trigrams": pa.array([], pa.int64()),
             "ppl_bits": pa.array([], pa.float64())}
        )
    model_ref = ray.put(model)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        # plain-function tasks reuse warm worker processes (no actor-pool
        # spin-up); the broadcast model is fetched zero-copy from plasma and
        # memoized per process, so repeat tasks on a worker pay nothing
        cnt, mean_bits = _lm_doc_bits(_cached_get(model_ref), batch["text"])
        has = cnt > 0
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[has],
                "n_trigrams": cnt[has],
                "ppl_bits": np.round(mean_bits[has], 6),
            }
        )

    out = _concat(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            score, batch_format="pandas", batch_size=65536
        )
    )
    return out.take(pc.sort_indices(out, sort_keys=[("doc_id", "ascending")]))


def perplexity_buckets(sf_dir: str) -> pa.Table:
    """CCNet-style per-language perplexity TERCILE buckets (Wenzek et al.
    2020 §4.4: within each language, split the corpus into head / middle /
    tail thirds by LM perplexity — head is the cleanest third and what
    most pipelines keep or upsample).

    Three streaming passes, nothing row-proportional on the driver:
      1. TRAIN — the shared ``_lm_train`` distributed count pass;
      2. HISTOGRAM — per batch, docs collapse to (lang, ppl-milli-bits)
         exact integer histogram partials; one tiny bucketed reduce gives
         per-language cumulative counts, from which the driver takes the
         1/3 and 2/3 thresholds (O(langs x distinct quantized values),
         corpus-size independent);
      3. ASSIGN — rescore each batch (model + thresholds broadcast once)
         and emit (doc_id, lang, ppl_bits, ppl_bucket).
    Quantization to integer milli-bits makes the thresholds and buckets
    bit-stable at any parallelism. Rows-only check (the LM is not
    SQL-expressible); pinned by the planted ordered-terciles pytest."""
    import ray

    from ..bucket import bucketed_group_agg

    model = _lm_train(sf_dir)
    if model is None:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "lang": pa.array([], pa.string()),
             "ppl_bits": pa.array([], pa.float64()),
             "ppl_bucket": pa.array([], pa.string())}
        )
    model_ref = ray.put(model)

    def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
        cnt, mean_bits = _lm_doc_bits(_cached_get(model_ref), batch["text"])
        has = cnt > 0
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_numpy()[has],
                "q": np.round(mean_bits[has] * 1000.0).astype(np.int64),
            }
        )
        return df.groupby(["lang", "q"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    hist = _concat(
        bucketed_group_agg(
            _docs(sf_dir, ["text", "lang"]).map_batches(
                hist_partial, batch_format="pandas", batch_size=65536
            ),
            ["lang", "q"],
            {"n": ("n", "sum")},
            num_buckets=4,
        )
    ).to_pandas()
    # per-language tercile thresholds from the exact quantized histogram
    thresholds: dict[str, tuple[int, int]] = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("q")
        cum = g["n"].cumsum().to_numpy()
        n = int(cum[-1])
        qs = g["q"].to_numpy()
        t1 = int(qs[np.searchsorted(cum, -(-n // 3))])       # ceil(n/3)
        t2 = int(qs[np.searchsorted(cum, -(-2 * n // 3))])   # ceil(2n/3)
        thresholds[str(lang)] = (t1, t2)
    thr_ref = ray.put(thresholds)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        cnt, mean_bits = _lm_doc_bits(_cached_get(model_ref), batch["text"])
        thr = _cached_get(thr_ref)
        has = cnt > 0
        langs = batch["lang"].to_numpy(dtype=object)[has]
        q = np.round(mean_bits[has] * 1000.0).astype(np.int64)
        u, inv = np.unique(langs, return_inverse=True)
        t1 = np.array([thr[l][0] for l in u], dtype=np.int64)[inv]
        t2 = np.array([thr[l][1] for l in u], dtype=np.int64)[inv]
        bucket = np.where(q <= t1, "head", np.where(q <= t2, "middle", "tail"))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[has],
                "lang": langs,
                "ppl_bits": np.round(mean_bits[has], 6),
                "ppl_bucket": bucket,
            }
        )

    out = _concat(
        _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
            assign, batch_format="pandas", batch_size=65536
        )
    )
    return out.take(pc.sort_indices(out, sort_keys=[("doc_id", "ascending")]))


# --- DSIR importance weights ----------------------------------------------------


_DSIR_H = 1 << 16  # hashed feature-table width (the DSIR paper's bucket trick)


def _dsir_features(batch: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(feature hash, doc index) for hashed unigram + bigram word features —
    vectorized: one findall, one explode, one ``pd.util.hash_array`` (stable
    across processes/runs), bigrams from consecutive unigram hashes masked
    at doc boundaries."""
    toks = batch["text"].fillna("").str.lower().str.findall(r"[a-z0-9']+")
    lens = toks.str.len().to_numpy(dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        e = np.empty(0, np.int64)
        return e, e
    flat = toks.explode().dropna().to_numpy(dtype=object)
    h = pd.util.hash_array(flat)  # uint64, deterministic
    doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    uni = (h % np.uint64(_DSIR_H)).astype(np.int64)
    same = doc_of[:-1] == doc_of[1:] if total > 1 else np.empty(0, bool)
    big = ((h[:-1][same] * _LM_P + h[1:][same]) % np.uint64(_DSIR_H)).astype(np.int64)
    feats = np.concatenate([uni, big])
    fdoc = np.concatenate([doc_of, doc_of[:-1][same]])
    return feats, fdoc


def dsir_weights(sf_dir: str, target_source: str = "src1") -> pa.Table:
    """Per-document DSIR importance weight — Xie et al. 2023 ("Data
    Selection for Language Models via Importance Resampling"): hashed
    n-gram features, weight = mean log p_target(f)/p_corpus(f) over the
    doc's features. Docs distributionally close to the target domain
    (here: ``source == target_source``) score high; resampling by these
    weights tilts a 100-TB crawl toward the target domain.

    Two streaming passes, the ``lm_perplexity`` shape: (1) ONE scan emits
    touched-bucket (bucket, kind, cnt) partials for BOTH the corpus and
    target feature distributions, folded by a bucketed reduce; the driver
    assembles one fixed-width (2^16) log-ratio table and broadcasts it
    once. (2) score pass reads the table zero-copy per task. Collisions
    smooth both distributions identically (the paper's own argument), so
    this is a scorer -> rows-only check, pinned by the planted
    two-vocabulary pytest."""
    import ray

    from ..bucket import bucketed_group_agg

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        feats, fdoc = _dsir_features(batch)
        if not len(feats):
            return pd.DataFrame(
                {"bucket": np.empty(0, np.int64), "kind": np.empty(0, np.int64),
                 "cnt": np.empty(0, np.int64)}
            )
        is_t = (batch["source"].to_numpy(dtype=object) == target_source)[fdoc]
        cc = np.bincount(feats, minlength=_DSIR_H)
        ct = np.bincount(feats[is_t], minlength=_DSIR_H)
        uc = np.flatnonzero(cc)
        ut = np.flatnonzero(ct)
        return pd.DataFrame(
            {
                "bucket": np.concatenate([uc, ut]),
                "kind": np.concatenate(
                    [np.zeros(len(uc), np.int64), np.ones(len(ut), np.int64)]
                ),
                "cnt": np.concatenate([cc[uc], ct[ut]]).astype(np.int64),
            }
        )

    parts = _docs(sf_dir, ["text", "source"]).map_batches(
        count_partial, batch_format="pandas", batch_size=65536
    )
    folded = _concat(
        bucketed_group_agg(parts, ["bucket", "kind"], {"cnt": ("cnt", "sum")},
                           num_buckets=16)
    ).to_pandas()
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "n_feats": pa.array([], pa.int64()),
         "dsir_weight": pa.array([], pa.float64())}
    )
    if folded.empty:
        return empty
    corpus = np.zeros(_DSIR_H, np.int64)
    target = np.zeros(_DSIR_H, np.int64)
    fc = folded[folded["kind"] == 0]
    ft = folded[folded["kind"] == 1]
    corpus[fc["bucket"].to_numpy()] = fc["cnt"].to_numpy()
    target[ft["bucket"].to_numpy()] = ft["cnt"].to_numpy()
    # add-one smoothed log-ratio of normalized distributions (one float64
    # table, 512 KB — broadcast once)
    log_ratio = np.log(
        (target + 1.0) / (target.sum() + _DSIR_H)
    ) - np.log((corpus + 1.0) / (corpus.sum() + _DSIR_H))
    table_ref = ray.put(log_ratio)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        lr = _cached_get(table_ref)
        feats, fdoc = _dsir_features(batch)
        n_docs = len(batch)
        if not len(feats):
            return pd.DataFrame(
                {"doc_id": np.empty(0, np.int64),
                 "n_feats": np.empty(0, np.int64),
                 "dsir_weight": np.empty(0, np.float64)}
            )
        tot = np.bincount(fdoc, weights=lr[feats], minlength=n_docs)
        cnt = np.bincount(fdoc, minlength=n_docs)
        has = cnt > 0
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[has],
                "n_feats": cnt[has].astype(np.int64),
                "dsir_weight": np.round(tot[has] / cnt[has], 6),
            }
        )

    out = _concat(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            score, batch_format="pandas", batch_size=65536
        )
    )
    return out.take(pc.sort_indices(out, sort_keys=[("doc_id", "ascending")]))


# --- per-language vocabulary statistics ----------------------------------------


def vocab_stats(sf_dir: str) -> pa.Table:
    """Per-language corpus vocabulary profile: total token count, distinct
    vocabulary size, and hapax legomena (tokens seen exactly once) — the
    Zipf-tail health signals of a training corpus.

    Shape: per-batch (lang, token) count partials, ONE token-keyed bucketed
    shuffle reduces them to exact global per-token counts (every occurrence
    of a token meets in one bucket — the tfidf df-join shape, no vocabulary
    broadcast), each bucket then collapses to <= n_langs partial rows, and
    a tiny second reduce sums per language. Shuffle carries (lang, token,
    cnt) partials only, never text."""
    from ..bucket import bucketed_apply, bucketed_group_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(r"[a-z0-9]+")
        df = pd.DataFrame(
            {"lang": batch["lang"].to_numpy(), "token": toks.to_numpy()}
        ).explode("token").dropna(subset=["token"])
        g = df.groupby(["lang", "token"], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        # complete per-(lang, token) counts inside one bucket -> per-lang
        # partial (n_tokens, vocab, hapax) rows
        tot = g.groupby(["lang", "token"], as_index=False)["cnt"].sum()
        out = tot.groupby("lang", as_index=False).agg(
            n_tokens=("cnt", "sum"),
            vocab=("cnt", "size"),
            hapax=("cnt", lambda c: int((c == 1).sum())),
        )
        return out

    parts = _docs(sf_dir, ["lang", "text"]).map_batches(
        partial, batch_format="pandas", batch_size=8192
    )
    per_bucket = bucketed_apply(parts, ["token"], bucket_stats, num_buckets=16)
    out = _concat(
        bucketed_group_agg(
            per_bucket,
            ["lang"],
            {
                "n_tokens": ("n_tokens", "sum"),
                "vocab": ("vocab", "sum"),
                "hapax": ("hapax", "sum"),
            },
            num_buckets=4,
        )
    )
    res = pa.table(
        {
            "lang": out.column("lang"),
            "n_tokens": out.column("n_tokens").cast(pa.int64()),
            "vocab": out.column("vocab").cast(pa.int64()),
            "hapax": out.column("hapax").cast(pa.int64()),
        }
    )
    return res.take(pc.sort_indices(res, sort_keys=[("lang", "ascending")]))


VOCAB_STATS_SQL = """
WITH tok AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents
), cnt AS (
  SELECT lang, token, count(*) AS c FROM tok GROUP BY 1, 2
)
SELECT lang,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       count(*) AS vocab,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
FROM cnt GROUP BY 1 ORDER BY 1
"""


# --- filter-calibration sweep (threshold grid in ONE pass) --------------------

_SWEEP_TOKEN_GRID = (10, 20, 50, 100, 200, 500)
_SWEEP_TTR_GRID = tuple(range(1, 10))  # tenths: 0.1 .. 0.9


def quality_threshold_sweep(sf_dir: str) -> pa.Table:
    """Filter-calibration report: for a grid of min-token-count and
    min-type-token-ratio thresholds, how many documents survive and what
    corpus share that is — the sweep every curation pipeline runs BEFORE
    committing to a quality filter, computed for the whole grid in ONE
    streaming pass (not one scan per threshold).

    Per-batch partials: token stats once per doc, then 15 vectorized
    grid-point counts + the batch doc count -> a 16-row partial; the tiny
    driver-side reduce sums and divides once. Both threshold families are
    ALL-INTEGER comparisons (`n >= th`; `uniq*10 >= th*max(n,1)`), so no
    float-ratio boundary can diverge from the SQL oracle at any scale."""

    class Sweep:
        def __init__(self):
            import re

            self.word = re.compile(r"[A-Za-z0-9]+")

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            n, uniq, _ = _token_stats(batch["text"].str.findall(self.word))
            n_safe = np.maximum(n, 1)
            metrics, ths, counts = [], [], []
            for th in _SWEEP_TOKEN_GRID:
                metrics.append("min_tokens")
                ths.append(th)
                counts.append(int(np.count_nonzero(n >= th)))
            for th in _SWEEP_TTR_GRID:
                metrics.append("min_ttr_tenths")
                ths.append(th)
                counts.append(int(np.count_nonzero(uniq * 10 >= th * n_safe)))
            metrics.append("_total")
            ths.append(0)
            counts.append(len(batch))
            return pd.DataFrame(
                {
                    "metric": pd.array(metrics, dtype=str),
                    "threshold": pd.array(ths, dtype=np.int64),
                    "n_docs": pd.array(counts, dtype=np.int64),
                }
            )

    parts = _concat(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            Sweep, batch_format="pandas", batch_size=4096, concurrency=2
        )
    ).to_pandas()
    empty = pa.table(
        {"metric": pa.array([], pa.string()),
         "threshold": pa.array([], pa.int64()),
         "n_docs": pa.array([], pa.int64()),
         "share": pa.array([], pa.float64())}
    )
    if parts.empty:
        return empty
    agg = parts.groupby(["metric", "threshold"], as_index=False)["n_docs"].sum()
    total = int(agg.loc[agg["metric"] == "_total", "n_docs"].iloc[0])
    if total == 0:
        return empty
    out = agg[agg["metric"] != "_total"].sort_values(
        ["metric", "threshold"], kind="mergesort"
    )
    return pa.table(
        {
            "metric": pa.array(out["metric"].astype(str), pa.string()),
            "threshold": pa.array(out["threshold"].to_numpy(dtype=np.int64), pa.int64()),
            "n_docs": pa.array(out["n_docs"].to_numpy(dtype=np.int64), pa.int64()),
            "share": pa.array(
                np.round(out["n_docs"].to_numpy(dtype=np.int64) / total, 6),
                pa.float64(),
            ),
        }
    )


QUALITY_THRESHOLD_SWEEP_SQL = """
WITH s AS (
  SELECT len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n,
         len(list_distinct(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS u
  FROM documents
), tot AS (SELECT CAST(count(*) AS BIGINT) AS c FROM s),
a AS (
  SELECT 'min_tokens' AS metric, CAST(g.th AS BIGINT) AS threshold,
         CAST(sum(CASE WHEN s.n >= g.th THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
  FROM s, (SELECT unnest([10, 20, 50, 100, 200, 500]) AS th) g
  GROUP BY 1, 2
),
b AS (
  SELECT 'min_ttr_tenths' AS metric, CAST(g.th AS BIGINT) AS threshold,
         CAST(sum(CASE WHEN s.u * 10 >= g.th * greatest(s.n, 1) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_docs
  FROM s, (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS th) g
  GROUP BY 1, 2
)
SELECT u.metric, u.threshold, u.n_docs,
       round(u.n_docs * 1.0 / tot.c, 6) AS share
FROM (SELECT * FROM a UNION ALL SELECT * FROM b) u, tot
ORDER BY u.metric, u.threshold
"""


# --- Gopher quality rules (Rae et al. 2021, A1.1) ------------------------------

_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(sf_dir: str) -> pa.Table:
    """Per-document Gopher quality-rule flags (Rae et al. 2021 App. A1.1)
    and the combined keep decision — the rule-based filter every web-scale
    curation pipeline applies before model-based scoring.

    Rules (each an ALL-INTEGER cross-multiplied comparison, so the
    distributed result is bit-equal to the sequential SQL oracle):
      r_wordcount  50 <= W <= 100000
      r_meanlen    3*W <= total_word_chars <= 10*W        (false when W=0)
      r_symbol     10*(#'#' + #'...' + #'…') <= W
      r_bullet     10*bullet_lines <= 9*lines             (-, *, • starts)
      r_ellipsis   10*ellipsis_lines <= 3*lines           (... or … ends)
      r_alpha      5*alpha_words >= 4*W                   ([A-Za-z] word)
      r_stop       >= 2 distinct of 8 required stopwords
    One streaming pass; per-batch work is explode + bincount vectorized
    (words tokenized by the SAME explicit whitespace class as the oracle's
    regex — no engine/SQL tokenizer drift)."""

    class Rules:
        def __init__(self):
            import re

            self.word = re.compile(r"[^ \t\n\r\f\v]+")

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            texts = batch["text"].fillna("").reset_index(drop=True)
            n = len(texts)
            words = texts.str.findall(self.word)
            W = words.str.len().to_numpy(dtype=np.int64)
            ex = words.explode().dropna()
            L = np.zeros(n, np.int64)
            A = np.zeros(n, np.int64)
            stop_n = np.zeros(n, np.int64)
            if len(ex):
                doc = ex.index.to_numpy()
                L = np.bincount(
                    doc, weights=ex.str.len().to_numpy(np.float64), minlength=n
                ).astype(np.int64)
                A = np.bincount(
                    doc,
                    weights=ex.str.contains("[A-Za-z]", regex=True).to_numpy(
                        np.float64
                    ),
                    minlength=n,
                ).astype(np.int64)
                low = ex.str.lower()
                sw = low.isin(_GOPHER_STOPWORDS)
                if sw.any():
                    sdf = pd.DataFrame(
                        {"doc": doc[sw.to_numpy()], "w": low[sw].to_numpy()}
                    ).drop_duplicates()
                    stop_n = np.bincount(
                        sdf["doc"].to_numpy(), minlength=n
                    ).astype(np.int64)
            lines = texts.str.split("\n")
            NL = lines.str.len().to_numpy(dtype=np.int64)
            lex = lines.explode()
            ldoc = lex.index.to_numpy()
            lv = lex.fillna("")
            B = np.bincount(
                ldoc,
                weights=lv.str.match(r"[-*•]").to_numpy(np.float64),
                minlength=n,
            ).astype(np.int64)
            E = np.bincount(
                ldoc,
                weights=(
                    lv.str.endswith("...") | lv.str.endswith("…")
                ).to_numpy(np.float64),
                minlength=n,
            ).astype(np.int64)
            S = (
                texts.str.count("#").to_numpy(dtype=np.int64)
                + texts.str.count(r"\.\.\.").to_numpy(dtype=np.int64)
                + texts.str.count("…").to_numpy(dtype=np.int64)
            )
            r_wordcount = (W >= 50) & (W <= 100000)
            r_meanlen = (W > 0) & (3 * W <= L) & (L <= 10 * W)
            r_symbol = 10 * S <= W
            r_bullet = 10 * B <= 9 * NL
            r_ellipsis = 10 * E <= 3 * NL
            r_alpha = 5 * A >= 4 * W
            r_stop = stop_n >= 2
            keep = (
                r_wordcount & r_meanlen & r_symbol & r_bullet & r_ellipsis
                & r_alpha & r_stop
            )
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(),
                    "n_words": W,
                    "r_wordcount": r_wordcount,
                    "r_meanlen": r_meanlen,
                    "r_symbol": r_symbol,
                    "r_bullet": r_bullet,
                    "r_ellipsis": r_ellipsis,
                    "r_alpha": r_alpha,
                    "r_stop": r_stop,
                    "keep": keep,
                }
            )

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        Rules, batch_format="pandas", batch_size=4096, concurrency=2
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


GOPHER_RULES_SQL = r"""
WITH s AS (
  SELECT doc_id,
         regexp_extract_all(text, '[^ \t\n\r\f\v]+') AS ws,
         string_split(text, chr(10)) AS ls,
         len(regexp_extract_all(text, '#'))
           + len(regexp_extract_all(text, '\.\.\.'))
           + len(regexp_extract_all(text, '…')) AS sym
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS w,
         CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
              AS BIGINT) AS l,
         CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
              AS BIGINT) AS a,
         CAST(len(list_intersect(list_distinct(list_transform(ws, x -> lower(x))),
                                 ['the','be','to','of','and','that','have','with']))
              AS BIGINT) AS stop_n,
         CAST(len(ls) AS BIGINT) AS nl,
         CAST(len(list_filter(ls, x -> regexp_matches(x, '^[-*•]')))
              AS BIGINT) AS b,
         CAST(len(list_filter(ls, x -> x LIKE '%...' OR x LIKE '%…'))
              AS BIGINT) AS e,
         CAST(sym AS BIGINT) AS sym
  FROM s
)
SELECT doc_id,
       w AS n_words,
       (w >= 50 AND w <= 100000) AS r_wordcount,
       (w > 0 AND 3 * w <= l AND l <= 10 * w) AS r_meanlen,
       (10 * sym <= w) AS r_symbol,
       (10 * b <= 9 * nl) AS r_bullet,
       (10 * e <= 3 * nl) AS r_ellipsis,
       (5 * a >= 4 * w) AS r_alpha,
       (stop_n >= 2) AS r_stop,
       ((w >= 50 AND w <= 100000) AND (w > 0 AND 3 * w <= l AND l <= 10 * w)
        AND (10 * sym <= w) AND (10 * b <= 9 * nl) AND (10 * e <= 3 * nl)
        AND (5 * a >= 4 * w) AND (stop_n >= 2)) AS keep
FROM m
ORDER BY doc_id
"""


# --- C4 line-level filters (Raffel et al. 2020, §2.2) --------------------------


def c4_filters(sf_dir: str) -> pa.Table:
    """C4-style line-level cleaning: keep lines that end in terminal
    punctuation, have >= 3 whitespace words and don't mention javascript;
    keep the DOCUMENT iff >= 3 lines survive and the raw text has neither
    'lorem ipsum' nor '{' — the line-granular sibling of the doc-granular
    ``gopher_rules``, emitting the CLEANED text (the downstream corpus),
    not just flags.

    One streaming pass: lines explode once per batch, every rule is a
    vectorized string kernel over the exploded frame, kept lines reassemble
    per doc with one C-level join. The oracle rebuilds the same text with
    ``list_filter`` + ``array_to_string``, so the value comparison covers
    the cleaned text byte-for-byte."""

    class C4:
        def __init__(self):
            import re

            self.term = re.compile(r'[.!?"]$')
            self.word = re.compile(r"[^ \t]+")

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            texts = batch["text"].fillna("").reset_index(drop=True)
            n = len(texts)
            lines = texts.str.split("\n")
            nl = lines.str.len().to_numpy(dtype=np.int64)
            lex = lines.explode()
            ldoc = lex.index.to_numpy()
            lv = lex.fillna("")
            ok = (
                lv.str.contains(self.term, regex=True)
                & (lv.str.count(self.word) >= 3)
                & ~lv.str.lower().str.contains("javascript", regex=False)
            ).to_numpy()
            n_kept = np.bincount(ldoc, weights=ok.astype(np.float64), minlength=n
                                 ).astype(np.int64)
            doc_ok = (
                (n_kept >= 3)
                & ~texts.str.lower().str.contains("lorem ipsum", regex=False).to_numpy()
                & ~texts.str.contains("{", regex=False).to_numpy()
            )
            kept_lines = pd.DataFrame(
                {"doc": ldoc[ok], "line": lv.to_numpy(dtype=object)[ok]}
            )
            joined = kept_lines.groupby("doc")["line"].agg("\n".join)
            clean = np.full(n, "", dtype=object)
            clean[joined.index.to_numpy()] = joined.to_numpy(dtype=object)
            clean[~doc_ok] = ""
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(),
                    "n_lines": nl,
                    "n_lines_kept": n_kept,
                    "kept": doc_ok,
                    "clean_text": clean,
                }
            )

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        C4, batch_format="pandas", batch_size=4096, concurrency=2
    )
    t = _concat(out)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


C4_FILTERS_SQL = r"""
WITH s AS (
  SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM documents
), f AS (
  SELECT doc_id, text, len(ls) AS nl,
         list_filter(ls, x -> regexp_matches(x, '[.!?"]$')
                          AND len(regexp_extract_all(x, '[^ \t]+')) >= 3
                          AND NOT contains(lower(x), 'javascript')) AS kl
  FROM s
)
SELECT doc_id,
       CAST(nl AS BIGINT) AS n_lines,
       CAST(len(kl) AS BIGINT) AS n_lines_kept,
       (len(kl) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(text, '{')) AS kept,
       CASE WHEN (len(kl) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
                  AND NOT contains(text, '{'))
            THEN array_to_string(kl, chr(10)) ELSE '' END AS clean_text
FROM f
ORDER BY doc_id
"""


# --- lexical diversity: type-token ratio per language --------------------------


def ttr_by_lang(sf_dir: str) -> pa.Table:
    """Per language: total token count, CORPUS-GLOBAL distinct token count,
    and the type-token ratio in integer parts-per-million — the lexical
    diversity profile (tokenizer-budget / vocab-size planning per language).

    Distinct-across-documents needs tokens co-located: each batch first
    collapses to its UNIQUE (lang, token) pairs with local occurrence
    counts (one RE2 split + dictionary_encode + lexsort bincount — no
    Python loop), then ONE shuffle keyed on hash(lang, token) delivers
    every occurrence of a pair to the same bucket; per bucket a groupby
    folds pairs to (lang, n_distinct_partial, n_tokens_partial) — distinct
    counts are disjoint across buckets by construction, so the driver-side
    per-lang sum is exact. Shuffle volume is per-batch-unique pairs (zipf:
    far below token count), never raw text. ttr_ppm divides two order-free
    integer sums once: (2*1e6*distinct + total) // (2*total)."""
    from ..bucket import bucketed_apply

    def pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch.column("text"), "[^A-Za-z0-9]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parent = parent[keep]
        lang = batch.column("lang").to_numpy(zero_copy_only=False)[parent]
        if len(parent) == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        lcodes, linv = np.unique(lang, return_inverse=True)
        tdict = flat.dictionary_encode()
        tcodes = tdict.indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((tcodes, linv))
        li, ti = linv[order], tcodes[order]
        first = np.concatenate(([True], (li[1:] != li[:-1]) | (ti[1:] != ti[:-1])))
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(li))).astype(np.int64)
        tok_vals = tdict.dictionary.take(pa.array(ti[first]))
        return pa.table(
            {
                "lang": pa.array(lcodes[li[first]], pa.string()),
                "token": tok_vals.cast(pa.string()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        per_pair = g.groupby(["lang", "token"], as_index=False)["cnt"].sum()
        out = per_pair.groupby("lang", as_index=False).agg(
            n_distinct=("token", "size"), n_tokens=("cnt", "sum")
        )
        return out

    ds = _docs(sf_dir, ["lang", "text"]).map_batches(
        pairs, batch_format="pyarrow", batch_size=4096
    )
    t = _concat(bucketed_apply(ds, ["lang", "token"], bucket_fn)).to_pandas()
    if len(t) == 0:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "ttr_ppm": pa.array([], pa.int64()),
            }
        )
    out = t.groupby("lang", as_index=False).agg(
        n_tokens=("n_tokens", "sum"), n_distinct=("n_distinct", "sum")
    ).sort_values("lang", kind="mergesort")
    nt = out["n_tokens"].to_numpy(dtype=np.int64)
    nd = out["n_distinct"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "lang": pa.array(out["lang"].astype(str), pa.string()),
            "n_tokens": pa.array(nt, pa.int64()),
            "n_distinct": pa.array(nd, pa.int64()),
            "ttr_ppm": pa.array((2 * 1_000_000 * nd + nt) // (2 * nt), pa.int64()),
        }
    )


TTR_BY_LANG_SQL = """
WITH t AS (
  SELECT lang, unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS token
  FROM documents
)
SELECT lang, count(*) AS n_tokens,
       count(DISTINCT token) AS n_distinct,
       (2 * 1000000 * count(DISTINCT token) + count(*)) // (2 * count(*))
         AS ttr_ppm
FROM t GROUP BY lang ORDER BY lang
"""


# --- overlapping fixed-size chunking (RAG / embedding-pipeline fan-out) --------


def chunk_split(sf_dir: str, chunk: int = 512, overlap: int = 128) -> pa.Table:
    """Overlapping fixed-size CHUNKING — split every document into
    ``chunk``-character windows starting every ``stride = chunk - overlap``
    characters (the 1→N fan-out every RAG / embedding-indexing pipeline
    runs before encoding): chunk ``j`` of a doc is
    ``text[j*stride : j*stride + chunk]``, ``n_chunks = (len-1)//stride + 1``
    for non-empty docs, empty docs emit nothing. Character (code-point)
    semantics on both sides: pandas ``.str.slice`` and DuckDB
    ``substring`` both count code points, so chunk text is byte-identical.

    Shape: pure streaming 1→N map — per batch, one vectorized
    ``.str.slice`` per CHUNK INDEX (bounded by the batch's longest doc,
    never per row), emitting only rows that have that chunk. No shuffle,
    no driver-side pass."""
    stride = chunk - overlap
    assert stride > 0, "overlap must be smaller than chunk"

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        txt = b["text"].astype(str)
        ln = txt.str.len().to_numpy(dtype=np.int64)
        n_chunks = np.where(ln > 0, (ln - 1) // stride + 1, 0)
        out_id, out_j, out_t = [], [], []
        j = 0
        while True:
            sel = np.flatnonzero(n_chunks > j)
            if len(sel) == 0:
                break
            sub = txt.iloc[sel]
            out_id.append(b["doc_id"].to_numpy(dtype=np.int64)[sel])
            out_j.append(np.full(len(sel), j, dtype=np.int64))
            out_t.append(sub.str.slice(j * stride, j * stride + chunk).to_numpy())
            j += 1
        if not out_id:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype=np.int64),
                 "chunk_idx": pd.Series(dtype=np.int64),
                 "chunk_text": pd.Series(dtype=object)}
            )
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(out_id),
                "chunk_idx": np.concatenate(out_j),
                "chunk_text": np.concatenate(out_t),
            }
        )

    t = _concat(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            explode, batch_format="pandas", batch_size=8192
        )
    )
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("doc_id", "ascending"), ("chunk_idx", "ascending")]
        )
    )


CHUNK_SPLIT_SQL = """
WITH idx AS (
  SELECT doc_id, text,
         unnest(range(0, (length(text) - 1) // 384 + 1)) AS chunk_idx
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       substring(text, CAST(chunk_idx * 384 AS INT) + 1, 512) AS chunk_text
FROM idx
ORDER BY doc_id, chunk_idx
"""


# --- vocabulary coverage curve (tokenizer-size planning) ------------------------

_COVERAGE_KS = (100, 500, 2000, 10000)


def vocab_coverage(sf_dir: str) -> pa.Table:
    """VOCABULARY COVERAGE curve — for each candidate vocab size k, the
    exact fraction (integer ppm) of corpus token mass covered by the k
    most frequent words: the curve a tokenizer-size decision reads (where
    it flattens, bigger vocabularies stop paying). Ties at the k boundary
    break lexicographically (freq desc, word asc) — identical in the SQL
    row_number ORDER BY, so counts are bit-equal.

    Shape: the exact corpus word table comes from the shared one-pass
    bucketed count (``bpe._word_counts``) — vocabulary-sized, the same
    accepted O(vocab) driver table the BPE trainer already shards. Scale
    path when the vocab outgrows one node: each count bucket is already
    GLOBAL for its words, so per-bucket local top-max(k) partials merge
    exactly (O(buckets x k) driver rows) and the total-mass term is a
    scalar sum of per-bucket partials."""
    from .bpe import _word_counts

    wc = _word_counts(sf_dir)
    if not len(wc):
        return pa.table(
            {"k": pa.array([], pa.int64()),
             "covered": pa.array([], pa.int64()),
             "total": pa.array([], pa.int64()),
             "coverage_ppm": pa.array([], pa.int64())}
        )
    total = int(wc["freq"].sum())
    top = wc.sort_values(
        ["freq", "word"], ascending=[False, True], kind="mergesort"
    ).head(max(_COVERAGE_KS))
    csum = top["freq"].cumsum().to_numpy(dtype=np.int64)
    rows = []
    for k in _COVERAGE_KS:
        covered = int(csum[min(k, len(csum)) - 1]) if len(csum) else 0
        rows.append((k, covered, total, (1_000_000 * covered) // total))
    return pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "covered": pa.array([r[1] for r in rows], pa.int64()),
            "total": pa.array([r[2] for r in rows], pa.int64()),
            "coverage_ppm": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


VOCAB_COVERAGE_SQL = """
WITH cnt AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
    FROM documents
  ) GROUP BY token
), ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rn FROM cnt
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt
)
SELECT k,
       CAST(coalesce((SELECT sum(c) FROM ranked WHERE rn <= k), 0) AS BIGINT)
         AS covered,
       (SELECT total FROM tot) AS total,
       CAST(1000000 * coalesce((SELECT sum(c) FROM ranked WHERE rn <= k), 0)
            // (SELECT total FROM tot) AS BIGINT) AS coverage_ppm
FROM (SELECT unnest([100, 500, 2000, 10000]) AS k)
ORDER BY k
"""
