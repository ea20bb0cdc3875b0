"""Corpus-curation operators: the final assembly steps of a training-data
pipeline — deterministic global shuffle into shards and weighted per-source
mixture sampling.

Both are keyed on md5-of-id "consistent hash" order (the idiom
``consistent_sample`` pins): deterministic at any parallelism, stable under
corpus growth (new docs land at hash positions without reshuffling old
ones), and exactly SQL-expressible so the driver's DuckDB gate value-checks
them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..broadcast import cached_get as _cached_get
from ..hashutil import md5_hex
from ..schema import read_parquet_clean as _read_pq


def _docs(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return _read_pq(f"{sf_dir}/documents.parquet", columns=columns)


def _concat(ds: rd.Dataset) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


def _md5_keys(ids: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(hex key, first-8-hex-digits-as-int) per id — the shared consistent
    order/placement key (needed for SQL parity; a non-oracle variant would
    key on ``pd.util.hash_array``)."""
    hexs = md5_hex(ids)
    pre = np.fromiter(
        (int(h[:8], 16) for h in hexs), dtype=np.int64, count=len(hexs)
    )
    return hexs, pre


def shuffle_shards(sf_dir: str, n_shards: int = 8) -> pa.Table:
    """Deterministic GLOBAL SHUFFLE into ``n_shards`` output shards with a
    stable position within each shard — what a training run consumes
    (shard files read sequentially = a reproducible random permutation of
    the corpus).

    shard = md5-prefix(doc_id) mod n_shards; position = rank of the full
    md5 key within the shard. ONE hash shuffle keyed by shard (every row
    of a shard meets in one bucket), then a vectorized per-shard sort +
    cumcount — no global sort, no driver-side pass. At 100 TB, n_shards
    is set to a multiple of writer parallelism and each bucket streams
    straight into ``sinks/batch_write``-style committed shard files."""
    from ..bucket import bucketed_apply

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        hexs, pre = _md5_keys(batch["doc_id"])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "shard": pre % n_shards,
                "_k": hexs,
            }
        )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shard", "_k", "doc_id"], kind="mergesort")
        pos = g.groupby("shard").cumcount().to_numpy() + 1
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "shard": g["shard"].to_numpy(),
                "pos": pos.astype(np.int64),
            }
        )

    ds = _docs(sf_dir, ["doc_id"]).map_batches(
        assign, batch_format="pandas", batch_size=8192
    )
    t = _concat(bucketed_apply(ds, ["shard"], rank))
    return t.take(
        pc.sort_indices(t, sort_keys=[("shard", "ascending"), ("pos", "ascending")])
    )


SHUFFLE_SHARDS_SQL = """
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
            AS BIGINT) AS pos
FROM (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR)) AS k,
         CAST(('0x' || left(md5(CAST(doc_id AS VARCHAR)), 8)) AS BIGINT) % 8
           AS shard
  FROM documents
)
ORDER BY shard, pos
"""


def mixture_sample(sf_dir: str) -> pa.Table:
    """Weighted per-SOURCE mixture sampling — reweighting a multi-source
    corpus to target mixture proportions, the step that turns raw crawl
    into a training mix.

    Each source gets a keep-rate (here a deterministic function of the
    source name so the oracle is closed-form: rate = (src_index mod 4 + 1)
    x 0.2); a doc survives iff its md5-prefix fraction < rate. Pure
    per-batch map — no shuffle at all, embarrassingly parallel, and the
    SAME docs survive at any parallelism or corpus growth (consistent
    hashing), so reruns and incremental extensions agree."""

    def sample(batch: pd.DataFrame) -> pd.DataFrame:
        _, pre = _md5_keys(batch["doc_id"])
        frac = pre / float(1 << 32)
        idx = batch["source"].str.slice(3).astype(np.int64).to_numpy()
        rate = (idx % 4 + 1) * 0.2
        keep = frac < rate
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy()[keep],
                "source": batch["source"].to_numpy()[keep],
            }
        )

    t = _concat(
        _docs(sf_dir, ["doc_id", "source"]).map_batches(
            sample, batch_format="pandas", batch_size=8192
        )
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


MIXTURE_SAMPLE_SQL = """
SELECT doc_id, source
FROM documents
WHERE CAST(('0x' || left(md5(CAST(doc_id AS VARCHAR)), 8)) AS BIGINT)
      / 4294967296.0
      < (CAST(substr(source, 4) AS BIGINT) % 4 + 1) * 0.2
ORDER BY doc_id
"""


def split_assign(sf_dir: str) -> pa.Table:
    """Deterministic train/val/test split by consistent hash — the
    holdout-assignment primitive of a training pipeline: a doc's split
    never changes as the corpus grows or the job re-runs at different
    parallelism. Rule: first hex char of md5(doc_id) — '0'-'b' → train
    (12/16), 'c'-'d' → val (2/16), 'e'-'f' → test (2/16).

    Scale shape: one column-pruned scan; md5 through DuckDB's C-vectorized
    kernel per batch (the ``consistent_sample`` idiom, no per-row Python);
    per-batch (source, split) count partials; one tiny bucketed reduce.
    Output is <= sources x 3 rows."""
    from ..bucket import bucketed_group_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = pd.Series(md5_hex(batch["doc_id"].to_numpy(np.int64))).str[:1].to_numpy()
        split = np.where(c <= "b", "train", np.where(c <= "d", "val", "test"))
        df = pd.DataFrame({"source": batch["source"].to_numpy(), "split": split})
        return df.groupby(["source", "split"], as_index=False).size().rename(
            columns={"size": "n_docs"}
        )

    parts = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        partial, batch_format="pandas", batch_size=65536
    )
    out = _concat(
        bucketed_group_agg(
            parts, ["source", "split"], {"n_docs": ("n_docs", "sum")}, num_buckets=4
        )
    )
    res = pa.table(
        {
            "source": out.column("source"),
            "split": out.column("split"),
            "n_docs": out.column("n_docs").cast(pa.int64()),
        }
    )
    return res.take(
        pc.sort_indices(
            res, sort_keys=[("source", "ascending"), ("split", "ascending")]
        )
    )


SPLIT_ASSIGN_SQL = """
WITH s AS (
  SELECT source,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT source, split, count(*) AS n_docs
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


def curate_e2e(
    sf_dir: str,
    min_tokens: int = 50,
    min_ttr: float = 0.3,
    n_shards: int = 8,
) -> pa.Table:
    """The END-TO-END corpus curation pipeline, composed as ONE lazy Ray
    Data pipeline: quality filter -> exact dedup -> mixture sample ->
    shuffle into training shards. Every doc-shaped intermediate streams
    block-to-block with backpressure — nothing materializes on the driver
    between stages, so the composition holds at 100 TB exactly like its
    component operators.

    Stage shapes (2 all-to-alls total for 4 logical stages):
    - quality filter: vectorized per-batch map (token count + TTR gates),
      fused by Ray into the read;
    - exact dedup: md5 computed per batch, TEXT DROPPED before the
      shuffle — only (md5, doc_id, source) rows move; bucketed min per
      content (survivor keeps its source);
    - mixture sample: consistent-hash Bernoulli per source stratum, pure
      map on the (already tiny) survivor stream;
    - shard assignment: md5-consistent shard + in-shard rank, the second
      and last shuffle, keyed by shard.

    Fully SQL-expressible, so the whole composition is value-checked by
    the driver's DuckDB gate — the compositional analog of the individual
    green oracles."""
    from ..bucket import bucketed_apply

    class QualityHash:
        """Filter + hash in one fused stage; drops text before shuffle."""

        def __init__(self):
            import re

            self.word = re.compile(r"[A-Za-z0-9]+")

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch["text"].str.findall(self.word)
            n = toks.str.len().astype("int64")
            uniq = toks.map(lambda ws: len(set(ws))).astype("int64")
            keep = (n >= min_tokens) & (uniq / n.clip(lower=1) >= min_ttr)
            kept = batch.loc[keep]
            return pd.DataFrame(
                {
                    "md5": md5_hex(kept["text"].to_numpy(dtype=object)),
                    "doc_id": kept["doc_id"].to_numpy(),
                    "source": kept["source"].to_numpy(),
                }
            ).sort_values(["md5", "doc_id"]).groupby("md5", as_index=False).first()

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["md5", "doc_id"], kind="mergesort")
        return g.groupby("md5", as_index=False).first()[["doc_id", "source"]]

    def mixture(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        _, pre = _md5_keys(batch["doc_id"])
        idx = batch["source"].str.slice(3).astype(np.int64).to_numpy()
        keep = pre / float(1 << 32) < (idx % 4 + 1) * 0.2
        return batch.loc[keep]

    def shard_rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shard", "_k", "doc_id"], kind="mergesort")
        pos = g.groupby("shard").cumcount().to_numpy() + 1
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "source": g["source"].to_numpy(),
                "shard": g["shard"].to_numpy(),
                "pos": pos.astype(np.int64),
            }
        )

    def assign_shard(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch.assign(shard=[], _k=[])
        hexs, pre = _md5_keys(batch["doc_id"])
        return batch.assign(shard=pre % n_shards, _k=hexs)

    ds = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        QualityHash, batch_format="pandas", batch_size=4096, concurrency=2
    )
    survivors = bucketed_apply(ds, ["md5"], dedup_bucket)
    sampled = survivors.map_batches(mixture, batch_format="pandas").map_batches(
        assign_shard, batch_format="pandas"
    )
    t = _concat(bucketed_apply(sampled, ["shard"], shard_rank))
    return t.take(
        pc.sort_indices(t, sort_keys=[("shard", "ascending"), ("pos", "ascending")])
    )


CURATE_E2E_SQL = """
WITH q AS (
  SELECT doc_id, text, source FROM documents
  WHERE len(regexp_extract_all(text, '[A-Za-z0-9]+')) >= 50
    AND len(list_distinct(regexp_extract_all(text, '[A-Za-z0-9]+'))) * 1.0
        / greatest(len(regexp_extract_all(text, '[A-Za-z0-9]+')), 1) >= 0.3
), d AS (
  SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)
), dd AS (
  SELECT q.doc_id, q.source FROM q JOIN d USING (doc_id)
), m AS (
  SELECT doc_id, source FROM dd
  WHERE CAST(('0x' || left(md5(CAST(doc_id AS VARCHAR)), 8)) AS BIGINT)
        / 4294967296.0
        < (CAST(substr(source, 4) AS BIGINT) % 4 + 1) * 0.2
)
SELECT doc_id, source, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
            AS BIGINT) AS pos
FROM (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS k,
         CAST(('0x' || left(md5(CAST(doc_id AS VARCHAR)), 8)) AS BIGINT) % 8
           AS shard
  FROM m
)
ORDER BY shard, pos
"""


def pack_sequences(sf_dir: str, budget: int = 96, n_shards: int = 8) -> pa.Table:
    """SEQUENCE PACKING: assign documents to fixed-token-budget training
    sequences (next-fit in deterministic shuffle order) — the step between
    a curated corpus and a token-stream dataloader.

    Deterministic at any parallelism: docs are ordered by (shard,
    md5(doc_id), doc_id) — the same consistent-shuffle key the shard op
    uses — and packed NEXT-FIT per shard: a doc opens a new sequence iff it
    would overflow the budget (an over-budget doc sits alone in its own
    sequence). ONE shard-keyed shuffle moves (doc_id, n_tokens) pairs, never
    text; the per-shard scan is the sequential pass every packer has
    (parallelism comes from shards). The DuckDB oracle replays the same
    recurrence as a recursive CTE, so the assignment is value-checked."""
    from ..bucket import bucketed_apply

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        hexs, _ = _md5_keys(batch["doc_id"])
        # len(string_split(text, ' ')) semantics: k spaces -> k+1 pieces
        n_tokens = batch["text"].str.count(" ").to_numpy(dtype=np.int64) + 1
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "shard": batch["doc_id"].to_numpy() % n_shards,
                "n_tokens": n_tokens,
                "_k": hexs,
            }
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shard", "_k", "doc_id"], kind="mergesort")
        shard = g["shard"].to_numpy()
        ntok = g["n_tokens"].to_numpy()
        seq = np.empty(len(g), dtype=np.int64)
        cur_shard, cur_seq, fill = -1, 0, 0
        for i in range(len(g)):
            if shard[i] != cur_shard:
                cur_shard, cur_seq, fill = shard[i], 0, ntok[i]
            elif fill + ntok[i] <= budget:
                fill += ntok[i]
            else:
                cur_seq += 1
                fill = ntok[i]
            seq[i] = cur_seq
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "shard": shard,
                "seq": seq,
                "n_tokens": ntok,
            }
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        project, batch_format="pandas", batch_size=8192
    )
    t = _concat(bucketed_apply(ds, ["shard"], pack))
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


PACK_SEQUENCES_SQL = """
WITH RECURSIVE ordered AS (
  SELECT doc_id, doc_id % 8 AS shard,
         len(string_split(text, ' ')) AS n_tokens,
         row_number() OVER (
           PARTITION BY doc_id % 8
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
),
packed AS (
  SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT) AS seq,
         n_tokens AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
         CASE WHEN p.fill + o.n_tokens <= 96 THEN p.seq ELSE p.seq + 1 END,
         CASE WHEN p.fill + o.n_tokens <= 96
              THEN p.fill + o.n_tokens ELSE o.n_tokens END
  FROM packed p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1
)
SELECT doc_id, shard, seq, n_tokens FROM packed ORDER BY doc_id
"""


def curate_train_ready(
    sf_dir: str,
    min_tokens: int = 50,
    min_ttr: float = 0.3,
    n_shards: int = 8,
    budget: int = 96,
) -> pa.Table:
    """The FULL training-data assembly line, composed as ONE lazy Ray Data
    pipeline: benchmark decontamination → blocklist filter → quality
    filter → exact dedup → mixture sample → sequence packing. The output is
    what a dataloader consumes: (doc_id, source, shard, seq) — which
    training sequence of which shard each surviving document lands in.

    Scale shape: the two removal SPECS (benchmark phrases, blocked hashes)
    are spec-sized broadcasts fetched once per actor (`ray.put`); all three
    filters + the md5 fuse into ONE streaming pass over the corpus that
    drops text before any shuffle; then the same 2 all-to-alls as
    ``curate_e2e`` (content-keyed dedup, shard-keyed pack). Nothing
    driver-side or broadcast grows with the corpus.

    Fully SQL-expressible (the packing recurrence via a recursive CTE), so
    the driver's DuckDB gate value-checks the whole composition."""
    import re

    from ..bucket import bucketed_apply
    from .contamination import _bench_phrases

    phrases_ref = ray.put(_bench_phrases(sf_dir, 997, 64))

    def project_blk(batch: pd.DataFrame) -> pd.DataFrame:
        sel = batch["doc_id"].to_numpy() % 101 == 0
        return pd.DataFrame(
            {"md5": md5_hex(batch["text"].to_numpy(dtype=object)[sel])}
        )

    blk = _concat(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            project_blk, batch_format="pandas", batch_size=8192
        )
    )
    blk_ref = ray.put(frozenset(blk.column("md5").to_pylist()))

    class CleanQualityHash:
        """Decontaminate + blocklist + quality + md5 + token count, fused:
        one streaming pass, text dropped before the first shuffle."""

        def __init__(self, phrases_ref, blk_ref):
            phrases = ray.get(phrases_ref)
            self.rx = (
                re.compile("|".join(re.escape(p) for p in phrases))
                if phrases
                else None
            )
            self.blocked = ray.get(blk_ref)
            self.word = re.compile(r"[A-Za-z0-9]+")

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if self.rx is not None:
                batch = batch.loc[
                    ~batch["text"].str.contains(self.rx, regex=True)
                ]
            md5s = pd.Series(
                md5_hex(batch["text"].to_numpy(dtype=object)), index=batch.index
            )
            batch = batch.loc[~md5s.isin(self.blocked)]
            md5s = md5s.loc[batch.index]
            toks = batch["text"].str.findall(self.word)
            n = toks.str.len().astype("int64")
            uniq = toks.map(lambda ws: len(set(ws))).astype("int64")
            keep = (n >= min_tokens) & (uniq / n.clip(lower=1) >= min_ttr)
            kept = batch.loc[keep]
            return (
                pd.DataFrame(
                    {
                        "md5": md5s.loc[keep].to_numpy(),
                        "doc_id": kept["doc_id"].to_numpy(),
                        "source": kept["source"].to_numpy(),
                        "n_tokens": kept["text"].str.count(" ").to_numpy(
                            dtype=np.int64
                        )
                        + 1,
                    }
                )
                .sort_values(["md5", "doc_id"])
                .groupby("md5", as_index=False)
                .first()
            )

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["md5", "doc_id"], kind="mergesort")
        return g.groupby("md5", as_index=False).first()[
            ["doc_id", "source", "n_tokens"]
        ]

    def mixture(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        _, pre = _md5_keys(batch["doc_id"])
        idx = batch["source"].str.slice(3).astype(np.int64).to_numpy()
        keep = pre / float(1 << 32) < (idx % 4 + 1) * 0.2
        return batch.loc[keep]

    def assign_shard(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch.assign(shard=[], _k=[])
        hexs, pre = _md5_keys(batch["doc_id"])
        return batch.assign(shard=pre % n_shards, _k=hexs)

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shard", "_k", "doc_id"], kind="mergesort")
        shard = g["shard"].to_numpy()
        ntok = g["n_tokens"].to_numpy()
        seq = np.empty(len(g), dtype=np.int64)
        cur_shard, cur_seq, fill = -1, 0, 0
        for i in range(len(g)):
            if shard[i] != cur_shard:
                cur_shard, cur_seq, fill = shard[i], 0, ntok[i]
            elif fill + ntok[i] <= budget:
                fill += ntok[i]
            else:
                cur_seq += 1
                fill = ntok[i]
            seq[i] = cur_seq
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "source": g["source"].to_numpy(),
                "shard": shard,
                "seq": seq,
                "n_tokens": ntok,
            }
        )

    ds = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        CleanQualityHash,
        fn_constructor_kwargs={"phrases_ref": phrases_ref, "blk_ref": blk_ref},
        batch_format="pandas",
        batch_size=4096,
        concurrency=2,
    )
    survivors = bucketed_apply(ds, ["md5"], dedup_bucket)
    sampled = survivors.map_batches(mixture, batch_format="pandas").map_batches(
        assign_shard, batch_format="pandas"
    )
    t = _concat(bucketed_apply(sampled, ["shard"], pack))
    return t.take(
        pc.sort_indices(t, sort_keys=[("doc_id", "ascending")])
    )


CURATE_TRAIN_READY_SQL = """
WITH RECURSIVE bench AS (
  SELECT substr(text, 1, 64) AS phrase FROM documents WHERE doc_id % 997 = 0
), blk AS (
  SELECT md5(text) AS h FROM documents WHERE doc_id % 101 = 0
), q AS (
  SELECT doc_id, text, source,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents d
  WHERE NOT EXISTS (SELECT 1 FROM bench b WHERE contains(d.text, b.phrase))
    AND md5(d.text) NOT IN (SELECT h FROM blk)
    AND len(regexp_extract_all(text, '[A-Za-z0-9]+')) >= 50
    AND len(list_distinct(regexp_extract_all(text, '[A-Za-z0-9]+'))) * 1.0
        / greatest(len(regexp_extract_all(text, '[A-Za-z0-9]+')), 1) >= 0.3
), d AS (
  SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)
), m AS (
  SELECT q.doc_id, q.source, q.n_tokens FROM q JOIN d USING (doc_id)
  WHERE CAST(('0x' || left(md5(CAST(q.doc_id AS VARCHAR)), 8)) AS BIGINT)
        / 4294967296.0
        < (CAST(substr(q.source, 4) AS BIGINT) % 4 + 1) * 0.2
), ordered AS (
  SELECT doc_id, source, n_tokens,
         CAST(('0x' || left(md5(CAST(doc_id AS VARCHAR)), 8)) AS BIGINT) % 8
           AS shard,
         row_number() OVER (
           PARTITION BY CAST(('0x' || left(md5(CAST(doc_id AS VARCHAR)), 8))
                             AS BIGINT) % 8
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM m
), packed AS (
  SELECT shard, rn, doc_id, source, n_tokens, CAST(0 AS BIGINT) AS seq,
         n_tokens AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.doc_id, o.source, o.n_tokens,
         CASE WHEN p.fill + o.n_tokens <= 96 THEN p.seq ELSE p.seq + 1 END,
         CASE WHEN p.fill + o.n_tokens <= 96
              THEN p.fill + o.n_tokens ELSE o.n_tokens END
  FROM packed p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1
)
SELECT doc_id, source, shard, seq, n_tokens FROM packed ORDER BY doc_id
"""


# --- UniMax-style per-language budgeted sampling -------------------------------


def _hex8_to_u64(hexes: np.ndarray) -> np.ndarray:
    """First-8-hex-chars -> uint64, fully vectorized (one C-level join +
    nibble table) — the integer form of the md5-consistent coin every
    sampling op here uses, matching SQL
    ``CAST(concat('0x', substr(md5(v), 1, 8)) AS BIGINT)``."""
    b = np.frombuffer(
        "".join([h[:8] for h in hexes]).encode("ascii"), dtype=np.uint8
    ).reshape(-1, 8)
    nib = np.where(b >= 97, b - 87, b - 48).astype(np.uint64)
    pows = (np.uint64(16) ** np.arange(7, -1, -1, dtype=np.uint64))
    return (nib * pows).sum(axis=1)


def unimax_sample(sf_dir: str, budget_per_lang: int = 150) -> pa.Table:
    """UniMax-style language-balanced sampling report (Chung et al. 2023):
    each language keeps at most ~``budget_per_lang`` documents, selected by
    a deterministic md5 coin — languages under budget keep everything,
    over-budget languages are down-sampled to an (expected) uniform
    budget-sized subset. The two-phase shape every budgeted-mixture policy
    needs: global per-language counts parameterize a per-row decision.

    Exactness: keep iff hash32 <= (budget * 2^32 - 1) // n_lang — the
    threshold is a Python int per language (no float rate), the per-row
    coin is the md5-hex prefix as an integer, so engine and SQL agree
    bit-for-bit. Pass 1 reduces to one (lang, count) row per language;
    pass 2 streams docs once, emitting per-(batch, lang) sampled-count
    partials. Nothing driver-side grows with the corpus."""
    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("lang", as_index=False).size()
        return pd.DataFrame(
            {"lang": g["lang"].astype(str),
             "n": g["size"].to_numpy(dtype=np.int64)}
        )

    cparts = _concat(docs.map_batches(count_partial, batch_format="pandas"))
    if cparts.num_rows == 0:
        return pa.table(
            {"lang": pa.array([], pa.string()),
             "n_total": pa.array([], pa.int64()),
             "n_sampled": pa.array([], pa.int64()),
             "sample_rate": pa.array([], pa.float64())}
        )
    counts = cparts.to_pandas().groupby("lang", as_index=False)["n"].sum()
    thresh = {
        r.lang: (int(budget_per_lang) * (1 << 32) - 1) // int(r.n)
        for r in counts.itertuples()
    }
    tref = ray.put(thresh)

    def sample_partial(b: pd.DataFrame) -> pd.DataFrame:
        th = _cached_get(tref)
        v = _hex8_to_u64(md5_hex(b["doc_id"].to_numpy()))
        lim = b["lang"].astype(str).map(th).to_numpy(dtype=np.uint64)
        keep = v <= lim
        g = pd.DataFrame({"lang": b["lang"].astype(str), "k": keep}).groupby(
            "lang", as_index=False
        ).agg(n_sampled=("k", "sum"))
        g["n_sampled"] = g["n_sampled"].astype(np.int64)
        return g

    sparts = _concat(docs.map_batches(sample_partial, batch_format="pandas"))
    sampled = sparts.to_pandas().groupby("lang", as_index=False)["n_sampled"].sum()
    out = counts.merge(sampled, on="lang", how="left").fillna({"n_sampled": 0})
    out = out.sort_values("lang", kind="mergesort")
    n = out["n"].to_numpy(dtype=np.int64)
    k = out["n_sampled"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "lang": pa.array(out["lang"].astype(str), pa.string()),
            "n_total": pa.array(n, pa.int64()),
            "n_sampled": pa.array(k, pa.int64()),
            "sample_rate": pa.array(np.round(k / n, 6), pa.float64()),
        }
    )


UNIMAX_SAMPLE_SQL = """
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
), t AS (
  SELECT lang, n,
         CAST((CAST(150 AS HUGEINT) * 4294967296 - 1) // n AS BIGINT) AS thresh
  FROM c
)
SELECT d.lang,
       CAST(min(t.n) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN CAST(concat('0x',
                substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                <= t.thresh THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       round(sum(CASE WHEN CAST(concat('0x',
                substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                <= t.thresh THEN 1 ELSE 0 END) * 1.0 / min(t.n), 6)
         AS sample_rate
FROM documents d JOIN t USING (lang)
GROUP BY 1 ORDER BY 1
"""
