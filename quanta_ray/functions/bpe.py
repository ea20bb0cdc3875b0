"""Byte-pair-encoding MERGE-TABLE training — the tokenizer-vocabulary
step every LLM data pipeline runs before anything is tokenized.

Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units"): BPE over a WORD-FREQUENCY table, not the raw corpus —
for whitespace-bounded merges the two are exactly equivalent, and the word
table is VOCABULARY-sized (grows ~log-ish with corpus bytes), so after one
streaming count pass the merge rounds never touch the corpus again.

Distributed shape:
  1. ONE streaming pass over ``documents`` -> exact (word, freq) counts
     (per-batch ``value_counts`` partials, hash-bucketed exact sum — the
     ``bigram_topk`` shape);
  2. the vocabulary is consistent-hash SHARDED across a pool of plain Ray
     actors (``_VocabShard``), each holding its words' current symbol
     sequences — the one piece of state the Dataset API cannot express
     (mutable across rounds);
  3. each merge round: every shard returns its pair-count partial
     (dict[pair, freq], O(distinct pairs in shard)); the driver sums and
     takes the argmax under the deterministic (count desc, left asc,
     right asc) order, then broadcasts the winning pair; shards apply the
     merge to the words that contain it (a per-shard pair->words index
     makes rounds incremental, not full rescans).

Partitioning assumption (documented per the north rule): the merge loop is
vocab-bounded, not corpus-bounded — at web scale the word table is millions
of rows spread over the shard pool while the corpus is petabytes; driver
traffic per round is one small dict per shard. Exactly the structure of a
production wordpiece/BPE trainer.

Determinism: integer freqs, order-free sums, lexicographic tie-breaks ->
the merge TABLE is a pure function of the corpus. Not SQL-expressible
(iterative argmax); pinned by the classic low/lower/lowest planted test
against a from-scratch single-threaded reference in pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..schema import read_parquet_clean as _read_pq

_EOW = "</w>"


def _word_counts(sf_dir: str) -> pd.DataFrame:
    """Exact corpus-wide (word, freq) via one bucketed streaming pass."""
    from ..bucket import bucketed_group_agg

    class WordPartial:
        def __init__(self):
            import re

            self.word = re.compile(r"[a-z0-9]+")

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vc = (
                batch["text"].str.lower().str.findall(self.word)
                .explode().dropna().value_counts()
            )
            return pd.DataFrame(
                {"word": vc.index.to_numpy(dtype=object),
                 "freq": vc.to_numpy(dtype=np.int64)}
            )

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["text"])
    parts = docs.map_batches(
        WordPartial, batch_format="pandas", batch_size=4096, concurrency=2
    )
    out = []
    for t in bucketed_group_agg(
        parts, ["word"], {"freq": ("freq", "sum")}
    ).iter_batches(batch_format="pandas", batch_size=None):
        out.append(t)
    if not out:
        return pd.DataFrame({"word": [], "freq": []})
    return pd.concat(out, ignore_index=True)


@ray.remote(num_cpus=1)
class _VocabShard:
    """One consistent-hash shard of the word table: current symbol
    sequences + freq, with a pair -> word-index inverted index so a merge
    round touches only the words that contain the winning pair."""

    def __init__(self, words: list[str], freqs: list[int]):
        self.freq = np.asarray(freqs, dtype=np.int64)
        self.seqs: list[list[str]] = [list(w) + [_EOW] for w in words]
        self.pair_words: dict[tuple[str, str], set[int]] = {}
        self.pair_cnt: dict[tuple[str, str], int] = {}
        for i, seq in enumerate(self.seqs):
            self._index_word(i, seq, +1)

    def _index_word(self, i: int, seq: list[str], sign: int) -> None:
        f = int(self.freq[i]) * sign
        for a, b in zip(seq[:-1], seq[1:]):
            p = (a, b)
            self.pair_cnt[p] = self.pair_cnt.get(p, 0) + f
            s = self.pair_words.setdefault(p, set())
            if sign > 0:
                s.add(i)
            # on removal the membership set is rebuilt lazily below

    def pair_counts(self) -> dict[tuple[str, str], int]:
        return {p: c for p, c in self.pair_cnt.items() if c > 0}

    def apply_merge(self, pair: tuple[str, str]) -> None:
        pair = tuple(pair)
        new_sym = pair[0] + pair[1]
        for i in list(self.pair_words.get(pair, ())):
            seq = self.seqs[i]
            self._index_word(i, seq, -1)
            out: list[str] = []
            j = 0
            while j < len(seq):
                if (
                    j + 1 < len(seq)
                    and seq[j] == pair[0]
                    and seq[j + 1] == pair[1]
                ):
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            self.seqs[i] = out
            self._index_word(i, out, +1)
        # drop dead entries so partials stay O(live pairs)
        self.pair_words = {
            p: s for p, s in self.pair_words.items() if self.pair_cnt.get(p, 0) > 0
        }
        self.pair_cnt = {p: c for p, c in self.pair_cnt.items() if c > 0}

    def ping(self) -> bool:
        return True


def bpe_merges_from_counts(
    words: list[str], freqs: list[int], n_merges: int, n_shards: int = 8
) -> list[tuple[str, str, int]]:
    """Run the distributed merge loop over an explicit word table."""
    if not words:
        return []
    # cap the pool by the cluster's CPUs (leave one for the driver): the
    # merge table is shard-count-invariant (pinned in pytest), so a small
    # cluster just runs fewer shards instead of deadlocking ray.get on
    # forever-pending actors.
    avail = int(ray.cluster_resources().get("CPU", n_shards + 1))
    # floor at 2 (not avail-1): correctness rests ONLY on the pinned
    # shard-count invariance of the merge table, so a transiently
    # under-reported cluster (cluster_resources() right after init on an
    # autoscaler) still trains multi-shard rather than degenerating to 1
    n_shards = max(1, min(n_shards, len(words), max(2, avail - 1)))
    h = pd.util.hash_array(np.asarray(words, dtype=object)) % np.uint64(n_shards)
    shards = []
    for s in range(n_shards):
        idx = np.flatnonzero(h == s)
        shards.append(
            _VocabShard.remote(
                [words[i] for i in idx], [int(freqs[i]) for i in idx]
            )
        )
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            partials = ray.get([sh.pair_counts.remote() for sh in shards])
            total: dict[tuple[str, str], int] = {}
            for p_dict in partials:
                for p, c in p_dict.items():
                    total[p] = total.get(p, 0) + c
            if not total:
                break
            best = min(total.items(), key=lambda kv: (-kv[1], kv[0]))
            (left, right), cnt = best
            if cnt <= 1:
                break  # nothing repeats: further merges are noise
            merges.append((left, right, int(cnt)))
            ray.get([sh.apply_merge.remote((left, right)) for sh in shards])
    finally:
        for sh in shards:
            ray.kill(sh)
    return merges


def bpe_merges(sf_dir: str, n_merges: int = 40, n_shards: int = 8) -> pa.Table:
    """Top-``n_merges`` BPE merge rules learned from the corpus."""
    wc = _word_counts(sf_dir)
    merges = bpe_merges_from_counts(
        wc["word"].tolist(), wc["freq"].tolist(), n_merges, n_shards
    )
    return pa.table(
        {
            "round": pa.array(range(1, len(merges) + 1), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "pair_count": pa.array([m[2] for m in merges], pa.int64()),
        }
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count of one word under the merge table (classic BPE encode:
    repeatedly merge the lowest-rank adjacent pair)."""
    seq = list(word) + [_EOW]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return len(seq)


def bpe_token_counts(sf_dir: str, n_merges: int = 40) -> pa.Table:
    """Per-document token count under the corpus-trained BPE merge table —
    the 'what will this cost to train on' statistic (packing budgets, token
    accounting) computed with the real tokenizer, not a whitespace proxy.

    The merge table (O(n_merges), trained by ``bpe_merges``) is broadcast
    once via ``ray.put``; each map task encodes with a per-WORD memo dict —
    encode cost is vocabulary-bounded, not occurrence-bounded (zipf: a few
    thousand distinct words cover almost every token of a shard). Rows-only
    (the tokenizer is iterative, no SQL form); pinned by the
    reference-equality pytest of the shared ``_encode_word``."""
    merges = bpe_merges(sf_dir, n_merges=n_merges)
    ranks = {
        (l, r): i
        for i, (l, r) in enumerate(
            zip(merges.column("left").to_pylist(),
                merges.column("right").to_pylist())
        )
    }
    ref = ray.put(ranks)

    class Encode:
        def __init__(self):
            import re

            self.word = re.compile(r"[a-z0-9]+")
            self.ranks = ray.get(ref)
            self.memo: dict[str, int] = {}

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch["text"].str.lower().str.findall(self.word)
            memo, ranks = self.memo, self.ranks
            counts = np.empty(len(toks), dtype=np.int64)
            for i, words in enumerate(toks.to_numpy()):
                c = 0
                for w in words:
                    n = memo.get(w)
                    if n is None:
                        n = memo[w] = _encode_word(w, ranks)
                    c += n
                counts[i] = c
            return pd.DataFrame(
                {"doc_id": batch["doc_id"].to_numpy(), "n_bpe_tokens": counts}
            )

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = []
    for t in docs.map_batches(
        Encode, batch_format="pandas", batch_size=4096, concurrency=2
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        out.append(t)
    tbl = pa.concat_tables(out, promote_options="default").combine_chunks()
    import pyarrow.compute as pc

    return tbl.take(pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")]))


def bpe_fertility(sf_dir: str, n_merges: int = 40) -> pa.Table:
    """Per-LANGUAGE tokenizer FERTILITY under the corpus-trained BPE merge
    table — tokens per word, the standard tokenizer-quality metric
    (a high-fertility language is under-served by the vocabulary and pays
    more sequence length per word). Exactness: per-language totals are
    integer sums (order-free), and the ratio is emitted as the exact
    integer ``fertility_ppm = (10^6 * n_tokens) // n_words`` alongside the
    raw totals.

    Shape: same broadcast-ranks / per-WORD-memo encode as
    ``bpe_token_counts``; each batch collapses to O(langs) partial rows
    (lang, n_words, n_tokens), the driver folds the tiny partials.
    Rows-only (the tokenizer is iterative, no SQL form); pinned by the
    reference-equality pytest."""
    merges = bpe_merges(sf_dir, n_merges=n_merges)
    ranks = {
        (l, r): i
        for i, (l, r) in enumerate(
            zip(merges.column("left").to_pylist(),
                merges.column("right").to_pylist())
        )
    }
    ref = ray.put(ranks)

    class Encode:
        def __init__(self):
            import re

            self.word = re.compile(r"[a-z0-9]+")
            self.ranks = ray.get(ref)
            self.memo: dict[str, int] = {}

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch["text"].str.lower().str.findall(self.word)
            memo = self.memo
            n_words = np.empty(len(toks), dtype=np.int64)
            n_tok = np.empty(len(toks), dtype=np.int64)
            for i, words in enumerate(toks.to_numpy()):
                c = 0
                for w in words:
                    n = memo.get(w)
                    if n is None:
                        n = memo[w] = _encode_word(w, self.ranks)
                    c += n
                n_words[i] = len(words)
                n_tok[i] = c
            return pd.DataFrame(
                {"lang": batch["lang"].astype(str), "n_words": n_words,
                 "n_bpe_tokens": n_tok}
            ).groupby("lang", as_index=False).sum()

    docs = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    parts = []
    for t in docs.map_batches(
        Encode, batch_format="pandas", batch_size=4096, concurrency=2
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        parts.append(t)
    if not parts:
        return pa.table(
            {"lang": pa.array([], pa.string()),
             "n_words": pa.array([], pa.int64()),
             "n_bpe_tokens": pa.array([], pa.int64()),
             "fertility_ppm": pa.array([], pa.int64())}
        )
    df = (
        pa.concat_tables(parts, promote_options="default")
        .to_pandas()
        .groupby("lang", as_index=False)
        .sum()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    words = df["n_words"].to_numpy(dtype=np.int64)
    toks = df["n_bpe_tokens"].to_numpy(dtype=np.int64)
    ppm = np.where(words > 0, (1_000_000 * toks) // np.maximum(words, 1), 0)
    return pa.table(
        {
            "lang": pa.array(df["lang"].astype(str), pa.string()),
            "n_words": pa.array(words, pa.int64()),
            "n_bpe_tokens": pa.array(toks, pa.int64()),
            "fertility_ppm": pa.array(ppm.astype(np.int64), pa.int64()),
        }
    )


def bpe_pack_sequences(
    sf_dir: str, budget: int = 128, n_shards: int = 8, n_merges: int = 40
) -> pa.Table:
    """TOKEN-EXACT sequence packing: the next-fit packer of
    ``curation.pack_sequences`` driven by REAL tokenizer counts (the
    corpus-trained BPE) instead of the whitespace proxy — what a training
    dataloader actually needs, since packing on word counts over- or
    under-fills sequences by the fertility factor.

    Same deterministic contract: docs ordered by (shard, md5(doc_id),
    doc_id), packed NEXT-FIT per shard (over-budget doc sits alone); ONE
    shard-keyed shuffle moves (doc_id, n_bpe_tokens) pairs. The counts
    come from the broadcast-ranks encode pass (``bpe_token_counts``); at
    corpus scale the two stages chain as lazy Datasets — here the counts
    table (O(docs) ints, the query result anyway) seeds the pack stage.
    Rows-only (BPE is iterative, no SQL form); pinned by the
    reference-equality pytest (retrain + re-encode + sequential replay)."""
    import ray.data as rd

    from ..bucket import bucketed_apply
    from .curation import _md5_keys

    counts = bpe_token_counts(sf_dir, n_merges=n_merges)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        hexs, _ = _md5_keys(batch["doc_id"])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "shard": batch["doc_id"].to_numpy() % n_shards,
                "n_tokens": batch["n_bpe_tokens"].to_numpy(dtype=np.int64),
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

    ds = rd.from_arrow(counts).map_batches(
        project, batch_format="pandas", batch_size=8192
    )
    import pyarrow.compute as pc

    parts = []
    for t in bucketed_apply(ds, ["shard"], pack).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        parts.append(t)
    out = pa.concat_tables(parts, promote_options="default").combine_chunks()
    return out.take(pc.sort_indices(out, sort_keys=[("doc_id", "ascending")]))
