"""Functions library tests: dedup family with planted duplicates, similarity
search vs a numpy ground truth, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def doc_dir(tmp_path_factory):
    """documents.parquet with planted exact + near duplicates."""
    d = tmp_path_factory.mktemp("docs")
    rng = np.random.default_rng(3)
    vocab = np.array("alpha beta gamma delta epsilon zeta eta theta".split())
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(40)]
    texts[10] = texts[0]  # exact dup of 0
    texts[11] = texts[1]  # exact dup of 1
    words2 = texts[2].split()
    words2[5] = "CHANGED"
    texts[12] = " ".join(words2)  # near dup of 2
    t = pa.table(
        {
            "doc_id": pa.array(range(40), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * 40,
            "source": ["synthetic"] * 40,
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("emb")
    rng = np.random.default_rng(4)
    mat = rng.standard_normal((50, 16)).astype(np.float32)
    mat[20] = mat[5] + 0.001 * rng.standard_normal(16).astype(np.float32)  # near dup
    t = pa.table(
        {
            "vec_id": pa.array(range(50), type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 3, 50), type=pa.int32()),
        }
    )
    pq.write_table(t, str(d / "embeddings.parquet"))
    return str(d), mat


def test_exact_dedup_drops_planted_dups(ray_session, doc_dir):
    from quanta_ray.functions.dedup import dedup_exact

    out = dedup_exact(doc_dir)
    ids = out.column("doc_id").to_pylist()
    assert 0 in ids and 10 not in ids
    assert 1 in ids and 11 not in ids
    assert len(ids) == 38


def test_minhash_lsh_finds_near_dup(ray_session, doc_dir):
    from quanta_ray.functions.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(doc_dir, jaccard_threshold=0.5)
    got = {(a, b) for a, b in zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist())}
    assert (0, 10) in got  # exact dup: jaccard 1.0
    assert (1, 11) in got
    assert (2, 12) in got  # near dup


def test_simhash_near_dups(ray_session, doc_dir):
    from quanta_ray.functions.dedup import simhash_near_dups

    pairs = simhash_near_dups(doc_dir, max_hamming=10)
    got = {(a, b) for a, b in zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist())}
    assert (0, 10) in got and (1, 11) in got


def test_knn_bruteforce_exact_matches_numpy(ray_session, emb_dir):
    from quanta_ray.functions.simsearch import knn_bruteforce_exact

    d, mat = emb_dir
    out = knn_bruteforce_exact(d, query_ids=(5,), k=3)
    rows = out.to_pylist()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    # ground truth in numpy
    m = mat.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m[5]
    sims[5] = -np.inf
    top = np.argsort(-sims)[:3]
    assert [r["neighbor_id"] for r in rows] == top.tolist()
    assert rows[0]["neighbor_id"] == 20  # planted near-identical vector


def test_knn_bruteforce_integer_key_matches_numpy(ray_session, emb_dir):
    """The registered (oracle-facing) bruteforce ranks on the integer
    score_ppm key — pin it against a from-scratch numpy recomputation of
    the quantize/score/tie-break contract, and the planted near-identical
    vector must still rank first."""
    from quanta_ray.functions.simsearch import knn_bruteforce

    d, mat = emb_dir
    out = knn_bruteforce(d, query_ids=(5,), k=3)
    rows = out.to_pylist()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    q = np.floor(mat.astype(np.float64) * 30.0 + 0.5).astype(np.int64)
    n2 = (q * q).sum(axis=1)
    dots = q @ q[5]
    den = n2 * n2[5]
    den = np.where(den == 0, 1, den)
    mag = (1_000_000 * dots * dots) // den
    score = np.where(dots >= 0, mag, -mag)
    ids = np.arange(len(mat))
    cand = np.nonzero((ids != 5) & (n2 > 0))[0]
    top = cand[np.lexsort((ids[cand], -score[cand]))][:3]
    assert [r["neighbor_id"] for r in rows] == top.tolist()
    assert [r["score_ppm"] for r in rows] == score[top].tolist()
    assert rows[0]["neighbor_id"] == 20  # planted near-identical vector


def test_near_dup_cosine_finds_planted(ray_session, emb_dir):
    from quanta_ray.functions.simsearch import near_dup_cosine

    d, _ = emb_dir
    pairs = near_dup_cosine(d, threshold=0.99)
    got = {(a, b) for a, b in zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist())}
    assert (5, 20) in got


def test_near_dup_cosine_high_threshold(ray_session, emb_dir):
    """The classic 0.9 near-dup bar (not just the fixture-tuned 0.4): the
    planted near-identical pair must still be found, and nothing else in this
    near-orthogonal fixture clears 0.9 — exercising the envelope documented
    in the docstring (per-plane p ≈ 0.9 at cos 0.95 → ~100% band recall)."""
    from quanta_ray.functions.simsearch import near_dup_cosine

    d, _ = emb_dir
    pairs = near_dup_cosine(d, threshold=0.9)
    got = {(a, b) for a, b in zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist())}
    assert got == {(5, 20)}


def test_hot_bucket_star_pairs_keep_exact_cluster(ray_session, tmp_path_factory):
    """An exact-dup cluster LARGER than the hot-bucket cap must survive
    dedup: every band bucket is the whole cluster (identical signatures), so
    pre-fix the cap silently skipped it. Star pairs vs the representative
    keep membership at O(n)."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.dedup import minhash_lsh_pairs, ngram_jaccard_dedup

    d = tmp_path_factory.mktemp("hotdocs")
    rng = np.random.default_rng(9)
    vocab = np.array("alpha beta gamma delta epsilon zeta eta theta".split())
    base = " ".join(rng.choice(vocab, size=30))
    n_cluster = 20  # > max_bucket=8 below
    texts = [base] * n_cluster + [
        " ".join(rng.choice(vocab, size=30)) for _ in range(10)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": texts,
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))

    import quanta_ray.functions.dedup as dd

    orig = dd._pairs_from_buckets

    def capped(*args, **kw):
        kw["max_bucket"] = 8
        return orig(*args, **kw)

    dd._pairs_from_buckets = capped
    try:
        pairs = minhash_lsh_pairs(str(d), jaccard_threshold=0.9)
        got = {(a, b) for a, b in zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist())}
        # every cluster member pairs with representative 0 at jaccard 1.0
        assert {(0, i) for i in range(1, n_cluster)} <= got
        survivors = ngram_jaccard_dedup(str(d), threshold=0.9)
        ids = survivors.column("doc_id").to_pylist()
        assert 0 in ids
        assert not any(i in ids for i in range(1, n_cluster))
    finally:
        dd._pairs_from_buckets = orig


def test_media_plumbing(ray_session):
    from quanta_ray.functions.multimodal import (
        FrameSampler,
        MediaFeatureExtractor,
        media_features,
        synthesize_media_table,
    )

    out = media_features()
    assert out.num_rows == 64
    assert out.column("features").type.list_size == 16
    # deterministic across runs
    out2 = media_features()
    assert out.equals(out2)
    # frame sampler fans out only videos
    t = synthesize_media_table(16)
    frames = FrameSampler()(t)
    kinds = t.column("kind").to_pylist()
    assert (frames.num_rows > 0) == ("video" in kinds)
    # real decode is genuine for uncompressed containers and an explicit
    # honest gate for compressed mimes (codec libs absent in this env)
    compressed = t.slice(0, 1).set_column(
        t.schema.get_field_index("mime"),
        "mime",
        pa.array(["image/jpeg"]),
    )
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(mode="real")(compressed)


def test_knn_ivf_finds_planted_neighbor(ray_session, emb_dir):
    """IVF probe must find the planted near-identical vector: it shares the
    query's coarse centroid by construction (rows-only operator, pinned here
    by a planted fixture instead of a SQL oracle)."""
    from quanta_ray.functions.simsearch import knn_ivf

    d, _ = emb_dir
    out = knn_ivf(d, query_ids=(5,), k=3)
    rows = out.to_pylist()
    assert rows and rows[0]["neighbor_id"] == 20
    assert rows[0]["cosine"] > 0.99


def test_simhash_signatures_deterministic(ray_session, doc_dir):
    from quanta_ray.functions.dedup import simhash_signatures

    a = simhash_signatures(doc_dir)
    b = simhash_signatures(doc_dir)
    assert a.equals(b)
    sig = dict(zip(a.column("doc_id").to_pylist(), a.column("simhash").to_pylist()))
    assert sig[0] == sig[10] and sig[1] == sig[11]  # exact dups → equal signatures


def test_ngram_jaccard_dedup_drops_planted(ray_session, doc_dir):
    from quanta_ray.functions.dedup import ngram_jaccard_dedup

    out = ngram_jaccard_dedup(doc_dir, threshold=0.7)
    ids = set(out.column("doc_id").to_pylist())
    assert 0 in ids and 1 in ids and 2 in ids  # originals survive
    assert 10 not in ids and 11 not in ids  # exact dups dropped
    assert 12 not in ids  # near dup (1 word of 30 changed) dropped


def test_lang_id_planted(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("lang_docs")
    texts = [
        "the cat and the dog are running to the house of the king",
        "der hund und die katze sind ein schönes paar nicht schlecht",
        "你好世界 这是一个测试文档",
        "zzzz qqqq xxxx",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), type=pa.int64()),
            "text": texts,
            "lang": ["en", "de", "zh", "xx"],
            "source": ["synthetic"] * 4,
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))

    from quanta_ray.functions.text import lang_id

    out = lang_id(str(d))
    pred = dict(zip(out.column("doc_id").to_pylist(), out.column("lang_pred").to_pylist()))
    assert pred[0] == "en" and pred[1] == "de" and pred[2] == "zh" and pred[3] == "unknown"


def test_minhash_batched_signatures_match_per_doc():
    """The vectorized batch signature path must equal the per-doc reference
    path (same shingles, same permutations) — pins the explode/reduceat
    machinery against the simple definition."""
    import pandas as pd

    from quanta_ray.functions.dedup import MinHasher, _minhash_sig, _shingle_hashes

    mh = MinHasher()
    texts = pd.Series(
        ["a b c d e f", "", "x y", "a b c d e f g h", "one", "a b c a b c a b c"]
    )
    sig = mh._signatures(texts)
    for i, t in enumerate(texts):
        expect = _minhash_sig(_shingle_hashes(t, mh.k), mh.a, mh.b)
        assert np.array_equal(sig[i], expect), f"doc {i}"


def test_pii_scrub_planted(ray_session, tmp_path_factory):
    """Planted emails/phones are redacted, and the Python-regex engine path
    agrees with the DuckDB RE2 oracle SQL on the same fixture."""
    import duckdb
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("pii_docs")
    texts = [
        "contact me at alice.smith+spam@example.co.uk for details",
        "call 415 555-0199 or (020) 7946 0958 today",
        "clean text with no pii at all",
        "mixed bob@test.org and 12345678901 in one line",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * 4,
            "source": ["synthetic"] * 4,
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))

    from quanta_ray.functions.text import PII_SCRUB_SQL, pii_scrub

    got = pii_scrub(str(d)).to_pandas()
    assert "<EMAIL>" in got.loc[0, "text_clean"] and "alice" not in got.loc[0, "text_clean"]
    assert got.loc[1, "text_clean"].count("<PHONE>") >= 1
    assert got.loc[2, "text_clean"] == texts[2] and got.loc[2, "n_redactions"] == 0
    assert "<EMAIL>" in got.loc[3, "text_clean"] and "<PHONE>" in got.loc[3, "text_clean"]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(PII_SCRUB_SQL).df()
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=True
    )


def test_doc_media_pipeline(ray_session, doc_dir):
    """Document-derived media: schema projection, deterministic features,
    frame fan-out only for 'video' rows."""
    from quanta_ray.functions.multimodal import doc_frame_samples, doc_media_features

    feats = doc_media_features(doc_dir)
    assert feats.num_rows == 40
    assert feats.column("features").type.list_size == 16
    assert feats.equals(doc_media_features(doc_dir))  # deterministic
    frames = doc_frame_samples(doc_dir)
    vids = {i for i in range(40) if i % 3 == 2}
    assert set(frames.column("media_id").to_pylist()) <= vids
    assert frames.num_rows > 0


def test_hll_distinct_accuracy(ray_session):
    """HLL approximate distinct must land within 2% of exact on the driver
    events fixture (m=4096 → ~1.6% standard error)."""
    import duckdb

    from quanta_ray.pipelines.batch_cep import distinct_users_approx

    sf = "/root/testdata/sf0.01"
    est = distinct_users_approx(sf).column("approx_distinct_users")[0].as_py()
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.02, (est, exact)


def test_consistent_sample_matches_sql(ray_session):
    import duckdb
    import pandas as pd

    from quanta_ray.pipelines.batch_cep import CONSISTENT_SAMPLE_SQL, consistent_sample

    sf = "/root/testdata/sf0.01"
    got = consistent_sample(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    want = con.execute(CONSISTENT_SAMPLE_SQL).df()
    pd.testing.assert_frame_equal(
        got.sort_values("event_id").reset_index(drop=True),
        want.sort_values("event_id").reset_index(drop=True),
        check_dtype=True,
    )


def test_dedup_exact_fast_collision_branch(ray_session, doc_dir):
    """The vectorized-hash fast path must equal md5 dedup, including under
    FORCED total hash collision (constant hash fn) — text equality inside
    the bucket separates colliding non-duplicates."""
    from quanta_ray.functions.dedup import dedup_exact, dedup_exact_fast

    want = dedup_exact(doc_dir).column("doc_id").to_pylist()
    got = dedup_exact_fast(doc_dir).column("doc_id").to_pylist()
    assert got == want

    def constant_hash(texts):
        return np.zeros(len(texts), dtype=np.uint64)

    collided = dedup_exact_fast(doc_dir, _hash_fn=constant_hash).column("doc_id").to_pylist()
    assert collided == want


def test_script_stats_planted(ray_session, tmp_path_factory):
    """Codepoint-range classification: planted cjk / latin / other docs land
    in the right groups (the synthetic corpus is all-latin, so the branch
    logic is pinned here)."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.text import script_stats

    d = tmp_path_factory.mktemp("script_docs")
    texts = ["hello world", "the quick fox", "你好世界", "mixed 文本 here", "12345 !!!", ""]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    pq.write_table(t, str(d / "documents.parquet"))
    out = script_stats(str(d))
    got = dict(zip(out.column("script").to_pylist(), out.column("n_docs").to_pylist()))
    assert got == {"cjk": 2, "latin": 2, "other": 2}


def test_shingle_batch_matches_per_doc():
    import pandas as pd

    from quanta_ray.functions.dedup import _shingle_hashes, _shingle_hashes_batch

    rng = np.random.default_rng(17)
    vocab = "a bb ccc dddd ee fff g hh".split()
    texts = ["", "one", "one two", " ".join(rng.choice(vocab, size=rng.integers(1, 40))) ]
    for _ in range(20):
        texts.append(" ".join(rng.choice(vocab, size=rng.integers(1, 60))))
    got = _shingle_hashes_batch(pd.Series(texts), 3)
    for t, g in zip(texts, got):
        assert np.array_equal(g, _shingle_hashes(t, 3)), t


def test_vectorized_text_kernels_match_reference():
    """The batch-vectorized rolling hash and token stats must equal their
    per-row reference forms (hot-path rewrites; values are load-bearing —
    rhash feeds dedup, token stats feed the SQL-checked quality queries)."""
    import re

    import pandas as pd

    from quanta_ray.functions.text import (
        _rolling_hash_batch,
        _rolling_hash_py,
        _token_stats,
    )

    rng = np.random.default_rng(23)
    vocab = "alpha beta Gamma delta42 x 7 éé".split()
    texts = ["", "a", "\x00", "ünïcödé tèxt", "x" * 2500]
    for _ in range(40):
        texts.append(" ".join(rng.choice(vocab, size=rng.integers(0, 80))))
    s = pd.Series(texts)
    got = _rolling_hash_batch(s)
    assert (got == np.array([_rolling_hash_py(t) for t in texts], dtype=np.uint64)).all()
    toks = s.str.findall(re.compile(r"[A-Za-z0-9]+"))
    n, uniq, tot = _token_stats(toks)
    for i, ws in enumerate(toks):
        assert n[i] == len(ws)
        assert uniq[i] == len(set(ws))
        assert tot[i] == sum(map(len, ws))


def test_kmeans_recovers_planted_clusters(ray_session, tmp_path_factory):
    """Three well-separated planted clusters must come back as three pure
    clusters (spherical k-means is deterministic: seeded init, fixed
    iterations)."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.cluster import kmeans_embeddings

    d = tmp_path_factory.mktemp("kmeans_emb")
    rng = np.random.default_rng(3)
    centers = np.eye(3, 8) * 10.0
    mat = np.vstack(
        [centers[i] + 0.05 * rng.standard_normal((20, 8)) for i in range(3)]
    ).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(60), type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], type=pa.list_(pa.float32())),
            "label": pa.array([i // 20 for i in range(60)], type=pa.int32()),
        }
    )
    pq.write_table(t, str(d / "embeddings.parquet"))
    out = kmeans_embeddings(str(d), k=3, iters=5)
    cl = out.column("cluster").to_pylist()
    groups = [set(cl[0:20]), set(cl[20:40]), set(cl[40:60])]
    assert all(len(g) == 1 for g in groups)  # each planted cluster is pure
    assert len(set().union(*groups)) == 3    # and they are distinct
    assert out.equals(kmeans_embeddings(str(d), k=3, iters=5))  # deterministic


def test_asof_join_nulls_and_ties(ray_session, tmp_path_factory):
    """AS-OF semantics pinned: backward lookup, max-orderkey tiebreak on
    equal dates, and left-outer nulls for users with no prior order."""
    import pyarrow.parquet as pq

    from quanta_ray.pipelines.relational import asof_latest_order

    d = tmp_path_factory.mktemp("asof")
    ts = lambda s: pd.Timestamp(s)
    ev = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "ts": pa.array(
                [ts("2024-01-10"), ts("2024-01-02"), ts("2024-01-10"), ts("2024-01-10")],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([7, 7, 8, 9], type=pa.int64()),
            "event_type": ["a"] * 4,
            "value": [0.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    od = pa.table(
        {
            "o_orderkey": pa.array([100, 101, 102, 200], type=pa.int64()),
            "o_custkey": pa.array([7, 7, 7, 8], type=pa.int64()),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": pa.array([10.0, 11.0, 12.0, 20.0], type=pa.float64()),
            "o_orderdate": pa.array(
                # 101 and 102 tie on the date; 102 has the higher key
                [ts("2024-01-01"), ts("2024-01-05"), ts("2024-01-05"), ts("2024-01-20")],
                type=pa.timestamp("us"),
            ),
            "o_orderpriority": ["1"] * 4,
        }
    )
    pq.write_table(ev, str(d / "events.parquet"))
    pq.write_table(od, str(d / "orders.parquet"))
    out = asof_latest_order(str(d)).to_pandas().set_index("event_id")
    assert out.loc[1, "last_orderkey"] == 102  # tie -> max orderkey
    assert out.loc[2, "last_orderkey"] == 100  # backward from 01-02
    assert pd.isna(out.loc[3, "last_orderkey"])  # user 8's order is in the future
    assert pd.isna(out.loc[4, "last_orderkey"])  # user 9 has no orders at all


def test_anti_join_respects_date_predicate(ray_session, tmp_path_factory):
    """Anti-join semantics pinned: a customer with only PRE-cutoff orders
    counts as order-less; one qualifying order removes the customer."""
    import pyarrow.parquet as pq

    from quanta_ray.pipelines.relational import customers_without_orders

    d = tmp_path_factory.mktemp("anti")
    ts = lambda s: pd.Timestamp(s)
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], type=pa.int64()),
            "c_name": ["a", "b", "c"],
            "c_nationkey": pa.array([0, 0, 0], type=pa.int64()),
            "c_acctbal": pa.array([1.0, 2.0, 3.0], type=pa.float64()),
            "c_mktsegment": ["M"] * 3,
        }
    )
    od = pa.table(
        {
            "o_orderkey": pa.array([10, 11], type=pa.int64()),
            "o_custkey": pa.array([1, 2], type=pa.int64()),
            "o_orderstatus": ["O"] * 2,
            "o_totalprice": pa.array([5.0, 6.0], type=pa.float64()),
            # customer 1: post-cutoff order (excluded from result);
            # customer 2: pre-cutoff only (kept); customer 3: none (kept)
            "o_orderdate": pa.array(
                [ts("2001-06-01"), ts("1999-12-31")], type=pa.timestamp("us")
            ),
            "o_orderpriority": ["1"] * 2,
        }
    )
    pq.write_table(cust, str(d / "customer.parquet"))
    pq.write_table(od, str(d / "orders.parquet"))
    out = customers_without_orders(str(d))
    assert out.column("c_custkey").to_pylist() == [2, 3]


def test_followup_range_join_boundaries(ray_session, tmp_path_factory):
    """Range-join interval semantics pinned: (a_ts, a_ts + w] half-open —
    simultaneous pair excluded, exactly-at-window-end included; type and
    user mismatches never pair."""
    import pyarrow.parquet as pq

    from quanta_ray.pipelines.batch_cep import followup_range_join

    d = tmp_path_factory.mktemp("rangejoin")
    ts = lambda s: pd.Timestamp(s)
    ev = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "ts": pa.array(
                [
                    ts("2024-01-01 10:00:00"),  # click, user 7
                    ts("2024-01-01 10:00:00"),  # purchase same instant -> no
                    ts("2024-01-01 10:30:00"),  # purchase at exactly +30m -> yes
                    ts("2024-01-01 10:30:01"),  # purchase 1s past window -> no
                    ts("2024-01-01 10:10:00"),  # purchase, but user 8 -> no
                    ts("2024-01-01 10:05:00"),  # view (wrong type) -> no
                ],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([7, 7, 7, 7, 8, 7], type=pa.int64()),
            "event_type": ["click", "purchase", "purchase", "purchase", "purchase", "view"],
            "value": pa.array([0.0] * 6, type=pa.float64()),
            "props": ["{}"] * 6,
        }
    )
    pq.write_table(ev, str(d / "events.parquet"))
    out = followup_range_join(str(d))
    assert out.to_pydict() == {"a_event_id": [1], "b_event_id": [3], "user_id": [7]}


def test_latest_per_user_rank_and_ties(ray_session, tmp_path_factory):
    """row_number-per-partition pinned: ts DESC with event_id DESC tiebreak,
    capped at n; a user with fewer than n events keeps them all."""
    import pyarrow.parquet as pq

    from quanta_ray.pipelines.batch_cep import latest_events_per_user

    d = tmp_path_factory.mktemp("rank")
    ts = lambda s: pd.Timestamp(s)
    ev = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "ts": pa.array(
                [
                    ts("2024-01-01 10:00:00"),
                    ts("2024-01-01 11:00:00"),
                    ts("2024-01-01 11:00:00"),  # tie with 2 -> higher id first
                    ts("2024-01-01 09:00:00"),
                    ts("2024-01-02 00:00:00"),  # user 8's only event
                ],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([7, 7, 7, 7, 8], type=pa.int64()),
            "event_type": ["click"] * 5,
            "value": pa.array([0.0] * 5, type=pa.float64()),
            "props": ["{}"] * 5,
        }
    )
    pq.write_table(ev, str(d / "events.parquet"))
    out = latest_events_per_user(str(d), n=3).to_pandas()
    u7 = out[out["user_id"] == 7]
    assert u7["event_id"].tolist() == [3, 2, 1]  # ties by id desc; 4 cut by n=3
    assert u7["rn"].tolist() == [1, 2, 3]
    assert out[out["user_id"] == 8]["event_id"].tolist() == [5]


def test_grouped_quantiles_match_bruteforce(ray_session, tmp_path_factory):
    """Per-group integer-percentile counting form vs a direct per-group
    computation of 'smallest v with count(<=v)*100 >= q*n'."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.text import grouped_length_quantiles

    d = tmp_path_factory.mktemp("gq")
    rng = np.random.default_rng(5)
    langs = np.repeat(["en", "de", "fr"], 40)
    n_chars = rng.integers(10, 500, size=120)
    t = pa.table(
        {
            "doc_id": pa.array(range(120), type=pa.int64()),
            "text": ["x"] * 120,
            "lang": pa.array(langs),
            "source": ["s"] * 120,
            "n_chars": pa.array(n_chars, type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    out = grouped_length_quantiles(str(d), qs=(50, 90)).to_pandas()
    for lang in ["de", "en", "fr"]:
        vals = np.sort(n_chars[langs == lang])
        n = len(vals)
        for q in (50, 90):
            expect = vals[np.searchsorted(np.arange(1, n + 1) * 100, q * n, side="left")]
            got = out[(out["lang"] == lang) & (out["q"] == q)]["n_chars"].iloc[0]
            assert got == expect, (lang, q, got, expect)


def test_heavy_hitters_planted_skew(ray_session, tmp_path_factory):
    """Approximate heavy hitters on planted skew: the true heavy keys are
    reported with EXACT counts (they make every block's top-m) and the
    slack bound is honest (>= any undercount; here the tail fits in m so
    slack collapses to 0)."""
    import pyarrow.parquet as pq

    from quanta_ray.pipelines.batch_cep import heavy_hitters_users

    d = tmp_path_factory.mktemp("hh")
    # 3 heavy users (1000, 600, 300 events) over a 50-user uniform tail
    users = np.concatenate(
        [
            np.full(1000, 1),
            np.full(600, 2),
            np.full(300, 3),
            np.tile(np.arange(100, 150), 4),
        ]
    )
    rng = np.random.default_rng(7)
    rng.shuffle(users)
    n = len(users)
    ev = pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array(
                pd.to_datetime("2024-01-01") + pd.to_timedelta(range(n), unit="s")
            ),
            "user_id": pa.array(users, type=pa.int64()),
            "event_type": ["click"] * n,
            "value": pa.array([0.0] * n, type=pa.float64()),
            "props": ["{}"] * n,
        }
    )
    pq.write_table(ev, str(d / "events.parquet"))
    out = heavy_hitters_users(str(d), k=3, m=256).to_pandas()
    assert out["user_id"].tolist() == [1, 2, 3]
    assert out["cnt_lower"].tolist() == [1000, 600, 300]  # exact: m covers tail
    assert (out["max_slack"] == 0).all()
    # tiny m: the guarantee is "any key with true count > max_slack is
    # present, and reported counts never exceed the truth"
    out2 = heavy_hitters_users(str(d), k=3, m=2).to_pandas()
    slack = int(out2["max_slack"].iloc[0])
    assert slack > 0
    true_counts = {1: 1000, 2: 600, 3: 300}
    for uid, cnt in true_counts.items():
        if cnt > slack:
            assert uid in set(out2["user_id"])
    for _, row in out2.iterrows():
        assert row["cnt_lower"] <= true_counts.get(row["user_id"], 4)


def test_stratified_sample_balanced_and_deterministic(ray_session, tmp_path_factory):
    """Per-group sample: each lang yields min(per_group, group_size) docs,
    identical across runs (hash order, no RNG)."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.text import stratified_sample

    d = tmp_path_factory.mktemp("strat")
    langs = ["en"] * 50 + ["de"] * 30 + ["zh"] * 3  # zh smaller than per_group
    n = len(langs)
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": ["x"] * n,
            "lang": pa.array(langs),
            "source": ["s"] * n,
            "n_chars": pa.array([1] * n, type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    out = stratified_sample(str(d), per_group=10).to_pandas()
    assert out.groupby("lang").size().to_dict() == {"de": 10, "en": 10, "zh": 3}
    again = stratified_sample(str(d), per_group=10).to_pandas()
    assert out.equals(again)


def test_dedup_clusters_long_chain(ray_session, tmp_path_factory):
    """Pointer-jumping CC must close a LONG chain (24 identical docs =>
    23-edge chain) well inside max_rounds, and leave singletons alone."""
    from quanta_ray.functions.dedup import dedup_clusters

    d = tmp_path_factory.mktemp("chain_docs")
    texts = ["dup dup dup"] * 24 + [f"unique text {i}" for i in range(6)]
    t = pa.table(
        {
            "doc_id": pa.array(range(30), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * 30,
            "source": ["synthetic"] * 30,
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    out = dedup_clusters(str(d), max_rounds=8).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert len(got) == 30
    for i in range(24):
        assert got[i] == 0, f"doc {i} not folded into chain cluster: {got[i]}"
    for i in range(24, 30):
        assert got[i] == i


def test_dedup_incremental_planted(ray_session, tmp_path_factory):
    """Even ids = existing corpus, odd = new shard: odd dups of existing
    content are dropped, new-internal dups keep one, fresh content kept."""
    from quanta_ray.functions.dedup import dedup_incremental

    d = tmp_path_factory.mktemp("incr_docs")
    texts = {
        0: "already in corpus",
        1: "already in corpus",      # dup of existing -> dropped
        2: "other existing",
        3: "brand new text b",       # new-internal dup group {3, 5} -> keep 3
        5: "brand new text b",
        7: "fresh and unique",       # kept
        9: "already in corpus",      # dup of existing -> dropped
    }
    ids = sorted(texts)
    t = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": [texts[i] for i in ids],
            "lang": ["en"] * len(ids),
            "source": ["synthetic"] * len(ids),
            "n_chars": pa.array([len(texts[i]) for i in ids], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    out = dedup_incremental(str(d))
    assert out.column("doc_id").to_pylist() == [3, 7]


def test_tfidf_rare_token_ranks_first(ray_session, tmp_path_factory):
    """A token unique to one doc must out-rank corpus-wide stopwords."""
    from quanta_ray.functions.text import tfidf_topk

    d = tmp_path_factory.mktemp("tfidf_docs")
    common = "the quick brown fox jumps over the lazy dog"
    texts = [common] * 9 + [common + " zyzzyva"]
    t = pa.table(
        {
            "doc_id": pa.array(range(10), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * 10,
            "source": ["synthetic"] * 10,
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    out = tfidf_topk(str(d), k=3).to_pandas()
    top1 = out[(out["doc_id"] == 9) & (out["rn"] == 1)]
    assert top1["token"].iloc[0] == "zyzzyva"
    assert top1["tfidf"].iloc[0] > 0
    # stopword-only docs: every token everywhere -> idf 0 -> tfidf 0
    assert (out[out["doc_id"] == 0]["tfidf"] == 0).all()


def test_funnel_staged_ordering(ray_session, tmp_path_factory):
    """Stage i counts only users whose stage-i event falls strictly after
    their earliest stage-(i-1) completion."""
    from quanta_ray.pipelines.batch_cep import funnel

    d = tmp_path_factory.mktemp("funnel_events")
    TS = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: full ordered funnel
        (1, TS + pd.Timedelta(minutes=1), "view"),
        (1, TS + pd.Timedelta(minutes=2), "click"),
        (1, TS + pd.Timedelta(minutes=3), "purchase"),
        # user 2: click BEFORE first view -> never reaches click stage
        (2, TS + pd.Timedelta(minutes=1), "click"),
        (2, TS + pd.Timedelta(minutes=5), "view"),
        (2, TS + pd.Timedelta(minutes=6), "purchase"),
        # user 3: view only
        (3, TS + pd.Timedelta(minutes=1), "view"),
        # user 4: no view at all -> not even stage 0
        (4, TS + pd.Timedelta(minutes=1), "purchase"),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": [r[2] for r in rows],
            "value": pa.array([1.0] * len(rows)),
            "props": ["{}"] * len(rows),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    out = funnel(str(d)).to_pandas()
    assert out["n_users"].tolist() == [3, 1, 1]


def test_near_dup_clusters_transitive_chain(ray_session, tmp_path_factory):
    """A~B and B~C near-dup (but A,C farther apart) must fold into ONE
    cluster via connected components — the non-transitivity case pairwise
    drop logic cannot represent."""
    from quanta_ray.functions.dedup import near_dup_clusters

    d = tmp_path_factory.mktemp("chain_near_docs")
    rng = np.random.default_rng(11)
    vocab = np.array("alpha beta gamma delta epsilon zeta eta theta".split())
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(20)]
    base = texts[2].split()
    mid = list(base)
    mid[7] = "CHANGED7"          # B: 1 of 40 words differs from A
    far = list(mid)
    far[23] = "CHANGED23"        # C: differs from B by 1, from A by 2
    texts[5], texts[9] = " ".join(mid), " ".join(far)
    t = pa.table(
        {
            "doc_id": pa.array(range(20), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * 20,
            "source": ["synthetic"] * 20,
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    out = near_dup_clusters(str(d), jaccard_threshold=0.7).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got[2] == 2 and got[5] == 2 and got[9] == 2, got
    keep = dict(zip(out["doc_id"], out["keep"]))
    assert keep[2] and not keep[5] and not keep[9]
    assert sum(not v for v in keep.values()) == 2  # only the planted chain folds


def test_media_codecs_roundtrip_and_physics():
    """Pure-numpy WAV/BMP codecs: byte-exact round trips and signal
    physics recovered from decoded features (the 'decode is real' pin)."""
    from quanta_ray.functions.media_codec import (
        bmp_features, block_resize, read_bmp, read_wav, wav_features,
        write_bmp, write_wav)

    # WAV: round trip + sine physics (440 Hz -> zcr 880/s, centroid 440 Hz)
    sr, f = 16000, 440.0
    t = np.arange(sr) / sr
    s = (10000 * np.sin(2 * np.pi * f * t)).astype(np.int16)
    buf = write_wav(s, sr)
    sr2, s2 = read_wav(buf)
    assert sr2 == sr and np.array_equal(s, s2)
    ft = wav_features(buf)
    assert abs(ft["zcr"] - 2 * f) < 5
    assert abs(ft["centroid_hz"] - f) < 2
    assert abs(ft["rms"] - 10000 / 32768 / np.sqrt(2)) < 1e-3

    # BMP: round trip through the padded-row path (odd width), solid stats
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(33, 45, 3), dtype=np.uint8)
    assert np.array_equal(read_bmp(write_bmp(img)), img)
    solid = np.full((8, 8, 3), [200, 100, 50], dtype=np.uint8)
    bf = bmp_features(write_bmp(solid))
    assert (bf["mean_r"], bf["mean_g"], bf["mean_b"]) == (200.0, 100.0, 50.0)
    assert bf["std_lum"] < 1e-9
    assert block_resize(img, 4, 4).shape == (4, 4, 3)


def test_real_decode_pipeline_recovers_planted_tone(ray_session):
    """End-to-end actor-pool REAL decode: the per-doc planted tone
    frequency comes back out of the WAV spectral centroid, and BMP
    dimensions/channel stats match the synthesized gradients."""
    from quanta_ray.functions.multimodal import doc_bmp_features, doc_wav_features

    w = doc_wav_features("/root/testdata/sf0.001").to_pandas()
    assert len(w) == 500
    for did in (0, 7, 123):
        feats = np.asarray(w.loc[w["media_id"] == did, "features"].iloc[0])
        expect = 100.0 + (did % 40) * 20.0
        assert abs(feats[4] - expect) < 3, (did, feats[4])   # centroid_hz
        assert abs(feats[3] - 2 * expect) < 12, (did, feats[3])  # zcr

    b = doc_bmp_features("/root/testdata/sf0.001").to_pandas()
    assert len(b) == 500
    f0 = np.asarray(b.loc[b["media_id"] == 0, "features"].iloc[0])
    # gradient image: mean_r == mean of linspace(0,255) rounded to uint8,
    # blue channel == doc_id % 256 == 0
    assert abs(f0[2] - 127.5) < 1.0 and f0[4] == 0.0


def test_real_decode_rejects_compressed_mime():
    from quanta_ray.functions.multimodal import MediaFeatureExtractor

    ex = MediaFeatureExtractor(mode="real")
    with pytest.raises(NotImplementedError):
        ex._real_vec(b"\xff\xd8\xff", "image/jpeg")


def test_y4m_codec_and_planted_scene_change(ray_session):
    """Y4M codec: luma parity with BT.601, and the end-to-end real video
    frame pipeline recovers each doc's PLANTED scene-change frame as the
    motion-feature argmax."""
    from quanta_ray.functions.media_codec import read_y4m, write_y4m
    from quanta_ray.functions.multimodal import doc_y4m_frames

    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(6, 24, 32, 3), dtype=np.uint8)
    w, h, fps, lum = read_y4m(write_y4m(frames, fps=10))
    assert (w, h, fps) == (32, 24, 10) and lum.shape == (6, 24, 32)
    y0 = (0.299 * frames[0, :, :, 0] + 0.587 * frames[0, :, :, 1]
          + 0.114 * frames[0, :, :, 2])
    assert np.abs(lum[0].astype(float) - y0).max() <= 1.0

    out = doc_y4m_frames("/root/testdata/sf0.001").to_pandas()
    assert out["media_id"].nunique() == 500
    for did in (0, 3, 42):
        g = out[out["media_id"] == did].sort_values("frame_idx")
        n_frames = len(g)
        planted = 1 + did % (n_frames - 1)
        assert int(g.loc[g["motion"].idxmax(), "frame_idx"]) == planted, did


def test_repetition_stats_brute_force(ray_session, doc_dir):
    """Per-doc bigram repetition fractions match a Counter reference, and a
    maximally repetitive planted doc scores high (Gopher-rule behavior)."""
    from collections import Counter

    from quanta_ray.functions.text import repetition_stats

    out = repetition_stats(doc_dir).to_pandas().set_index("doc_id")
    texts = pq.read_table(doc_dir + "/documents.parquet").to_pandas()
    for _, row in texts.iterrows():
        w = row["text"].split(" ")
        c = Counter(zip(w[:-1], w[1:]))
        got = out.loc[row["doc_id"]]
        assert got["n_bigrams"] == sum(c.values())
        assert got["n_distinct_bigrams"] == len(c)
        assert got["top_bigram_frac"] == pytest.approx(
            max(c.values()) / sum(c.values()), abs=1e-6
        )


def test_repetition_stats_flags_boilerplate(ray_session, tmp_path):
    from quanta_ray.functions.text import repetition_stats

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": ["spam ham " * 50 + "spam", "a b c d e f g h i j"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": pa.array([0, 0], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = repetition_stats(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "dup_bigram_frac"] > 0.9  # boilerplate
    assert out.loc[1, "dup_bigram_frac"] == 0.0  # all-unique


def test_decontaminate_removes_planted_overlap(ray_session, doc_dir):
    """Benchmark = doc 0 (every=997); its exact dup doc 10 contains the
    phrase and must be removed too; everything else survives."""
    from quanta_ray.functions.contamination import decontaminate

    kept = set(decontaminate(doc_dir).column("doc_id").to_pylist())
    assert 0 not in kept and 10 not in kept
    assert kept == set(range(40)) - {0, 10}


def test_blocklist_filter_exact_vs_naive(ray_session, doc_dir):
    """Bloom-prefiltered anti-join returns EXACTLY the naive blocklist
    semantics (no false negatives; positives exact-verified)."""
    import hashlib

    from quanta_ray.functions.contamination import blocklist_filter

    docs = pq.read_table(doc_dir + "/documents.parquet").to_pandas()
    blocked = {
        hashlib.md5(t.encode()).hexdigest()
        for t in docs.loc[docs.doc_id % 101 == 0, "text"]
    }
    expect = sorted(
        int(r.doc_id)
        for r in docs.itertuples()
        if hashlib.md5(r.text.encode()).hexdigest() not in blocked
    )
    got = blocklist_filter(doc_dir).column("doc_id").to_pylist()
    assert got == expect
    assert 0 not in got and 10 not in got  # doc 10 is an exact dup of blocked doc 0


def test_pack_sequences_next_fit_reference(ray_session, doc_dir):
    """Packing matches a brute-force next-fit replay: every doc packed
    exactly once, no sequence exceeds the budget (unless a single doc does),
    and sequence ids are dense per shard in consistent-hash order."""
    import hashlib

    from quanta_ray.functions.curation import pack_sequences

    budget = 96
    out = pack_sequences(doc_dir, budget=budget).to_pandas()
    docs = pq.read_table(doc_dir + "/documents.parquet").to_pandas()
    assert sorted(out.doc_id) == sorted(docs.doc_id)  # each doc exactly once

    docs["n_tokens"] = docs["text"].str.count(" ") + 1
    docs["shard"] = docs["doc_id"] % 8
    docs["k"] = docs["doc_id"].map(lambda v: hashlib.md5(str(v).encode()).hexdigest())
    expect = {}
    for shard, g in docs.sort_values(["k", "doc_id"]).groupby("shard"):
        seq, fill = 0, 0
        for r in g.itertuples():
            if fill and fill + r.n_tokens > budget:
                seq, fill = seq + 1, r.n_tokens
            else:
                fill += r.n_tokens
            expect[r.doc_id] = (shard, seq)
    got = {r.doc_id: (r.shard, r.seq) for r in out.itertuples()}
    assert got == expect
    # budget respected for every multi-doc sequence
    per_seq = out.groupby(["shard", "seq"]).n_tokens.agg(["sum", "count"])
    assert (per_seq.loc[per_seq["count"] > 1, "sum"] <= budget).all()


def test_model_score_matches_reference(ray_session, doc_dir):
    """Hashed-linear scorer matches a direct Python replay of the hashing
    trick + weight table (integer milli-units: association-free)."""
    import hashlib
    import re

    from quanta_ray.functions.text import model_score

    out = model_score(doc_dir).to_pandas().set_index("doc_id")
    docs = pq.read_table(doc_dir + "/documents.parquet").to_pandas()
    word = re.compile(r"[a-z0-9]+")
    for r in docs.itertuples():
        expect = sum(
            (int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 1024)
            * 2654435761 % 1000 - 500
            for t in word.findall(r.text.lower())
        )
        assert out.loc[r.doc_id, "score_milli"] == expect


def test_norm_stats_matches_numpy(ray_session, emb_dir):
    from quanta_ray.functions.simsearch import norm_stats

    d, mat = emb_dir
    out = norm_stats(d).to_pandas().set_index("label")
    labels = pq.read_table(d + "/embeddings.parquet").column("label").to_numpy()
    m = mat.astype(np.float64)
    for lb in np.unique(labels):
        sel = labels == lb
        assert out.loc[lb, "n"] == sel.sum()
        assert out.loc[lb, "mean_norm"] == pytest.approx(
            np.linalg.norm(m[sel], axis=1).mean(), abs=1e-5
        )
        assert out.loc[lb, "mean_dim0"] == pytest.approx(
            m[sel, 0].mean(), abs=1e-5
        )


def test_user_gap_stats_single_event_user_excluded(ray_session, tmp_path):
    """A user with one event has no gap and must be absent; multi-event
    users get exact integer-microsecond gap sums and maxima."""
    from quanta_ray.pipelines.batch_cep import user_gap_stats

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:01", "2024-01-01 00:00:04",
         "2024-01-01 12:00:00"]
    )
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array([7, 7, 7, 9], type=pa.int64()),
            "event_type": ["view"] * 4,
            "value": pa.array([0.0] * 4, type=pa.float64()),
            "props": ["{}"] * 4,
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = user_gap_stats(str(tmp_path)).to_pandas().set_index("user_id")
    assert 9 not in out.index
    assert out.loc[7, "n_gaps"] == 2
    assert out.loc[7, "total_gap_us"] == 4_000_000
    assert out.loc[7, "max_gap_us"] == 3_000_000


def test_curate_train_ready_composition(ray_session, tmp_path):
    """The full assembly line honors every stage: contaminated, blocked,
    low-quality and duplicate docs are gone; survivors are packed within
    budget; and the result equals running the component rules by hand."""
    import hashlib

    from quanta_ray.functions.curation import curate_train_ready

    rng = np.random.default_rng(11)
    vocab = np.array(
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
        "nu xi omicron pi rho sigma tau upsilon".split()
    )
    n = 60
    texts = [" ".join(rng.choice(vocab, size=60)) for _ in range(n)]
    texts[5] = texts[3]  # exact dup — dedup keeps 3
    texts[7] = "spam " * 60  # low TTR — quality-filtered
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * n,
            "source": [f"src{i % 5}" for i in range(n)],
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = curate_train_ready(str(tmp_path), budget=200).to_pandas()

    ids = set(out.doc_id)
    assert 0 not in ids  # benchmark doc (997-selected) removed by its own phrase
    assert 5 not in ids and 7 not in ids  # dup and low-quality removed
    # blocklist: doc 0's hash is blocked (101-selected) — already out
    # every survivor passed mixture: replay the rule
    for r in out.itertuples():
        pre = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
        rate = (int(r.source[3:]) % 4 + 1) * 0.2
        assert pre / float(1 << 32) < rate
    # packing: multi-doc sequences within budget
    per_seq = out.groupby(["shard", "seq"]).n_tokens.agg(["sum", "count"])
    assert (per_seq.loc[per_seq["count"] > 1, "sum"] <= 200).all()


def test_grouped_hll_accuracy(ray_session, tmp_path):
    """Grouped HLL: per-group estimates near exact at cardinalities well
    past the small-range correction regime. Bound = 4% ≈ 2.5σ of the m=4096
    sketch's ~1.6% standard error (a fixed seed draws a fixed deviation;
    group b lands at 2.07% on this one)."""
    from quanta_ray.pipelines.batch_cep import distinct_users_per_type_approx

    rng = np.random.default_rng(6)
    n = 120_000
    types = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    # distinct id spaces of different sizes per group
    uid = np.where(
        types == "a",
        rng.integers(0, 20_000, n),
        np.where(types == "b", rng.integers(100_000, 108_000, n),
                 rng.integers(200_000, 202_000, n)),
    )
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(
                pd.to_datetime("2024-01-01").value // 1000 + np.arange(n),
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array(uid, type=pa.int64()),
            "event_type": pa.array(types, type=pa.string()),
            "value": pa.array(np.zeros(n), type=pa.float64()),
            "props": pa.array(["{}"] * n, type=pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = distinct_users_per_type_approx(str(tmp_path)).to_pandas().set_index("event_type")
    df = pd.DataFrame({"event_type": types, "user_id": uid})
    exact = df.groupby("event_type").user_id.nunique()
    for g in ("a", "b", "c"):
        est = out.loc[g, "approx_distinct_users"]
        assert abs(est - exact[g]) / exact[g] < 0.04, (g, est, exact[g])


def test_decontaminate_ngram_catches_partial_overlap(ray_session, tmp_path):
    """An 8-token overlap ANYWHERE in the doc contaminates it (stricter than
    the substring rule, which only sees the benchmark doc's prefix)."""
    from quanta_ray.functions.contamination import decontaminate_ngram

    bench = "q w e r t y u i o p a s d f g h"  # doc 0 = benchmark (997-select)
    mid = "zz xx " + " ".join(bench.split()[4:12]) + " yy vv"  # 8-gram overlap
    clean = "one two three four five six seven eight nine ten"
    short = "tiny doc"  # < 8 tokens: can never be contaminated
    texts = [bench, mid, clean, short]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    kept = decontaminate_ngram(str(tmp_path)).column("doc_id").to_pylist()
    assert kept == [2, 3]


def test_pattern_match_planted_sequences(ray_session, tmp_path):
    """Planted consecutive view>click>purchase triples are found, including
    overlapping anchors; a triple interrupted by another event type or split
    across users is NOT matched."""
    from quanta_ray.pipelines.batch_cep import pattern_match

    base = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: view,click,purchase then view,click,purchase (2 matches)
        (1, 1, "view"), (2, 1, "click"), (3, 1, "purchase"),
        (4, 1, "view"), (5, 1, "click"), (6, 1, "purchase"),
        # user 2: view,click,ERROR,purchase (interrupted -> no match)
        (7, 2, "view"), (8, 2, "click"), (9, 2, "error"), (10, 2, "purchase"),
        # user 3/4: sequence split across users -> no match
        (11, 3, "view"), (12, 3, "click"), (13, 4, "purchase"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(
                [base + pd.Timedelta(seconds=r[0]) for r in rows],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "event_type": [r[2] for r in rows],
            "value": pa.array([0.0] * len(rows), type=pa.float64()),
            "props": ["{}"] * len(rows),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = pattern_match(str(tmp_path)).to_pandas()
    assert list(out["user_id"]) == [1, 1]
    assert list(out["start_event_id"]) == [1, 4]
    assert list(out["span_us"]) == [2_000_000, 2_000_000]


def test_line_dedup_planted_boilerplate(ray_session, tmp_path):
    """Multi-line docs with a cookie-banner line repeated across >2 docs:
    the banner vanishes from every doc, unique lines survive in order, and a
    doc made ENTIRELY of boilerplate disappears. Result is diffed against
    the registered DuckDB oracle on the same planted fixture (the driver
    corpus is single-line, so this is where the value check bites)."""
    import duckdb

    from quanta_ray.functions.text import LINE_DEDUP_SQL, line_dedup

    banner = "accept all cookies to continue"
    docs = [
        (1, f"alpha unique one\n{banner}\nbravo unique two"),
        (2, f"{banner}\ncharlie distinct"),
        (3, f"delta text here\n{banner}"),
        (4, banner),                       # all-boilerplate -> disappears
        (5, "echo only doc\nfox line"),    # untouched
        (6, "shared twice\ntail six"),     # "shared twice" appears 2x: kept
        (7, "shared twice\ntail seven"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], type=pa.int64()),
            "text": [d[1] for d in docs],
            "lang": ["en"] * len(docs),
            "source": ["web"] * len(docs),
            "n_chars": pa.array([len(d[1]) for d in docs], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    out = line_dedup(str(tmp_path)).to_pandas().set_index("doc_id")
    assert 4 not in out.index
    assert out.loc[1, "text"] == "alpha unique one\nbravo unique two"
    assert out.loc[1, "n_lines_removed"] == 1
    assert out.loc[5, "text"] == "echo only doc\nfox line"
    assert out.loc[6, "text"] == "shared twice\ntail six"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    oracle = con.execute(LINE_DEDUP_SQL).df().set_index("doc_id")
    pd.testing.assert_frame_equal(
        out.astype({"n_lines_kept": "int64", "n_lines_removed": "int64"}),
        oracle.astype({"n_lines_kept": "int64", "n_lines_removed": "int64"}),
    )


def test_value_quantiles_approx_within_bin_width(ray_session):
    """The histogram sketch's percentiles land within one bin width of
    exact numpy percentiles on real driver data."""
    import duckdb

    from quanta_ray.pipelines.batch_cep import value_quantiles_approx

    sf = "/root/testdata/sf0.01"
    out = value_quantiles_approx(sf).to_pandas().set_index("q")
    v = duckdb.sql(
        f"SELECT value FROM read_parquet('{sf}/events.parquet')"
    ).df()["value"].to_numpy()
    width = (v.max() - v.min()) / 4096
    for q in (50, 90, 99):
        exact = np.percentile(v, q)
        assert abs(out.loc[q, "value_approx"] - exact) <= width + 1e-9, (
            q, out.loc[q, "value_approx"], exact, width
        )


def test_near_dup_keep_best_prefers_longest(ray_session, tmp_path):
    """A planted A~B~C near-dup chain where the LONGEST member is neither
    the min id nor an endpoint: keep_best keeps it (and only it) for the
    cluster, while singletons keep themselves."""
    from quanta_ray.functions.dedup import near_dup_keep_best

    rng = np.random.default_rng(11)
    vocab = np.array("alpha beta gamma delta epsilon zeta eta theta".split())
    base = list(rng.choice(vocab, size=40))
    a = " ".join(base)
    b_words = list(base); b_words[5] = "CHANGED"
    b = " ".join(b_words) + " tail tail tail tail tail"   # longest, id 1
    c_words = list(b_words); c_words[20] = "ALSO"
    c = " ".join(c_words)
    texts = [a, b, c] + [" ".join(rng.choice(vocab, size=30)) for _ in range(10)]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["web"] * len(texts),
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = near_dup_keep_best(str(tmp_path), jaccard_threshold=0.5).to_pandas()
    cluster0 = out[out["doc_id"].isin([0, 1, 2])]
    assert cluster0["cluster_id"].nunique() == 1, "chain must fold to one cluster"
    kept = cluster0[cluster0["keep"]]
    assert list(kept["doc_id"]) == [1], "longest member wins, not min id"
    singles = out[~out["doc_id"].isin([0, 1, 2])]
    assert singles["keep"].all()


def test_sessionize_and_count_windows_planted(ray_session, tmp_path):
    """Sessionize: a 31-minute gap splits sessions, a 29-minute gap doesn't;
    count windows: a 7-event user chunks into windows of 5+2 with correct
    first/last timestamps."""
    from quanta_ray.pipelines.batch_cep import count_windows, sessionize

    base = pd.Timestamp("2024-01-01")
    # user 5: events at 0, 29min, 60min (29min gap keeps, 31min gap splits)
    ts = [base, base + pd.Timedelta(minutes=29), base + pd.Timedelta(minutes=60)]
    # user 6: 7 events one second apart
    ts += [base + pd.Timedelta(seconds=i) for i in range(7)]
    uid = [5, 5, 5] + [6] * 7
    t = pa.table(
        {
            "event_id": pa.array(range(1, 11), type=pa.int64()),
            "ts": pa.array(pd.to_datetime(ts), type=pa.timestamp("us")),
            "user_id": pa.array(uid, type=pa.int64()),
            "event_type": ["view"] * 10,
            "value": pa.array([1.0] * 10, type=pa.float64()),
            "props": ["{}"] * 10,
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))

    s = sessionize(str(tmp_path)).to_pandas().set_index("event_id")
    assert list(s.loc[[1, 2, 3], "session_id"]) == [0, 0, 1]
    assert (s.loc[[4, 5, 6, 7, 8, 9, 10], "session_id"] == 0).all()

    w = count_windows(str(tmp_path), size=5).to_pandas()
    u6 = w[w["user_id"] == 6].sort_values("window_id")
    assert list(u6["n_events"]) == [5, 2]
    assert u6.iloc[0]["start_ts"] == base and u6.iloc[0]["end_ts"] == base + pd.Timedelta(seconds=4)
    assert u6.iloc[1]["start_ts"] == base + pd.Timedelta(seconds=5)


def test_semdedup_drops_planted_semantic_dups(ray_session, tmp_path_factory):
    """SemDeDup: identical/near-identical directions collapse to the lowest
    vec_id; orthogonal one-hot vectors all survive regardless of which
    k-means cluster they land in (cosine 0 < tau)."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.cluster import semdedup

    d = tmp_path_factory.mktemp("semdedup_emb")
    rng = np.random.default_rng(7)
    dim = 32
    rows = []
    base = np.zeros(dim); base[0] = 1.0
    for i in range(5):  # ids 0-4: near-identical direction -> dup set of 0
        rows.append(base + 1e-4 * rng.standard_normal(dim))
    other = np.zeros(dim); other[1] = 1.0
    rows.append(other)          # id 5: kept
    rows.append(other.copy())   # id 6: exact dup of 5
    for j in range(20):         # ids 7-26: pairwise-orthogonal one-hots
        v = np.zeros(dim); v[2 + j] = 1.0
        rows.append(v)
    mat = np.vstack(rows).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], type=pa.list_(pa.float32())),
            "label": pa.array([0] * len(mat), type=pa.int32()),
        }
    )
    pq.write_table(t, str(d / "embeddings.parquet"))
    out = semdedup(str(d), k=4, iters=3, tau=0.92)
    df = out.to_pandas().set_index("vec_id")
    assert not df.loc[[1, 2, 3, 4], "kept"].any()
    assert (df.loc[[1, 2, 3, 4], "dup_of"] == 0).all()
    assert not df.loc[6, "kept"] and df.loc[6, "dup_of"] == 5
    kept_ids = set(df.index[df["kept"]])
    assert kept_ids == {0, 5} | set(range(7, 27))
    assert df.loc[df["kept"], "dup_of"].isna().all()
    assert out.equals(semdedup(str(d), k=4, iters=3, tau=0.92))  # deterministic


def test_lm_perplexity_separates_gibberish(ray_session, tmp_path_factory):
    """The corpus-trained trigram LM must score in-distribution repetitive
    text lower (fewer bits/char) than out-of-distribution gibberish, and be
    deterministic; docs too short for a trigram are excluded."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.text import lm_perplexity

    d = tmp_path_factory.mktemp("lm_docs")
    common = "the quick brown fox jumps over the lazy dog and runs away again "
    docs = [common * 4 for _ in range(30)]          # ids 0-29: in-distribution
    docs.append("zqxj vkwp fyhg bnmz qqxz jjwv kkpz")  # id 30: gibberish
    docs.append("ab")                                # id 31: too short
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
            "lang": pa.array(["en"] * len(docs), type=pa.string()),
            "source": pa.array(["web"] * len(docs), type=pa.string()),
            "n_chars": pa.array([len(s) for s in docs], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    out = lm_perplexity(str(d))
    df = out.to_pandas().set_index("doc_id")
    assert 31 not in df.index                       # no trigram -> excluded
    assert df.loc[30, "ppl_bits"] > df.loc[0, "ppl_bits"] + 2.0
    assert (df.loc[0:29, "ppl_bits"] < 4.0).all()
    assert out.equals(lm_perplexity(str(d)))        # deterministic rerun


def test_pca_project_recovers_planted_axis(ray_session, tmp_path_factory):
    """With variance planted along axis 0 (and a little along axis 1), the
    first principal component of the normalized vectors must align with
    axis 0: pc1 ordering matches the axis-0 coordinate ordering, pc1
    variance dominates pc2, and reruns are bit-identical (sign fixed)."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.simsearch import pca_project

    d = tmp_path_factory.mktemp("pca_emb")
    rng = np.random.default_rng(7)
    n, dim = 200, 8
    mat = np.zeros((n, dim))
    mat[:, 0] = rng.normal(0, 5.0, n)     # dominant axis
    mat[:, 1] = rng.normal(0, 0.5, n)     # minor axis
    mat[:, 2:] = rng.normal(0, 0.01, (n, dim - 2))
    mat = mat + 10.0                       # offset: mean-centering must matter
    t = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0] * n, type=pa.int32()),
        }
    )
    pq.write_table(t, str(d / "embeddings.parquet"))
    out = pca_project(str(d)).to_pandas().sort_values("vec_id")
    assert len(out) == n and list(out.columns) == ["vec_id", "pc1", "pc2"]
    # pc1 must carry (almost) all the variance
    assert out["pc1"].var() > 20 * out["pc2"].var()
    # pc1 must be (anti)correlated with the planted axis-0 NORMALIZED coord
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    corr = np.corrcoef(out["pc1"].to_numpy(), norm[:, 0])[0, 1]
    assert abs(corr) > 0.99
    assert out.equals(pca_project(str(d)).to_pandas().sort_values("vec_id"))


def test_dup_spans_flags_shared_substring(ray_session, tmp_path_factory):
    """A long span copied verbatim between two docs at offsets that DIFFER
    by a non-multiple of the sampling rate (7 vs 0 — the phase-shifted
    duplication a doc-relative strided grid structurally misses) must be
    flagged in BOTH docs: content-defined anchors depend only on local
    text, so the shared span anchors identically regardless of offset. A
    unique doc must report zero dup windows, and sub-width docs are absent
    (no window exists)."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.dedup import dup_spans

    d = tmp_path_factory.mktemp("span_docs")
    words = [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
        "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
        "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
        "victor", "whiskey", "xray",
    ]
    # 589 varied chars -> 19 content anchors whose windows fit in the span
    shared = " ".join(w + str(i) for i, w in enumerate(words * 3))
    docs = [
        "abcdefg" + shared,                    # 0: span at offset 7
        shared + " unique suffix beta " * 8,   # 1: span at offset 0
        "completely different text with no repeated content at all " * 4,  # 2
        "tiny",                                # 3: shorter than width
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
            "lang": pa.array(["en"] * len(docs), type=pa.string()),
            "source": pa.array(["web"] * len(docs), type=pa.string()),
            "n_chars": pa.array([len(s) for s in docs], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    out = dup_spans(str(d)).to_pandas().set_index("doc_id")
    assert 3 not in out.index
    assert out.loc[0, "n_dup_windows"] >= 1
    assert out.loc[1, "n_dup_windows"] >= 1
    assert out.loc[2, "n_dup_windows"] == 0
    assert (out["n_windows"] >= out["n_dup_windows"]).all()


def test_dsir_weights_prefer_target_vocabulary(ray_session, tmp_path_factory):
    """DSIR importance weights must rank docs written in the target
    domain's vocabulary above docs from a disjoint vocabulary, score the
    target docs themselves highest, and be deterministic."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.text import dsir_weights

    d = tmp_path_factory.mktemp("dsir_docs")
    med = "patient dosage clinical trial symptom therapy diagnosis treatment "
    web = "click subscribe channel video gaming stream meme viral trending "
    docs, srcs = [], []
    for i in range(20):                      # target domain sample
        docs.append(med * 3)
        srcs.append("src1")
    for i in range(10):                      # in-domain docs OUTSIDE target
        docs.append(med * 2 + "extra ")
        srcs.append("src2")
    for i in range(10):                      # out-of-domain docs
        docs.append(web * 3)
        srcs.append("src2")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
            "lang": pa.array(["en"] * len(docs), type=pa.string()),
            "source": pa.array(srcs, type=pa.string()),
            "n_chars": pa.array([len(s) for s in docs], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    out = dsir_weights(str(d), target_source="src1")
    df = out.to_pandas().set_index("doc_id")
    in_domain = df.loc[20:29, "dsir_weight"]
    out_domain = df.loc[30:39, "dsir_weight"]
    assert in_domain.min() > out_domain.max() + 0.5  # clear separation
    assert df.loc[0:19, "dsir_weight"].min() >= in_domain.max() - 1e-9
    assert out.equals(dsir_weights(str(d), target_source="src1"))


def test_knn_pq_finds_planted_neighbor(ray_session, emb_dir):
    """PQ-ADC approximate search must still put the planted near-identical
    vector first for its query (quantization error << the planted margin),
    and be deterministic (seeded sample init, fixed Lloyd iterations)."""
    from quanta_ray.functions.simsearch import knn_pq

    d, _ = emb_dir
    out = knn_pq(d, query_ids=(5,), k=5, m=4, ksub=8)
    df = out.to_pandas()
    assert df.iloc[0]["neighbor_id"] == 20   # the planted near-dup of vec 5
    assert df.iloc[0]["rank"] == 1
    assert out.equals(knn_pq(d, query_ids=(5,), k=5, m=4, ksub=8))


def test_knn_ivfpq_finds_planted_neighbor(ray_session, emb_dir):
    """IVFADC: the planted near-identical vector shares its query's coarse
    list and has ~zero residual distance, so it must rank first; seeded
    training makes reruns identical."""
    from quanta_ray.functions.simsearch import knn_ivfpq

    d, _ = emb_dir
    out = knn_ivfpq(d, query_ids=(5,), k=5, n_centroids=4, nprobe=2, m=4, ksub=8)
    df = out.to_pandas()
    assert df.iloc[0]["neighbor_id"] == 20
    assert df.iloc[0]["rank"] == 1
    assert out.equals(
        knn_ivfpq(d, query_ids=(5,), k=5, n_centroids=4, nprobe=2, m=4, ksub=8)
    )


def test_perplexity_buckets_terciles_per_language(ray_session, tmp_path_factory):
    """CCNet buckets: within each language the head/middle/tail thirds must
    be ordered by perplexity (max head ppl <= min middle ppl <= min tail
    ppl), gibberish must land in the tail, and reruns are bit-identical."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.text import perplexity_buckets

    d = tmp_path_factory.mktemp("ppl_bucket_docs")
    common = "the quick brown fox jumps over the lazy dog and runs away again "
    docs, langs = [], []
    for i in range(24):                       # en: varying cleanliness
        noise = " zqxj" * (i // 2)
        docs.append(common * 3 + noise)
        langs.append("en")
    docs.append("zzqqxxjj vvkkww ppzz qqxxzz jjwwvv kkppzz mmnnbb")  # en gibberish
    langs.append("en")
    for i in range(9):                        # second language, its own terciles
        docs.append("der schnelle braune fuchs springt " * (2 + i % 3))
        langs.append("de")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "source": pa.array(["web"] * len(docs), type=pa.string()),
            "n_chars": pa.array([len(s) for s in docs], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    out = perplexity_buckets(str(d))
    df = out.to_pandas()
    assert set(df.columns) == {"doc_id", "lang", "ppl_bits", "ppl_bucket"}
    for lang, g in df.groupby("lang"):
        by = {b: s["ppl_bits"] for b, s in g.groupby("ppl_bucket")}
        assert set(by) <= {"head", "middle", "tail"} and "head" in by
        if "middle" in by:
            assert by["head"].max() <= by["middle"].min()
        if "tail" in by:
            assert by["tail"].min() >= max(
                by[b].max() for b in ("head", "middle") if b in by
            )
    # the gibberish doc is the worst of its language -> tail
    assert df.set_index("doc_id").loc[24, "ppl_bucket"] == "tail"
    assert out.equals(perplexity_buckets(str(d)))


def test_outlier_scores_flags_far_vector(ray_session, tmp_path_factory):
    """A vector orthogonal to two tight planted clusters must get the
    maximum distance-to-prototype and the outlier flag; in-cluster vectors
    must not be flagged; reruns are bit-identical."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.cluster import outlier_scores

    d = tmp_path_factory.mktemp("outlier_emb")
    rng = np.random.default_rng(3)
    dim, per = 8, 40
    a = np.zeros(dim); a[0] = 1.0
    b = np.zeros(dim); b[1] = 1.0
    rows = []
    for base in (a, b):
        for _ in range(per):
            rows.append(base + rng.normal(0, 0.02, dim))
    far = np.zeros(dim); far[7] = 1.0          # orthogonal to both clusters
    rows.append(far)
    mat = np.asarray(rows)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(rows)), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0] * len(rows), type=pa.int32()),
        }
    )
    pq.write_table(t, str(d / "embeddings.parquet"))
    out = outlier_scores(str(d), k=2, iters=4, tail_frac=0.02)
    df = out.to_pandas().set_index("vec_id")
    far_id = len(rows) - 1
    assert df["cos_dist"].idxmax() == far_id
    assert bool(df.loc[far_id, "is_outlier"])
    assert not df.drop(index=far_id)["is_outlier"].any()
    assert out.equals(outlier_scores(str(d), k=2, iters=4, tail_frac=0.02))


def test_winnow_pairs_planted(ray_session, tmp_path_factory):
    """Winnowing guarantee: two docs sharing a substring of >= w+k-1 bytes
    share >= 1 fingerprint; with a long shared passage they share many, so
    the planted pair must surface with a high n_shared while unrelated
    random-vocab docs stay un-paired at min_shared=3."""
    from quanta_ray.functions.dedup import winnow_pairs

    d = tmp_path_factory.mktemp("winnow")
    rng = np.random.default_rng(7)
    vocab = np.array("kappa lambda mu nu xi omicron pi rho sigma tau".split())
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(20)]
    shared = "the quick brown fox jumps over the lazy dog again and again"
    texts[3] = texts[3][:50] + " " + shared + " " + texts[3][50:]
    texts[9] = shared + " " + texts[9]
    t = pa.table(
        {
            "doc_id": pa.array(range(20), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * 20,
            "source": ["synthetic"] * 20,
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))

    out = winnow_pairs(str(d), min_shared=3).to_pandas()
    planted = out[(out["a"] == 3) & (out["b"] == 9)]
    assert len(planted) == 1, f"planted pair missing: {out}"
    # the 60-byte shared passage yields many shared fingerprints
    assert int(planted["n_shared"].iloc[0]) >= 5
    # determinism: a second run returns the identical table
    out2 = winnow_pairs(str(d), min_shared=3).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_minhash_containment_planted(ray_session, tmp_path_factory):
    """A short doc quoted VERBATIM inside a long doc: containment ~1.0
    while Jaccard is diluted small — the asymmetric detector must surface
    the pair that the Jaccard query misses."""
    from quanta_ray.functions.dedup import minhash_containment, minhash_lsh_pairs

    d = tmp_path_factory.mktemp("contain")
    rng = np.random.default_rng(11)
    vocab = np.array("ares bion ceto dia eos faun gaia hebe ixio kore".split())
    texts = [" ".join(rng.choice(vocab, size=60)) for _ in range(15)]
    quote = " ".join(rng.choice(vocab, size=45))
    texts[4] = quote  # the short doc IS the quote
    # long doc = quote + a 25-word tail: containment(smaller) ~ 1.0 but
    # Jaccard ~ 0.6 — below the pairs query's 0.7 default, inside the LSH
    # bands' near-certain collision range (recall caveat in the docstring)
    texts[8] = quote + " " + " ".join(rng.choice(vocab, size=25))
    t = pa.table(
        {
            "doc_id": pa.array(range(15), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * 15,
            "source": ["synthetic"] * 15,
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))

    cont = minhash_containment(str(d), containment_threshold=0.9).to_pandas()
    hit = cont[(cont["a"] == 4) & (cont["b"] == 8)]
    assert len(hit) == 1, f"contained pair missing: {cont}"
    assert float(hit["containment"].iloc[0]) >= 0.9
    # the default-threshold Jaccard query MISSES the same pair (diluted)
    jac = minhash_lsh_pairs(str(d), jaccard_threshold=0.7).to_pandas()
    assert len(jac[(jac["a"] == 4) & (jac["b"] == 8)]) == 0
    jall = minhash_lsh_pairs(str(d), jaccard_threshold=0.0).to_pandas()
    jrow = jall[(jall["a"] == 4) & (jall["b"] == 8)]
    assert len(jrow) == 1 and float(jrow["jaccard"].iloc[0]) < 0.7


def test_image_phash_planted_groups(ray_session):
    """pHash near-dup: every emitted pair is intra-group (same base image,
    different noise), coverage of the planted quads is high, hamming obeys
    the cap, and the hash itself is noise-robust (same-group hamming small,
    cross-group large)."""
    from quanta_ray.functions.multimodal import image_phash_near_dups

    t = image_phash_near_dups("/root/testdata/sf0.001").to_pandas()
    assert len(t) > 0
    assert (t["a"] // 4 == t["b"] // 4).all()          # no cross-group pair
    assert (t["hamming"] <= 3).all()
    # coverage: groups of 4 -> 6 intra pairs each; noise can push a few
    # past the hamming cap, but the vast majority must be recovered
    n_docs = 500
    assert len(t) >= 0.9 * (n_docs // 4) * 6


def test_phash_noise_robust_and_distinct():
    """Unit pin for the hash itself: +/-4 noise on the same low-frequency
    field gives hamming <= 3; independent fields give hamming >> 3."""
    import numpy as np

    from quanta_ray.functions.media_codec import write_bmp
    from quanta_ray.functions.multimodal import PHasher

    ph = PHasher()

    def img(gid, noise_seed):
        rng = np.random.default_rng(900_000 + gid)
        low = rng.normal(0.0, 1.0, (6, 6))
        field = np.kron(low, np.ones((8, 8)))
        field = (field - field.min()) / max(field.ptp(), 1e-9) * 220.0 + 16.0
        noise = np.random.default_rng(noise_seed).integers(-4, 5, field.shape)
        g = np.clip(field + noise, 0, 255).astype(np.uint8)
        return write_bmp(np.stack([g, g, g], axis=2))

    def ham(h1, h2):
        return bin(int(h1, 16) ^ int(h2, 16)).count("1")

    same = ham(ph._hash(img(1, 10)), ph._hash(img(1, 11)))
    diff = ham(ph._hash(img(1, 10)), ph._hash(img(2, 10)))
    assert same <= 3, same
    assert diff > 10, diff


def test_audio_segments_planted_bursts(ray_session):
    """Segment COUNT equals the planted 1 + doc_id % 4 for EVERY document,
    and each boundary is within one 20 ms frame of the planted burst edge
    (bursts at [100 + i*250, 250 + i*250] ms)."""
    from quanta_ray.functions.multimodal import audio_segments

    t = audio_segments("/root/testdata/sf0.001").to_pandas()
    counts = t.groupby("doc_id")["seg_idx"].size()
    assert len(counts) == 500
    for did, n in counts.items():
        assert n == 1 + did % 4, (did, n)
    start_err = (t["start_ms"] - (100 + t["seg_idx"] * 250)).abs()
    end_err = (t["end_ms"] - (250 + t["seg_idx"] * 250)).abs()
    assert int(start_err.max()) <= 20 and int(end_err.max()) <= 20


def test_matryoshka_recall_matches_numpy(ray_session, emb_dir):
    """Full-dim recall is 1.0 by construction, and every truncated level's
    recall equals a from-scratch numpy recomputation (truncate -> renorm ->
    exact top-k -> intersect with the full-dim set)."""
    from quanta_ray.functions.simsearch import matryoshka_recall

    d, mat = emb_dir
    out = matryoshka_recall(d, query_ids=(3, 5), k=4).to_pandas()
    assert set(out["dims"]) == {16, 8, 4, 2}
    assert (out.loc[out["dims"] == 16, "recall"] == 1.0).all()

    m = mat.astype(np.float64)

    def topk(dd, qid, k=4):
        sub = m[:, :dd]
        n = np.linalg.norm(sub, axis=1, keepdims=True)
        n[n == 0] = 1.0
        sub = sub / n
        s = sub @ sub[qid]
        ids = np.arange(len(m))
        cand = ids[ids != qid]
        order = cand[np.lexsort((ids[cand], -s[cand]))]
        return set(order[:k])

    for qid in (3, 5):
        truth = topk(16, qid)
        for dd in (16, 8, 4, 2):
            got_row = out[(out["dims"] == dd) & (out["query_id"] == qid)]
            want = len(topk(dd, qid) & truth) / len(truth)
            assert float(got_row["recall"].iloc[0]) == round(want, 6), (dd, qid)


def _bpe_reference(word_freqs: dict, n_merges: int):
    """From-scratch single-threaded Sennrich-style BPE for the planted pin."""
    seqs = {w: list(w) + ["</w>"] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        cnt = {}
        for w, seq in seqs.items():
            f = word_freqs[w]
            for p in zip(seq[:-1], seq[1:]):
                cnt[p] = cnt.get(p, 0) + f
        if not cnt:
            break
        (l, r), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if c <= 1:
            break
        merges.append((l, r, c))
        for w, seq in seqs.items():
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == l and seq[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[w] = out
    return merges


def test_bpe_merges_match_reference_and_shard_invariant(ray_session):
    """The distributed merge table equals the single-threaded reference on
    the classic low/lower/newest/widest corpus, and is IDENTICAL at 1 and 4
    shards (the cross-shard pair-count sum is exact, not approximate)."""
    from quanta_ray.functions.bpe import bpe_merges_from_counts

    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    want = _bpe_reference(wf, 12)
    got1 = bpe_merges_from_counts(list(wf), list(wf.values()), 12, n_shards=1)
    got4 = bpe_merges_from_counts(list(wf), list(wf.values()), 12, n_shards=4)
    assert got1 == want
    assert got4 == want
    # the classic first merges: ('e','s') then ('es','t') then ('est','</w>')
    assert want[0][:2] == ("e", "s")
    assert want[1][:2] == ("es", "t")


def test_bpe_merges_corpus_smoke(ray_session, doc_dir):
    from quanta_ray.functions.bpe import bpe_merges

    t = bpe_merges(doc_dir, n_merges=10, n_shards=3)
    assert t.num_rows > 0
    assert t.column("round").to_pylist() == list(range(1, t.num_rows + 1))
    # counts are non-increasing is NOT guaranteed for BPE, but every
    # emitted merge must have repeated at least twice
    assert min(t.column("pair_count").to_pylist()) >= 2


def test_bpe_token_counts_match_reference(ray_session, doc_dir):
    """Every doc's BPE token count equals a from-scratch recompute: train
    the reference merge table on the same word counts, encode each doc
    word-by-word with the reference merges."""
    import re

    import pyarrow.parquet as pq2

    from quanta_ray.functions.bpe import bpe_token_counts

    got = bpe_token_counts(doc_dir, n_merges=10).to_pandas()
    docs = pq2.read_table(doc_dir + "/documents.parquet").to_pandas()
    word = re.compile(r"[a-z0-9]+")
    wf = {}
    for t in docs["text"]:
        for w in word.findall(t.lower()):
            wf[w] = wf.get(w, 0) + 1
    merges = _bpe_reference(wf, 10)
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}

    def enc(w):
        seq = list(w) + ["</w>"]
        while len(seq) > 1:
            best, bi = None, -1
            for i in range(len(seq) - 1):
                r = ranks.get((seq[i], seq[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            seq[bi : bi + 2] = [seq[bi] + seq[bi + 1]]
        return len(seq)

    want = {
        int(d): sum(enc(w) for w in word.findall(t.lower()))
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    assert {int(d): int(n) for d, n in zip(got["doc_id"], got["n_bpe_tokens"])} == want


def test_absence_join_planted(ray_session, tmp_path_factory):
    """Absence (notFollowedBy) semantics pinned: window is half-open
    (simultaneous B does NOT answer), inclusive at +30min, same-user only,
    and a B before A never answers."""
    import pyarrow.parquet as pq

    from quanta_ray.pipelines.batch_cep import absence_join

    d = tmp_path_factory.mktemp("absence")
    t0 = pd.Timestamp("2024-03-01 12:00:00")
    mins = lambda m: t0 + pd.Timedelta(minutes=m)
    ev = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8, 9], pa.int64()),
            "ts": pa.array(
                [
                    mins(0),   # 1: u1 click, answered by 2
                    mins(10),  # 2: u1 purchase
                    mins(60),  # 3: u1 click, purchase at exactly +30 -> answered
                    mins(90),  # 4: u1 purchase (60 + 30)
                    mins(200), # 5: u2 click, simultaneous purchase does NOT answer
                    mins(200), # 6: u2 purchase (same ts)
                    mins(300), # 7: u3 click, only OTHER-user purchase follows
                    mins(310), # 8: u4 purchase (different user)
                    mins(400), # 9: u5 click, purchase exists but BEFORE it
                ],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 1, 1, 2, 2, 3, 4, 5], pa.int64()),
            "event_type": [
                "click", "purchase", "click", "purchase", "click",
                "purchase", "click", "purchase", "click",
            ],
            "value": [0.0] * 9,
            "props": ["{}"] * 9,
        }
    )
    pq.write_table(ev, str(d / "events.parquet"))
    out = absence_join(str(d))
    assert out.column("event_id").to_pylist() == [5, 7, 9]


def test_session_overlap_counts_planted(ray_session, tmp_path_factory):
    """Interval-overlap stabbing count pinned: closed intervals (touching
    endpoints overlap), self excluded, single-event sessions are points."""
    import pyarrow.parquet as pq

    from quanta_ray.pipelines.batch_cep import session_overlap_counts

    d = tmp_path_factory.mktemp("overlap")
    t0 = pd.Timestamp("2024-03-01 00:00:00")
    mins = lambda m: t0 + pd.Timedelta(minutes=m)
    # u1: [0, 10]; u2: [5, 15]; u3: [20, 30]; u4: point at exactly 10
    rows = [
        (1, 1, 0), (2, 1, 10),
        (3, 2, 5), (4, 2, 15),
        (5, 3, 20), (6, 3, 30),
        (7, 4, 10),
    ]
    ev = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([mins(r[2]) for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": ["view"] * len(rows),
            "value": [0.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    pq.write_table(ev, str(d / "events.parquet"))
    out = session_overlap_counts(str(d)).to_pandas().set_index("user_id")
    # u1 [0,10] overlaps u2 [5,15] and the point u4 {10} -> 2
    assert out.loc[1, "n_overlap"] == 2
    # u2 [5,15] overlaps u1 and u4 -> 2; u3 [20,30] nothing -> 0
    assert out.loc[2, "n_overlap"] == 2
    assert out.loc[3, "n_overlap"] == 0
    assert out.loc[4, "n_overlap"] == 2
    assert out.loc[1, "n_events"] == 2 and out.loc[4, "n_events"] == 1


def test_emb_range_search_planted(ray_session, tmp_path_factory):
    """Quantized-cosine range search pinned: near-parallel pair passes with
    the exact integer dot, orthogonal and sub-threshold pairs are excluded,
    each unordered pair emitted once (a_id < b_id)."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.simsearch import range_search

    d = tmp_path_factory.mktemp("rsearch")
    emb = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [1.0, 0.1], [0.0, 1.0]], pa.list_(pa.float32())
            ),
            "label": pa.array([0, 0, 1], pa.int32()),
        }
    )
    pq.write_table(emb, str(d / "embeddings.parquet"))
    out = range_search(str(d))
    # q0=[100,0], q1=[100,10], q2=[0,100]: only (0,1) passes tau=0.35
    # (0,2): dot=0 excluded; (1,2): 400*1000^2 < 49*10100*10000 excluded
    assert out.column("a_id").to_pylist() == [0]
    assert out.column("b_id").to_pylist() == [1]
    assert out.column("dot").to_pylist() == [10000]


def test_sharded_paths_bit_identical(ray_session, monkeypatch):
    """The sharded broadcast paths (corpus rows > QUANTA_CORPUS_BROADCAST_LIMIT
    -> per-shard ``ray.put`` + streaming pass + merge) are pinned against the
    single-broadcast path on the real sf0.001 embeddings (500 rows -> 4
    shards at limit 150): range_search and knn_graph are BIT-identical
    (each query/pair completes within one shard's pass), and the
    graph-search's per-shard local-graph merge keeps the recall bar."""
    import numpy as np

    from quanta_ray.functions.simsearch import (
        _batch_matrix, _concat, _emb, knn_graph, knn_graph_search,
        range_search,
    )

    sf = "/root/testdata/sf0.001"
    whole_rs = range_search(sf).to_pandas()
    whole_kg = knn_graph(sf).to_pandas()
    monkeypatch.setenv("QUANTA_CORPUS_BROADCAST_LIMIT", "150")
    shard_rs = range_search(sf).to_pandas()
    shard_kg = knn_graph(sf).to_pandas()
    pd.testing.assert_frame_equal(whole_rs, shard_rs)
    pd.testing.assert_frame_equal(whole_kg, shard_kg)

    got = knn_graph_search(sf).to_pandas()
    t = _concat(_emb(sf))
    ids, mat = _batch_matrix(t)
    o = np.argsort(ids)
    ids, mat = ids[o], mat[o]
    sims = mat @ mat.T
    recalls = []
    for qid, grp in got.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert (grp["neighbor_id"] != qid).all()
        qi = int(np.searchsorted(ids, qid))
        s = sims[qi].copy()
        s[qi] = -2.0
        truth = set(ids[np.lexsort((ids, -s))[:10]].tolist())
        recalls.append(len(truth & set(grp["neighbor_id"])) / 10)
    assert sum(recalls) / len(recalls) >= 0.8
    assert min(recalls) >= 0.5


def test_video_frame_near_dups_planted(ray_session, tmp_path_factory):
    """Frame-level video near-dup pinned on the planted noisy-group corpus:
    every surviving pair joins frames of the SAME doc group and the SAME
    scene segment, never the same video; coverage of the planted
    same-(group, segment) cross-video frame pairs is near-complete."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.multimodal import video_frame_near_dups

    d = tmp_path_factory.mktemp("vdup")
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(24)), pa.int64()),
            "lang": ["en"] * 24,
            "source": ["s"] * 24,
            "text": ["x"] * 24,
            "n_chars": pa.array([1] * 24, pa.int64()),
        }
    )
    pq.write_table(docs, str(d / "documents.parquet"))
    t = video_frame_near_dups(str(d))
    a_doc = t.column("a_doc").to_numpy()
    b_doc = t.column("b_doc").to_numpy()
    a_f = t.column("a_frame").to_numpy()
    b_f = t.column("b_frame").to_numpy()
    assert t.num_rows > 0
    assert (a_doc != b_doc).all()                  # same-video pairs excluded
    assert (a_doc // 4 == b_doc // 4).all()        # intra-group only
    assert ((a_f < 3) == (b_f < 3)).all()          # never across the scene cut
    # planted same-(group, segment) cross-video pairs: 6 groups x 2 segments
    # x (C(12,2) - 4*C(3,2)) = 6 * 2 * 54
    assert t.num_rows >= 0.85 * (6 * 2 * 54)


def test_bpe_fertility_matches_reference(ray_session, doc_dir):
    """Per-language fertility equals a from-scratch recompute: word and
    token totals per lang from the reference tokenizer, ppm ratio exact."""
    import re

    import pyarrow.parquet as pq2

    from quanta_ray.functions.bpe import bpe_fertility

    got = bpe_fertility(doc_dir, n_merges=10).to_pandas().set_index("lang")
    docs = pq2.read_table(doc_dir + "/documents.parquet").to_pandas()
    word = re.compile(r"[a-z0-9]+")
    wf = {}
    for t in docs["text"]:
        for w in word.findall(t.lower()):
            wf[w] = wf.get(w, 0) + 1
    merges = _bpe_reference(wf, 10)
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}

    def enc(w):
        seq = list(w) + ["</w>"]
        while len(seq) > 1:
            best, bi = None, -1
            for i in range(len(seq) - 1):
                r = ranks.get((seq[i], seq[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            seq[bi : bi + 2] = [seq[bi] + seq[bi + 1]]
        return len(seq)

    want: dict[str, list[int]] = {}
    for lang, t in zip(docs["lang"], docs["text"]):
        ws = word.findall(t.lower())
        agg = want.setdefault(str(lang), [0, 0])
        agg[0] += len(ws)
        agg[1] += sum(enc(w) for w in ws)
    assert set(got.index) == set(want)
    for lang, (nw, nt) in want.items():
        assert int(got.loc[lang, "n_words"]) == nw
        assert int(got.loc[lang, "n_bpe_tokens"]) == nt
        assert int(got.loc[lang, "fertility_ppm"]) == (
            (1_000_000 * nt) // nw if nw else 0
        )


def test_cluster_balanced_sample_caps_and_consistency(ray_session):
    """Cluster-balanced sample pinned: per-cluster cap respected, sampled
    rows keep their k-means assignment, membership is the deterministic
    lowest-hash rule (recomputed from the full assignment)."""
    import pandas as pd

    from quanta_ray.functions.cluster import (
        cluster_balanced_sample, kmeans_embeddings,
    )

    sf = "/root/testdata/sf0.001"
    cap = 7
    samp = cluster_balanced_sample(sf, k=8, per_cluster=cap, iters=3).to_pandas()
    full = kmeans_embeddings(sf, k=8, iters=3).to_pandas()
    sizes = samp.groupby("cluster").size()
    assert (sizes <= cap).all()
    merged = samp.merge(full, on="vec_id", suffixes=("_s", "_f"))
    assert (merged["cluster_s"] == merged["cluster_f"]).all()
    # lowest-hash rule recomputed from the full assignment
    full["h"] = pd.util.hash_array(full["vec_id"].to_numpy("int64"))
    want = (
        full.sort_values(["cluster", "h", "vec_id"], kind="mergesort")
        .groupby("cluster", as_index=False)
        .head(cap)
    )
    assert set(samp["vec_id"]) == set(want["vec_id"])
    # full clusters emit exactly the cap
    full_sizes = full.groupby("cluster").size()
    for c, n in full_sizes.items():
        assert sizes.get(c, 0) == min(cap, n)


def test_knn_graph_search_recall(ray_session):
    """Graph-ANN beam search pinned: recall@10 vs the exact scan is high
    on the real sf0.001 embeddings (mean >= 0.8, no query below 0.5), and
    every emitted neighbor list is rank-contiguous and self-free."""
    import numpy as np

    from quanta_ray.functions.simsearch import (
        _batch_matrix, _concat, _emb, knn_graph_search,
    )

    sf = "/root/testdata/sf0.001"
    got = knn_graph_search(sf).to_pandas()
    t = _concat(_emb(sf))
    ids, mat = _batch_matrix(t)
    o = np.argsort(ids)
    ids, mat = ids[o], mat[o]
    sims = mat @ mat.T
    recalls = []
    for qid, grp in got.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert (grp["neighbor_id"] != qid).all()
        qi = int(np.searchsorted(ids, qid))
        s = sims[qi].copy()
        s[qi] = -2.0
        truth = set(ids[np.lexsort((ids, -s))[:10]].tolist())
        recalls.append(len(truth & set(grp["neighbor_id"])) / 10)
    assert sum(recalls) / len(recalls) >= 0.8
    assert min(recalls) >= 0.5


def test_bpe_pack_sequences_matches_reference(ray_session, doc_dir):
    """Token-exact packing equals a sequential replay: reference-retrained
    BPE counts per doc, next-fit per shard in (md5, doc_id) order."""
    import hashlib
    import re

    import pyarrow.parquet as pq2

    from quanta_ray.functions.bpe import bpe_pack_sequences

    BUDGET, SHARDS = 128, 8
    got = bpe_pack_sequences(doc_dir, budget=BUDGET, n_shards=SHARDS,
                             n_merges=10).to_pandas()
    docs = pq2.read_table(doc_dir + "/documents.parquet").to_pandas()
    word = re.compile(r"[a-z0-9]+")
    wf = {}
    for t in docs["text"]:
        for w in word.findall(t.lower()):
            wf[w] = wf.get(w, 0) + 1
    merges = _bpe_reference(wf, 10)
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}

    def enc(w):
        seq = list(w) + ["</w>"]
        while len(seq) > 1:
            best, bi = None, -1
            for i in range(len(seq) - 1):
                r = ranks.get((seq[i], seq[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            seq[bi : bi + 2] = [seq[bi] + seq[bi + 1]]
        return len(seq)

    counts = {
        int(d): sum(enc(w) for w in word.findall(t.lower()))
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    # sequential replay: per shard, (md5, doc_id) order, next-fit
    want = {}
    for s in range(SHARDS):
        members = sorted(
            (d for d in counts if d % SHARDS == s),
            key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d),
        )
        seq, fill = 0, 0
        for i, d in enumerate(members):
            n = counts[d]
            if i == 0:
                fill = n
            elif fill + n <= BUDGET:
                fill += n
            else:
                seq += 1
                fill = n
            want[d] = (s, seq, n)
    got_map = {
        int(r.doc_id): (int(r.shard), int(r.seq), int(r.n_tokens))
        for r in got.itertuples()
    }
    assert got_map == want


def test_audio_fingerprint_near_dups_planted(ray_session, tmp_path_factory):
    """Audio fingerprint dedup pinned on the planted noisy-group corpus:
    every surviving pair is intra-group (precision 1.0) with >= 95%
    coverage of the planted same-recording pairs."""
    import pyarrow.parquet as pq

    from quanta_ray.functions.multimodal import audio_fingerprint_near_dups

    d = tmp_path_factory.mktemp("adup")
    n = 48
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "text": ["x"] * n,
            "n_chars": pa.array([1] * n, pa.int64()),
        }
    )
    pq.write_table(docs, str(d / "documents.parquet"))
    t = audio_fingerprint_near_dups(str(d))
    a = t.column("a").to_numpy()
    b = t.column("b").to_numpy()
    assert t.num_rows > 0
    assert (a // 4 == b // 4).all()  # precision 1.0
    planted = n // 4 * 6  # groups x C(4,2)
    assert t.num_rows >= 0.95 * planted


def test_hll_distinct_accuracy_and_shard_invariance(ray_session):
    """HyperLogLog distinct-per-group pinned on the real events table:
    within 3 sigma of the exact distinct (1.04/sqrt(4096) per register
    theory), deterministic across runs, and BIT-identical at a different
    batch size (register max is commutative/idempotent — the shard-count
    invariance that makes the sketch safe to distribute)."""
    import pyarrow.parquet as pq2

    from quanta_ray.functions import sketch

    sf = "/root/testdata/sf0.01"
    got = sketch.hll_distinct(sf).to_pandas()
    ev = pq2.read_table(sf + "/events.parquet", columns=["user_id", "event_type"]).to_pandas()
    exact = ev.groupby("event_type")["user_id"].nunique()
    assert set(got["event_type"]) == set(exact.index)
    tol = 3 * 1.04 / (4096 ** 0.5)  # ~4.9%
    for _, r in got.iterrows():
        true = exact[r["event_type"]]
        assert abs(r["est_distinct"] - true) <= max(2, tol * true), (
            r["event_type"], r["est_distinct"], true,
        )
    again = sketch.hll_distinct(sf).to_pandas()
    pd.testing.assert_frame_equal(got, again)

    # different batching = different partial grouping; the merged registers
    # (and therefore the estimate) must not move
    import ray.data as rd2

    orig = sketch._events

    def small_batches(sf_dir, columns=None):
        return orig(sf_dir, columns).repartition(16)

    sketch._events, got2 = small_batches, None
    try:
        got2 = sketch.hll_distinct(sf).to_pandas()
    finally:
        sketch._events = orig
    pd.testing.assert_frame_equal(got, got2)


def test_cms_heavy_hitters_bounds(ray_session):
    """Count-Min top-k pinned on the real events table: estimates never
    undercount, overcount is within the 3N/w CM bound, the true top-k ids
    are all recovered, and the output is shard-invariant (counter sum is
    fully commutative)."""
    import pyarrow.parquet as pq2

    from quanta_ray.functions import sketch

    sf = "/root/testdata/sf0.01"
    k, w = 10, 2048
    got = sketch.cms_heavy_hitters(sf, k=k, w=w).to_pandas()
    ev = pq2.read_table(sf + "/events.parquet", columns=["user_id"]).to_pandas()
    true = ev["user_id"].value_counts()
    n = len(ev)
    assert len(got) == k
    for _, r in got.iterrows():
        t = int(true.get(r["user_id"], 0))
        assert r["est_count"] >= t, "CM must never undercount"
        assert r["est_count"] <= t + 3 * n / w
    # true top-k all present (strictly-heavier-than-k-th ids can't be lost:
    # min-over-rows estimates only grow counts)
    kth = true.iloc[k - 1]
    must_have = set(true[true > kth].index.tolist())
    assert must_have <= set(got["user_id"].tolist())

    sketch_orig = sketch._events

    def small_batches(sf_dir, columns=None):
        return sketch_orig(sf_dir, columns).repartition(16)

    sketch._events = small_batches
    try:
        got2 = sketch.cms_heavy_hitters(sf, k=k, w=w).to_pandas()
    finally:
        sketch._events = sketch_orig
    pd.testing.assert_frame_equal(got, got2)
