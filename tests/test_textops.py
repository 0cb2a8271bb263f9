"""Behavioral tests for the training-data pipeline ops (textops/).

The driver's DuckDB oracle already checks Spark≡SQL equivalence; these
tests check SEMANTICS on constructed inputs: planted duplicates are
found, ANN matches a numpy oracle, the multimodal plumbing round-trips.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sbm_communitydetection_spark.textops import analysis as TA
from sbm_communitydetection_spark.textops import dedup as TD
from sbm_communitydetection_spark.textops import multimodal as TM
from sbm_communitydetection_spark.textops import similarity as TS

BASE = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
NEAR = "the quick brown fox jumps over the lazy dog near the old stone bridge tonight"
FAR = "completely different words about spark shuffles and parquet column pruning here"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE, "en", "s", len(BASE)),
        (1, BASE, "en", "s", len(BASE)),  # exact dup of 0
        (2, NEAR, "en", "s", len(NEAR)),  # near dup of 0
        (3, FAR, "en", "s", len(FAR)),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


@pytest.fixture(scope="module")
def embs(spark):
    rng = np.random.default_rng(7)
    rows = []
    for label in range(3):
        center = rng.normal(size=8)
        for j in range(5):
            v = center + rng.normal(scale=0.05, size=8)
            rows.append((label * 5 + j, [float(x) for x in v], label))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_exact_dedup_groups(docs):
    res = {r.doc_id: r.keep_id for r in TD.exact_dedup(docs).collect()}
    assert res[0] == 0 and res[1] == 0  # identical texts collapse to min id
    assert res[2] == 2 and res[3] == 3


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r.a, r.b): r.jaccard for r in TD.ngram_jaccard_pairs(docs, threshold=0.4).collect()}
    assert pairs[(0, 1)] == 1.0  # identical
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.7  # one word changed
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {(r.a, r.b) for r in TD.minhash_lsh_dup_pairs(docs, threshold=0.4).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs
    assert (0, 3) not in pairs


def test_near_dup_clusters_transitive_canonical(spark, docs):
    # 0~1 (exact) and 0~2 (near): transitivity puts {0,1,2} in ONE cluster
    # with 0 as the canonical survivor; 3 stays a singleton.
    res = {r.doc_id: (r.cluster_id, r.keep) for r in TD.near_dup_clusters(spark, docs).collect()}
    assert res[0] == (0, 1) and res[1] == (0, 0) and res[2] == (0, 0)
    assert res[3] == (3, 1)
    # survivors of the dedup decision
    assert {d for d, (_, k) in res.items() if k} == {0, 3}


def test_minhash_signature_identical_for_identical_docs(docs):
    sig = TD.minhash_signatures(docs).collect()
    by_doc: dict[int, dict[int, int]] = {}
    for r in sig:
        by_doc.setdefault(r.doc_id, {})[r.hash_id] = r.min_h
    assert by_doc[0] == by_doc[1]
    overlap = sum(1 for h, v in by_doc[0].items() if by_doc[2][h] == v)
    assert overlap > len(by_doc[0]) * 0.5  # near-dup signatures mostly agree


def test_simhash_hamming_orders_similarity(docs):
    fp = {r.doc_id: r.simhash for r in TD.simhash(docs).collect()}
    assert fp[0] == fp[1]
    near = bin(fp[0] ^ fp[2]).count("1")
    far = bin(fp[0] ^ fp[3]).count("1")
    assert near < far


def test_simhash_banded_equals_all_pairs_any_radius(docs):
    # pigeonhole recall must be TOTAL at every radius, including ones
    # where 60 bits don't divide evenly into max_hamming+1 bands
    fp = {r.doc_id: r.simhash for r in TD.simhash(docs).collect()}
    for radius in (0, 3, 6, 9):
        exact = {
            (a, b, bin(fp[a] ^ fp[b]).count("1"))
            for a in fp
            for b in fp
            if a < b and bin(fp[a] ^ fp[b]).count("1") <= radius
        }
        banded = {
            (r.a, r.b, r.hamming)
            for r in TD.simhash_banded_dup_pairs(docs, max_hamming=radius).collect()
        }
        assert banded == exact, f"radius {radius}"


def test_cosine_topk_matches_numpy(embs):
    res = TS.cosine_topk(embs, k=3).collect()
    rows = embs.orderBy("vec_id").collect()
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / np.outer(norms, norms)
    np.fill_diagonal(sims, -np.inf)
    for vec_id in range(len(rows)):
        got = [r.neighbor_id for r in sorted(res, key=lambda r: r.rank) if r.vec_id == vec_id]
        expect = list(np.argsort(np.round(-sims[vec_id], 6), kind="stable")[:3])
        assert got == [int(x) for x in expect], f"vec {vec_id}: {got} vs {expect}"


def test_ivf_topk_neighbors_share_cluster(embs):
    res = TS.ivf_topk(embs, k=3).collect()
    # tight synthetic clusters: every IVF neighbor comes from the same label
    label_of = {r.vec_id: r.label for r in embs.collect()}
    for r in res:
        assert label_of[r.vec_id] == label_of[r.neighbor_id]


def test_embedding_cosine_dup_pairs_threshold(embs):
    pairs = TD.embedding_cosine_dup_pairs(embs, threshold=0.99).collect()
    label_of = {r.vec_id: r.label for r in embs.collect()}
    assert len(pairs) > 0
    for r in pairs:
        assert label_of[r.a] == label_of[r.b]


def test_token_stats_and_quality(docs):
    stats = {r.doc_id: r for r in TA.token_stats(docs).collect()}
    assert stats[0].n_tokens == len(BASE.split(" "))
    q = {r.doc_id: r for r in TA.text_quality(docs).collect()}
    assert 0.0 <= q[0].quality <= 1.0
    assert q[0].stopword_ratio > 0  # 'the' appears


def test_lang_id_deterministic(docs):
    res = {r.doc_id: r.lang_pred for r in TA.lang_id(docs).collect()}
    assert res[0] == "en"  # 'the'/'over' hit the en stopword set


def test_doc_fingerprint_equal_for_identical(docs):
    fp = TA.doc_fingerprint(docs).collect()
    by_doc: dict[int, list[int]] = {}
    for r in sorted(fp, key=lambda r: (r.doc_id, r.rank)):
        by_doc.setdefault(r.doc_id, []).append(r.h)
    assert by_doc[0] == by_doc[1]
    assert by_doc[0] != by_doc[3]


def test_multimodal_decode_plumbing(docs):
    meta = {r.doc_id: r for r in TM.decode_meta(TM.payload_table(docs)).collect()}
    w, h, c = TM.fake_decode_meta(BASE.encode())
    assert (meta[0].width, meta[0].height, meta[0].checksum) == (w, h, c)
    assert meta[0].n_bytes == len(BASE.encode())
    with pytest.raises(NotImplementedError):
        TM.decode_image(b"\x89PNG")


def test_payload_table_schema(docs):
    pt = TM.payload_table(docs)
    assert dict(pt.dtypes)["payload"] == "binary"
    assert pt.filter(F.col("n_bytes") != F.octet_length("payload")).count() == 0


def test_multimodal_frame_sample_covers_sampled_strides(spark, docs):
    pt = TM.payload_table(docs)
    frames = TM.frame_sample(pt, every_k=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    texts = {r.doc_id: r.text for r in docs.collect()}
    for d, rows in by_doc.items():
        payload = texts[d].encode()
        n_frames = (len(payload) + TM.FRAME_BYTES - 1) // TM.FRAME_BYTES
        assert sorted(r.frame_idx for r in rows) == list(range(0, n_frames, 2))
        for r in rows:
            chunk = payload[r.frame_idx * TM.FRAME_BYTES:(r.frame_idx + 1) * TM.FRAME_BYTES]
            assert r.n_frame_bytes == len(chunk)
            assert r.frame_checksum == sum(chunk) % 1_000_003


def test_multimodal_features_histogram(spark, docs):
    feats = TM.extract_features(TM.payload_table(docs)).collect()
    texts = {r.doc_id: r.text.encode() for r in docs.collect()}
    for r in feats:
        b = texts[r.doc_id]
        want = sum(1 for x in b if x % TM.FEATURE_DIM == r.dim_idx) / max(len(b), 1)
        assert abs(r.value - want) < 1e-12
    # per-doc histogram sums to 1
    sums = {}
    for r in feats:
        sums[r.doc_id] = sums.get(r.doc_id, 0.0) + r.value
    assert all(abs(v - 1.0) < 1e-9 for v in sums.values())


def test_multimodal_resize_meta_scale(spark, docs):
    meta = TM.resize_meta(TM.payload_table(docs), target_w=64, target_h=48).collect()
    for r in meta:
        assert 1 <= r.width <= 640 and 1 <= r.height <= 480
        assert abs(r.scale - round(min(64.0 / r.width, 48.0 / r.height), 6)) < 1e-9


def test_stream_dedup_equals_batch_dedup(spark):
    from sbm_communitydetection_spark.textops.stream_dedup import stream_minhash_dedup

    mk = lambda s: s  # noqa: E731
    group_a = "the quick brown fox jumps over the lazy dog near the old stone bridge"
    group_b = "spark executors shuffle parquet row groups across the cluster network fabric"
    rows = [
        (0, group_a + " today"), (1, group_a + " today"),          # batch 0 exact dups
        (2, group_b + " quickly"), (3, "totally unrelated words about gardening and soil"),
        (4, group_a + " tonight"),                                  # batch 1: near-dup of 0/1
        (5, group_b + " slowly"), (6, "another singleton about pottery kilns and glaze"),
        (7, group_a + " today"),                                    # batch 2: exact dup of 0/1
        (8, group_b + " quickly"),                                  # batch 2: exact dup of 2
    ]
    docs = [
        (i, mk(t), "en", "s", len(t)) for i, t in rows
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    full = spark.createDataFrame(docs, schema)
    batches = [
        spark.createDataFrame(docs[0:4], schema),
        spark.createDataFrame(docs[4:7], schema),
        spark.createDataFrame(docs[7:9], schema),
    ]
    batch_pairs = sorted(
        tuple(r) for r in TD.minhash_lsh_dup_pairs(full, threshold=0.4).collect()
    )
    stream_pairs = sorted(
        tuple(r) for r in stream_minhash_dedup(spark, batches, threshold=0.4).collect()
    )
    assert stream_pairs == batch_pairs
    found = {(a, b) for a, b, _ in stream_pairs}
    # cross-batch pairs must be present: (0,4) b0-b1, (0,7) b0-b2, (2,8) b0-b2
    assert {(0, 1), (0, 4), (0, 7), (1, 7), (2, 8)} <= found


def test_ivf_with_trained_kmeans_centroids(embs):
    # production path: no ground-truth label column used for the quantizer
    cents = TS.kmeans_centroids(embs, n_cells=3, iters=10, seed=7, sample_rows=100)
    res = TS.ivf_topk(embs, k=3, centroids=cents).collect()
    exact = TS.cosine_topk(embs, k=3).collect()
    got = {(r.vec_id, r.neighbor_id) for r in res}
    want = {(r.vec_id, r.neighbor_id) for r in exact}
    # tight synthetic clusters: trained cells recover the exact neighbors
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"recall {recall}"
    # determinism: same seed → same centroid table
    again = TS.kmeans_centroids(embs, n_cells=3, iters=10, seed=7, sample_rows=100)
    assert sorted(map(tuple, cents.collect())) == sorted(map(tuple, again.collect()))
    # VERDICT r4 #3: multi-probe is monotone in recall and clears the
    # bar with room — the tightened multiprobe-path assertion
    res2 = TS.ivf_topk(embs, k=3, centroids=cents, nprobe=2).collect()
    got2 = {(r.vec_id, r.neighbor_id) for r in res2}
    recall2 = len(got2 & want) / len(want)
    assert recall2 >= recall and recall2 >= 0.95, f"nprobe=2 recall {recall2}"


def test_ivf_topk_multiprobe_recovers_boundary_neighbor(spark):
    """nprobe=2 (VERDICT r4 #3): a query whose true nearest neighbor
    sits across its cell boundary misses it at 1 probe and recovers it
    at 2.  Centroids A=(1,0), B=(0,1); q=(0.8,0.6) homes in A but its
    best neighbor (0.6,0.8) homes in B."""
    cents = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, 0.0), (1, 0, 0.0), (1, 1, 1.0)],
        "label long, d int, c double",
    )
    embs = spark.createDataFrame(
        [(1, [0.8, 0.6]), (2, [0.6, 0.8]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    top1 = lambda res: {r.vec_id: r.neighbor_id for r in res if r.rank == 1}
    one = top1(TS.ivf_topk(embs, k=1, centroids=cents, nprobe=1).collect())
    two = top1(TS.ivf_topk(embs, k=1, centroids=cents, nprobe=2).collect())
    assert one[1] == 3      # 1-probe only sees its home cell's vectors
    assert two[1] == 2      # 2-probe recovers the true (cross-cell) top-1


def test_tfidf_topk_hand_corpus(spark):
    import math

    corpus = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    out = TA.tfidf_topk(corpus, k=2)
    rows = {(r.doc_id, r.term): (r.tf, r.score) for r in out.collect()}
    # df: apple 1, banana 2, cherry 2, date 1; N = 3
    assert rows[(0, "apple")][0] == 2
    assert abs(rows[(0, "apple")][1] - round(2 * math.log(3 / 1), 6)) < 1e-9
    assert abs(rows[(1, "cherry")][1] - round(1 * math.log(3 / 2), 6)) < 1e-9
    # date (df=1) outranks cherry (df=2) in doc 2 despite tf 2 vs 1?
    # scores: cherry 2*ln(1.5)=0.81, date 1*ln(3)=1.10 -> both in top-2
    assert (2, "date") in rows and (2, "cherry") in rows


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        F.lit("src0").alias("source"),
        F.lit("x").alias("text"),
    )
    rates = {"en": 300, "de": 1000}
    a = {r.doc_id for r in TA.stratified_sample(docs, rates).collect()}
    b = {r.doc_id for r in TA.stratified_sample(docs, rates).collect()}
    assert a == b  # no RNG anywhere
    counts = {(r.lang): (r.n_total, r.n_sampled) for r in TA.stratum_counts(docs, rates).collect()}
    assert counts["de"] == (1000, 1000)  # rate 1000 permille keeps all
    en_total, en_kept = counts["en"]
    assert en_total == 1000 and 200 <= en_kept <= 400  # ~30% kept


# -- decontamination / PII scrub -------------------------------------------------


def test_decontamination_flags(spark):
    bench = spark.createDataFrame([(100, BASE)], "doc_id long, text string")
    train = spark.createDataFrame(
        [(0, BASE), (1, NEAR), (2, FAR)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_hit_shingles, r.contaminated)
        for r in TD.decontamination_flags(train, bench).collect()
    }
    assert got[0][1] and got[0][0] > 0  # identical text: fully contaminated
    assert got[1][1]  # near dup shares most shingles
    assert got[2] == (0, False)  # disjoint text is clean
    assert got[0][0] > got[1][0]


def test_pii_scrub(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@corp.example.org and call 12345678 now"),
            (1, "short 12345 stays but email-less"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in TA.pii_scrub(docs).collect()}
    assert got[0].n_emails == 1 and got[0].n_long_numbers == 1
    assert got[0].text_scrubbed == "mail <EMAIL> and call <NUM> now"
    # 5-digit run is below the threshold; no email
    assert got[1].n_emails == 0 and got[1].n_long_numbers == 0
    assert got[1].text_scrubbed == "short 12345 stays but email-less"


def test_quantize_embeddings_roundtrip(spark):
    embs = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.0, 0.254]), (1, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r for r in TS.quantize_embeddings(embs).collect()}
    r0 = got[0]
    assert r0.scale == pytest.approx(1.0 / 127, abs=1e-6)
    assert r0.codes == [127, -63, 0, 32]  # -0.5/s = -63.5 -> floor(-63.0) after +0.5
    assert r0.max_abs_err <= r0.scale / 2 + 1e-9
    # all-zero vector: scale 0, zero codes, zero error
    assert got[1].scale == 0.0 and got[1].codes == [0, 0] and got[1].max_abs_err == 0.0


def test_repetition_stats_hand_computed(spark):
    from sbm_communitydetection_spark.textops.analysis import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "a a a a"),          # 4 words, 1 distinct; trigrams: "a a a" x2
            (1, "a b c d"),          # all distinct; trigrams "a b c","b c d"
            (2, "x y"),              # shorter than n=3: zero trigrams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert got[0].distinct_word_ratio == 0.25
    assert got[0].top_word_frac == 1.0
    assert got[0].dup_ngram_frac == 0.5  # 2 trigrams, 1 distinct
    assert got[1].distinct_word_ratio == 1.0
    assert got[1].top_word_frac == 0.25
    assert got[1].dup_ngram_frac == 0.0
    assert got[2].dup_ngram_frac == 0.0  # no n-grams => nothing repeats


def test_mixture_weights_hand_computed(spark):
    # strata: en/a 100 docs (s=10), fr/b 9 docs (s=3) -> S=13
    rows = [(i, "t", "en", "a", 1) for i in range(100)] + [
        (1000 + i, "t", "fr", "b", 1) for i in range(9)
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    budget = 26
    got = {(r.lang, r.source): r for r in TA.mixture_weights(d, budget).collect()}
    # permille = min(1000, 1000*26*s // (13*n)): en 260000//1300=200, fr 78000//117=666
    assert got[("en", "a")].target_permille == 200
    assert got[("fr", "b")].target_permille == 666
    assert abs(got[("en", "a")].weight - 10 / 13) < 1e-12
    # α=0.5 flattening: the rare stratum keeps a far higher rate
    assert got[("fr", "b")].target_permille > got[("en", "a")].target_permille

    kept = TA.temperature_sample(d, budget).collect()
    by = {}
    for r in kept:
        by.setdefault((r.lang, r.source), set()).add(r.doc_id)
    # exact keep sets: (doc_id*KNUTH) % 1000 < permille — engine-free replay
    exp_en = {i for i in range(100) if (i * 2654435761) % 1000 < 200}
    exp_fr = {1000 + i for i in range(9) if ((1000 + i) * 2654435761) % 1000 < 666}
    assert by.get(("en", "a"), set()) == exp_en
    assert by.get(("fr", "b"), set()) == exp_fr


def test_mixture_weights_budget_exceeds_corpus_caps_at_1000(spark):
    d = spark.createDataFrame(
        [(i, "t", "en", "a", 1) for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    (row,) = TA.mixture_weights(d, 10_000).collect()
    assert row.target_permille == 1000
    assert TA.temperature_sample(d, 10_000).count() == 5


def test_ngram_lm_score_hand_computed(spark):
    rows = [(0, "a b a b"), (1, "a b"), (2, "c")]
    d = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: r for r in TA.ngram_lm_score(d).collect()}
    # c2: "a b"->3, "b a"->1; c1: a->3, b->1; V=3 (a,b,c)
    import math

    exp0 = (math.log(4 / 6) + math.log(2 / 4) + math.log(4 / 6)) / 3
    assert got[0].n_bigrams == 3
    assert abs(got[0].lm_score - round(exp0, 6)) < 1e-9
    assert abs(got[1].lm_score - round(math.log(4 / 6), 6)) < 1e-9
    assert 2 not in got  # single-word doc has no bigrams
    # the doc made of the corpus's dominant bigram scores above average
    assert got[1].lm_score > exp0


def test_bloom_decontamination_no_false_negatives(spark):
    """Every doc the exact op flags must be bloom-flagged (Bloom filters
    cannot produce false negatives), and bloom hit counts dominate the
    exact ones; with a roomy bitset the flags match exactly here."""
    bench_rows = [(100, "alpha beta gamma delta epsilon zeta")]
    train_rows = [
        (0, "alpha beta gamma delta words here"),  # overlaps benchmark
        (1, "totally different words appear in this one text"),
        (2, "epsilon zeta eta theta iota kappa"),  # no 3-gram overlap... wait
    ]
    mk = lambda rows: spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    bench, train = mk(bench_rows), mk(train_rows)
    exact = {r.doc_id: r for r in TD.decontamination_flags(train, bench).collect()}
    bloom = {r.doc_id: r for r in TD.bloom_decontamination(train, bench).collect()}
    assert set(exact) == set(bloom)
    for d in exact:
        if exact[d].contaminated:
            assert bloom[d].contaminated, f"false negative on doc {d}"
        assert bloom[d].n_hit_shingles >= exact[d].n_hit_shingles
    assert exact[0].contaminated and bloom[0].contaminated
    # doc 2 shares the bigram "epsilon zeta" but no word TRIgram
    assert not exact[2].contaminated


def test_stratum_topk_sample_exact_replay(spark):
    """The kept set per stratum is exactly the k smallest portable
    hashes — replayed in pure Python; small strata keep everything."""
    import hashlib

    rows = [(i, "t", "en", "a", 1) for i in range(10)] + [(100, "t", "fr", "b", 1)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    h = lambda i: int(hashlib.md5(f"topk:{i}".encode()).hexdigest()[:15], 16)
    exp = set(sorted(range(10), key=lambda i: (h(i), i))[:3]) | {100}
    out = TA.stratum_topk_sample(d, 3).collect()
    assert {r.doc_id for r in out} == exp
    assert all(1 <= r.rank <= 3 for r in out)


def test_dsir_importance_prefers_target_like_docs(spark):
    """Docs sharing the target's bigrams must outscore off-target docs,
    and n_feats = word_count - 1 (one bigram per adjacent word pair)."""
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta", "en", "a", 22),
            (1, "alpha beta gamma delta", "en", "a", 22),
            (2, "omega psi chi phi", "en", "a", 17),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    target = docs.filter("doc_id = 0")
    out = {r.doc_id: r for r in TA.dsir_importance(docs, target).collect()}
    assert set(out) == {0, 1, 2}
    assert all(r.n_feats == 3 for r in out.values())
    assert out[1].dsir_logratio > out[2].dsir_logratio  # target-like wins
    assert out[0].dsir_logratio == out[1].dsir_logratio  # identical text ties


def test_substring_dup_flags_exact_at_granularity(spark):
    """Shared ≥k-char substrings flag both docs; shorter overlaps don't;
    sub-k docs report 0 grams and False."""
    from sbm_communitydetection_spark.textops.dedup import substring_dup_flags

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),
            (1, "xx the quick brown cat"),   # shares 'the quick brown ' (16 > k)
            (2, "totally different content here"),
            (3, "short"),                    # < k chars
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in substring_dup_flags(docs, k=12).collect()}
    assert got[0].substring_dup and got[1].substring_dup
    assert not got[2].substring_dup
    assert got[3].n_grams == 0 and not got[3].substring_dup
    # doc 0 has len 25 → 14 grams, all distinct
    assert got[0].n_grams == 14


def test_boilerplate_strip_removes_frequent_ngrams(spark):
    rows = [
        (0, "alpha ad tracker footer beta"),
        (1, "ad tracker footer gamma"),
        (2, "ad tracker footer"),
        (3, "delta epsilon zeta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in TA.boilerplate_strip(docs, min_df=3, n=3).collect()
    }
    assert out[0]["clean_text"] == "alpha beta"
    assert out[0]["n_tokens"] == 5 and out[0]["n_kept"] == 2
    assert out[1]["clean_text"] == "gamma"
    assert out[2]["clean_text"] == "" and out[2]["keep_ratio"] == 0.0
    # unique doc untouched (its grams have df=1)
    assert out[3]["clean_text"] == "delta epsilon zeta"
    assert out[3]["keep_ratio"] == 1.0


def test_token_pmi_surfaces_collocation(spark):
    text = "new york a b new york c d new york"
    docs = spark.createDataFrame(
        [(0, text), (1, text)], "doc_id long, text string"
    )
    rows = TA.token_pmi(docs, min_count=3).collect()
    # only the planted collocation survives min_count; PMI is positive
    assert [(r["a"], r["b"]) for r in rows] == [("new", "york")]
    assert rows[0]["pair_count"] == 6
    assert rows[0]["pmi"] > 0


def test_corpus_stats_known_counts(spark):
    docs = spark.createDataFrame(
        [(0, "a a a b b c")], "doc_id long, text string"
    )
    r = TA.corpus_stats(docs).collect()[0]
    assert r["n_tokens"] == 6 and r["vocab_size"] == 3
    assert r["hapax_frac"] == round(1 / 3, 6)
    assert r["top1_share"] == 0.5
    # OLS slope of ln(freq) ~ ln(rank) over ranks (1,2,3), freqs (3,2,1)
    x = np.log([1.0, 2.0, 3.0])
    y = np.log([3.0, 2.0, 1.0])
    slope = ((len(x) * (x * y).sum() - x.sum() * y.sum())
             / (len(x) * (x * x).sum() - x.sum() ** 2))
    assert r["zipf_slope"] == round(float(slope), 6)


def test_quality_lr_fit_learns_separable_labels(spark):
    """English docs are long, others short: after 10 GD steps the loss
    must beat the zero-init ln(2) and the length weight must be
    positive."""
    long_t = " ".join(["word"] * 80)
    short_t = "tiny doc"
    rows = [(i, long_t, "en") for i in range(10)] + [
        (10 + i, short_t, "de") for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = TA.quality_lr_fit(docs).collect()[0]
    assert r["logloss"] < 0.693147
    assert r["w1"] > 0 and r["w2"] > 0


def test_cross_source_dup_matrix_flags_leak(spark):
    rows = [
        (0, BASE, "en", "train", len(BASE)),
        (1, BASE, "en", "eval", len(BASE)),   # exact dup across the split
        (2, FAR, "en", "train", len(FAR)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {(r.source_a, r.source_b): r.n_pairs
           for r in TD.cross_source_dup_matrix(docs).collect()}
    assert got == {("eval", "train"): 1}


def test_split_leakage_flags_cross_split_dups_only(spark):
    """Four identical docs → all 6 pairs are Hamming-0 dups; leakage rows
    are exactly the pairs whose portable-hash coins land in different
    splits (expected set computed with the same md5 coin in Python)."""
    import hashlib

    from sbm_communitydetection_spark.textops.pipeline import split_leakage

    ids = [1, 2, 3, 4]
    docs = spark.createDataFrame(
        [(i, "the same exact text for everyone") for i in ids],
        "doc_id long, text string",
    )

    def coin_split(doc_id, val=300, test=300, seed=13):
        c = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:15], 16) % 1000
        return "val" if c < val else ("test" if c < val + test else "train")

    splits = {i: coin_split(i) for i in ids}
    expected = {
        (a, b)
        for a in ids
        for b in ids
        if a < b and splits[a] != splits[b]
    }
    got = {
        (r.a, r.b)
        for r in split_leakage(
            docs, max_hamming=0, val_permille=300, test_permille=300
        ).collect()
    }
    assert got == expected
    assert all(
        r.split_a != r.split_b
        for r in split_leakage(
            docs, max_hamming=0, val_permille=300, test_permille=300
        ).collect()
    )


def test_split_leakage_empty_when_single_split(spark):
    from sbm_communitydetection_spark.textops.pipeline import split_leakage

    docs = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa bb cc")], "doc_id long, text string"
    )
    # val=0, test=0 → everything lands in train → no cross-split pair
    assert (
        split_leakage(docs, max_hamming=0, val_permille=0, test_permille=0).count()
        == 0
    )


def test_hard_negative_pairs_window_semantics(spark):
    """Identical docs (hamming 0) are never negatives; with 60 one-bit
    bands every pair differing in < 60 bits collides somewhere, so the
    output is exactly the non-identical pairs within the window."""
    import pytest as _pytest

    from sbm_communitydetection_spark.textops.dedup import hard_negative_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),  # dup of 1 → excluded
            (3, "alpha beta gamma zeta"),   # near 1 → small hamming
            (4, "xx yy zz ww qq"),          # far from all
        ],
        "doc_id long, text string",
    )
    rows = hard_negative_pairs(
        docs, min_hamming=1, max_hamming=60, n_bands=60
    ).collect()
    got = {(r.a, r.b) for r in rows}
    assert (1, 2) not in got  # exact dup filtered by min_hamming
    assert (1, 3) in got and (2, 3) in got
    assert all(1 <= r.hamming <= 60 for r in rows)
    with _pytest.raises(ValueError):
        hard_negative_pairs(docs, min_hamming=0)


def test_rrf_fusion_rewards_agreement(spark):
    """A doc ranked well by BOTH lists must out-score a doc that tops
    only one list (the RRF property: 2/(60+r) beats 1/(60+1) for small
    r). Fixture: doc 2 is lexically AND semantically close to query 0;
    doc 1 is only lexically close; doc 3 only semantically close."""
    from sbm_communitydetection_spark.textops.fusion import rrf_fused_topk

    docs = spark.createDataFrame(
        [
            (0, "apple banana cherry"),
            (1, "apple banana zebra"),     # lexical overlap only
            (2, "apple banana cherry"),    # identical text + same vector
            (3, "xx yy zz"),               # no lexical overlap
        ],
        "doc_id long, text string",
    )
    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.0, 1.0], 0),            # orthogonal to query
            (2, [1.0, 0.1], 0),            # near query
            (3, [0.9, 0.2], 0),            # near query
        ],
        "vec_id long, embedding array<float>, label int",
    )
    qs = docs.filter(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    rows = rrf_fused_topk(docs, embs, qs, k=4, depth=4).collect()
    scores = {r.doc_id: r.rrf for r in rows}
    assert scores[2] == max(scores.values())  # both-list winner
    assert 1 in scores and 3 in scores        # single-list docs still present
    assert scores[2] > scores[1] and scores[2] > scores[3]


def test_knn_label_disagreement_flags_mislabeled_vector(spark):
    """Two tight clusters; vec 10 sits in cluster A but wears label B →
    its 2 nearest neighbors both disagree → flagged with n_agree=0.
    Correctly-labeled vectors agree with both neighbors → absent."""
    from sbm_communitydetection_spark.textops.similarity import (
        knn_label_disagreement,
    )

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.01], 0),
        (2, [0.98, 0.02], 0),
        (10, [0.97, 0.03], 1),  # geometrically A, labeled B
        (20, [0.0, 1.0], 1),
        (21, [0.01, 0.99], 1),
        (22, [0.02, 0.98], 1),
    ]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r.vec_id: (r.n_agree, r.n_neighbors)
        for r in knn_label_disagreement(embs, k=2, max_agree=0).collect()
    }
    assert got == {10: (0, 2)}


def test_readability_counts_and_formula(spark):
    """'go on. stop!' → 3 words, 2 sentences, 3 vowel runs (o, o, o);
    flesch = 206.835 − 1.015·(3/2) − 84.6·(3/3). Empty text is dropped."""
    from sbm_communitydetection_spark.textops.analysis import readability_scores

    docs = spark.createDataFrame(
        [(1, "go on. stop!"), (2, "")], "doc_id long, text string"
    )
    rows = readability_scores(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (3, 2, 3)
    assert r.flesch == round(206.835 - 1.015 * (3 / 2) - 84.6 * 1.0, 4)


def test_winnowing_guarantee_and_edges(spark):
    """Winnowing invariants: (a) a shared passage of ≥ w+n−1 words
    yields ≥1 shared fingerprint (the SIGMOD'03 guarantee), (b) every
    fingerprint is one of the doc's own shingle hashes, (c) a doc with
    fewer than n words emits nothing, (d) a doc with fewer than w
    shingles winnows to exactly its global-min shingle hash."""
    from sbm_communitydetection_spark.textops.analysis import (
        WINNOW_W,
        winnowing_fingerprints,
    )
    from sbm_communitydetection_spark.textops.portable import (
        NGRAM_N,
        md5_long,
        shingles_col,
    )

    passage = "the quick brown fox jumps over the lazy sleeping dog"  # 10 words
    assert len(passage.split()) >= WINNOW_W + NGRAM_N - 1
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + passage + " gamma delta"),
            (2, passage + " omega entirely different tail words here"),
            (3, "too short"),  # < n words
            (4, "just four words here"),  # 2 shingles < w
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs).collect()
    by_doc: dict[int, set[int]] = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    # (a) shared-passage guarantee
    assert by_doc[1] & by_doc[2]
    # (b) fingerprints ⊆ own shingle hashes
    sh = docs.select(
        "doc_id",
        F.explode(
            F.transform(shingles_col(F.col("text")), lambda s: md5_long(s))
        ).alias("h"),
    ).collect()
    hashes: dict[int, set[int]] = {}
    for r in sh:
        hashes.setdefault(r.doc_id, set()).add(r.h)
    for d, s in by_doc.items():
        assert s <= hashes[d]
    # (c) sub-shingle doc emits nothing
    assert 3 not in by_doc
    # (d) < w shingles → exactly the global min
    assert by_doc[4] == {min(hashes[4])}


def test_retrieval_metrics_hand_card(spark):
    """4 vectors on a line, query 0 (mod=1, rem=0 makes everyone a
    query; pick q=0's row): neighbors of 0 ranked by cosine; labels
    place exactly one relevant at a known rank — check recall/MRR/nDCG
    against hand arithmetic."""
    import math

    from sbm_communitydetection_spark.textops.similarity import retrieval_metrics

    rows = [
        (0, [1.0, 0.0], 7),
        (1, [1.0, 0.1], 9),   # rank 1 for q0, label differs
        (2, [1.0, 0.3], 7),   # rank 2, relevant
        (3, [0.0, 1.0], 9),   # rank 3
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.query_id: r for r in retrieval_metrics(e, k=3, query_mod=1, query_rem=0).collect()}
    r0 = got[0]
    # label 7 has 2 members → n_rel = 1; vec 2 is the only relevant, at rank 2
    assert (r0.n_rel, r0.hits) == (1, 1)
    assert r0.recall_at_k == 1.0
    assert r0.mrr_at_k == 0.5
    dcg = 1.0 / math.log2(3)  # rel at rank 2
    idcg = 1.0 / math.log2(2)  # one relevant → ideal rank 1
    assert r0.ndcg_at_k == round(dcg / idcg, 6)
    # every query with n_rel >= 1 present: all 4 vectors qualify
    assert set(got) == {0, 1, 2, 3}


def test_bpe_train_sennrich_example_and_greedy_scan(spark):
    """'low' x5 + 'lowest' x2: most frequent pair is (l,o) x7, then
    (lo,w) x7; ties broken lexicographically.  'aaaa' pins the greedy
    left-to-right scan: (a,a) counts 3 pairs but one merge pass yields
    'aa','aa' so the NEXT round counts (aa,aa)=1."""
    from sbm_communitydetection_spark.textops.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "low low low low low lowest lowest")], "doc_id long, text string"
    )
    got = [
        (r.merge_idx, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train(docs, n_merges=3).orderBy("merge_idx").collect()
    ]
    assert got[0] == (0, "l", "o", 7)
    assert got[1] == (1, "lo", "w", 7)
    # after 'low' merges fully, remaining pairs live in 'lowest' (x2):
    # (low,e) x2, (e,s) x2, (s,t) x2 → lex smallest left wins: (e,s)
    assert got[2] == (2, "e", "s", 2)

    docs2 = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    got2 = [
        (r.merge_idx, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train(docs2, n_merges=2).orderBy("merge_idx").collect()
    ]
    # 2 words x 3 adjacent (a,a) pairs = 6; greedy scan leaves aa|aa
    assert got2[0] == (0, "a", "a", 6)
    assert got2[1] == (1, "aa", "aa", 2)


def test_cluster_silhouette_separated_blobs(spark):
    """Two tight blobs far apart → every vector's silhouette ≈ 1;
    a vector exactly midway between the two learned centroids → ≈ 0."""
    from sbm_communitydetection_spark.textops.similarity import cluster_silhouette

    rows = (
        [(i, [0.0 + 0.01 * i, 0.0], 0) for i in range(4)]
        + [(10 + i, [10.0 + 0.01 * i, 0.0], 1) for i in range(4)]
        + [(99, [5.0075, 0.0], 0)]  # near-midpoint probe
    )
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.vec_id: r.sil for r in cluster_silhouette(e, n_cells=2, iters=4).collect()}
    assert len(got) == 9
    # the midpoint probe joins one blob's cell and drags its centroid a
    # little, so "≈ 1" is a hair under 0.9 for that side
    for v in range(4):
        assert got[v] > 0.85
        assert got[10 + v] > 0.85
    assert abs(got[99]) < 0.3


def test_knn_graph_clusters_blobs_and_singleton(spark):
    """Two tight blobs cluster together; an isolated far vector whose
    kNN attraction is one-directional stays a singleton under the
    MUTUAL filter."""
    from sbm_communitydetection_spark.textops.similarity import knn_graph_clusters

    rows = (
        [(i, [1.0, 0.01 * i], 0) for i in range(4)]
        + [(10 + i, [-1.0, 0.01 * i], 1) for i in range(4)]
        + [(99, [0.0, 1.0], 2)]  # orthogonal outlier
    )
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.id: r.cluster for r in knn_graph_clusters(e, k=2).collect()}
    assert len(got) == 9
    assert len({got[i] for i in range(4)}) == 1
    assert len({got[10 + i] for i in range(4)}) == 1
    assert got[0] != got[10]
    # the outlier ranks blob members as ITS neighbors, but no blob member
    # ranks the outlier back within k=2 → singleton
    assert got[99] == 99


def test_bpe_apply_fertility_hand_counts(spark):
    """'low low' with merges [(l,o),(lo,w)]: each word collapses to ONE
    token → fertility 1.0; with no merges fertility = avg word length."""
    from sbm_communitydetection_spark.textops.bpe import bpe_apply

    d = spark.createDataFrame([(1, "low low"), (2, "ab")], "doc_id long, text string")
    full = {r.doc_id: r for r in bpe_apply(d, [("l", "o"), ("lo", "w")]).collect()}
    assert (full[1].n_words, full[1].n_tokens, full[1].fertility) == (2, 2, 1.0)
    assert (full[2].n_words, full[2].n_tokens) == (1, 2)  # merges don't apply
    none = {r.doc_id: r for r in bpe_apply(d, []).collect()}
    assert none[1].n_tokens == 6 and none[1].fertility == 3.0
