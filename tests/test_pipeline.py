"""Training-data pipeline operators: dedup, similarity, textstats,
multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graft.pipeline.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from graft.pipeline.multimodal import (
    extract_features,
    media_stats,
    sample_frames,
    synth_media,
)
from graft.pipeline.similarity import (
    cosine_topk,
    embedding_near_dups,
    lsh_bucket_topk,
)
from graft.pipeline.textstats import (
    fingerprints,
    lang_id,
    quality_scores,
    token_counts,
)

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog near the river bank"),
    (1, "The quick brown fox jumps over the lazy dog near the river bank"),
    (2, "The Quick  brown FOX jumps over the lazy dog, near the river bank!"),
    (3, "Der schnelle braune Fuchs springt und ist nicht mit der Katze"),
    (4, "completely different text about machine learning and spark engines"),
    (5, "the quick brown fox jumps over the lazy dog near another river"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_token_counts(spark, docs):
    got = {r.doc_id: r.n_tokens for r in token_counts(docs).collect()}
    assert got[0] == 13
    assert got[2] == 13  # punctuation stripped before tokenizing


def test_fingerprint_exact_dedup(spark, docs):
    fp = {r.doc_id: r.fingerprint for r in fingerprints(docs).collect()}
    assert fp[0] == fp[1] == fp[2]  # case/punct/ws-insensitive
    assert fp[0] != fp[4]
    dd = {r.doc_id: r for r in exact_dedup(docs).collect()}
    assert dd[0].keep and not dd[1].keep and not dd[2].keep
    assert dd[1].canonical_id == 0 and dd[2].group_size == 3
    assert dd[4].keep


def test_lang_id(spark, docs):
    got = {r.doc_id: r.lang_pred for r in lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[3] == "de"


def test_quality_scores_bounds(spark, docs):
    rows = quality_scores(docs).collect()
    for r in rows:
        assert 0.0 <= r.quality <= 1.0
        assert 0.0 <= r.alpha_ratio <= 1.0


def test_minhash_lsh_finds_near_dups(spark, docs):
    sigs = minhash_signatures(docs, n_hashes=16, k=3).cache()
    assert sigs.count() == 6
    pairs = {
        (r.a, r.b) for r in lsh_candidate_pairs(sigs, 16, bands=8).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs
    verified = ngram_jaccard_pairs(docs,
        spark.createDataFrame(sorted(pairs), "a long, b long"),
        threshold=0.5,
    )
    got = {(r.a, r.b): r.jaccard for r in verified.collect()}
    assert got[(0, 1)] == pytest.approx(1.0)
    assert got[(0, 2)] == pytest.approx(1.0)  # same after normalization
    assert (0, 4) not in got


def test_simhash_near_dup_distance(spark, docs):
    sh = {r.doc_id: r.simhash for r in simhash(docs, bits=32).collect()}
    assert sh[0] == sh[1] == sh[2]
    ham_near = bin(sh[0] ^ sh[5]).count("1")
    ham_far = bin(sh[0] ^ sh[4]).count("1")
    assert ham_near < ham_far


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal(8)
    rows = []
    for i in range(40):
        v = rng.standard_normal(8)
        rows.append((i, [float(x) for x in v]))
    rows.append((100, [float(x) for x in base]))
    rows.append((101, [float(x) for x in base + 0.01 * rng.standard_normal(8)]))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        [float(x) for x in base],
    )


def test_cosine_topk_exact(spark, emb):
    df, q = emb
    top = cosine_topk(df, q, k=2).collect()
    assert [r.vec_id for r in top] == [100, 101]
    assert top[0].cosine == pytest.approx(1.0, abs=1e-5)


def test_lsh_bucket_topk_finds_duplicate(spark, emb):
    df, q = emb
    top = lsh_bucket_topk(df, q, k=2, n_planes=4).collect()
    assert top and top[0].vec_id == 100  # exact copy shares every bucket


def test_lsh_bucket_topk_planes_portable(spark, emb):
    from graft.pipeline.similarity import (
        lsh_bucket_topk_planes,
        rademacher_planes,
    )

    df, q = emb
    top = lsh_bucket_topk_planes(df, q, rademacher_planes(8, 3), k=3).collect()
    assert top and top[0].vec_id == 100  # exact copy shares every bucket
    assert top[0].cosine == pytest.approx(1.0, abs=1e-5)


def test_ivf_assign_and_topk(spark, emb):
    from graft.pipeline.similarity import ivf_assign, ivf_topk

    df, q = emb
    # centroid_mod=10 -> centroids {0, 10, 20, 30, 100} (ids % 10 == 0)
    assign = {r.vec_id: r.centroid_id for r in
              ivf_assign(df, centroid_mod=10).collect()}
    assert len(assign) == df.count()  # every vector assigned exactly once
    for cid in (0, 10, 20, 30, 100):
        assert assign[cid] == cid  # a centroid's nearest centroid is itself
    # the Arrow matmul kernel and the relational crossjoin plan are the
    # same quantizer — bit-identical assignments
    relational = {r.vec_id: r.centroid_id for r in
                  ivf_assign(df, centroid_mod=10,
                             method="crossjoin").collect()}
    assert assign == relational
    top = ivf_topk(df, q, k=3, n_probe=2, centroid_mod=10).collect()
    # 100 is a centroid equal to the query: probe finds its list, and the
    # planted near-copy 101 assigns to centroid 100 (cosine ~1)
    ids = [r.vec_id for r in top]
    assert ids[0] == 100 and 101 in ids
    assert top[0].cosine == pytest.approx(1.0, abs=1e-5)


def test_embedding_near_dups(spark, emb):
    df, _ = emb
    pairs = {(r.a, r.b): r.cosine for r in
             embedding_near_dups(df, threshold=0.95).collect()}
    assert (100, 101) in pairs
    assert all(c >= 0.95 for c in pairs.values())


def test_multimodal_feature_plumbing(spark):
    media = synth_media(spark, n=30)
    feats = extract_features(media, dim=16).collect()
    assert len(feats) == 30
    assert all(len(r.feature) == 16 for r in feats)
    # deterministic: same payload -> same features
    f2 = extract_features(synth_media(spark, n=30), dim=16).collect()
    assert {r.media_id: r.feature for r in feats} == {
        r.media_id: r.feature for r in f2
    }
    with pytest.raises(NotImplementedError):
        extract_features(media, fake=False)


def test_multimodal_frames_and_stats(spark):
    media = synth_media(spark, n=30)
    frames = sample_frames(media).collect()
    assert frames and all(r.frame_payload for r in frames)
    vids = {r.media_id for r in frames}
    kinds = {r.media_id: r.kind for r in media.collect()}
    assert all(kinds[m] == "video" for m in vids)
    stats = {r.kind: r.n for r in media_stats(media).collect()}
    assert stats == {"image": 10, "audio": 10, "video": 10}


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_extract_features_real_decode_guard(spark):
    """fake=False must be an honest NotImplementedError on hosts
    without codec libraries (never a silent fake)."""
    media = synth_media(spark, n=4)
    if _has_pil():
        pytest.skip("Pillow installed — guard not reachable")
    with pytest.raises(NotImplementedError):
        extract_features(media, dim=16, fake=False)


@pytest.mark.skipif(not _has_pil(), reason="Pillow not installed")
def test_extract_features_real_decode(spark):
    """With Pillow present, image payloads decode for real; schema and
    row count match the fake path exactly."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (8, 8), color=128).save(buf, format="PNG")
    rows = [(0, "image", buf.getvalue(), 8, 8, None, 100),
            (1, "audio", b"\x00" * 64, None, None, 16000, 100)]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, "
        "height int, sample_rate int, duration_ms int",
    )
    out = {r["media_id"]: r for r in
           extract_features(media, dim=16, fake=False).collect()}
    assert len(out) == 2
    # the 8x8 gray-128 PNG decodes to constant 128/255 pixels
    assert abs(out[0]["feature"][0] - 128 / 255) < 1e-6
    assert len(out[0]["feature"]) == 16


def test_near_dup_clusters(spark, docs):
    from graft.pipeline.dedup import near_dup_clusters

    out = {r.doc_id: r for r in
           near_dup_clusters(docs, threshold=0.5).collect()}
    assert len(out) == len(DOCS)  # every doc labeled
    # docs 0/1 are identical, 2 a near-copy: transitively one cluster,
    # canonical = min id, only the canonical kept
    assert out[1].cluster_id == 0 and out[2].cluster_id == 0
    assert out[0].keep and not out[1].keep and not out[2].keep
    # unrelated docs stay singleton clusters
    assert out[3].cluster_id == 3 and out[3].keep
    assert out[4].cluster_id == 4 and out[4].keep


def test_smooth_embeddings_matches_python(spark):
    """Component-wise alpha-blend vs a dict reference, including a
    no-neighbor passthrough vector."""
    from graft.pipeline.similarity import smooth_embeddings

    vecs = {
        1: [1.0, 0.0, 2.0],
        2: [3.0, 4.0, 0.0],
        3: [0.0, 8.0, 1.0],
        4: [5.0, 5.0, 5.0],   # isolated
    }
    pairs = [(1, 2), (1, 3)]
    emb = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    p = spark.createDataFrame(pairs, "a long, b long")
    got = {
        r.vec_id: r.embedding
        for r in smooth_embeddings(emb, p, alpha=0.5).collect()
    }
    import statistics

    adj = {1: [2, 3], 2: [1], 3: [1]}
    want = {}
    for k, v in vecs.items():
        ns = adj.get(k)
        if not ns:
            want[k] = [round(x, 6) for x in v]
        else:
            want[k] = [
                round(
                    0.5 * x
                    + 0.5 * statistics.mean(vecs[n][i] for n in ns),
                    6,
                )
                for i, x in enumerate(v)
            ]
    assert got == want


def test_knn_graph_topk_and_ties(spark):
    """Within one bucket (single plane, all-positive first component)
    the kNN graph is exact top-k with (cosine DESC, b ASC) tie-break,
    and every source emits at most k rows."""
    import numpy as np

    from graft.pipeline.similarity import knn_graph

    vecs = {
        0: [1.0, 0.0], 1: [1.0, 0.1], 2: [1.0, 0.2],
        3: [0.1, 1.0], 4: [0.1, 1.0],   # exact tie pair
    }
    emb = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    # one plane that puts everything in the same bucket
    out = knn_graph(
        emb, k=2, planes=np.array([[1.0, 0.0]])
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.a, []).append((r.b, r.cosine))
    got = {
        a: sorted(v, key=lambda t: (-t[1], t[0])) for a, v in got.items()
    }
    assert all(len(v) <= 2 for v in got.values())

    def cos(u, v):
        nu = sum(x * x for x in u) ** 0.5
        nv = sum(x * x for x in v) ** 0.5
        return round(sum(x * y for x, y in zip(u, v)) / (nu * nv), 6)

    for a, rows in got.items():
        want = sorted(
            ((cos(vecs[a], vecs[b]), b) for b in vecs if b != a),
            key=lambda t: (-t[0], t[1]),
        )[:2]
        assert [(b, c) for c, b in want] == rows
    # vectors 3 and 4 are identical: each must rank the other first
    assert got[3][0][0] == 4 and got[4][0][0] == 3


def test_deterministic_sample_and_splits(spark):
    """Hash sampling: deterministic across reruns, ~p fraction,
    disjoint salts independent; splits partition every row, are
    append-stable, and match python md5 exactly."""
    import hashlib

    from graft.pipeline.splits import assign_splits, deterministic_sample

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1000)],
        "doc_id long, text string",
    )
    s1 = sorted(r.doc_id for r in
                deterministic_sample(df, 0.2, "doc_id").collect())
    s2 = sorted(r.doc_id for r in
                deterministic_sample(df, 0.2, "doc_id").collect())
    assert s1 == s2
    assert 120 < len(s1) < 280  # ~200 expected

    def u60(k, salt):
        return int(
            hashlib.md5(f"{k}#{salt}".encode()).hexdigest()[:15], 16
        )

    want = sorted(i for i in range(1000)
                  if u60(i, "sample") < int(0.2 * 2**60))
    assert s1 == want

    out = {r.doc_id: r.split for r in assign_splits(df).collect()}
    assert len(out) == 1000
    counts = {}
    for v in out.values():
        counts[v] = counts.get(v, 0) + 1
    assert 800 < counts["train"] < 970
    # python reference for the boundary logic
    def split_of(k):
        h = u60(k, "split")
        if h < int(0.9 * 2**60):
            return "train"
        if h < int(0.95 * 2**60):
            return "val"
        return "test"

    assert out == {i: split_of(i) for i in range(1000)}
    # append stability: a subset keeps identical assignments
    sub = {
        r.doc_id: r.split
        for r in assign_splits(df.where(F.col("doc_id") < 100)).collect()
    }
    assert sub == {k: v for k, v in out.items() if k < 100}


def test_tfidf_top_terms(spark):
    """tf-idf keywords against a hand-computed reference: the term
    unique to a doc outranks corpus-wide terms; row budget respected."""
    import math

    from graft.pipeline.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [(0, "spark spark engine"), (1, "spark query engine"),
         (2, "zebra zebra zebra spark")],
        "doc_id long, text string",
    )
    out = {}
    for r in tfidf_top_terms(docs, k=2).collect():
        out.setdefault(r.doc_id, {})[r.term] = r.score
    assert all(len(v) <= 2 for v in out.values())
    # doc 2: 'zebra' df=1 tf=3 -> 3*ln(3); 'spark' df=3 -> idf 0
    assert out[2]["zebra"] == round(3 * math.log(3), 6)
    assert out[2]["spark"] == 0.0
    # doc 0: 'spark' tf=2 idf=0 -> 0; 'engine' df=2 tf=1 -> ln(1.5)
    assert out[0]["engine"] == round(math.log(1.5), 6)


def test_select_survivors_quality_argmax(spark, docs):
    from graft.pipeline.dedup import select_survivors
    from graft.pipeline.textstats import quality_scores

    out = {r.doc_id: r for r in
           select_survivors(docs, threshold=0.5).collect()}
    assert len(out) == len(DOCS)
    q = {r.doc_id: r.quality for r in quality_scores(docs).collect()}
    # docs 0/1/2 form one cluster: the survivor is the quality argmax
    # with doc_id asc tie-break, computed independently here
    cluster = [0, 1, 2]
    best = min(cluster, key=lambda d: (-q[d], d))
    for d in cluster:
        assert out[d].cluster_id == 0
        assert out[d].cluster_size == 3
        assert out[d].survivor == (d == best)
        assert out[d].quality == q[d]
    # singletons survive themselves
    assert out[3].survivor and out[3].cluster_size == 1
    assert out[4].survivor and out[4].cluster_size == 1
    # exactly one survivor per cluster
    assert sum(1 for r in out.values() if r.survivor) == len(DOCS) - 2


def test_select_survivors_custom_scores(spark, docs):
    """A custom (doc_id, quality) policy table overrides the engine
    score — here an inverted-id score makes the HIGHEST doc_id win."""
    from pyspark.sql import functions as F

    from graft.pipeline.dedup import select_survivors

    scores = docs.select(
        "doc_id", (-F.col("doc_id")).cast("double").alias("quality")
    )
    out = {r.doc_id: r.survivor for r in
           select_survivors(docs, scores=scores,
                            threshold=0.5).collect()}
    assert out[0] and not out[1] and not out[2]  # -0 is max of {0,-1,-2}


def test_pii_scan_counts_and_redaction(spark):
    from graft.pipeline.textstats import pii_scan

    rows = [
        (0, "mail me at a.b+c@example.com or admin@sub.example.org now"),
        (1, "server 10.0.0.1 and 192.168.100.42 are up"),
        (2, "call 555-867-5309 or 555.123.4567"),
        (3, "clean document with no identifiers at all"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_scan(df).collect()}
    assert (got[0]["n_emails"], got[0]["n_pii"]) == (2, 2)
    assert (got[1]["n_ipv4"], got[1]["n_pii"]) == (2, 2)
    assert (got[2]["n_phones"], got[2]["n_pii"]) == (2, 2)
    assert got[3]["n_pii"] == 0
    assert got[4]["n_pii"] == 0
    # redaction fingerprint: no-PII doc hashes its own text; PII docs don't
    import hashlib

    assert got[3]["redacted_fp"] == hashlib.md5(rows[3][1].encode()).hexdigest()
    red0 = "mail me at <EMAIL> or <EMAIL> now"
    assert got[0]["redacted_fp"] == hashlib.md5(red0.encode()).hexdigest()


def test_pii_scan_matches_duckdb(spark):
    """Java-regex and RE2 dialects agree on the PII patterns —
    count and full redacted-text fingerprint, including the tricky
    digit-run boundaries (phone-inside-IP, >3-digit octets)."""
    import duckdb

    from graft.pipeline.oracles import SQL_PII_SCAN
    from graft.pipeline.textstats import pii_scan

    rows = [
        (0, "x a@b.co 1.2.3.4 999-999-9999 y"),
        (1, "not-an-ip 1234.5.6.78901 but 12.34.56.78 yes"),
        (2, "dotted 123.456.7890 reads as a phone, not an ip"),
        (3, "overlap trap 10.20.30.40.50.60 several octets"),
        (4, "e@ma.il@double.at strange"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in pii_scan(df).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in con.sql(SQL_PII_SCAN).fetchall())
    assert got == want


def test_repetition_stats(spark):
    from graft.pipeline.textstats import repetition_stats

    rows = [
        # 4 lines, 2 identical -> dup_line_frac 0.25; heavy bigram repeat
        (0, "spam spam spam spam\nunique line one\nspam spam spam spam\nlast"),
        # no repetition at all
        (1, "alpha beta gamma delta epsilon"),
        # too short for any gram
        (2, "word"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    assert got[0]["dup_line_frac"] == 0.25
    # doc0 tokens: 4+3+4+1=12 -> 11 bigrams, "spam spam" appears 6 times
    assert got[0]["top_bigram_frac"] == round(6 / 11, 6)
    assert got[0]["dup_bigram_frac"] > 0.3
    assert got[1]["dup_bigram_frac"] == 0.0
    assert got[1]["dup_trigram_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == 0.0
    assert got[3]["dup_line_frac"] == 0.0


def test_decontaminate_flags_overlap(spark):
    from graft.pipeline.dedup import decontaminate

    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps high"),   # 4/4 eval 3-grams hit
            (1, "a completely different sentence with no overlap here"),
            (2, "xy"),                                # sub-shingle-length
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict()
           for r in decontaminate(train, ev, k=3, threshold=0.5).collect()}
    assert got[0]["n_grams"] == 4 and got[0]["n_hit"] == 3
    assert got[0]["overlap_frac"] == 0.75 and got[0]["contaminated"]
    assert got[1]["n_hit"] == 0 and not got[1]["contaminated"]
    # the short doc still reports (its sub-length shingle misses)
    assert not got[2]["contaminated"]


def test_dup_span_stats(spark):
    """Cross-doc duplicated n-gram coverage vs a brute-force reference:
    within-doc repeats don't count, spans union correctly, short docs
    get zeros."""
    from graft.pipeline.dedup import dup_span_stats

    rows = [
        (0, "a b c d e"),            # shares "a b c" with doc 1
        (1, "x a b c y"),
        (2, "q r s t u"),            # unique
        (3, "a b"),                  # shorter than n
        (4, "m n o m n o m n o"),    # within-doc repeat only
        (5, "a b c d"),              # "a b c" with 0/1, "b c d" with 0
    ]
    n = 3
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dup_span_stats(df, n=n).collect()}

    toks = {d: t.split() for d, t in rows}
    grams = {
        d: [tuple(t[i:i + n]) for i in range(len(t) - n + 1)]
        for d, t in toks.items()
    }
    dup = {
        g
        for d, gs in grams.items()
        for g in gs
        if any(g in set(gs2) for d2, gs2 in grams.items() if d2 != d)
    }
    assert len(got) == len(rows)
    for d, t in toks.items():
        hits = [i for i, g in enumerate(grams[d]) if g in dup]
        covered = {p for i in hits for p in range(i, i + n)}
        r = got[d]
        assert r.n_tokens == len(t), d
        assert r.n_grams == max(len(t) - n + 1, 0), d
        assert r.dup_grams == len(hits), d
        assert r.covered_tokens == len(covered), d
        exp = round(len(covered) / len(t), 6) if t else 0.0
        assert r.dup_token_frac == exp, d
    # the designed cases really exercise what they claim
    assert got[4].dup_grams == 0 and got[3].n_grams == 0
    assert got[0].dup_token_frac > 0 and got[5].covered_tokens == 4


def test_dup_span_stats_hashed_grams_equivalent(spark):
    """The 100-TB shuffle shape (hashed_grams=True, xxhash64 agg keys)
    is value-identical to the exact-string path at test scale — on the
    driver's documents table, where gram counts are far below any
    collision regime (VERDICT r4 #6)."""
    import os

    from graft.pipeline.dedup import dup_span_stats

    docs = spark.read.parquet(
        os.path.join("/root/testdata/sf0.001", "documents.parquet")
    )
    exact = {r.doc_id: r for r in dup_span_stats(docs, n=8).collect()}
    hashed = {
        r.doc_id: r
        for r in dup_span_stats(docs, n=8, hashed_grams=True).collect()
    }
    assert exact.keys() == hashed.keys() and len(exact) > 0
    for d in exact:
        assert exact[d] == hashed[d], d


def test_weighted_sample(spark):
    """Quality-weighted keep: exact hash-threshold semantics, monotone
    in scale (raising the budget only adds rows), weight-0 never kept,
    weight>=1 always kept."""
    import hashlib

    from graft.pipeline.splits import weighted_sample

    rows = [(i, [0.0, 0.25, 0.5, 0.75, 1.0][i % 5]) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = {r.doc_id for r in weighted_sample(df, "w", "doc_id").collect()}

    mod = 2**60
    exp = {
        i for i, w in rows
        if int(hashlib.md5(f"{i}#wsample".encode()).hexdigest()[:15], 16)
        < min(w * mod, float(mod))
    }
    assert kept == exp
    assert not any(i % 5 == 0 for i in kept)          # w=0 never
    assert all(i in kept for i, w in rows if w >= 1)  # w=1 always
    half = {
        r.doc_id
        for r in weighted_sample(df, "w", "doc_id", scale=0.5).collect()
    }
    assert half <= kept                               # monotone in scale
    assert len(half) < len(kept)


def test_bigram_logprob(spark):
    """Hand-computed corpus bigram MLE surprisal; <2-token docs drop."""
    import math

    from graft.pipeline.textstats import bigram_logprob

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a c"), (2, "x")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_logprob(df).collect()}
    # bf: (a,b)=2 (b,a)=1 (a,c)=1; cf: a=3, b=1
    assert set(got) == {0, 1}
    assert got[0].n_bigrams == 3
    assert got[0].xent_bits == round(-2 * math.log2(2 / 3) / 3, 6)
    assert got[1].n_bigrams == 1
    assert got[1].xent_bits == round(math.log2(3), 6)
