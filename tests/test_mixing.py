"""Source mixing + unigram cross-entropy (pipeline additions)."""

import math

import pytest

from graft.pipeline.splits import mix_sources, source_mix_plan
from graft.pipeline.textstats import unigram_logprob


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"text {i}", "web") for i in range(80)]
    rows += [(100 + i, f"text {100 + i}", "code") for i in range(20)]
    rows += [(200 + i, f"text {200 + i}", "junk") for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_plan_bottleneck_math(corpus):
    # weights 1:1 over (web, code); junk unweighted -> dropped.
    # bottleneck = code: T = min(80/.5, 20/.5) = 40; k = 20 each.
    plan = {r["source"]: r for r in
            source_mix_plan(corpus, {"web": 1.0, "code": 1.0}).collect()}
    assert set(plan) == {"web", "code"}
    assert plan["code"]["accept_rate"] == 1.0          # taken whole
    assert plan["code"]["n_avail"] == 20
    assert plan["web"]["accept_rate"] == 0.25          # 20/80
    assert plan["web"]["weight"] == 0.5                # normalized


def test_plan_rate_capped_at_one(corpus):
    # weight skewed toward the scarce source: rate still <= 1
    plan = {r["source"]: r["accept_rate"] for r in
            source_mix_plan(corpus, {"web": 1.0, "code": 9.0}).collect()}
    assert plan["code"] == 1.0
    assert 0 < plan["web"] < 0.05  # 20/9 * 1 / 80 ≈ 0.0278


def test_mix_deterministic_and_append_stable(corpus):
    w = {"web": 1.0, "code": 1.0}
    a = {r["doc_id"] for r in mix_sources(corpus, w).collect()}
    b = {r["doc_id"] for r in mix_sources(corpus.repartition(7), w).collect()}
    assert a == b and a  # identical across partitionings, non-empty
    # every selected doc comes from a weighted source
    assert all(d < 200 for d in a)
    # hash-threshold rule: a doc's accept decision depends only on
    # (key, salt, rate); with rate pinned to 1.0 everything survives
    full = mix_sources(corpus, {"web": 1.0, "code": 0.25})
    assert full.where("source = 'web'").count() == 80


def test_unigram_xent_hand_values(spark):
    # corpus: 'a' x3, 'b' x1 -> p(a)=3/4, p(b)=1/4
    docs = spark.createDataFrame(
        [(0, "a a a"), (1, "b"), (2, "  ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    assert set(out) == {0, 1}  # blank doc dropped
    assert out[0]["n_tokens"] == 3
    assert out[0]["xent_bits"] == pytest.approx(-math.log2(0.75), abs=1e-6)
    assert out[1]["xent_bits"] == pytest.approx(2.0, abs=1e-6)
    # rare-token doc is more surprising than the common-token doc
    assert out[1]["xent_bits"] > out[0]["xent_bits"]


def test_plan_zero_availability_source_zeroes_the_mix(spark, corpus):
    # a weighted source with no docs makes the mixture infeasible: the
    # plan must say so (all-zero rates), not let the others fill 100%
    plan = {r["source"]: r for r in
            source_mix_plan(corpus, {"web": 1.0, "absent": 1.0}).collect()}
    assert set(plan) == {"web", "absent"}
    assert plan["absent"]["n_avail"] == 0
    assert plan["absent"]["accept_rate"] == 0.0
    assert plan["web"]["accept_rate"] == 0.0
    assert mix_sources(corpus, {"web": 1.0, "absent": 1.0}).count() == 0


def test_zipf_alpha_hand_values(spark):
    import math

    from graft.pipeline.textstats import zipf_alpha

    # tf: the=4, cat=2, dog=1 -> tail (f>=2) = {4, 2}
    docs = spark.createDataFrame(
        [(0, "the cat the"), (1, "the dog the cat")],
        "doc_id long, text string",
    )
    row = zipf_alpha(docs, f_min=2).first()
    want = 1.0 + 2 / (math.log(4 / 1.5) + math.log(2 / 1.5))
    assert row["vocab_size"] == 3 and row["n_tail_terms"] == 2
    assert row["alpha"] == pytest.approx(want, abs=1e-6)
    # empty tail -> NULL alpha, not a crash
    tiny = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    r2 = zipf_alpha(tiny, f_min=2).first()
    assert r2["alpha"] is None and r2["n_tail_terms"] == 0
