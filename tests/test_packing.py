"""Document chunking + sequence packing (graft.pipeline.packing)."""

import pytest
from pyspark.sql import functions as F

from graft.pipeline.packing import (
    chunk_documents,
    pack_sequences,
    packed_sequence_stats,
)

DOCS = [
    (0, "a b c d e f g h i j"),                # 10 tokens
    (1, ""),                                    # empty -> dropped
    (2, "   "),                                 # whitespace-only -> dropped
    (3, "one two three"),                       # 3 tokens
    (4, "Tab\tand\nnewline   separated words"), # 5 tokens, mixed whitespace
    (5, "x " * 23),                             # 23 tokens
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_chunk_windows_and_overlap(spark, docs):
    # chunk=4, overlap=1, stride=3: 10 tokens -> ceil(9/3)=3 chunks
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    }
    assert out[(0, 0)] == ("a b c d", 4)
    assert out[(0, 1)] == ("d e f g", 4)   # starts at stride 3: overlap 'd'
    assert out[(0, 2)] == ("g h i j", 4)
    # 3 tokens < chunk: exactly one (short) chunk
    assert out[(3, 0)] == ("one two three", 3)
    # mixed whitespace splits cleanly, raw casing preserved
    assert out[(4, 0)] == ("Tab and newline separated", 4)
    # empty / whitespace-only docs produce no rows
    assert not any(d in (1, 2) for d, _ in out)


def test_chunk_no_redundant_tail(spark, docs):
    # n=23, chunk=8, overlap=2, stride=6 -> ceil(21/6)=4 chunks; last
    # chunk starts at 18 and carries the 5 remaining tokens
    rows = (
        chunk_documents(docs.where("doc_id = 5"), chunk_tokens=8, overlap=2)
        .orderBy("chunk_idx")
        .collect()
    )
    assert [r["n_tokens"] for r in rows] == [8, 8, 8, 5]
    assert chunk_documents(docs, chunk_tokens=4, overlap=1).where(
        "n_tokens <= 0"
    ).count() == 0


def test_chunk_rejects_bad_overlap(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=-2)  # would skip tokens
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0, overlap=0)


def test_pack_duplicate_doc_id_spans_stay_disjoint(spark):
    # duplicate keys are malformed input, but the ROWS-frame prefix sum
    # must still hand out disjoint offsets (RANGE would give both rows
    # the same offset and leave sequence slots unfilled)
    docs = spark.createDataFrame(
        [(7, "a b c d e"), (7, "a b c d e"), (8, "x y z")],
        "doc_id long, text string",
    )
    packed = pack_sequences(docs, seq_len=8)
    fills = (
        packed.groupBy("seq_id")
        .agg(F.sum(F.col("end_tok") - F.col("begin_tok")).alias("fill"))
        .collect()
    )
    assert sum(r["fill"] for r in fills) == 13  # every token exactly once
    offs = sorted(
        (r["seq_id"] * 8 + r["seq_off"]) for r in packed.collect()
    )
    assert len(offs) == len(set(offs))  # no colliding span starts


def test_pack_covers_every_token_exactly_once(spark, docs):
    packed = pack_sequences(docs, seq_len=8)
    rows = packed.collect()
    # per-doc spans are disjoint, ordered, and cover [0, n)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_tokens = {0: 10, 3: 3, 4: 5, 5: 23}
    assert set(by_doc) == set(n_tokens)
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r["begin_tok"])
        assert rs[0]["begin_tok"] == 0
        assert rs[-1]["end_tok"] == n_tokens[d]
        for a, b in zip(rs, rs[1:]):
            assert a["end_tok"] == b["begin_tok"]
            assert b["seq_id"] == a["seq_id"] + 1  # consecutive sequences
    # every sequence holds exactly seq_len tokens except the last
    fills = {
        r["seq_id"]: r["fill"]
        for r in packed.groupBy("seq_id")
        .agg(F.sum(F.col("end_tok") - F.col("begin_tok")).alias("fill"))
        .collect()
    }
    total = sum(n_tokens.values())
    assert sum(fills.values()) == total
    last = max(fills)
    assert all(v == 8 for s, v in fills.items() if s != last)
    # in-sequence offsets start where the previous doc slice ended
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(r)
    for s, rs in by_seq.items():
        rs.sort(key=lambda r: r["seq_off"])
        assert rs[0]["seq_off"] == 0
        for a, b in zip(rs, rs[1:]):
            assert a["seq_off"] + (a["end_tok"] - a["begin_tok"]) == b["seq_off"]


def test_pack_deterministic_across_parallelism(spark, docs):
    # packing order is (md5-bucket, doc_id): input partitioning must not
    # change the result (n_buckets is part of the semantics and stays
    # fixed — it defines the order, not just the parallelism)
    a = sorted(map(tuple, pack_sequences(docs, seq_len=8).collect()))
    b = sorted(
        map(tuple, pack_sequences(docs.repartition(7), seq_len=8).collect())
    )
    assert a == b


def test_pack_stats(spark, docs):
    stats = packed_sequence_stats(
        pack_sequences(docs, seq_len=8), seq_len=8
    ).first()
    assert stats["n_seqs"] == 6  # 41 tokens / 8 -> 5 full + 1 partial
    assert stats["full_seqs"] == 5
