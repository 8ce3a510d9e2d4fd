"""Document chunking and sequence packing for LLM training-data prep.

Two operators a 100-TB pretraining pipeline runs after dedup/filtering:

- :func:`chunk_documents` — split each document into overlapping
  fixed-token-budget chunks (RAG indexing / long-doc splitting). Pure
  column expressions: one ``split`` + one bounded ``explode`` per doc,
  no shuffle at all — embarrassingly parallel at any scale.
- :func:`pack_sequences` — concat-then-split sequence packing (the
  GPT-style "pack documents into fixed-length training sequences"
  step): documents are laid end-to-end in a deterministic total order
  and the token stream is cut into ``seq_len``-sized sequences; each
  output row maps a document's token span into the sequence it lands
  in. The global prefix sum is computed hierarchically — a per-bucket
  window (parallel across ``n_buckets``) plus an ``n_buckets``-row
  cumulative base — NOT a single-partition global window, so the one
  shuffle is the bucket exchange and parallelism is ``n_buckets``-wide
  (raise it at scale; 16 is plenty for test corpora).

Tokens are whitespace-split pieces of the RAW text (chunking must not
normalize away casing/punctuation — unlike textstats._tokens, which
lowercases for counting). Empty documents produce no output rows.

The packing order is ``(bucket, doc_id)`` where
``bucket = conv(substr(md5(doc_id), 1, 8), 16, 10) % n_buckets`` — a
portable deterministic hash both Spark and the DuckDB oracle compute
identically, so results are reproducible across engines and runs
(hash-bucketing also load-balances the prefix-sum windows regardless
of doc_id distribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _raw_tokens(text_col: str):
    """Whitespace tokens of the raw text (no lowering, no punctuation
    stripping); leading/trailing whitespace yields '' pieces — filtered."""
    return F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_tokens): overlapping token
    windows with stride ``chunk_tokens - overlap``.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``;
    a doc with ``n`` tokens yields ``max(1, ceil((n-overlap)/stride))``
    chunks, so no trailing chunk is ever fully contained in the
    previous one. Zero-token docs yield no rows.

    Plan shape: narrow projection + explode — no shuffle, no Python.
    """
    if chunk_tokens <= 0 or not 0 <= overlap < chunk_tokens:
        raise ValueError("need chunk_tokens > 0 and 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    sized = (
        df.select("doc_id", _raw_tokens(text_col).alias("toks"))
        .withColumn("n", F.size("toks"))
        .where(F.col("n") > 0)
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.col("n") - F.lit(overlap)) / F.lit(float(stride))),
    )
    start = F.col("chunk_idx") * stride
    return (
        sized.select(
            "doc_id",
            "toks",
            "n",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("long"))).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join(
                F.slice(F.col("toks"), start + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), F.col("n") - start)
            .cast("long")
            .alias("n_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 512,
    n_buckets: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Map each document's token span onto fixed-length training
    sequences (concat-then-split packing, no padding waste).

    Documents are concatenated in ``(bucket, doc_id)`` order and the
    token stream is cut every ``seq_len`` tokens; a document straddling
    a cut is split across consecutive sequences. Output one row per
    (document × sequence) intersection:

    ``(seq_id, doc_id, begin_tok, end_tok, seq_off)`` — the doc's
    tokens ``[begin_tok, end_tok)`` land in sequence ``seq_id``
    starting at in-sequence offset ``seq_off``. Every sequence is
    exactly ``seq_len`` tokens except the last.

    Scale: the prefix sum is per-bucket windows + an ``n_buckets``-row
    cumulative base joined back broadcast-style — one data shuffle
    (the bucket exchange), window parallelism = ``n_buckets``.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(n_buckets),
    )
    sized = (
        df.select(
            "doc_id",
            F.size(_raw_tokens(text_col)).alias("n"),
            bucket.alias("bucket"),
        )
        .where(F.col("n") > 0)
    )
    # ROWS frame, not the orderBy default RANGE: with a duplicated
    # doc_id, RANGE gives every tied row the full tied sum — identical
    # offsets, colliding token spans, and sequence slots never filled.
    # ROWS keeps spans disjoint (duplicate keys are malformed input,
    # but they must corrupt only their own docs, not the whole stream).
    in_bucket = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sized.withColumn(
        "local_off", F.sum("n").over(in_bucket) - F.col("n")
    )
    # n_buckets rows: cumulative token count of all earlier buckets
    bases = (
        sized.groupBy("bucket")
        .agg(F.sum("n").alias("bn"))
        .withColumn(
            "base",
            F.coalesce(
                F.sum("bn").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "base")
    )
    offs = local.join(F.broadcast(bases), "bucket").select(
        "doc_id",
        "n",
        (F.col("base") + F.col("local_off")).alias("off"),
    )
    first_seq = F.floor(F.col("off") / seq_len)
    last_seq = F.floor((F.col("off") + F.col("n") - 1) / seq_len)
    s = F.col("seq_id")
    begin = F.greatest(s * seq_len - F.col("off"), F.lit(0))
    end = F.least((s + 1) * seq_len - F.col("off"), F.col("n"))
    return (
        offs.select(
            "doc_id",
            "n",
            "off",
            F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
        )
        .select(
            "seq_id",
            "doc_id",
            begin.cast("long").alias("begin_tok"),
            end.cast("long").alias("end_tok"),
            (F.col("off") + begin - s * seq_len).cast("long").alias("seq_off"),
        )
    )


def packed_sequence_stats(packed: DataFrame, seq_len: int = 512) -> DataFrame:
    """One-row packing audit over :func:`pack_sequences` output:
    sequence count, docs-per-sequence mean, count of exactly-full
    sequences (all but the last, when packing is healthy), and
    boundary-straddling doc count."""
    per_seq = packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("end_tok") - F.col("begin_tok")).alias("fill"),
    )
    straddlers = packed.groupBy("doc_id").count().where(F.col("count") > 1)
    return per_seq.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.round(F.avg("n_docs"), 6).alias("avg_docs_per_seq"),
        F.sum(F.when(F.col("fill") == seq_len, 1).otherwise(0)).alias(
            "full_seqs"
        ),
    ).crossJoin(
        F.broadcast(
            straddlers.agg(F.count(F.lit(1)).alias("straddling_docs"))
        )
    )
