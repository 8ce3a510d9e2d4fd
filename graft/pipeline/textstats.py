"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting — all pure column expressions (JVM-side,
whole-stage codegen; no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic —
# deliberately small and fixed so the language call is deterministic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pour", "dans", "des"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "para", "con", "del"],
}


def _tokens(col):
    """Lowercased whitespace tokens of a normalized string."""
    norm = F.lower(F.trim(F.regexp_replace(col, r"[^\p{L}\p{N}\s]", " ")))
    return F.filter(F.split(norm, r"\s+"), lambda t: t != F.lit(""))


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy (count of
    letter/digit runs — the standard pre-tokenizer split)."""
    return df.select(
        "doc_id",
        F.size(_tokens(F.col(text_col))).alias("n_tokens"),
        F.size(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^\p{L}\p{N}]+"),
                lambda t: t != F.lit(""),
            )
        ).alias("n_words"),
        F.length(text_col).alias("n_chars"),
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: length band, alpha ratio,
    punctuation ratio, mean word length band (the usual cheap filters)."""
    n_chars = F.length(text_col)
    n_alpha = F.length(F.regexp_replace(text_col, r"[^\p{L}]", ""))
    n_punct = F.length(F.regexp_replace(text_col, r"[^.,;:!?]", ""))
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks)
    mean_wl = F.when(n_tokens > 0, n_alpha / n_tokens).otherwise(F.lit(0.0))
    len_ok = F.when((n_chars >= 50) & (n_chars <= 20000), 1.0).otherwise(0.25)
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    wl_ok = F.when((mean_wl >= 2.5) & (mean_wl <= 12.0), 1.0).otherwise(0.5)
    score = (
        0.3 * len_ok
        + 0.3 * alpha_ratio
        + 0.2 * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0)))
        + 0.2 * wl_ok
    )
    return df.select(
        "doc_id",
        F.round(score, 6).alias("quality"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        n_tokens.alias("n_tokens"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language heuristic: the language whose stopword
    list overlaps the token multiset most wins; 'und' (undetermined) when
    nothing overlaps. One pass, pure array functions."""
    toks = _tokens(F.col(text_col))

    def _in_list(words):
        arr = F.array(*[F.lit(w) for w in words])
        return lambda t: F.array_contains(arr, t)

    scores = [
        F.size(F.filter(toks, _in_list(STOPWORDS[lang]))).alias(f"s_{lang}")
        for lang in STOPWORDS
    ]
    scored = df.select("doc_id", *scores)
    langs = list(STOPWORDS)
    best_score = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pick = F.lit("und")
    # reversed so earlier languages win ties (first match in dict order)
    for lang in reversed(langs):
        pick = F.when(
            (F.col(f"s_{lang}") == best_score) & (best_score > 0), lang
        ).otherwise(pick)
    return scored.select("doc_id", pick.alias("lang_pred"))


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of the casefolded, punctuation-stripped,
    whitespace-collapsed text (portable across engines — the dedup key)."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^\p{L}\p{N}\s]", ""),
            r"\s+",
            " ",
        )
    )
    return df.select("doc_id", F.md5(norm).alias("fingerprint"))


# PII patterns — deliberately lookaround-free ASCII classes so the Java
# (Spark) and RE2 (DuckDB oracle) regex engines match identically.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction over a document corpus.

    Returns ``(doc_id, n_emails, n_phones, n_ipv4, n_pii, redacted_fp)``
    — per-pattern match counts and the md5 fingerprint of the redacted
    text (emails → ``<EMAIL>``, then IPv4 → ``<IP>``, then phones →
    ``<PHONE>``, in that fixed order so overlapping matches resolve
    identically on every engine). Pure column expressions: the corpus
    never leaves the JVM and the scan is one codegen stage — the
    cheapest possible shape for a 100-TB redaction pass. The
    fingerprint (not the redacted text itself) keeps the output row
    narrow; callers wanting the text apply the same three
    ``regexp_replace`` steps.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_PHONE,
        "<PHONE>",
    )
    n_emails = F.regexp_count(t, F.lit(PII_EMAIL))
    n_ipv4 = F.regexp_count(t, F.lit(PII_IPV4))
    n_phones = F.regexp_count(t, F.lit(PII_PHONE))
    return df.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ipv4.alias("n_ipv4"),
        (n_emails + n_ipv4 + n_phones).alias("n_pii"),
        F.md5(redacted).alias("redacted_fp"),
    )


def _word_ngrams(toks, n: int):
    """Array of (non-distinct) n-token grams; empty when len(toks) < n."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals.

    Returns ``(doc_id, dup_line_frac, top_bigram_frac, dup_bigram_frac,
    dup_trigram_frac)`` — the standard repetition quality filters:
    fraction of non-unique lines, the most frequent word-bigram's share
    of all bigrams, and the non-unique fraction of word bi-/trigrams
    (tokenizer shared with :func:`token_counts`; all rounded to 6 dp;
    docs too short to form a gram score 0.0).

    Plan shape: the line metric is a pure array expression (no
    shuffle); the n-gram metrics are one explode + two hash aggs each,
    keyed by (doc_id, gram) so partial aggregation absorbs long
    documents — nothing corpus-sized shuffles more than once, and the
    per-doc join keys are the natural doc_id partitioning.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), F.trim),
        lambda x: x != F.lit(""),
    )
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)) / n_lines,
    ).otherwise(F.lit(0.0))
    base = df.select("doc_id", F.round(dup_line, 6).alias("dup_line_frac"))

    toks = _tokens(F.col(text_col))

    def _gram_stats(n: int, prefix: str) -> DataFrame:
        grams = df.select(
            "doc_id", F.explode(_word_ngrams(toks, n)).alias("g")
        )
        c = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        return c.groupBy("doc_id").agg(
            F.sum("c").alias(f"{prefix}_total"),
            F.max("c").alias(f"{prefix}_max"),
            F.count(F.lit(1)).alias(f"{prefix}_distinct"),
        )

    bi = _gram_stats(2, "bi")
    tri = _gram_stats(3, "tri")
    out = base.join(bi, "doc_id", "left").join(tri, "doc_id", "left")

    def _frac(num, den):
        return F.round(
            F.when(F.coalesce(den, F.lit(0)) > 0, num / den).otherwise(0.0), 6
        )

    return out.select(
        "doc_id",
        "dup_line_frac",
        _frac(F.col("bi_max"), F.col("bi_total")).alias("top_bigram_frac"),
        _frac(
            F.col("bi_total") - F.col("bi_distinct"), F.col("bi_total")
        ).alias("dup_bigram_frac"),
        _frac(
            F.col("tri_total") - F.col("tri_distinct"), F.col("tri_total")
        ).alias("dup_trigram_frac"),
    )


def top_terms(
    df: DataFrame, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary head: ``(term, n long, df long)`` — the k most
    frequent tokens (same tokenizer as :func:`token_counts`) with total
    count and document frequency, ranked (n DESC, term ASC). The vocab
    inspection / stopword-candidate / tokenizer-sanity table every
    corpus build starts with. One explode + one hash agg (map-side
    combinable) + a top-k sort of the (tiny) term table — at 100 TB
    the agg output is vocabulary-sized, never corpus-sized.
    """
    toks = df.select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("term")
    )
    counts = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("df"),
    )
    return counts.orderBy(F.desc("n"), F.asc("term")).limit(k)


def tfidf_top_terms(
    df: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Per-document keyword extraction: ``(doc_id, term, score)`` — the
    k terms with highest tf·idf per document (idf = ln(N / df_term),
    ties broken (score DESC, term ASC), score rounded to 6 dp). The
    cheap keyword/topic-feature table of a corpus build. Plan: one
    explode + two hash aggs (term frequencies are map-side combinable),
    a broadcast of the scalar N and the (vocabulary-sized) df table,
    and one per-doc top-k window — nothing corpus-sized shuffles twice.
    """
    toks = df.select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    n_docs = df.select(
        F.countDistinct("doc_id").alias("n_docs")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("dfreq")), 6
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def unigram_logprob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document unigram cross-entropy against the corpus's OWN
    unigram distribution — the cheap LM-quality signal (mean token
    surprisal in bits): boilerplate/repetitive docs score low,
    gibberish and rare-token soup score high, both tails are the usual
    filter candidates.

    Returns ``(doc_id, n_tokens, xent_bits)`` with
    ``xent_bits = -mean_t log2(tf(t) / N)`` over the doc's (normalized)
    tokens; zero-token docs yield no row.

    Plan shape at 100 TB: explode is narrow; the term-frequency table
    is VOCABULARY-sized (one map-side-combinable hash agg of the token
    stream) and joins back against the stream as a build-side-small
    hash join — stopword skew sits on the probe side only, which hash
    joins tolerate (and AQE splits). No driver collect, no window.
    """
    from graft.checkpoint import truncate

    toks = df.select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("term")
    )
    # materialize the vocabulary-sized tf table once: unmaterialized,
    # its lineage (a full corpus tokenization) re-runs for the
    # corpus_n scalar AND the probe join — three passes instead of two
    # (the probe-side re-tokenization is the one irreducible repeat)
    tf = truncate(toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf")))
    total = tf.agg(F.sum("tf").alias("corpus_n"))
    return (
        toks.join(tf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                -F.avg(F.log2(F.col("tf") / F.col("corpus_n"))), 6
            ).alias("xent_bits"),
        )
    )


def zipf_alpha(df: DataFrame, f_min: int = 2, text_col: str = "text") -> DataFrame:
    """One-row ``(alpha, n_tail_terms, vocab_size, f_min)`` — the
    continuous MLE (Hill) estimate of the term-frequency tail exponent
    over terms with frequency ≥ ``f_min``, with the same Clauset–
    Shalizi–Newman −0.5 discreteness correction the degree-tail
    estimator uses (graft.algos.structure.powerlaw_alpha — this is its
    text twin): how Zipfian the corpus vocabulary is, the number that
    sizes hash-vocab tables and decides stopword pruning before the
    token-level operators run at scale.

    Cost: one explode + one vocabulary-sized hash agg + one scalar
    agg. alpha is NULL on an empty tail; floats rounded to 6 dp.
    """
    tf = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    return tf.agg(
        F.round(
            1.0
            + F.count(F.when(F.col("f") >= f_min, 1))
            / F.sum(
                F.when(F.col("f") >= f_min, F.log(F.col("f") / (f_min - 0.5)))
            ),
            6,
        ).alias("alpha"),
        F.count(F.when(F.col("f") >= f_min, 1)).alias("n_tail_terms"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.lit(f_min).cast("long").alias("f_min"),
    )


def bigram_logprob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document bigram cross-entropy against the corpus's OWN
    bigram MLE — the conditional counterpart of
    :func:`unigram_logprob`: ``xent_bits = -mean_i log2(c(prev, cur) /
    c_ctx(prev))`` over the doc's token bigrams, where ``c_ctx`` counts
    the context token's occurrences AS a bigram context. Because the
    model is trained on the same corpus it scores, every scored bigram
    has nonzero count — no smoothing term to tune. Low = predictable /
    template-like text, high = incoherent token soup; the GAP
    unigram−bigram xent is the classic fluency signal (repetitive
    boilerplate has low bigram xent even when its unigram xent is
    normal).

    Returns ``(doc_id, n_bigrams, xent_bits)``; docs with fewer than 2
    tokens yield no row (same convention as unigram_logprob's
    zero-token docs).

    Plan shape at 100 TB: same as unigram_logprob one level up — the
    bigram stream is explode-narrow; the frequency tables are
    bigram-vocabulary-sized hash aggs (map-side combinable) probed by
    hash joins; no window, no collect.
    """
    from graft.checkpoint import truncate

    grams = df.select(
        "doc_id", F.explode(_word_ngrams(_tokens(F.col(text_col)), 2))
        .alias("g")
    )
    pairs = grams.select(
        "doc_id",
        F.substring_index("g", " ", 1).alias("prev"),
        F.substring_index("g", " ", -1).alias("cur"),
    )
    bf = truncate(
        pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("f"))
    )
    cf = bf.groupBy("prev").agg(F.sum("f").alias("cf"))
    return (
        pairs.join(bf, ["prev", "cur"])
        .join(cf, "prev")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -F.avg(F.log2(F.col("f") / F.col("cf"))), 6
            ).alias("xent_bits"),
        )
    )
