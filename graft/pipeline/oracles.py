"""DuckDB-dialect oracle SQL mirroring graft.pipeline operators.

Every expression here is the engine-portable twin of a Spark column
expression in textstats/dedup/similarity: md5-based hashes, identical
normalization regexes, identical tie-breaks, floats rounded to 6 dp on
both sides. Used by __spark_entry__.oracle_sql().
"""

from graft.pipeline.textstats import STOPWORDS

# normalized text + token list (mirrors textstats._tokens /
# the dedup/fingerprint normalizer)
_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), "
    "'[^\\p{L}\\p{N}\\s]', '', 'g'), '\\s+', ' ', 'g'))"
)
_NORM_SPACED = (
    "trim(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'))"
)

SQL_TOKEN_COUNTS = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex({_NORM_SPACED}, '\\s+'),
                     t -> t <> '') AS l,
         list_filter(string_split_regex(lower(text), '[^\\p{{L}}\\p{{N}}]+'),
                     t -> t <> '') AS w,
         length(text) AS n_chars
  FROM documents
)
SELECT doc_id, len(l) AS n_tokens, len(w) AS n_words, n_chars FROM toks
"""

SQL_FINGERPRINTS = f"""
SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents
"""

SQL_EXACT_DEDUP = f"""
WITH fp AS (
  SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents
), canon AS (
  SELECT fingerprint, min(doc_id) AS canonical_id,
         count(*) AS group_size
  FROM fp GROUP BY fingerprint
)
SELECT fp.doc_id, fp.fingerprint,
       fp.doc_id = c.canonical_id AS keep,
       c.canonical_id, c.group_size
FROM fp JOIN canon c USING (fingerprint)
"""


def _lang_sql() -> str:
    score_cols = []
    for lang, words in STOPWORDS.items():
        arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        score_cols.append(
            f"len(list_filter(l, t -> list_contains({arr}, t))) AS s_{lang}"
        )
    langs = list(STOPWORDS)
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = "CASE "
    for lang in langs:  # dict order: earlier language wins ties
        case += f"WHEN s_{lang} = best AND best > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex({_NORM_SPACED}, '\\s+'),
                     t -> t <> '') AS l
  FROM documents
), scored AS (
  SELECT doc_id, {', '.join(score_cols)} FROM toks
), withbest AS (
  SELECT *, {best} AS best FROM scored
)
SELECT doc_id, {case} AS lang_pred FROM withbest
"""


SQL_LANG_ID = _lang_sql()

# shingles: distinct 3-token shingles of the normalized text, mirroring
# dedup._shingles (sequence over start offsets, slice k tokens, join)
_SQL_SHINGLES = f"""
toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS l FROM documents
), expanded AS (
  SELECT doc_id, l,
         unnest(range(1, greatest(len(l) - 2, 1) + 1)) AS i
  FROM toks
), sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(l[i:i+2], ' ') AS shingle
  FROM expanded
  WHERE array_to_string(l[i:i+2], ' ') <> ''
)
"""


def _minhash_sql(n_hashes: int = 16) -> str:
    aggs = ", ".join(
        f"min(md5(shingle || '#{i}')) AS sig_{i}" for i in range(n_hashes)
    )
    return f"WITH {_SQL_SHINGLES} SELECT doc_id, {aggs} FROM sh GROUP BY doc_id"


SQL_MINHASH = _minhash_sql()


def _near_dup_sql(
    n_hashes: int = 16, bands: int = 4, max_bucket: int = 50,
    threshold: float = 0.5,
) -> str:
    rows = n_hashes // bands
    sig_aggs = ", ".join(
        f"min(md5(shingle || '#{i}')) AS sig_{i}" for i in range(n_hashes)
    )
    band_selects = []
    for b in range(bands):
        cols = ", ".join(f"sig_{b * rows + r}" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5(concat_ws('|', {cols})) AS h "
            "FROM sig"
        )
    bands_union = " UNION ALL ".join(band_selects)
    # WITH-less body so callers can prepend WITH or WITH RECURSIVE
    return f"""
{_SQL_SHINGLES}
, sig AS (SELECT doc_id, {sig_aggs} FROM sh GROUP BY doc_id)
, buckets AS ({bands_union})
, capped AS (
  SELECT * FROM (
    SELECT doc_id, band, h,
           count(*) OVER (PARTITION BY band, h) AS bs
    FROM buckets
  ) WHERE bs <= {max_bucket}
), cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM capped l JOIN capped r ON l.band = r.band AND l.h = r.h
  WHERE l.doc_id < r.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT c.a, c.b, count(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a
  JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
), pairs AS (
  SELECT i.a, i.b,
         round(n_inter / (za.n + zb.n - n_inter), 6) AS jaccard
  FROM inter i
  JOIN sizes za ON za.doc_id = i.a
  JOIN sizes zb ON zb.doc_id = i.b
  WHERE round(n_inter / (za.n + zb.n - n_inter), 6) >= {threshold}
)"""


SQL_NEAR_DUP_PAIRS = (
    "WITH " + _near_dup_sql() + "\nSELECT a, b, jaccard FROM pairs"
)


def _near_dup_clusters_sql(**kwargs) -> str:
    """Transitive closure of the verified near-dup pairs (mirrors
    graft.pipeline.dedup.near_dup_clusters): recursive reachability over
    the symmetrized pair edges, cluster id = min doc_id reachable,
    singletons = every unpaired document."""
    return (
        "WITH RECURSIVE "
        + _near_dup_sql(**kwargs)
        + """
, sym AS (
  SELECT a AS u, b AS v FROM pairs
  UNION
  SELECT b AS u, a AS v FROM pairs
), reach(v, u) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT r.v, s.v FROM reach r JOIN sym s ON r.u = s.u
), labels AS (
  SELECT v AS doc_id, min(u) AS cluster_id FROM reach GROUP BY v
)
SELECT d.doc_id,
       coalesce(l.cluster_id, d.doc_id) AS cluster_id,
       coalesce(l.cluster_id, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id"""
    )


SQL_NEAR_DUP_CLUSTERS = _near_dup_clusters_sql()

SQL_COSINE_TOPK = """
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
), scored AS (
  SELECT e.vec_id,
         round(
           list_dot_product(e.embedding::DOUBLE[], q.qv)
           / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                    e.embedding::DOUBLE[]))
              * sqrt(list_dot_product(q.qv, q.qv))),
           6
         ) AS cosine
  FROM embeddings e, q
)
SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id LIMIT 10
"""

# WITH-less body shared by SQL_QUALITY_SCORES and the quality-aware
# survivor selection; final CTE `qual` carries the rounded scores
_QUALITY_BODY = f"""raw AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^\\p{{L}}]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         len(list_filter(string_split_regex({_NORM_SPACED}, '\\s+'),
                         t -> t <> '')) AS n_tokens
  FROM documents
), feat AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_chars >= 50 AND n_chars <= 20000
              THEN 1.0 ELSE 0.25 END AS len_ok,
         CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END
           AS alpha_ratio,
         CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END
           AS punct_ratio,
         CASE WHEN n_tokens > 0 AND n_alpha / n_tokens >= 2.5
                   AND n_alpha / n_tokens <= 12.0
              THEN 1.0 ELSE 0.5 END AS wl_ok
  FROM raw
), qual AS (
  SELECT doc_id,
         round(0.3 * len_ok + 0.3 * alpha_ratio
               + 0.2 * (1.0 - least(punct_ratio * 5.0, 1.0))
               + 0.2 * wl_ok, 6) AS quality,
         round(alpha_ratio, 6) AS alpha_ratio,
         round(punct_ratio, 6) AS punct_ratio,
         n_tokens
  FROM feat
)"""

SQL_QUALITY_SCORES = (
    "WITH "
    + _QUALITY_BODY
    + """
SELECT doc_id, quality, alpha_ratio, punct_ratio, n_tokens FROM qual"""
)


def _survivors_sql(**kwargs) -> str:
    """Quality-aware survivor selection per transitive near-dup cluster
    (mirrors graft.pipeline.dedup.select_survivors): the cluster
    recursion + the quality formula + (quality desc, doc_id asc)
    argmax and cluster sizes."""
    return (
        "WITH RECURSIVE "
        + _near_dup_sql(**kwargs)
        + """
, sym AS (
  SELECT a AS u, b AS v FROM pairs
  UNION
  SELECT b AS u, a AS v FROM pairs
), reach(v, u) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT r.v, s.v FROM reach r JOIN sym s ON r.u = s.u
), labels AS (
  SELECT v AS doc_id, min(u) AS cluster_id FROM reach GROUP BY v
), cl AS (
  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
), """
        + _QUALITY_BODY
        + """
, jq AS (
  SELECT cl.doc_id, cl.cluster_id, q.quality
  FROM cl JOIN qual q ON q.doc_id = cl.doc_id
), rk AS (
  SELECT doc_id, cluster_id, quality,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY quality DESC, doc_id) AS r,
         count(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM jq
)
SELECT doc_id, cluster_id, quality, r = 1 AS survivor, cluster_size
FROM rk"""
    )


SQL_DEDUP_SURVIVORS = _survivors_sql()

# media_features: synth_media documents payload length 64 + (i % 5) * 32
# bytes for media_id i (graft/pipeline/multimodal.py:37) — the oracle
# derives the expected (media_id, n_bytes) table independently, which
# verifies the Arrow mapInPandas plumbing round-trips ids and payload
# sizes (the decode itself is the documented deterministic stub).
SQL_MEDIA_FEATURES = """
SELECT CAST(range AS BIGINT) AS media_id,
       CAST(64 + (range % 5) * 32 AS INTEGER) AS n_bytes
FROM range(64)
"""


def _sig_sql(planes, vec: str) -> str:
    """±1-plane sign signature of a DOUBLE[] expression — term-for-term
    the same multiply/add order as similarity._signature, so the float
    decisions agree bit-for-bit."""
    bits = []
    for j in range(len(planes)):
        terms = " + ".join(
            f"({planes[j][d]:+.1f}) * {vec}[{d + 1}]"
            for d in range(len(planes[j]))
        )
        bits.append(f"(CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits)


def _ann_topk_sql(dim: int = 64, n_planes: int = 4, k: int = 10) -> str:
    """Mirror of similarity.lsh_bucket_topk_planes with the query's own
    bucket computed in SQL from the same md5-Rademacher planes."""
    from graft.pipeline.similarity import rademacher_planes

    planes = rademacher_planes(dim, n_planes)
    cos = (
        "round(list_dot_product(s.ev, q.qv) / "
        "(sqrt(list_dot_product(s.ev, s.ev)) * "
        "sqrt(list_dot_product(q.qv, q.qv))), 6)"
    )
    return f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
), q AS (
  SELECT ev AS qv FROM base WHERE vec_id = 0
), sig AS (
  SELECT vec_id, ev, {_sig_sql(planes, 'ev')} AS s FROM base
), qs AS (
  SELECT {_sig_sql(planes, 'qv')} AS s FROM q
)
SELECT s.vec_id, {cos} AS cosine
FROM sig s, q, qs
WHERE s.s = qs.s
ORDER BY cosine DESC, s.vec_id
LIMIT {k}
"""


SQL_ANN_TOPK = _ann_topk_sql()


def _ivf_topk_sql(centroid_mod: int = 31, n_probe: int = 2,
                  k: int = 10) -> str:
    """Mirror of similarity.ivf_topk: centroids are the deterministic
    ``vec_id % centroid_mod = 0`` sample, vectors assign to the
    max-cosine centroid (6-dp compare, larger cid wins ties — identical
    to Spark's max(struct(cos, cid))), the query probes its ``n_probe``
    best centroids, exact top-k over the probed candidates."""
    return f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
), cents AS (
  SELECT vec_id AS cid, ev AS cv FROM base WHERE vec_id % {centroid_mod} = 0
), q AS (
  SELECT ev AS qv FROM base WHERE vec_id = 0
), assign AS (
  SELECT vec_id, cid FROM (
    SELECT b.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY b.vec_id
             ORDER BY round(list_dot_product(b.ev, c.cv)
                            / (sqrt(list_dot_product(b.ev, b.ev))
                               * sqrt(list_dot_product(c.cv, c.cv))), 6)
                      DESC, c.cid DESC
           ) AS rn
    FROM base b, cents c
  ) WHERE rn = 1
), qprobe AS (
  SELECT cid FROM (
    SELECT c.cid,
           row_number() OVER (
             ORDER BY round(list_dot_product(c.cv, q.qv)
                            / (sqrt(list_dot_product(c.cv, c.cv))
                               * sqrt(list_dot_product(q.qv, q.qv))), 6)
                      DESC, c.cid DESC
           ) AS rn
    FROM cents c, q
  ) WHERE rn <= {n_probe}
)
SELECT b.vec_id,
       round(list_dot_product(b.ev, q.qv)
             / (sqrt(list_dot_product(b.ev, b.ev))
                * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
FROM base b
JOIN assign a ON a.vec_id = b.vec_id
JOIN qprobe p ON p.cid = a.cid, q
ORDER BY cosine DESC, b.vec_id
LIMIT {k}
"""


SQL_IVF_TOPK = _ivf_topk_sql()


def _simhash_sql(bits: int = 32) -> str:
    """Mirrors dedup.simhash: token hash = first 8 hex chars of md5; bit
    b of that 32-bit value lives in hex char ``8 - b//4`` (md5 hex is
    big-endian), nibble bit ``b % 4`` — pure string/arithmetic SQL, no
    hex→int cast needed."""
    bit_sums = []
    for b in range(bits):
        char_pos = 8 - b // 4
        nib = (
            f"(strpos('0123456789abcdef', "
            f"substring(md5(tok), {char_pos}, 1)) - 1)"
        )
        bit_sums.append(
            f"sum(CASE WHEN (({nib} >> {b % 4}) & 1) = 1 "
            f"THEN 1 ELSE -1 END) AS b{b}"
        )
    val = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split({_NORM}, ' '), t -> t <> ''))
           AS tok
  FROM documents
), agg AS (
  SELECT doc_id, {', '.join(bit_sums)} FROM toks GROUP BY doc_id
)
SELECT doc_id, CAST({val} AS BIGINT) AS simhash FROM agg
"""


SQL_SIMHASH = _simhash_sql()


def _near_dup_embeddings_sql(
    threshold: float = 0.95, n_planes: int = 8, max_bucket: int = 50,
    dim: int = 64, dup_mod: int = 10, dup_offset: int = 1_000_000,
) -> str:
    """LSH-bucketed near-duplicate pairs over embeddings ∪ planted exact
    copies (vec_id % dup_mod == 0, re-id'd at +dup_offset). The
    hyperplanes are the md5-Rademacher planes from
    graft.pipeline.similarity.rademacher_planes, inlined as literals, so
    the oracle reproduces the *bucketing* (not just the cosine check):
    identical sign expressions, identical bucket cap, identical pair
    join."""
    from graft.pipeline.similarity import rademacher_planes

    planes = rademacher_planes(dim, n_planes)
    sig_bits = []
    for j in range(n_planes):
        terms = " + ".join(
            f"({planes[j][d]:+.1f}) * ev[{d + 1}]" for d in range(dim)
        )
        sig_bits.append(f"(CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END)")
    sig = " || ".join(sig_bits)
    cos = (
        "round(list_dot_product(a.ev, b.ev) / "
        "(sqrt(list_dot_product(a.ev, a.ev)) * "
        "sqrt(list_dot_product(b.ev, b.ev))), 6)"
    )
    return f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
  UNION ALL
  SELECT vec_id + {dup_offset}, embedding::DOUBLE[] FROM embeddings
  WHERE vec_id % {dup_mod} = 0
), sig AS (
  SELECT vec_id, ev, {sig} AS s FROM base
), capped AS (
  SELECT * FROM (
    SELECT vec_id, ev, s, count(*) OVER (PARTITION BY s) AS bs FROM sig
  ) WHERE bs <= {max_bucket}
)
SELECT DISTINCT a.vec_id AS a, b.vec_id AS b, {cos} AS cosine
FROM capped a JOIN capped b ON a.s = b.s AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


SQL_NEAR_DUP_EMBEDDINGS = _near_dup_embeddings_sql()


def _smoothed_embeddings_sql(
    alpha: float = 0.5, threshold: float = 0.95, n_planes: int = 8,
    max_bucket: int = 50, dim: int = 64, dup_mod: int = 10,
    dup_offset: int = 1_000_000,
) -> str:
    """One mean-aggregation smoothing layer over the SAME LSH-bucketed
    near-dup pair graph as SQL_NEAR_DUP_EMBEDDINGS (planes, bucket cap
    and threshold inlined identically), replayed component-wise:
    unnest WITH ORDINALITY -> per-(id, pos) neighbor mean -> rounded
    alpha-blend -> order-pinned list rebuild. Mirrors
    graft.pipeline.similarity.smooth_embeddings exactly."""
    from graft.pipeline.similarity import rademacher_planes

    planes = rademacher_planes(dim, n_planes)
    sig_bits = []
    for j in range(n_planes):
        terms = " + ".join(
            f"({planes[j][d]:+.1f}) * ev[{d + 1}]" for d in range(dim)
        )
        sig_bits.append(f"(CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END)")
    sig = " || ".join(sig_bits)
    cos = (
        "round(list_dot_product(a.ev, b.ev) / "
        "(sqrt(list_dot_product(a.ev, a.ev)) * "
        "sqrt(list_dot_product(b.ev, b.ev))), 6)"
    )
    return f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
  UNION ALL
  SELECT vec_id + {dup_offset}, embedding::DOUBLE[] FROM embeddings
  WHERE vec_id % {dup_mod} = 0
), sig AS (
  SELECT vec_id, ev, {sig} AS s FROM base
), capped AS (
  SELECT * FROM (
    SELECT vec_id, ev, s, count(*) OVER (PARTITION BY s) AS bs FROM sig
  ) WHERE bs <= {max_bucket}
), prs AS (
  SELECT DISTINCT a.vec_id AS a, b.vec_id AS b
  FROM capped a JOIN capped b ON a.s = b.s AND a.vec_id < b.vec_id
  WHERE {cos} >= {threshold}
), sym AS (
  SELECT a AS id, b AS nbr FROM prs
  UNION
  SELECT b AS id, a AS nbr FROM prs
), comp AS (
  SELECT s.id, r.pos, e.ev[r.pos] AS val
  FROM sym s
  JOIN base e ON e.vec_id = s.nbr,
  LATERAL (SELECT unnest(range(1, len(e.ev) + 1)) AS pos) r
), mn AS (
  SELECT id, pos, avg(val) AS mv FROM comp GROUP BY id, pos
), own AS (
  SELECT e.vec_id AS id, r.pos, e.ev[r.pos] AS val
  FROM base e,
  LATERAL (SELECT unnest(range(1, len(e.ev) + 1)) AS pos) r
), outc AS (
  SELECT o.id, o.pos,
         round(CASE WHEN m.mv IS NULL THEN o.val
                    ELSE {alpha} * o.val + {1.0 - alpha} * m.mv END,
               6) AS v
  FROM own o LEFT JOIN mn m ON m.id = o.id AND m.pos = o.pos
)
SELECT id AS vec_id, list(v ORDER BY pos) AS embedding
FROM outc GROUP BY id
"""


SQL_SMOOTHED_EMBEDDINGS = _smoothed_embeddings_sql()


def _knn_graph_sql(
    k: int = 5, n_planes: int = 8, max_bucket: int = 50, dim: int = 64,
    dup_mod: int = 10, dup_offset: int = 1_000_000,
) -> str:
    """Approximate kNN graph over the planted-duplicate corpus: the
    same md5-Rademacher sign buckets and cap as
    SQL_NEAR_DUP_EMBEDDINGS, then row_number() <= k per source with
    the engine's exact tie-break (cosine DESC, b ASC). Mirrors
    graft.pipeline.similarity.knn_graph."""
    from graft.pipeline.similarity import rademacher_planes

    planes = rademacher_planes(dim, n_planes)
    sig_bits = []
    for j in range(n_planes):
        terms = " + ".join(
            f"({planes[j][d]:+.1f}) * ev[{d + 1}]" for d in range(dim)
        )
        sig_bits.append(f"(CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END)")
    sig = " || ".join(sig_bits)
    cos = (
        "round(list_dot_product(a.ev, b.ev) / "
        "(sqrt(list_dot_product(a.ev, a.ev)) * "
        "sqrt(list_dot_product(b.ev, b.ev))), 6)"
    )
    return f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
  UNION ALL
  SELECT vec_id + {dup_offset}, embedding::DOUBLE[] FROM embeddings
  WHERE vec_id % {dup_mod} = 0
), sig AS (
  SELECT vec_id, ev, {sig} AS s FROM base
), capped AS (
  SELECT * FROM (
    SELECT vec_id, ev, s, count(*) OVER (PARTITION BY s) AS bs FROM sig
  ) WHERE bs <= {max_bucket}
), scored AS (
  SELECT a.vec_id AS a, b.vec_id AS b, {cos} AS cosine
  FROM capped a JOIN capped b
    ON a.s = b.s AND a.vec_id <> b.vec_id
)
SELECT a, b, cosine FROM (
  SELECT a, b, cosine,
         row_number() OVER (PARTITION BY a ORDER BY cosine DESC, b)
           AS rn
  FROM scored
) WHERE rn <= {k}
"""


SQL_KNN_GRAPH = _knn_graph_sql()


SQL_TOP_TERMS = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex({_NORM_SPACED}, '\\s+'),
                            t -> t <> '')) AS term
  FROM documents
), c AS (
  SELECT term, count(*) AS n, count(DISTINCT doc_id) AS df
  FROM toks GROUP BY term
)
SELECT term, n, df FROM c ORDER BY n DESC, term LIMIT 50
"""


_U60 = ("('0x' || substr(md5(cast(doc_id AS varchar) || '#{salt}'), "
        "1, 15))::BIGINT")

SQL_DETERMINISTIC_SAMPLE = f"""
SELECT doc_id FROM documents
WHERE {_U60.format(salt='sample')} < {int(0.2 * 2**60)}
"""

SQL_SPLIT_ASSIGNMENT = f"""
SELECT doc_id,
       CASE WHEN {_U60.format(salt='split')} < {int(0.9 * 2**60)}
              THEN 'train'
            WHEN {_U60.format(salt='split')} < {int(0.95 * 2**60)}
              THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


SQL_TFIDF_TOP_TERMS = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex({_NORM_SPACED}, '\\s+'),
                            t -> t <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS dfreq FROM tf GROUP BY term
), n AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(n.n_docs / dfreq.dfreq), 6) AS score
  FROM tf JOIN dfreq USING (term), n
)
SELECT doc_id, term, score FROM (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rn
  FROM scored
) WHERE rn <= 3
"""


# embedding moments (PCA/whitening statistics): per-dimension mean and
# the d×d population covariance — the SQL twins of the Arrow
# partial-sum pass in graft.pipeline.embeddings.embedding_moments.
# DuckDB arrays are 1-indexed; range(len) generates 0-based dims.
SQL_EMBEDDING_MEAN = """
WITH x AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
  WHERE embedding IS NOT NULL
)
SELECT pos, round(avg(v), 6) AS avg_v FROM x GROUP BY pos
"""

SQL_EMBEDDING_COVARIANCE = """
WITH x AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
  WHERE embedding IS NOT NULL
)
SELECT a.pos AS i, b.pos AS j,
       round(avg(a.v * b.v) - avg(a.v) * avg(b.v), 6) AS cov
FROM x a JOIN x b USING (vec_id)
GROUP BY a.pos, b.pos
"""


def _kmeans_sql(k: int, rounds: int) -> str:
    """Unrolled Lloyd k-means twin of graft.pipeline.embeddings.kmeans:
    pmod(vec_id, k) partition init, per-round nearest-centroid assignment on
    6-dp-rounded squared L2 with lowest-cid ties, recentroid by plain
    avg. (The engine keeps a previous centroid when a cluster empties;
    the SQL drops it — equivalent whenever no cluster empties at the
    contract SFs, which the green hash itself certifies end-to-end.)"""
    sql = """
WITH x AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
  WHERE embedding IS NOT NULL
)
, a0 AS (
  SELECT vec_id, ((vec_id % {k}) + {k}) % {k} AS cid
  FROM embeddings WHERE embedding IS NOT NULL
)"""
    for r in range(rounds):
        sql += """
, c{r} AS MATERIALIZED (
  SELECT a.cid, x.pos, avg(x.v) AS cv
  FROM x JOIN a{r} a USING (vec_id)
  GROUP BY a.cid, x.pos
)
, d{n} AS MATERIALIZED (
  SELECT x.vec_id, c.cid,
         round(sum((x.v - c.cv) * (x.v - c.cv)), 6) AS d2
  FROM x JOIN c{r} c ON c.pos = x.pos
  GROUP BY x.vec_id, c.cid
)
, a{n} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cid) AS rn
    FROM d{n}
  ) WHERE rn = 1
)""".replace("{r}", str(r)).replace("{n}", str(r + 1))
    sql += f"""
SELECT vec_id, cid AS centroid_id FROM a{rounds}"""
    return sql.replace("{k}", str(k))


SQL_KMEANS_2ITER = _kmeans_sql(8, 2)


# --- PII scan (textstats.pii_scan): RE2 twins of the Java patterns ---
_PII_EMAIL = "[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}"
_PII_IPV4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_PII_PHONE = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

SQL_PII_SCAN = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phones,
       len(regexp_extract_all(text, '{_PII_IPV4}')) AS n_ipv4,
       len(regexp_extract_all(text, '{_PII_EMAIL}'))
         + len(regexp_extract_all(text, '{_PII_IPV4}'))
         + len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_pii,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_IPV4}', '<IP>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g')) AS redacted_fp
FROM documents
"""


# --- repetition stats (textstats.repetition_stats) ---
SQL_REPETITION_STATS = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)),
                                    x -> trim(x)), x -> x <> '') AS lns,
         list_filter(string_split_regex({_NORM_SPACED}, '\\s+'),
                     t -> t <> '') AS l
  FROM documents
), lin AS (
  SELECT doc_id,
         CASE WHEN len(lns) > 0
              THEN round(1.0 - 1.0 * len(list_distinct(lns)) / len(lns), 6)
              ELSE 0.0 END AS dup_line_frac
  FROM base
), bg AS (
  SELECT doc_id, array_to_string(l[i:i+1], ' ') AS g
  FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS i
        FROM base WHERE len(l) >= 2)
), bc AS (
  SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g
), bi AS (
  SELECT doc_id, sum(c) AS bt, max(c) AS bm, count(*) AS bd
  FROM bc GROUP BY doc_id
), tg AS (
  SELECT doc_id, array_to_string(l[i:i+2], ' ') AS g
  FROM (SELECT doc_id, l, unnest(range(1, len(l) - 1)) AS i
        FROM base WHERE len(l) >= 3)
), tc AS (
  SELECT doc_id, g, count(*) AS c FROM tg GROUP BY doc_id, g
), tri AS (
  SELECT doc_id, sum(c) AS tt, max(c) AS tm, count(*) AS td
  FROM tc GROUP BY doc_id
)
SELECT lin.doc_id, dup_line_frac,
       round(CASE WHEN coalesce(bt, 0) > 0
                  THEN 1.0 * bm / bt ELSE 0.0 END, 6) AS top_bigram_frac,
       round(CASE WHEN coalesce(bt, 0) > 0
                  THEN 1.0 * (bt - bd) / bt ELSE 0.0 END, 6)
         AS dup_bigram_frac,
       round(CASE WHEN coalesce(tt, 0) > 0
                  THEN 1.0 * (tt - td) / tt ELSE 0.0 END, 6)
         AS dup_trigram_frac
FROM lin LEFT JOIN bi USING (doc_id) LEFT JOIN tri USING (doc_id)
"""


def _decontaminate_sql(mod: int = 41, threshold: float = 0.1) -> str:
    """Oracle for dedup.decontaminate over the contract split: eval =
    documents with doc_id % mod == 0, train = the rest; k=3 shingles
    (reuses the certified _SQL_SHINGLES CTE)."""
    return f"""
WITH {_SQL_SHINGLES.strip().lstrip(',').strip()}
, train AS (SELECT * FROM sh WHERE doc_id % {mod} <> 0)
, ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {mod} = 0)
, agg AS (
  SELECT t.doc_id, count(*) AS n_grams,
         sum(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM train t LEFT JOIN ev e USING (shingle)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       coalesce(n_grams, 0) AS n_grams,
       coalesce(n_hit, 0) AS n_hit,
       round(CASE WHEN coalesce(n_grams, 0) > 0
                  THEN 1.0 * coalesce(n_hit, 0) / n_grams
                  ELSE 0.0 END, 6) AS overlap_frac,
       round(CASE WHEN coalesce(n_grams, 0) > 0
                  THEN 1.0 * coalesce(n_hit, 0) / n_grams
                  ELSE 0.0 END, 6) >= {threshold} AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {mod} <> 0) d
LEFT JOIN agg USING (doc_id)
"""


SQL_DECONTAMINATION = _decontaminate_sql()


# --- chunking / sequence packing (graft.pipeline.packing) ---
# raw-text whitespace tokens: no lowering, no punctuation stripping
_RAW_TOKS = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"


def _chunk_sql(chunk: int = 64, overlap: int = 8) -> str:
    stride = chunk - overlap
    return f"""
WITH sized AS (
  SELECT doc_id, {_RAW_TOKS} AS l, len({_RAW_TOKS}) AS n FROM documents
), nz AS (
  SELECT * FROM sized WHERE n > 0
), idx AS (
  SELECT doc_id, l, n,
         unnest(generate_series(
           0,
           greatest(1, cast(ceil((n - {overlap}) / {stride}.0) AS BIGINT)) - 1
         )) AS chunk_idx
  FROM nz
)
SELECT doc_id, chunk_idx,
       array_to_string(
         l[chunk_idx*{stride}+1 : chunk_idx*{stride}+{chunk}], ' '
       ) AS chunk_text,
       least({chunk}, n - chunk_idx*{stride}) AS n_tokens
FROM idx
"""


def _pack_sql(seq_len: int = 512, n_buckets: int = 16) -> str:
    # same portable bucket hash as pack_sequences: first 8 md5 hex chars
    # of cast(doc_id as varchar), mod n_buckets; packing order
    # (bucket, doc_id); oracle computes the prefix sum with one flat
    # window (it doesn't need to scale)
    return f"""
WITH sized AS (
  SELECT doc_id, len({_RAW_TOKS}) AS n,
         cast(('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % {n_buckets} AS bucket
  FROM documents
), nz AS (
  SELECT * FROM sized WHERE n > 0
), offs AS (
  SELECT doc_id, n,
         coalesce(sum(n) OVER (
           ORDER BY bucket, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS off
  FROM nz
), spans AS (
  SELECT doc_id, n, off,
         unnest(generate_series(
           cast(floor(off / {seq_len}.0) AS BIGINT),
           cast(floor((off + n - 1) / {seq_len}.0) AS BIGINT)
         )) AS seq_id
  FROM offs
)
SELECT seq_id, doc_id,
       cast(greatest(seq_id*{seq_len} - off, 0) AS BIGINT) AS begin_tok,
       cast(least((seq_id+1)*{seq_len} - off, n) AS BIGINT) AS end_tok,
       cast(off + greatest(seq_id*{seq_len} - off, 0) - seq_id*{seq_len}
            AS BIGINT) AS seq_off
FROM spans
"""


def _pack_stats_sql(seq_len: int = 512, n_buckets: int = 16) -> str:
    return f"""
WITH packed AS ({_pack_sql(seq_len, n_buckets)}),
per_seq AS (
  SELECT seq_id, count(*) AS n_docs,
         sum(end_tok - begin_tok) AS fill
  FROM packed GROUP BY seq_id
),
straddle AS (
  SELECT count(*) AS straddling_docs FROM (
    SELECT doc_id FROM packed GROUP BY doc_id HAVING count(*) > 1
  )
)
SELECT count(*) AS n_seqs,
       round(avg(n_docs), 6) AS avg_docs_per_seq,
       cast(sum(CASE WHEN fill = {seq_len} THEN 1 ELSE 0 END) AS BIGINT)
         AS full_seqs,
       (SELECT straddling_docs FROM straddle) AS straddling_docs
FROM per_seq
"""


SQL_DOC_CHUNKS = _chunk_sql()
SQL_PACKED_SEQUENCES = _pack_sql()
SQL_PACKING_STATS = _pack_stats_sql()


# --- source mixing (graft.pipeline.splits.mix_sources) ---
def _mix_sql(weights: dict, key_col: str = "doc_id",
             salt: str = "mix") -> tuple[str, str]:
    """(plan_sql, mix_sql) oracle pair for source_mix_plan/mix_sources:
    same bottleneck-source feasibility math, same md5 60-bit threshold."""
    total = sum(weights.values())
    wrows = ", ".join(
        f"('{s}', {w / total!r})" for s, w in sorted(weights.items())
    )
    plan = f"""
WITH w AS (
  SELECT source, cast(weight AS DOUBLE) AS weight
  FROM (VALUES {wrows}) raw(source, weight)
),
counts AS (
  SELECT source, count(*) AS n_avail FROM documents GROUP BY source
), per AS (
  SELECT w.source, coalesce(counts.n_avail, 0) AS n_avail, w.weight
  FROM w LEFT JOIN counts USING (source)
), t AS (SELECT min(n_avail / weight) AS _t FROM per)
SELECT per.source, per.n_avail, round(per.weight, 6) AS weight,
       round(CASE WHEN per.n_avail > 0
                  THEN least(1.0, per.weight * t._t / per.n_avail)
                  ELSE 0.0 END, 6) AS accept_rate
FROM per, t
"""
    mix = f"""
WITH plan AS ({plan})
SELECT d.*, p.accept_rate
FROM documents d JOIN plan p USING (source)
WHERE cast(('0x' || substr(
        md5(cast(d.{key_col} AS VARCHAR) || '#{salt}'), 1, 15)) AS BIGINT)
      < cast(p.accept_rate * {2**60}.0 AS BIGINT)
"""
    return plan, mix


_MIX_WEIGHTS = {f"src{i}": (3.0 if i < 4 else 1.0) for i in range(16)}
SQL_SOURCE_MIX_PLAN, SQL_SOURCE_MIX = _mix_sql(_MIX_WEIGHTS)


# --- unigram cross-entropy (graft.pipeline.textstats.unigram_logprob) ---
SQL_UNIGRAM_XENT = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex({_NORM_SPACED}, '\\s+'),
                            t -> t <> '')) AS term
  FROM documents
), tf AS (
  SELECT term, count(*) AS tf FROM toks GROUP BY term
), tot AS (SELECT sum(tf) AS corpus_n FROM tf)
SELECT doc_id, count(*) AS n_tokens,
       round(-avg(log2(tf / corpus_n)), 6) AS xent_bits
FROM toks JOIN tf USING (term), tot
GROUP BY doc_id
"""


# --- Zipf term-frequency tail exponent (textstats.zipf_alpha) ---
def _zipf_sql(f_min: int = 2) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex({_NORM_SPACED}, '\\s+'),
                            t -> t <> '')) AS term
  FROM documents
), tf AS (SELECT term, count(*) AS f FROM toks GROUP BY term)
SELECT round(1.0 + count(CASE WHEN f >= {f_min} THEN 1 END)
             / sum(CASE WHEN f >= {f_min}
                        THEN ln(f / ({f_min} - 0.5)) END), 6) AS alpha,
       count(CASE WHEN f >= {f_min} THEN 1 END) AS n_tail_terms,
       count(*) AS vocab_size,
       cast({f_min} AS BIGINT) AS f_min
FROM tf
"""


SQL_ZIPF_ALPHA = _zipf_sql()


# --- cross-doc duplicated n-gram span coverage (dedup.dup_span_stats) ---
def _dup_span_sql(n: int = 8) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex({_NORM_SPACED}, '\\s+'),
                     t -> t <> '') AS t
  FROM documents
), per AS (
  SELECT doc_id, len(t) AS n_tokens,
         greatest(len(t) - {n - 1}, 0) AS n_grams
  FROM toks
), gr AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i + {n - 1}], ' ') AS g
  FROM toks, UNNEST(generate_series(1, len(t) - {n - 1})) AS s(i)
  WHERE len(t) >= {n}
), dup AS (
  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd FROM gr GROUP BY g)
  WHERE nd >= 2
), hits AS (
  SELECT gr.doc_id, gr.pos FROM gr JOIN dup USING (g)
), dupg AS (
  SELECT doc_id, count(*) AS dup_grams FROM hits GROUP BY doc_id
), cov AS (
  SELECT doc_id, count(DISTINCT pos + o) AS covered
  FROM hits, UNNEST(generate_series(0, {n - 1})) AS u(o)
  GROUP BY doc_id
)
SELECT p.doc_id, p.n_tokens, p.n_grams,
       coalesce(d.dup_grams, 0) AS dup_grams,
       coalesce(c.covered, 0) AS covered_tokens,
       round(CASE WHEN p.n_tokens > 0
                  THEN coalesce(c.covered, 0) / p.n_tokens
                  ELSE 0 END, 6) AS dup_token_frac
FROM per p
LEFT JOIN dupg d USING (doc_id)
LEFT JOIN cov c USING (doc_id)
"""


SQL_DUP_SPAN_STATS = _dup_span_sql()


# --- quality-weighted deterministic sampling (splits.weighted_sample) ---
SQL_WEIGHTED_SAMPLE = (
    "WITH "
    + _QUALITY_BODY
    + f"""
SELECT doc_id FROM qual
WHERE {_U60.format(salt='wsample')}
      < least(quality * 1152921504606846976.0, 1152921504606846976.0)
"""
)


# --- per-doc bigram cross-entropy (textstats.bigram_logprob) ---
SQL_BIGRAM_XENT = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex({_NORM_SPACED}, '\\s+'),
                     t -> t <> '') AS t
  FROM documents
), bg AS (
  SELECT doc_id, t[i] AS prev, t[i + 1] AS cur
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS s(i)
  WHERE len(t) >= 2
), bf AS (
  SELECT prev, cur, count(*) AS f FROM bg GROUP BY prev, cur
), cf AS (
  SELECT prev, sum(f) AS cf FROM bf GROUP BY prev
)
SELECT doc_id, count(*) AS n_bigrams,
       round(-avg(log2(f / cf)), 6) AS xent_bits
FROM bg JOIN bf USING (prev, cur) JOIN cf USING (prev)
GROUP BY doc_id
"""


def _ann_recall_sql(dim: int = 64, n_planes: int = 4, k: int = 10,
                    query_mod: int = 97, probe_bits: int = 0) -> str:
    """Mirror of similarity.ann_recall: identical md5-Rademacher
    bucketing, identical (cosine 6-dp DESC, id ASC) ranking on both the
    exact and the bucketed arm; ``probe_bits`` mirrors the multi-probe
    arm (positional Hamming distance over the signature bitstring)."""
    from graft.pipeline.similarity import rademacher_planes

    planes = rademacher_planes(dim, n_planes)
    ham = " + ".join(
        f"(CASE WHEN substr(b.s, {j + 1}, 1) <> substr(q.qs, {j + 1}, 1)"
        " THEN 1 ELSE 0 END)"
        for j in range(n_planes)
    )
    cos = (
        "round(list_dot_product(b.ev, q.qv) / "
        "(sqrt(list_dot_product(b.ev, b.ev)) * "
        "sqrt(list_dot_product(q.qv, q.qv))), 6)"
    )
    return f"""
WITH base AS (
  SELECT vec_id AS vid, embedding::DOUBLE[] AS ev FROM embeddings
), sg AS (
  SELECT vid, ev, {_sig_sql(planes, 'ev')} AS s FROM base
), q AS (
  SELECT vid AS qid, ev AS qv, s AS qs FROM sg WHERE vid % {query_mod} = 0
), exact AS (
  SELECT qid, vid FROM (
    SELECT q.qid, b.vid,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {cos} DESC, b.vid) AS rn
    FROM base b, q
  ) WHERE rn <= {k}
), ann AS (
  SELECT qid, vid FROM (
    SELECT q.qid, b.vid,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {cos} DESC, b.vid) AS rn
    FROM sg b JOIN q ON ({ham}) <= {probe_bits}
  ) WHERE rn <= {k}
), ne AS (SELECT qid, count(*) AS n_exact FROM exact GROUP BY qid)
, na AS (SELECT qid, count(*) AS n_ann FROM ann GROUP BY qid)
, nh AS (
  SELECT e.qid, count(*) AS n_hit
  FROM exact e JOIN ann a ON a.qid = e.qid AND a.vid = e.vid
  GROUP BY e.qid
)
SELECT ne.qid AS query_id, ne.n_exact,
       coalesce(na.n_ann, 0) AS n_ann,
       coalesce(nh.n_hit, 0) AS n_hit,
       round(coalesce(nh.n_hit, 0) / least({k}, ne.n_exact), 6) AS recall
FROM ne LEFT JOIN na USING (qid) LEFT JOIN nh USING (qid)
"""


SQL_ANN_RECALL = _ann_recall_sql()
SQL_ANN_RECALL_MP1 = _ann_recall_sql(probe_bits=1)
