"""Training-data pipeline operators over document/embedding tables.

Beyond the reference's graph operators, these are the operations a
large-scale training-data pipeline needs (dedup, similarity search,
text analysis, multimodal plumbing) — all expressed as Spark built-ins
(JVM-side, whole-stage-codegen) except where Arrow-batched pandas UDFs
are genuinely required.
"""

from graft.pipeline.textstats import (  # noqa: F401
    token_counts,
    quality_scores,
    lang_id,
    fingerprints,
    pii_scan,
    repetition_stats,
)
from graft.pipeline.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
    decontaminate,
)
from graft.pipeline.similarity import (  # noqa: F401
    cosine_topk,
    lsh_bucket_topk,
    embedding_near_dups,
)
from graft.pipeline.embeddings import (  # noqa: F401
    embedding_moments,
    kmeans,
    pca_components,
    project_embeddings,
    whiten_embeddings,
)
from graft.pipeline.packing import (  # noqa: F401
    chunk_documents,
    pack_sequences,
    packed_sequence_stats,
)
from graft.pipeline.splits import (  # noqa: F401
    assign_splits,
    deterministic_sample,
    mix_sources,
    source_mix_plan,
)
