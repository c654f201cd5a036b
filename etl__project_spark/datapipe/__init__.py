from etl__project_spark.datapipe.text import (  # noqa: F401
    bpe_pair_counts,
    common_ngram_filter,
    doc_fingerprint,
    lang_id_heuristic,
    pii_scrub,
    quality_rules,
    text_stats,
)
from etl__project_spark.datapipe.dedup import (  # noqa: F401
    char_shingles,
    contamination_check,
    dedup_exact,
    jaccard_prefix_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
)
from etl__project_spark.datapipe.sampling import (  # noqa: F401
    hash_bucket,
    hash_sample,
    stratified_hash_sample,
)
from etl__project_spark.datapipe.similarity import (  # noqa: F401
    batch_topk,
    brute_force_topk,
    bucketed_topk,
    cosine_components,
    semantic_dedup,
    sign_bucket,
)
from etl__project_spark.datapipe.linalg import (  # noqa: F401
    covariance_matrix,
    pca_top_component,
    pca_top_k,
    project_embeddings,
)
from etl__project_spark.datapipe.sketches import (  # noqa: F401
    hll_estimate,
    hll_merge,
    hll_registers,
)
