from parquet_converters_spark.functions.text import (  # noqa: F401
    tokens,
    token_count,
    quality_score,
    language_scores,
    language_id,
    doc_fingerprint,
    shingles,
)
from parquet_converters_spark.functions.dedup import (  # noqa: F401
    content_hash,
    exact_dedup,
    minhash_signature,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    ngram_jaccard_pairs,
)
from parquet_converters_spark.functions.similarity import (  # noqa: F401
    cosine_similarity,
    cosine_topk,
    lsh_bucket_ann,
    embedding_neardup_pairs,
)
