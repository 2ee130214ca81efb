"""LLM training-data pipeline operators (beyond-reference, SURVEY §7.2 phase 7).

Designed for 100 TB corpora: every operator is a DataFrame composition with
bounded shuffles; candidate generation (LSH/buckets) is always separated from
exact verification so the O(n²) step only ever runs within small buckets.
"""

from .text import (
    clean_text,
    clean_text_frame,
    token_count,
    quality_score,
    language_id,
    content_fingerprint,
    shingle_fingerprints,
    text_metrics_frame,
    shingle_fingerprint_frame,
    url_normalize,
    url_host,
    url_registrable_domain,
    url_metrics_frame,
)
from .dedup import (
    dedup_exact,
    dedup_lines,
    duplicated_spans,
    remove_duplicated_spans,
    dedup_clusters,
    dedup_fuzzy,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
    minhash_lsh_pairs,
    simhash_signatures,
    embedding_near_dup_pairs,
)
from .similarity import cosine_topk, lsh_bucket_topk, ivf_topk, kmeans_centroids, kmeans_centroids_cached, clear_centroid_memo, semdedup, normalize_embeddings, truncate_embeddings
from .quality import (
    linear_quality_score_frame,
    blocklist_metrics_frame,
    gopher_quality_frame,
    unigram_logprob_frame,
    bigram_logprob_frame,
    repetition_metrics_frame,
    pii_metrics_frame,
)
from .retrieval import term_document_frequency, tfidf_top_terms, bm25_topk
from .splits import hash_bucket, split_by_hash, kfold_by_hash
from .chunking import chunk_documents, mask_tokens_frame, pack_sequences
from .decontam import contamination_frame, oov_rate_frame
from .sampling import (
    cap_per_key,
    cap_tokens_per_key,
    mixture_plan,
    mixture_sample,
    sample_stratified_hash,
    shuffle_by_hash,
    temperature_weights,
)

__all__ = [
    "chunk_documents",
    "pack_sequences",
    "mask_tokens_frame",
    "contamination_frame",
    "oov_rate_frame",
    "cap_per_key",
    "cap_tokens_per_key",
    "sample_stratified_hash",
    "mixture_sample",
    "mixture_plan",
    "temperature_weights",
    "shuffle_by_hash",
    "hash_bucket",
    "split_by_hash",
    "kfold_by_hash",
    "gopher_quality_frame",
    "linear_quality_score_frame",
    "unigram_logprob_frame",
    "bigram_logprob_frame",
    "repetition_metrics_frame",
    "pii_metrics_frame",
    "tfidf_top_terms",
    "term_document_frequency",
    "bm25_topk",
    "token_count",
    "quality_score",
    "language_id",
    "content_fingerprint",
    "shingle_fingerprints",
    "text_metrics_frame",
    "clean_text",
    "clean_text_frame",
    "shingle_fingerprint_frame",
    "url_normalize",
    "url_host",
    "url_registrable_domain",
    "url_metrics_frame",
    "dedup_exact",
    "blocklist_metrics_frame",
    "dedup_lines",
    "duplicated_spans",
    "remove_duplicated_spans",
    "dedup_clusters",
    "dedup_fuzzy",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_prefix",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "embedding_near_dup_pairs",
    "cosine_topk",
    "semdedup",
    "normalize_embeddings",
    "truncate_embeddings",
    "lsh_bucket_topk",
    "ivf_topk",
    "kmeans_centroids",
    "kmeans_centroids_cached",
    "clear_centroid_memo",
]
