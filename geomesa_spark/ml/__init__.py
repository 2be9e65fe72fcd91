"""Embedding similarity search: exact brute-force top-k (baseline) and
random-hyperplane LSH bucketing (the 100 TB scale path)."""

from geomesa_spark.ml.similarity import (  # noqa: F401
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_signatures,
    lsh_topk,
)
