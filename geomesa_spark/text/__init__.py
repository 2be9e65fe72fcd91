"""Text-analysis + deduplication operators for large-scale training-data
pipelines (task brief: first-class alongside the SURVEY.md §2 inventory).

Everything stays JVM-side (built-in ``pyspark.sql.functions``) where the
semantics allow; MinHash/SimHash signatures are the only pandas-UDF hop
(Arrow-batched numpy, no per-row Python)."""

from geomesa_spark.text.analysis import (  # noqa: F401
    fingerprint,
    lang_id,
    quality_features,
    with_tokens,
)
from geomesa_spark.text.dedup import (  # noqa: F401
    exact_dedup,
    minhash_pairs,
    ngram_jaccard_pairs,
    simhash,
)
