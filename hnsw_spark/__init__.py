"""hnsw_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ``deepfates/hnsw`` vector-search
library, re-expressed Spark-first.

The reference (see SURVEY.md) is an in-memory HNSW approximate-nearest-neighbor
engine.  This package provides the same capability surface as distributed
DataFrame programs:

- ``functions.similarity``  — dot / cosine / euclidean kernels as Catalyst
  column builders (reference: src/similarity.ts).
- ``operators.knn``         — exact brute-force top-k (the reference's oracle,
  src/bench/metrics.ts:9-24) and batch kNN query semantics (src/main.ts:253-283).
- ``operators.ann``         — the approximate tier: IVF-partitioned index build
  + nProbe-routed search (the Spark-native analogue of the HNSW layer
  hierarchy, src/main.ts:202-229).
- ``operators.hnsw_graph``  — the reference's namesake algorithm itself:
  per-list HNSW graphs built inside applyInPandas (level sampling, diversity
  heuristic, reciprocal pruning), greedy-descent + ef-bounded beam search
  (src/main.ts:71-129, 202-317).
- ``operators.validate``    — ingest guards: dimension consistency and
  duplicate-id rejection (src/main.ts:234-248).
- ``plans.sweep`` / ``plans.layout`` — benchmark grid sweeps with JSON/CSV
  sinks (src/bench/run.ts), bucketed co-located joins, skew salting.
- ``operators.evaluation``  — recall@k, micro-averaged mean recall, floor-index
  percentiles, latency summaries, A/B diff reports (src/bench/metrics.ts,
  src/bench/report.ts).
- ``operators.dedup`` / ``functions.text`` — large-scale training-data pipeline
  operators (exact/MinHash/SimHash/n-gram dedup, language id, quality scores).
- ``operators.curation``    — keep/drop curation pipeline, deterministic
  stratified sampling, vocab/TF-IDF statistics, feature-hashing embeddings.
- ``operators.temporal``    — as-of (backward) join via union+window.
- ``functions.quantize``    — int8 symmetric embedding quantization.
- ``sources``               — fvecs/ivecs decoders, seeded synthetic vectors,
  fixture table loaders (src/bench/dataset.ts).
- ``plans.persistence``     — index save/load with overwrite + load-if-exists
  semantics (src/db.ts).
- ``streaming``             — incremental ingest / windowed aggregation
  (the streaming scan S4 and addPoint B2 paths).
"""

__version__ = "0.1.0"

from hnsw_spark.functions.similarity import (  # noqa: E402
    cosine_similarity,
    dot_product,
    euclidean_distance,
    euclidean_similarity,
    get_metric,
    l2_norm,
)
from hnsw_spark.operators.ann import IVFIndex, build_ivf_index  # noqa: E402
from hnsw_spark.operators.hnsw_graph import (  # noqa: E402
    HNSWIndex,
    build_hnsw_index,
)
from hnsw_spark.operators.curation import (  # noqa: E402
    curation_flags,
    feature_hash_embeddings,
    stratified_sample,
    tfidf_top_terms,
    vocab_stats,
)
from hnsw_spark.operators.dedup import (  # noqa: E402
    embedding_neardup,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
)
from hnsw_spark.operators.knn import knn_exact  # noqa: E402
from hnsw_spark.operators.temporal import asof_join  # noqa: E402
from hnsw_spark.operators.validate import validate_vectors  # noqa: E402
from hnsw_spark.functions.quantize import (  # noqa: E402
    dequantize,
    quant_scale,
    quantize,
)
from hnsw_spark.plans.persistence import (  # noqa: E402
    delete_index,
    load_index,
    save_index,
)

__all__ = [
    "dot_product",
    "cosine_similarity",
    "euclidean_distance",
    "euclidean_similarity",
    "l2_norm",
    "get_metric",
    "knn_exact",
    "build_ivf_index",
    "IVFIndex",
    "build_hnsw_index",
    "HNSWIndex",
    "validate_vectors",
    "save_index",
    "load_index",
    "delete_index",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash",
    "simhash_neardup_pairs",
    "embedding_neardup",
    "curation_flags",
    "stratified_sample",
    "vocab_stats",
    "tfidf_top_terms",
    "feature_hash_embeddings",
    "asof_join",
    "quant_scale",
    "quantize",
    "dequantize",
]
