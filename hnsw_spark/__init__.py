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
- ``operators.evaluation``  — recall@k, micro-averaged mean recall, floor-index
  percentiles, latency summaries, A/B diff reports (src/bench/metrics.ts,
  src/bench/report.ts).
- ``operators.dedup`` / ``operators.text`` — large-scale training-data pipeline
  operators (exact/MinHash/SimHash/n-gram dedup, language id, quality scores).
- ``sources``               — fvecs/ivecs decoders, seeded synthetic vectors,
  fixture table loaders (src/bench/dataset.ts).
- ``plans.persistence``     — index save/load with overwrite + load-if-exists
  semantics (src/db.ts).
- ``streaming``             — incremental ingest / windowed aggregation
  (the streaming scan S4 and addPoint B2 paths).
"""

__version__ = "0.1.0"
