"""cogie_spark — a from-scratch PySpark-native record-linkage / entity-
resolution analytics engine with the query semantics of jinzhuoran/CogIE.

The reference (/root/reference) is a single-process Python+PyTorch
information-extraction toolkit whose entity-linking stage
(cogie/toolkit/el/el_toolkit.py:84-152) is structurally a record-linkage
pipeline: blocking (ANN top-k) -> pairwise scoring (cross-encoder) ->
best-match selection -> transitive alignment to a canonical table.

This package re-realizes those semantics Spark-first:

- ``functions``  : engine-portable hashing (md5-based 64-bit), shingling,
                   MinHash, SimHash, vectorized pandas-UDF string scorers.
- ``operators``  : blocking (salted MinHash-LSH), pair scoring, iterative
                   large-star/small-star connected components, dedup family,
                   ANN similarity search, text analysis, span decode,
                   vocabulary build, evaluation metrics.
- ``plans``      : the flagship linkage pipeline (blocking -> scoring ->
                   clustering) with per-stage checkpoint manifests.
- ``fixtures``   : deterministic synthetic ``code_files`` generator
                   (BASELINE.json input_hint) + labeled ground-truth pairs.
- ``io``         : parquet + manifest snapshot protocol (Iceberg-style
                   commit semantics without an Iceberg runtime).
- ``streaming``  : incremental linkage via Structured Streaming foreachBatch.

Everything is public PySpark DataFrame API; no RDDs in the hot path, no
per-row Python UDFs (Arrow-batched pandas UDFs only).
"""

__version__ = "0.1.0"
