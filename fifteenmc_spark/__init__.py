"""fifteenmc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the M1A5TO/15MC-Algorithm reference.

The reference (read-only at /root/reference) is a single-process
pandas/GeoPandas/NumPy "15-minute city" geospatial pipeline.  This package
re-expresses every operator it implements (SURVEY.md §2) as idiomatic Spark
DataFrame / SQL plans, plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) that a 100 TB
deployment needs.

Layout
------
- ``session``    SparkSession factory tuned for AQE + Arrow.
- ``io``         table registry + schema-checked parquet readers/writers.
- ``functions``  column-expression libraries (geo math, text metrics) — no UDFs.
- ``operators``  relational/declared-query builders, dedup, similarity, kNN snap.
- ``plans``      multi-step jobs: tile grid, graph build, bounded multi-source
                 Dijkstra reachability, point/path queries.
- ``streaming``  Structured Streaming veneer (windows + watermark).
"""

__version__ = "0.1.0"
