"""PySpark-native analytics engine with the query / data-processing
capabilities of the reference CDC pipeline (tidb-cdc: TiDB -> TiCDC
canal-json -> Kafka -> consumer -> Elasticsearch + Prometheus/Grafana
analytics), rebuilt Spark-first.

Layout
------
- ``sources``   : table loaders + deterministic canal-json envelope generator
- ``operators`` : parse/validate/explode/normalize chain, relational ops,
                  aggregations, window/metrics algebra, CDC replay
- ``functions`` : text analysis, dedup, similarity-search, multimodal stubs
- ``streaming`` : Structured Streaming ingest + stateful alert operators
- ``plans``     : scale/tuning helpers (AQE, partitioning, broadcast)

All semantics derive from public knowledge of the reference repo's
behavior (cited per-function as ``file:line`` inside docstrings) and the
public Apache Spark API. No code is copied from the reference.
"""

__version__ = "0.1.0"
