"""spark-vams — a PySpark-native analytics engine with the query and
data-processing capabilities of awslabs/visual-asset-management-system.

Not a port: the reference is an AWS Lambda + DynamoDB + OpenSearch
application; this package re-expresses what it computes as idiomatic
Spark DataFrame / SQL / Structured Streaming plans over partitioned
Parquet, extended with large-scale LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Layout
------
- ``session``    : tuned SparkSession factory (AQE, broadcast, Arrow)
- ``sources``    : table loaders (driver test data; VAMS-shaped derived views)
- ``models``     : request models (search requests, pagination)
- ``plans``      : request -> DataFrame compilers (the "query planner")
- ``operators``  : relational + domain operators (EAV, graph, versions,
                   dedup, similarity, text, multimodal)
- ``functions``  : scalar Column helpers (normalization, coercion, scoring)
- ``streaming``  : CDC / search-table maintenance jobs
"""

__version__ = "0.1.0"
