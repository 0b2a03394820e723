"""biodwh2_arcadedb_server_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference system ``BioDWH2/BioDWH2-ArcadeDB-Server``
(a graph-ETL + embedded graph-database server; see SURVEY.md). The
reference loads a labeled property graph into a row-oriented store and
serves SQL/GraphQL over it; this engine expresses the same data model
and query surface as Spark DataFrames / Spark SQL, letting Catalyst and
Tungsten own physical execution, plus batch graph analytics and
LLM-training-data pipeline operators designed for 100 TB scale.

Layout:
- ``session``    — tuned SparkSession factory
- ``sources``    — table registry / workspace readers and writers
- ``workspace``  — LPG build pipeline (reference ArcadeDBService semantics)
- ``operators``  — graph traversal/analytics, dedup, similarity, text
- ``functions``  — scalar/array helper functions (JVM-side first)
- ``plans``      — plan inspection and audit helpers
- ``streaming``  — Structured Streaming operators over event streams
"""

__version__ = "0.1.0"

from biodwh2_arcadedb_server_spark.session import get_spark  # noqa: F401
