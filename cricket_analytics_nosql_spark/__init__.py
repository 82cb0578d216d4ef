"""PySpark-native analytics engine with the capabilities of
rohilutture/cricket-analytics-nosql (see SURVEY.md).

The reference is a MongoDB + Neo4j client pipeline; this package
re-expresses its whole capability surface — ETL flatten/normalize,
aggregation-pipeline queries, graph analytics incl. PageRank — as
idiomatic Spark DataFrame/SQL plans, plus the LLM-data-pipeline
extension operators (dedup, similarity search, multimodal columns,
text analysis) mandated by BASELINE.json.

Layout:
    session     SparkSession builder (AQE on, UTC, tuned shuffle)
    sources/    schema-checked parquet loaders + Cricsheet JSON source
    operators/  relational operator library + cricket ETL kernels
    functions/  scalar/vector/text column helpers
    graph/      vertex/edge builders, Cypher-query shapes, PageRank
    streaming/  Structured Streaming jobs (windows, watermark, dedup)
    llm/        dedup, similarity search, text analysis, multimodal
    catalog.py  name -> (spark fn, oracle SQL) registry for the driver
"""

__version__ = "0.1.0"
