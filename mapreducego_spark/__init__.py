"""mapreducego_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference MapReduce framework
(Noahnut/MapReduceGo, surveyed in SURVEY.md), extended with the
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) and designed for 100 TB scale.

Layout:
    session     - SparkSession builder (AQE on, tuned shuffle)
    sources     - table catalog / parquet-text-json readers
    operators   - relational core (joins, aggs, windows, set ops,
                  sort/top-k, as-of, time windows) + the faithful
                  Map/Reduce plugin tier
    functions   - text analysis, dedup (exact/MinHash/SimHash/
                  Jaccard), vector similarity, multimodal plumbing
    streaming   - Structured Streaming pipelines
    queries     - the registry consumed by __spark_entry__.py
"""

__version__ = "0.1.0"
