"""financial_anomaly_detection_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of ``richardmukechiwa/financial-anomaly-detection``
(reference surveyed in SURVEY.md) as an idiomatic Apache Spark
engine: DataFrame/SQL + Catalyst for the relational surface, MLlib
pipelines for feature preparation, custom Estimators for the anomaly
models (Isolation Forest / LOF / reconstruction-error scorer), and
Structured Streaming for the record-at-a-time serving path.

Layout:
    session     SparkSession factory tuned for the scale target
    schemas     canonical StructType schemas (transactions, events, ...)
    sources     readers (parquet/csv/json/jdbc) and sinks
    functions   column-expression builders (time, scoring, text, vector)
    operators   composite dataframe operators (profiles, dedup, similarity)
    ml          MLlib feature pipeline + anomaly estimators
    plans       end-to-end batch plans (the reference's endpoints as plans)
    streaming   Structured Streaming serving path
"""

__version__ = "0.1.0"
