"""formula1_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the computation of the reference ELT pipeline
(sadaffatimaee/formula1-data-pipeline: Airflow ingest -> Snowflake/dbt
models) as idiomatic PySpark: DataFrame/SQL logical plans optimized by
Catalyst, Parquet columnar storage, and a model registry that plays the
role of the dbt DAG.

Layout
------
- ``session``    : tuned SparkSession factory.
- ``functions``  : scalar cleaning/parsing expressions (reference F1-F17).
- ``operators``  : relational building blocks (as-of join, priority dedup,
                   top-k, count-distinct-over-window rewrite) plus the
                   mandated large-scale extension operators (dedup,
                   similarity search, text analysis, multimodal columns).
- ``plans``      : the model registry + the 15 reference-equivalent models.
- ``sources``    : raw landing (all-string), REST-shaped ingest, catalog IO.
- ``streaming``  : Structured Streaming leg (micro-batch upsert parity).
"""

__version__ = "0.1.0"

from formula1_data_pipeline_spark.session import get_spark  # noqa: F401
