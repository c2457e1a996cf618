"""streamforge_data_pipeline_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline (selahjs/streamforge-data-pipeline): CSV intake with
ordered per-row validation and error routing, duplicate elimination
against an existing key set (broadcast anti-join), first-wins in-file
dedup (window), chunked/atomic sinks, job-status state, the JPA-derived
relational query surface — plus the LLM-training-data extensions
(exact/MinHash-LSH/SimHash dedup, cosine similarity search, text
analysis, multimodal column plumbing) designed for 100 TB scale.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection (broadcast vs shuffle), and AQE handles skew;
no Python row-UDFs on any hot path.
"""

__version__ = "0.1.0"

from streamforge_data_pipeline_spark.session import get_session  # noqa: F401
