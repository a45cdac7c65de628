"""ensembl_lakehouse_spark — a PySpark-native analytics engine.

A ground-up reimplementation of the query and data-processing
capabilities of rohitxsh/ensembl_lakehouse (an Athena/Glue/S3/Redis/
Celery query-dispatch service; see /root/reference) as an embedded,
Spark-first engine:

- Catalyst/Tungsten replace AWS Athena as the execution engine
  (reference: app/main.py:478-485 delegates all execution to Athena).
- The Spark catalog replaces the Glue Data Catalog
  (reference: app/constants.py:12-13).
- Parquet views partitioned on the mandatory key column replace the
  S3 parquet lake (reference: app/main.py:479 forces
  ``WHERE species='...'`` on every query).
- A thread-pool job registry with the same five-state lifecycle
  replaces the Athena async API (reference: app/main.py:263-277).
- Native DataFrame writers replace the Celery/pandas export worker
  (reference: app/tasks.py:13-32).
- A canonicalized semantic query cache replaces the Redis cache
  (reference: app/main.py:78-86).

Beyond reference parity, the ``operators`` package adds the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) that the project's north
star mandates, each designed for 100 TB scale: declarative DataFrame
plans, broadcast-able dimensions, map-side combining, and no
driver-side materialization on the query path.
"""

from ensembl_lakehouse_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
