# Example Airflow DAG driving the graft engine — the drop-in analog of
# the reference's dags/etl/main.py (daily at 22:00, no catchup).
#
# The reference runs pandas transforms inside Celery workers; here each
# task is a spark-submit of an engine entry point, so Airflow does
# orchestration only and no data moves through the scheduler (the same
# property the reference achieves by staging everything in Postgres).
#
# The engine handles intra-run ordering itself (stage >> NDS with strict
# state -> county -> measurement order inside graft.aqi.Pipeline.run),
# so one task per run is sufficient; retries are safe because the
# CET/LSET protocol is at-least-once and every merge is idempotent.

from datetime import datetime

from airflow import DAG
from airflow.providers.apache.spark.operators.spark_submit import (
    SparkSubmitOperator,
)

ENGINE_JAR = "/opt/graft/graft-assembly.jar"
SOURCE_DIR = "/data/aqi/sources"      # 10_state_aqi_*.csv + uscounties.csv
WAREHOUSE = "/data/aqi/warehouse"     # parquet tables replace Postgres

with DAG(
    dag_id="graft_aqi_pipeline",
    schedule_interval="0 22 * * *",   # main.py:11
    start_date=datetime(2024, 1, 1),
    catchup=False,                    # main.py:12
) as dag:
    run_pipeline = SparkSubmitOperator(
        task_id="run_pipeline",
        application=ENGINE_JAR,
        java_class="graft.aqi.RunPipeline",
        application_args=[SOURCE_DIR, WAREHOUSE],
        conf={
            "spark.sql.session.timeZone": "UTC",
            "spark.sql.adaptive.enabled": "true",
            # register vec_dot / rolling_hash for SQL-side consumers
            "spark.sql.extensions": "graft.plans.GraftExtensions",
        },
    )
