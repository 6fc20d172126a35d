"""Airflow orchestration mirror (SURVEY.md §2.11): the reference chains
three DAGs — scrape ≫ clean ≫ load — via TriggerDagRunOperator
(reference dags/master_dag.py:22-39). The Spark-era mapping keeps Airflow
as the scheduler and turns each stage into a spark-submit of the engine's
job mains; the engine package stays import-clean without Airflow
installed (everything is defined inside ``build_dag``).

Differences from the reference, by design:
- one linear DAG instead of three chained DAGs + TimeDeltaSensors — the
  data dependencies ARE the ordering, no wall-clock sleeps
  (reference dags/transform_dag.py:31-34);
- per-competitor load fan-out collapses into one Spark job (Spark
  parallelizes internally; reference dags/load_to_bigquery_dag.py:126-184);
- the scrape stage stays a plain Python task (browser I/O is not a Spark
  workload, SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import Any

PIPELINE_ARGS = [
    "--bronze", "{{ var.value.bronze_dir }}",
    "--silver", "{{ var.value.silver_dir }}",
    "--gold", "{{ var.value.gold_dir }}",
]


def build_dag(dag_id: str = "telecom_competitor_analysis_spark") -> Any:
    """Construct the DAG. Raises ImportError where Airflow is absent —
    callers in non-Airflow environments should not invoke this (the
    module import itself stays safe)."""
    from datetime import datetime, timedelta

    from airflow import DAG
    from airflow.operators.python import PythonOperator
    from airflow.providers.apache.spark.operators.spark_submit import (
        SparkSubmitOperator,
    )

    default_args = {
        # parity with the reference's retry posture
        # (reference dags/master_dag.py:8-9)
        "retries": 1,
        "retry_delay": timedelta(minutes=1),
    }

    with DAG(
        dag_id=dag_id,
        start_date=datetime(2023, 11, 1),
        schedule="@daily",  # date-grain scraped_at implies daily cadence
        catchup=False,
        default_args=default_args,
    ) as dag:

        def _scrape(**_: Any) -> None:
            # extraction stays outside the engine: Playwright/BS4
            # collectors write bronze {"products": [...]} docs
            # (reference dags/scrape_dag.py:29-46). Plug in here.
            raise NotImplementedError("wire the site collectors here")

        scrape = PythonOperator(task_id="scrape", python_callable=_scrape)

        clean_and_load = SparkSubmitOperator(
            task_id="clean_and_load",
            application="-m telecom_competitor_analysis_spark.jobs.run_pipeline",
            application_args=PIPELINE_ARGS,
            conf={
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.session.timeZone": "UTC",
            },
        )

        scrape >> clean_and_load
    return dag


try:  # expose the DAG only inside a real Airflow deployment
    import airflow  # noqa: F401

    dag = build_dag()
except ImportError:  # engine environments without Airflow stay importable
    dag = None
