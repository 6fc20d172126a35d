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

# The task graph as a pure-Python SPEC: testable in any environment
# (tests/test_orchestration.py asserts the graph shape, retry posture and
# spark-submit wiring without importing Airflow), consumed verbatim by
# ``build_dag`` where Airflow is installed — so what the test pins IS what
# the scheduler runs. Shape mirrors the reference's scrape ≫ clean ≫ load
# chain (reference dags/master_dag.py:22-39) collapsed to scrape ≫
# clean_and_load (the two Spark stages are one job, SURVEY.md §2.11).
TASK_SPEC: dict[str, Any] = {
    "dag_id": "telecom_competitor_analysis_spark",
    "schedule": "@daily",  # date-grain scraped_at implies daily cadence
    "catchup": False,
    "default_args": {
        # parity with the reference's retry posture
        # (reference dags/master_dag.py:8-9)
        "retries": 1,
        "retry_delay_minutes": 1,
    },
    "tasks": {
        "scrape": {"operator": "python", "callable": "scrape_collectors"},
        "clean_and_load": {
            "operator": "spark_submit",
            "application": (
                "-m telecom_competitor_analysis_spark.jobs.run_pipeline"
            ),
            "application_args": PIPELINE_ARGS,
            "conf": {
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.session.timeZone": "UTC",
            },
        },
        # the LLM-corpus path: batch curation funnel over the documents
        # corpus (jobs/curate.py — URL dedup → line filter → Gopher →
        # classifier → near-dup → decontaminate → shard, emitting the
        # dataset-card lineage table). Independent of the telco star
        # pipeline — a parallel root in the same daily DAG.
        "curate_corpus": {
            "operator": "spark_submit",
            "application": (
                "-m telecom_competitor_analysis_spark.jobs.curate"
            ),
            "application_args": [
                "--input", "{{ var.value.corpus_dir }}",
                "--out", "{{ var.value.curated_dir }}",
            ],
            "conf": {
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.session.timeZone": "UTC",
            },
        },
    },
    # edges as (upstream, downstream) pairs
    "dependencies": [("scrape", "clean_and_load")],
}


def _scrape_collectors(**_: Any) -> None:
    # extraction stays outside the engine: Playwright/BS4 collectors
    # write bronze {"products": [...]} docs
    # (reference dags/scrape_dag.py:29-46). Plug in here.
    raise NotImplementedError("wire the site collectors here")


# python-operator callables resolved BY NAME from the spec — a python
# task whose `callable` is missing or unknown fails at DAG-build time,
# never silently wires to the wrong function
PYTHON_CALLABLES: dict[str, Any] = {
    "scrape_collectors": _scrape_collectors,
}


def build_dag(dag_id: str | None = None) -> Any:
    """Construct the DAG from ``TASK_SPEC``. Raises ImportError where
    Airflow is absent — callers in non-Airflow environments should not
    invoke this (the module import itself stays safe)."""
    from datetime import datetime, timedelta

    from airflow import DAG
    from airflow.operators.python import PythonOperator
    from airflow.providers.apache.spark.operators.spark_submit import (
        SparkSubmitOperator,
    )

    spec = TASK_SPEC
    default_args = {
        "retries": spec["default_args"]["retries"],
        "retry_delay": timedelta(
            minutes=spec["default_args"]["retry_delay_minutes"]
        ),
    }

    with DAG(
        dag_id=dag_id or spec["dag_id"],
        start_date=datetime(2023, 11, 1),
        schedule=spec["schedule"],
        catchup=spec["catchup"],
        default_args=default_args,
    ) as dag:
        built: dict[str, Any] = {}
        for task_id, t in spec["tasks"].items():
            if t["operator"] == "python":
                built[task_id] = PythonOperator(
                    task_id=task_id,
                    python_callable=PYTHON_CALLABLES[t["callable"]],
                )
            elif t["operator"] == "spark_submit":
                built[task_id] = SparkSubmitOperator(
                    task_id=task_id,
                    application=t["application"],
                    application_args=t["application_args"],
                    conf=t["conf"],
                )
            else:  # fail at BUILD time, same guarantee as the callables
                raise ValueError(
                    f"unknown operator {t['operator']!r} for task"
                    f" {task_id!r}"
                )
        for up, down in spec["dependencies"]:
            built[up] >> built[down]
    return dag


try:  # expose the DAG only inside a real Airflow deployment
    import airflow  # noqa: F401

    dag = build_dag()
except ImportError:  # engine environments without Airflow stay importable
    dag = None
