"""Scheduler-facing orchestration surface (SURVEY.md §2.11). The engine
itself is scheduler-agnostic; this package holds the Airflow DAG mirror of
the reference's master chain, importable only where Airflow is installed."""
