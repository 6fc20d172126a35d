"""Runnable pipeline stages mirroring the reference's DAG chain
(scrape ≫ clean ≫ load, reference dags/master_dag.py:22-39). Extraction
(browser I/O) stays outside the engine; rows enter via
``spark.createDataFrame(rows, schemas.RAW_PRODUCT)`` and everything
downstream is DataFrame plans."""
