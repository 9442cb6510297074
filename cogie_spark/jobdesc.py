"""Job-description scope — labels every driver-side action so event
logs / the Spark UI attribute wall time to pipeline stages by name."""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def job_desc(df_or_spark, desc: str):
    sc = getattr(df_or_spark, "sparkSession", df_or_spark).sparkContext
    old = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try:
        yield
    finally:
        sc.setJobDescription(old)
