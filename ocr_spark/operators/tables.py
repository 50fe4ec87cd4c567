"""Shared table loader for the operator library."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan.  Declarative — Catalyst pushes filters/projections into
    the scan (verify with ``.explain``: PushedFilters / ReadSchema)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
