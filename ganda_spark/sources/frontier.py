"""Seed frontier — the engine's S1 at scale.

The reference's "frontier" is whatever the Unix pipe feeds it
(parser/parser.go:30-49). Ours is a DataFrame with the FIXTURES.md §1
shape: (seq, url, host, priority, context). For tests/bench we derive it
deterministically from the driver's `orders` parquet (TESTDATA.md) via the
shared spec (ganda_spark/spec.py) so the DuckDB oracle reproduces it
bit-for-bit; in production it is an Iceberg table scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ganda_spark import spec


def seed_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic skewed frontier from `{sf_dir}/orders.parquet`.

    Columns: seq (bigint), url, host (string), priority (int),
    context (array<string>). Host 0 is hot (~24% of rows) to exercise
    skew handling.
    """
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders")
    return spark.sql(spec.frontier_sql("spark"))
