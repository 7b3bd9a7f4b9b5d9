"""Scale-safe exact statistics over bounded-domain measures.

Spark's exact ``percentile`` aggregate buffers every value of a group in
executor memory — at 10^10 rows per group that is the operator OOMing, and
the usual escape (``approx_percentile``) trades away exactness. For
measures whose DOMAIN is bounded (latency in ms, HTTP status, retry
counts, token counts, quality basis-points — most operational metrics),
there is a third way that is both exact and scale-proof:

  1. histogram: groupBy(group_cols, value) → count. The ONLY shuffle over
     data, and partial aggregation compresses it map-side to at most
     |domain| rows per group regardless of row count.
  2. cumulative counts over the histogram (a Window partitioned by the
     group — it orders |domain| rows per group, never the data).
  3. nearest-rank pick: the smallest value whose cumulative count reaches
     ceil(p·n), computed in INTEGER arithmetic (percentile as basis
     points) so an external oracle reproduces it bit-for-bit — no float
     interpolation to disagree about in the last ulp.

At 100 TB: shuffle carries ≤ groups × |domain| rows (e.g. 3 status
classes × 200 latencies = 600 rows), executor state is O(|domain|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    percentiles_bp: dict[str, int],
) -> DataFrame:
    """Exact nearest-rank percentiles of ``value_col`` per group.

    percentiles_bp maps an output label to the percentile in basis points,
    e.g. {"p50": 5000, "p95": 9500, "p99": 9900}. Returns one row per
    (group, label): group_cols..., pct (label), n (group row count),
    value (the nearest-rank percentile, same type as value_col).

    Nearest-rank: value at 1-based position ceil(p·n) in the sorted group
    — ceil taken in integers: (n·bp + 9999) div 10000.
    """
    hist = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_run = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = hist.withColumn("_cum", F.sum("_cnt").over(w_run)).withColumn(
        "_n", F.sum("_cnt").over(w_all)
    )
    labels = F.explode(
        F.array(*[F.lit(label) for label in percentiles_bp])
    ).alias("pct")
    bp = F.element_at(
        F.create_map(
            *[x for label, b in percentiles_bp.items() for x in (F.lit(label), F.lit(b))]
        ),
        F.col("pct"),
    )
    exploded = (
        cum.select(*group_cols, value_col, "_cnt", "_cum", "_n", labels)
        .withColumn("_bp", bp)
        # integer ceil(n·p): (n·bp + 9999) DIV 10000 — no float interpolation
        .withColumn("_target", F.expr("CAST((_n * _bp + 9999) DIV 10000 AS BIGINT)"))
    )
    picked = exploded.where(
        (F.col("_cum") >= F.col("_target"))
        & (F.col("_cum") - F.col("_cnt") < F.col("_target"))
    )
    return picked.select(
        *group_cols,
        "pct",
        F.col("_n").alias("n"),
        F.col(value_col).alias("value"),
    )
