"""Adaptive recrawl scheduling — the revisit policy layered on top of the
frontier (Cho & Garcia-Molina, "Effective page refresh policies for web
crawlers", TODS 2003; the reference fetches a URL list once and exits —
reference README.md:28-30 — a continuous crawl must decide WHEN to come
back).

Exponential-backoff freshness model in exact integer arithmetic: a page
unchanged for `unchanged_streak` consecutive revisits gets interval
base·2^streak generations (clamped to [base, max_interval]); a page that
changed resets its streak upstream and is revisited at the base rate.
All pure Column expressions (shiftleft — exact in both engines, no
float pow), shuffle-free over the history table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recrawl_schedule(
    df: DataFrame,
    current_gen: int,
    streak_col: str = "unchanged_streak",
    last_gen_col: str = "last_fetch_gen",
    base_interval: int = 1,
    max_interval: int = 64,
) -> DataFrame:
    """Annotate a fetch-history table with the revisit decision:

      revisit_interval  base·2^min(streak, 30) clamped to max_interval
      next_due          last_fetch_gen + revisit_interval
      due_now           next_due ≤ current_gen
      overdue           max(0, current_gen − next_due) — a priority boost
                        for pages the schedule has starved

    The streak cap (30) keeps the shift in BIGINT range; max_interval is
    the policy ceiling (never forget a page entirely).
    """
    if base_interval < 1 or max_interval < base_interval:
        raise ValueError(
            f"need 1 <= base_interval <= max_interval, got "
            f"{base_interval}/{max_interval}"
        )
    # SQL shiftleft: the Python F.shiftleft only takes a LITERAL bit
    # count, the SQL function accepts a per-row column
    interval = F.least(
        F.expr(
            f"shiftleft(CAST({base_interval} AS BIGINT), "
            f"CAST(least({streak_col}, 30) AS INT))"
        ),
        F.lit(max_interval).cast("long"),
    )
    out = df.withColumn("revisit_interval", interval.cast("long")).withColumn(
        "next_due", (F.col(last_gen_col) + F.col("revisit_interval")).cast("long")
    )
    return out.withColumn(
        "due_now", F.col("next_due") <= F.lit(current_gen)
    ).withColumn(
        "overdue",
        F.greatest(
            F.lit(0).cast("long"), (F.lit(current_gen) - F.col("next_due")).cast("long")
        ),
    )
