"""Gap-based sessionization of an event log — a training-data pipeline
staple (interaction logs → per-session examples).

Scale posture: one shuffle, keyed on the user column; both windows are
partitioned by that key and order only one user's rows, so parallelism is
the user cardinality (effectively unbounded) and no unpartitioned pass
over the data exists. Skewed power-users are a bounded window state (their
row count), and AQE skew-split covers the exchange itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    out_col: str = "session_id",
) -> DataFrame:
    """Assign a per-user session ordinal (1-based): a new session starts
    when the second-truncated gap to the previous event exceeds ``gap_s``.
    Ordering is (ts, tiebreak) — a total order per user, so the result is
    deterministic under any parallelism. Gaps compare on truncated unix
    seconds (microsecond payloads in ts don't flip a boundary between
    engines that truncate vs round)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    prev_ts = F.lag(ts_col).over(w)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts)
    new_sess = F.when(prev_ts.isNull() | (gap > gap_s), 1).otherwise(0)
    return events.withColumn("_nf", new_sess).withColumn(
        out_col,
        F.sum("_nf").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_nf")
