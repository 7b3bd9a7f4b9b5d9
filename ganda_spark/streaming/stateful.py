"""Custom stateful streaming operator (applyInPandasWithState): a per-host
release budget that persists ACROSS micro-batches.

The batch politeness pop (operators/politeness.pop_batch) caps each host
per generation; a continuous crawl also wants a durable cap — "never more
than N requests to host H over the stream's lifetime / until ops resets
state". That is per-key mutable state, exactly what
applyInPandasWithState provides: state lives in the state store (
checkpointed, partition-local, keyed by host), each micro-batch's rows for
a host arrive as Arrow batches, and the operator emits only the rows the
remaining budget admits — deterministically, best (priority, seq) first.

Scale posture: state is ONE counter per host; the shuffle is the same
host-keyed exchange the politeness partitioner needs anyway. No per-row
Python outside the Arrow batches (input_hint contract).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RELEASE_SCHEMA = (
    "seq long, url string, host string, priority int, released_rank long"
)
STATE_SCHEMA = "used long"


def stateful_host_budget(stream: DataFrame, budget: int) -> DataFrame:
    """stream(seq, url, host, priority, ...) → rows released under the
    durable per-host budget, with `released_rank` = the host's lifetime
    release ordinal (1-based). Rows beyond the budget are dropped (the
    caller's defer/requeue policy can read the gap from released_rank)."""

    def release(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (used,) = state.get if state.exists else (0,)
        # applyInPandasWithState delivers one GROUP as MULTIPLE Arrow chunks
        # (~10k rows each); sorting per-chunk would let a worse row from an
        # early chunk beat a better (priority, seq) row from a later chunk
        # (ADVICE r2). Materialize the whole group first — a group here is
        # one host's rows in ONE micro-batch, bounded by the upstream
        # trigger size, not the frontier — then sort ONCE and take the head.
        chunks = [pdf for pdf in pdfs]
        if used < budget and chunks:
            group = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            take = group.sort_values(["priority", "seq"]).head(budget - used)
            n = len(take)
            if n > 0:
                yield take.assign(
                    released_rank=range(used + 1, used + n + 1)
                )[["seq", "url", "host", "priority", "released_rank"]]
                used += n
        state.update((used,))

    return (
        stream.groupBy("host")
        .applyInPandasWithState(
            release,
            outputStructType=RELEASE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
