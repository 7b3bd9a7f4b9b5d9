"""The end-to-end crawl plan — ganda's fixed dataflow, declared as one
Catalyst logical plan per generation (SURVEY.md §3.1 step 5):

    frontier_scan → canonicalize → anti-join(seen) → robots gate →
    politeness pop (priority window) → partition_for_fetch →
    mock_fetch → transforms/envelope → {results, errors, deferred, metrics}

The reference runs this as goroutines and channels (cli/cli.go:240-266);
here every arrow is a DataFrame edge, so Catalyst gets to push filters into
the scan, broadcast the robots join, and AQE-coalesce the shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ganda_spark.config import EngineConfig
from ganda_spark.functions.transforms import json_envelope, plain_output
from ganda_spark.operators.fetch import mock_fetch_udf, split_results
from ganda_spark.operators.politeness import partition_for_fetch, pop_batch, robots_gate
from ganda_spark.operators.seen import filter_unseen_exact


@dataclass
class GenerationResult:
    released: DataFrame   # what was popped for fetching
    results: DataFrame    # fetched rows (status/body/attempts/latency)
    errors: DataFrame     # retry-exhausted rows (ganda only logs these)
    deferred: DataFrame   # politeness/budget overflow → next generation
    blocked: DataFrame    # robots-disallowed rows
    fetched: DataFrame    # the UNSPLIT fetch output — persist() THIS before
    #                       materializing results and errors separately, or
    #                       each action re-executes the fetch stage


def crawl_generation(
    frontier: DataFrame,
    cfg: EngineConfig,
    seen: DataFrame | None = None,
    robots: DataFrame | None = None,
    global_budget: int | None = None,
) -> GenerationResult:
    """One crawl generation as a single declarative plan."""
    work = frontier
    if seen is not None:
        work = filter_unseen_exact(work, seen)
    if robots is not None:
        work, blocked = robots_gate(work, robots)
    else:
        blocked = work.limit(0)
    released, deferred = pop_batch(work, cfg, global_budget=global_budget)
    placed = partition_for_fetch(released, cfg)
    fetched = mock_fetch_udf(placed, cfg)
    results, errors = split_results(fetched)
    return GenerationResult(
        released=released,
        results=results,
        errors=errors,
        deferred=deferred,
        blocked=blocked,
        fetched=fetched,
    )


def envelope_output(results: DataFrame, cfg: EngineConfig) -> DataFrame:
    """K1: the stdout stream as a DataFrame(seq, line) — W=1 byte-parity is
    orderBy(seq); at scale the order contract is per-seq, so a partitioned
    ordered write preserves it (SURVEY.md §2.5 K1)."""
    ctx = (
        F.when(F.col("context").isNotNull(), F.to_json(F.col("context")))
        if "context" in results.columns
        else F.lit(None).cast("string")
    )
    if cfg.json_envelope:
        line = json_envelope(
            F.col("url"),
            F.col("status"),
            F.col("body"),
            cfg.response_body,
            context_json=ctx,
        )
    else:
        line = plain_output(F.col("body"), cfg.response_body)
    return results.select(F.col("seq"), line.alias("line")).where(
        F.col("line").isNotNull() if not cfg.json_envelope else F.lit(True)
    )
