"""ganda_spark — a from-scratch PySpark-native crawl frontier + fetch scheduler.

Reproduces the observable semantics of the reference CLI `tednaleid/ganda`
(read-only at /root/reference) — request parsing, fetch/retry/throttle
behavior, response transforms, output shapes, ordering, URL-seen membership —
re-expressed as idiomatic Spark DataFrame plans, and generalizes its
pipe-to-fetch model to a 10^10-URL frontier over tables of interleaved
text+media span documents (see /root/repo/BASELINE.json `north_rule`).

This is NOT a port: the reference is a single-process Go channel pipeline;
this engine is a columnar, Catalyst-optimized batch/micro-batch dataflow.
See /root/repo/SURVEY.md for the operator-by-operator mapping.
"""

__version__ = "0.1.0"

from ganda_spark.config import EngineConfig  # noqa: F401
