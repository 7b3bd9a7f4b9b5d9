"""K5 production backend — Iceberg commit-protocol contract tests.

The sandbox has no network, so iceberg-spark-runtime is unfetchable
(`curl repo1.maven.org` → DNS failure) and the MERGE/DELETE statements can
never execute against a real Iceberg catalog here. Per VERDICT r2 next #4,
this suite pins the protocol at the statement level instead:

  1. every generated statement PARSES with Spark's own SQL parser and
     yields the expected logical plan node,
  2. the per-generation statement sequence has the crash-safety shape
     (marker last; clears precede appends; seen via MERGE),
  3. a stub executor replays commit → crash → re-commit and proves the
     sequence is idempotent (no dup seen rows, no doubled generation rows,
     single marker),
  4. the runtime gate raises with actionable setup instructions.
"""

from __future__ import annotations

import re

import pytest

from ganda_spark.streaming.iceberg_backend import (
    SETUP_HINT,
    IcebergCheckpointStore,
    clear_generation_sql,
    clear_marker_sql,
    commit_statement_sequence,
    create_marker_table_sql,
    create_seen_table_sql,
    iceberg_available,
    insert_marker_sql,
    seen_merge_sql,
)

NS = "crawl.ck"


def _parse(spark, sql: str) -> str:
    """Parse with Spark's sqlParser; return the logical plan class name.
    Syntax-level only — exactly what can be validated without the jar."""
    plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    return plan.getClass().getSimpleName()


def test_every_statement_parses(spark):
    cases = {
        create_marker_table_sql(NS): "CreateTable",
        create_seen_table_sql(NS): "CreateTable",
        seen_merge_sql(NS): "MergeIntoTable",
        clear_generation_sql(NS, "results", 3): "DeleteFromTable",
        clear_marker_sql(NS, 3): "DeleteFromTable",
        insert_marker_sql(NS, 3): "InsertIntoStatement",
    }
    for sql, expected in cases.items():
        got = _parse(spark, sql)
        assert expected in got, f"{sql!r} parsed to {got}, expected {expected}"


def test_commit_sequence_shape():
    tables = ["results", "errors", "frontier", "seen"]
    seq = commit_statement_sequence(NS, gen=2, table_names=tables)
    kinds = [k for k, _ in seq]
    # the marker is the atomic commit point: strictly LAST
    assert kinds[-2:] == ["delete", "insert"]
    assert "generations" in seq[-1][1]
    # every append table is cleared before it is appended (gen > 0)
    for name in ("results", "errors", "frontier"):
        d = next(i for i, (k, s) in enumerate(seq) if k == "delete" and f".{name} " in s + " ")
        a = next(i for i, (k, s) in enumerate(seq) if k == "append" and s.endswith(name))
        assert d < a
    # seen goes through MERGE, never append
    assert ("merge", seen_merge_sql(NS)) in seq
    assert not any(k == "append" and s.endswith("seen") for k, s in seq)
    # generation 0 needs no clears for append tables (createOrReplace path)
    seq0 = commit_statement_sequence(NS, gen=0, table_names=["results"])
    assert [k for k, _ in seq0] == ["append", "delete", "insert"]


class _StubCatalog:
    """Statement-level stand-in for an Iceberg catalog: just enough
    semantics (append, delete-by-batch, merge-on-url, marker insert) to
    replay the commit protocol and check idempotence invariants."""

    def __init__(self):
        self.tables: dict[str, list[dict]] = {}
        self.markers: list[int] = []

    def execute(self, kind: str, sql_or_table: str, gen: int, rows: dict[str, list[dict]]):
        if kind == "ddl":
            self.tables.setdefault("seen", [])
        elif kind == "merge":
            seen = self.tables.setdefault("seen", [])
            have = {r["url"] for r in seen}
            seen.extend(r for r in rows["seen"] if r["url"] not in have)
        elif kind == "delete":
            if "generations" in sql_or_table:
                self.markers = [g for g in self.markers if g != gen]
            else:
                name = re.search(r"DELETE FROM \S+\.(\w+) ", sql_or_table).group(1)
                t = self.tables.setdefault(name, [])
                self.tables[name] = [r for r in t if r["_batch_id"] != gen]
        elif kind == "append":
            name = sql_or_table.rsplit(".", 1)[1]
            self.tables.setdefault(name, []).extend(rows[name])
        elif kind == "insert":
            self.markers.append(gen)


def _run_sequence(cat, seq, gen, rows, crash_after: int | None = None):
    for i, (kind, s) in enumerate(seq):
        if crash_after is not None and i >= crash_after:
            return
        cat.execute(kind, s, gen, rows)


def test_crash_recommit_is_idempotent():
    """The exact failure the protocol exists for: a commit crashes after
    writing data but BEFORE the marker; resume re-runs the generation.
    Invariants after the re-commit: no duplicate seen urls, exactly one
    copy of the generation's rows per table, exactly one marker."""
    tables = ["results", "seen"]
    gen = 1
    rows = {
        "results": [{"_batch_id": gen, "url": f"u{i}"} for i in range(5)],
        "seen": [{"url": f"u{i}"} for i in range(5)],
    }
    seq = commit_statement_sequence(NS, gen, tables)
    cat = _StubCatalog()
    # seed: a previous generation's state that must survive untouched
    cat.tables["results"] = [{"_batch_id": 0, "url": "old"}]
    cat.tables["seen"] = [{"url": "old"}]
    cat.markers = [0]

    # attempt 1 crashes right before the marker insert (the last statement)
    _run_sequence(cat, seq, gen, rows, crash_after=len(seq) - 1)
    assert gen not in cat.markers  # resume sees gen as UNcommitted
    # attempt 2 replays the full sequence
    _run_sequence(cat, seq, gen, rows)
    assert sorted(cat.markers) == [0, 1]
    gen_rows = [r for r in cat.tables["results"] if r["_batch_id"] == gen]
    assert len(gen_rows) == 5  # not doubled by the replay
    assert [r for r in cat.tables["results"] if r["_batch_id"] == 0] == [
        {"_batch_id": 0, "url": "old"}
    ]
    urls = [r["url"] for r in cat.tables["seen"]]
    assert sorted(urls) == sorted(set(urls))  # MERGE deduped the replay


def test_runtime_gate_raises_with_setup_hint(spark):
    if iceberg_available(spark):  # pragma: no cover - not in this sandbox
        pytest.skip("iceberg runtime present; gate not exercisable")
    with pytest.raises(RuntimeError) as e:
        IcebergCheckpointStore(spark, catalog="crawl")
    assert "iceberg-spark-runtime" in str(e.value)
    assert str(e.value) == SETUP_HINT
