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


class IcebergCheckpointStore:
    """Same duck-typed contract as streaming.checkpoint.CheckpointStore."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "crawl"):
        if not iceberg_available(spark):
            raise RuntimeError(SETUP_HINT)
        self.spark = spark
        self.ns = f"{catalog}.{namespace}"
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.ns}")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.ns}.generations "
            "(generation INT, committed_at TIMESTAMP) USING iceberg"
        )

    def _table(self, name: str) -> str:
        return f"{self.ns}.{name}"

    def commit(self, gen: int, tables: dict[str, DataFrame], metrics: dict):
        for name, df in tables.items():
            out = df.withColumn("_batch_id", F.lit(gen)).withColumn(
                "_partition_id", F.spark_partition_id()
            )
            if name == "seen":
                out.createOrReplaceTempView("_seen_delta")
                self.spark.sql(
                    f"CREATE TABLE IF NOT EXISTS {self._table('seen')} "
                    "(url STRING, _batch_id INT, _partition_id INT) USING iceberg"
                )
                # MERGE = idempotent on re-commit after a crash
                self.spark.sql(
                    f"MERGE INTO {self._table('seen')} t USING _seen_delta s "
                    "ON t.url = s.url WHEN NOT MATCHED THEN INSERT *"
                )
            else:
                if gen == 0:
                    out.writeTo(self._table(name)).createOrReplace()
                else:
                    # crash-then-recommit idempotence: a plain append would
                    # double rows that read() (_batch_id == gen) returns
                    # twice — clear this generation's rows first
                    self.spark.sql(
                        f"DELETE FROM {self._table(name)} WHERE _batch_id = {gen}"
                    )
                    out.writeTo(self._table(name)).append()
        # commit point: the generation marker (snapshot-isolated);
        # delete-then-insert keeps re-commits single-row
        self.spark.sql(
            f"DELETE FROM {self.ns}.generations WHERE generation = {gen}"
        )
        self.spark.sql(
            f"INSERT INTO {self.ns}.generations "
            f"VALUES ({gen}, current_timestamp())"
        )

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
