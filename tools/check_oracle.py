"""Local stand-in for the driver's correctness gate: runs every
__spark_entry__.queries() entry at sf0.01 and compares against
oracle_sql() via DuckDB — row count, column names, order-insensitive
value hash.

Faithful to the DRIVER environment (CORRECTNESS_r01 lessons):
  * a VANILLA SparkSession — no ganda_spark.session confs. Queries that
    only pass under our own session factory (e.g. mapKeyDedupPolicy)
    are bugs the driver will catch; this harness must catch them first.
  * pandas rendering on BOTH sides (df.toPandas() / duckdb .df()), not
    fetchall() — DuckDB HUGEINT becomes float64 through pandas ("2.0"
    vs Spark's "2"), which fetchall() masks (it yields Python ints).

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "\\N"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if v != v:
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _canon(pdf):
    """pandas DataFrame → (lowered colnames, sorted canonical row lines)."""
    cols = [c.lower() for c in pdf.columns]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm(r[i]) for i in order)
        for r in pdf.itertuples(index=False, name=None)
    )
    return cols, lines


def value_hash(lines) -> str:
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(only: list[str]) -> int:
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    # VANILLA session — deliberately not ganda_spark.session.get_spark()
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("oracle-check-vanilla")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create or replace view {t} as "
            f"select * from '{SF_DIR}/{t}.parquet'"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            spark_cols, spark_lines = _canon(df.toPandas())
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(spark_lines)} (no oracle, rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            duck_cols, duck_lines = _canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        problems = []
        if len(spark_lines) != len(duck_lines):
            problems.append(f"rows {len(spark_lines)} vs {len(duck_lines)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols {sorted(spark_cols)} vs {sorted(duck_cols)}")
        if not problems and value_hash(spark_lines) != value_hash(duck_lines):
            problems.append("value-hash mismatch")
            ss, ds = set(spark_lines), set(duck_lines)
            for x in list(ss - ds)[:3]:
                print(f"   spark-only: {x[:160]}")
            for x in list(ds - ss)[:3]:
                print(f"   duck-only : {x[:160]}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            failures += 1
        else:
            print(f"PASS {name}: rows={len(spark_lines)} [{time.time()-t0:.1f}s]")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1:]) else 0)
