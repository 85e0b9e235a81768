"""Local simulation of the driver's CORRECTNESS gate.

For every key in ``__spark_entry__.queries()``: run the Spark query at
``sf_dir`` (default /root/testdata/sf0.01), run the matching
``oracle_sql()`` string in DuckDB over the same parquet tables, then
canonicalize both sides the way the driver does — pandas frame, columns
sorted by name, rows sorted by all columns (this is the step that dies on
list-typed cells, the round-1 ERR class) — and compare row count, column
names, and a value hash.

Usage:
    python scripts/check_oracle.py [query ...]   # default: all queries
Env:
    SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    """(rows, sorted column names, value hash) — mimics the driver: sort
    columns by name, sort rows by all columns, stringify with float
    rounding, md5."""
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    parts = []
    for c in cols:
        s = df[c]
        if s.dtype.kind == "f":
            # the driver formats floats with %.6g — which also collapses
            # integral floats (DuckDB HUGEINT sums arrive as float64) to
            # the same string an int64 column produces ("8809", not
            # "8809.0"); round() + str() would flag a pure dtype skew
            s = s.map(lambda v: f"{v:.6g}")
        parts.append(s.astype(str).str.cat(sep="\x1f"))
    digest = hashlib.md5("\x1e".join(parts).encode()).hexdigest()
    return len(df), cols, digest


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        # a typo must not report "0 fail" success for a gate that never ran
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        spark.stop()
        return 2
    n_pass = n_rowsonly = n_fail = 0
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            s_rows, s_cols, s_hash = _canon(sdf)
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"ERR  {name}: spark side\n{traceback.format_exc()}")
            continue
        sql = oracles.get(name)
        if sql is None:
            n_rowsonly += 1
            print(f"rows {name}: {s_rows} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(sql).fetchdf()
            o_rows, o_cols, o_hash = _canon(odf)
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"ERR  {name}: oracle side\n{traceback.format_exc()}")
            continue
        ok = (s_rows == o_rows) and (s_cols == o_cols) and (s_hash == o_hash)
        if ok:
            n_pass += 1
            print(f"PASS {name}: {s_rows} rows [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            failures.append(name)
            print(
                f"FAIL {name}: rows {s_rows}/{o_rows} "
                f"cols_match={s_cols == o_cols} hash_match={s_hash == o_hash}"
            )
            if s_cols != o_cols:
                print(f"     spark cols:  {s_cols}\n     oracle cols: {o_cols}")

    print(
        f"\n== {n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail"
        + (f" ({', '.join(failures)})" if failures else "")
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
