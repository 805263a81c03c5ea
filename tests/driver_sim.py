"""Simulates the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() twin on DuckDB over the same sf dir; compare
row count, schema, and order-insensitive values.

Usage: python tests/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                # dtype-insensitive numeric compare (int32 vs int64 etc.);
                # float64 is exact for all engine values (< 2^53)
                df[c] = pd.to_numeric(df[c]).astype("float64")
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return (
        df.sort_values(list(df.columns), kind="mergesort")
        .reset_index(drop=True)
    )


def _dtype_family(s: pd.Series) -> str:
    k = s.dtype.kind
    return "int" if k in "iu" else ("float" if k == "f" else "other")


def compare(name, spark_df, duck_df) -> list:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} "
            f"duck={sorted(duck_df.columns)}"
        )
        return problems
    # dtype-strict: the driver hashes rendered values, so an int64 Spark
    # column vs a float64 oracle column (e.g. DuckDB sum(BIGINT) returning
    # HUGEINT -> float64) hash-mismatches even when values are equal.
    # normalize() below would mask that; flag it here first.
    for c in sorted(spark_df.columns):
        fa, fb = _dtype_family(spark_df[c]), _dtype_family(duck_df[c])
        if {fa, fb} == {"int", "float"}:
            problems.append(
                f"dtype family mismatch in {c}: spark={spark_df[c].dtype} "
                f"duck={duck_df[c].dtype} (driver hash sees int vs float)"
            )
    if problems:
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = normalize(spark_df.copy()), normalize(duck_df.copy())
    if len(a) == len(b) and not a.equals(b):
        diff_cols = [c for c in a.columns if not a[c].equals(b[c])]
        problems.append(f"values differ in columns {diff_cols}")
        for c in diff_cols[:2]:
            neq = a[c] != b[c]
            idx = neq[neq].index[:3]
            for i in idx:
                problems.append(f"  {c}[{i}]: spark={a[c][i]!r} duck={b[c][i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from servico_ocr_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = sorted(only - set(qs))
    if unknown:
        sys.exit(
            f"unknown query name(s) {unknown} — not in queries(); "
            "a typo here would otherwise gate a partial set silently"
        )
    # the flagship oracles are committed golden parquets generated at ONE
    # sf (tests/golden/INPUTS.json); at any other sf_dir they would
    # false-fail on correct code, so fall back to a rows-only check there.
    # The driver itself always gates at the golden sf (sf0.01).
    golden_sf = None
    try:
        import json as _json

        with open(os.path.join(os.path.dirname(__file__), "golden",
                               "INPUTS.json")) as fh:
            golden_sf = _json.load(fh)["sf_dir"].rstrip("/")
    except Exception:
        pass
    golden_only = {"extract_docs", "extract_lineage"}

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if (name in golden_only and golden_sf is not None
                and os.path.realpath(sf_dir) != os.path.realpath(golden_sf)):
            try:
                n = fn(spark, sf_dir).count()
            except Exception as exc:
                print(f"[FAIL] {name}: spark error: {str(exc)[:300]}")
                failed.append(name)
                continue
            print(f"[rows] {name}: {n} rows (golden oracle is for "
                  f"{golden_sf}; rows-only at this sf)")
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as exc:
            print(f"[FAIL] {name}: spark error: {str(exc)[:300]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"[rows] {name}: {len(spdf)} rows (no oracle, rows-only)")
            assert len(spdf) >= 0
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"[FAIL] {name}: duckdb error: {str(exc)[:300]}")
            failed.append(name)
            continue
        problems = compare(name, spdf, ddf)
        if problems:
            print(f"[FAIL] {name}: " + "; ".join(problems[:5]))
            failed.append(name)
        else:
            print(f"[ ok ] {name}: {len(spdf)} rows match")
    spark.stop()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
