"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402
from gp_ann_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = []
    for t in df_pandas[cols].itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                # v + 0.0 canonicalizes -0.0 → 0.0: engines summing in a
                # different order can land on opposite signed zeros for a
                # ~±1e-10 mean, and "-0.000000" != "0.000000" would FAIL
                # two numerically identical results
                row.append(f"{v + 0.0:.6f}")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return cols, sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("correctness_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {t1 - t0:.1f}s)")
            if len(sdf) == 0:
                failures.append(name)
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        sc, sr = canon(sdf)
        oc, orows = canon(odf)
        status = []
        if [c.lower() for c in sc] != [c.lower() for c in oc]:
            status.append(f"schema: spark={sc} oracle={oc}")
        if len(sr) != len(orows):
            status.append(f"rows: spark={len(sr)} oracle={len(orows)}")
        elif sr != orows:
            bad = sum(1 for a, b in zip(sr, orows) if a != b)
            ex = next((a, b) for a, b in zip(sr, orows) if a != b)
            status.append(f"values: {bad}/{len(sr)} differ, e.g. {ex[0]} vs {ex[1]}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)}  ({t1 - t0:.1f}s)")
        else:
            print(f"OK    {name}: {len(sr)} rows match ({t1 - t0:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
