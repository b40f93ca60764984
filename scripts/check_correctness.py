"""Self-check harness mimicking the driver's CORRECTNESS gate:
run every queries() entry on Spark and its oracle_sql() twin on DuckDB
at the same sf, compare row count + column names + order-insensitive
values. Usage: python scripts/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from tartare_spark.demos import ORACLE, SPARK
    from tartare_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    ok = bad = 0
    for name, fn in SPARK.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {str(e)[:200]}")
            bad += 1
            continue
        if name not in ORACLE:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            ok += 1
            continue
        try:
            rel = con.sql(ORACLE[name])
            d_cols = list(rel.columns)
            d_types = [str(t) for t in rel.types]
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: DUCKDB ERROR {str(e)[:200]}")
            bad += 1
            continue
        # The driver's value hash is TYPE-sensitive: DuckDB's int128
        # (HUGEINT, e.g. from sum() over integers) hash-mismatches an
        # equal Spark BIGINT even though str() comparison passes. Flag
        # it here so the oracle gets an explicit CAST.
        exotic = [
            (c, t)
            for c, t in zip(d_cols, d_types)
            if any(k in t.upper() for k in ("HUGEINT", "DECIMAL"))
        ]
        if exotic:
            print(f"FAIL  {name}: oracle returns driver-hash-unsafe types {exotic}"
                  " — CAST to BIGINT/DOUBLE in the oracle SQL")
            bad += 1
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL  {name}: columns spark={sc} duckdb={dc}")
            bad += 1
        elif len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} duckdb={len(dr)}")
            bad += 1
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL  {name}: values differ, e.g. {diffs}")
            bad += 1
        else:
            print(f"OK    {name}: {len(sr)} rows [{time.time()-t0:.1f}s]")
            ok += 1
    print(f"\n{ok} ok, {bad} failing")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
