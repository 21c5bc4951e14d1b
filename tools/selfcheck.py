"""Mimic the driver's correctness gate: run every queries() entry on Spark and
its oracle_sql() twin on DuckDB at the same sf, compare row count, schema
(column names), and an order-insensitive value hash.

Usage: python tools/selfcheck.py [sf_dir] [key ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd


def norm_cell(v):
    if isinstance(v, float):
        # Stabilize float formatting BUT keep a float marker: the driver
        # hashes an int-typed 5 differently from a float-typed 5.0 (r4
        # events_bool_aggs went driver-red because DuckDB count_if returns
        # HUGEINT -> pandas float64 while Spark returned BIGINT, and the old
        # %.9g collapse hid it locally). A float that formats without a
        # decimal point or exponent gets ".0" appended so the local suite
        # fails exactly where the driver would.
        s = f"{v:.9g}"
        if "." not in s and "e" not in s and "n" not in s:  # nan/inf keep as-is
            s += ".0"
        return s
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> str:
    import hashlib

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(
        ",".join(norm_cell(v) for v in row) for row in pdf.itertuples(index=False)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def duck_connection(sf_dir: str):
    """DuckDB connection with the driver's table views registered."""
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def compare_key(spark, con, qs, oracles, key: str, sf_dir: str):
    """Run one queries() entry on Spark and its oracle on DuckDB; return a
    list of problem strings (empty = parity). Rows-only keys return [] iff
    the Spark side runs and yields a frame."""
    sdf = qs[key](spark, sf_dir).toPandas()
    if key not in oracles:
        return []
    odf = con.execute(oracles[key]).df()
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
    else:
        hs, ho = frame_hash(sdf), frame_hash(odf)
        if hs != ho:
            problems.append(f"hash {hs} vs {ho}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from thewhisperdb_spark.session import get_spark

    spark = get_spark("selfcheck")

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for key, fn in qs.items():
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(key)
            print(f"FAIL  {key}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        t_spark = time.time() - t0
        if key not in oracles:
            print(f"rows  {key}: {len(sdf)} rows (rows-only, {t_spark:.1f}s)")
            if len(sdf) == 0:
                print(f"      WARNING {key}: 0 rows")
            continue
        try:
            odf = con.execute(oracles[key]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(key)
            print(f"FAIL  {key}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            hs, ho = frame_hash(sdf), frame_hash(odf)
            if hs != ho:
                problems.append(f"hash {hs} vs {ho}")
        if problems:
            failures.append(key)
            print(f"FAIL  {key}: {'; '.join(problems)}")
            if len(sdf) == len(odf) and sorted(sdf.columns) == sorted(odf.columns):
                s = sdf.reindex(sorted(sdf.columns), axis=1)
                o = odf.reindex(sorted(odf.columns), axis=1)
                ss = sorted(tuple(norm_cell(v) for v in r) for r in s.itertuples(index=False))
                oo = sorted(tuple(norm_cell(v) for v in r) for r in o.itertuples(index=False))
                diff = [(a, b) for a, b in zip(ss, oo) if a != b][:3]
                for a, b in diff:
                    print(f"        spark={a}\n        duck ={b}")
        else:
            print(f"OK    {key}: {len(sdf)} rows ({t_spark:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
