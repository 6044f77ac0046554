#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs the DuckDB oracle.

Mimics the driver's correctness gate: run Verify (done separately via
sbt), then for each dumped parquet result, run the paired oracle SQL in
DuckDB over the same testdata tables, sort columns by name, sort rows,
and compare values. Dev tooling only — not part of the shipped library.

Usage: python3 scripts/precheck.py <sfdir> <outdir> [name-substr ...]
Optional trailing args restrict the check to queries whose name contains
any of the given substrings (scale-rehearsal spot checks, where running
every quadratic oracle in DuckDB would dominate the wall clock).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        # decimals/dates/timestamps → str for engine-neutral compare
    df = df.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sfdir: str, outdir: str, only: list = ()) -> None:
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file tables; Spark-written scale
        # rehearsal data (ScaleUp) ships part-file directories
        path = Path(f"{sfdir}/{t}.parquet")
        src = f"{path}/*.parquet" if path.is_dir() else str(path)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    # Spot-check dumps (Verify with name filters) write a suffixed
    # oracle file so they can never clobber a full run's oracle_sql.json
    # in the same outdir; prefer it when this is itself a filtered check.
    spot = Path(f"{outdir}/oracle_sql.spotcheck.json")
    oracle_path = spot if (only and spot.exists()) \
        else Path(f"{outdir}/oracle_sql.json")
    oracle = json.loads(oracle_path.read_text())
    if only:
        oracle = {n: s for n, s in oracle.items()
                  if any(sub in n for sub in only)}
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        pdir = Path(outdir) / name
        if not pdir.exists():
            print(f"MISSING  {name} (no spark output)")
            bad += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{pdir}/*.parquet'").df()
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            bad += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"SCHEMA   {name}: spark={list(a.columns)} duck={list(b.columns)}")
            bad += 1
        elif len(a) != len(b):
            print(f"ROWS     {name}: spark={len(a)} duck={len(b)}")
            bad += 1
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"VALUES   {name}: {int(neq.sum())}/{len(a)} rows differ; first:")
            idx = neq[neq].index[:3]
            for i in idx:
                print(f"  spark: {a.loc[i].to_dict()}")
                print(f"  duck : {b.loc[i].to_dict()}")
            bad += 1
        else:
            print(f"OK       {name} ({len(a)} rows)")
            ok += 1
    print(f"\n{ok} ok, {bad} bad")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
