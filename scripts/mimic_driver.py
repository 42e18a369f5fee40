#!/usr/bin/env python3
"""Mimic of the (unseen) driver compare: pandas-read both sides, sort
columns by name, sort rows, md5 the stringified cells. Used to reproduce
the r01 hash_match pattern and validate fixes against it.

Usage: python3 scripts/mimic_driver.py <sfDir> <verifyOutDir> [only]

The optional third arg is a comma-separated query-name subset, matching
Verify's SPARK_GRAFT_ONLY — without it every oracle entry is checked.
"""
import datetime
import glob
import hashlib
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _cell(v):
    # pandas reads a parquet DATE column as datetime.date objects while
    # DuckDB's .df() yields datetime64 — the real driver hash-matches
    # date-typed outputs across that divide (observed: q_gap_islands /
    # q_retention green in CORRECTNESS_r08), so normalize date -> midnight
    # timestamp before stringifying.
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return str(pd.Timestamp(v))
    return str(v)


def df_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(tuple(_cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main(sf_dir: str, out_dir: str, only=None) -> None:
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results = {}
    for name in sorted(oracles):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            results[name] = {"err": "no spark output"}
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": str(e)}
            continue
        hm = df_hash(spark_df) == df_hash(oracle_df)
        results[name] = {
            "rows": (len(spark_df), len(oracle_df)),
            "schema_match": sorted(spark_df.columns) == sorted(oracle_df.columns),
            "hash_match": hm,
        }
        if not hm:
            sdf = spark_df[sorted(spark_df.columns)]
            odf = oracle_df[sorted(oracle_df.columns)]
            srows = sorted(tuple(_cell(v) for v in r) for r in sdf.itertuples(index=False, name=None))
            orows = sorted(tuple(_cell(v) for v in r) for r in odf.itertuples(index=False, name=None))
            for a, b in zip(srows, orows):
                if a != b:
                    results[name]["first_diff"] = {"spark": a, "oracle": b}
                    break
    for name, r in results.items():
        flag = "OK  " if r.get("hash_match") else "FAIL"
        print(flag, name, json.dumps(r.get("first_diff", r.get("err", ""))))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None)
