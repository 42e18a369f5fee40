#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with the sf tables
registered as views, and compares: column names (sorted), row counts,
and cell values (rows sorted, exact equality after normalization).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir: str, out_dir: str, only=None) -> int:
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    # large-SF sweeps: an in-memory DB cannot spill, so heavy oracles OOM
    # at sf0.1 — give DuckDB a temp dir and a bounded budget instead
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET memory_limit='32GB'")
    # a runaway pair-join oracle (q_dbscan/q_pagerank class at sf1) can
    # fill the DISK through the spill dir — cap it so the query errors
    # loudly instead of wedging the machine at 100% disk; override for a
    # known-feasible-but-spilly solo rerun via DUCKDB_TEMP_CAP
    import os as _os
    con.execute(
        f"SET max_temp_directory_size='{_os.environ.get('DUCKDB_TEMP_CAP', '30GB')}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_fail = 0
    for name in sorted(oracles):
        if only is not None and name not in only:
            continue
        res_dir = out / name
        if not res_dir.exists():
            print(f"FAIL {name}: no Spark result written")
            n_fail += 1
            continue
        spark_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        spark_cols = sorted(spark_rel.columns)
        spark_rows = sorted(
            (
                tuple(norm(v) for v in row)
                for row in con.sql(
                    f"SELECT {', '.join(spark_cols)} FROM '{res_dir}/*.parquet'"
                ).fetchall()
            ),
            key=repr,  # None sorts consistently alongside ints/floats
        )
        try:
            oracle_rel = con.sql(oracles[name])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        oracle_cols = sorted(oracle_rel.columns)
        if spark_cols != oracle_cols:
            print(f"FAIL {name}: columns {spark_cols} != {oracle_cols}")
            n_fail += 1
            continue
        try:
            # execution happens at fetch time, so the spill-cap /
            # out-of-memory class of failure lands HERE, not at the
            # con.sql() above — catch it per-query or one heavy oracle
            # aborts the whole sweep
            oracle_rows = sorted(
                (
                    tuple(norm(v) for v in row)
                    for row in con.sql(
                        f"SELECT {', '.join(oracle_cols)} FROM ({oracles[name]})"
                    ).fetchall()
                ),
                key=repr,
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle execution error: {e}")
            n_fail += 1
            continue
        if len(spark_rows) != len(oracle_rows):
            print(f"FAIL {name}: rowcount {len(spark_rows)} != {len(oracle_rows)}")
            n_fail += 1
            continue
        bad = [
            (a, b) for a, b in zip(spark_rows, oracle_rows) if a != b
        ]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(spark_rows)} row mismatches; first: ")
            print(f"  spark : {bad[0][0]}")
            print(f"  oracle: {bad[0][1]}")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(spark_rows)} rows)")
    return n_fail


if __name__ == "__main__":
    # optional 3rd arg: comma-separated query names to (re-)check
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(1 if main(sys.argv[1], sys.argv[2], only) else 0)
