#!/usr/bin/env python3
"""Full-registry cross-scale correctness sweep (the r11 verdict's item 3):
mimic_driver's pandas-stringify hash compare, with check_oracle's DuckDB
spill/memory caps so one heavy oracle cannot wedge the machine, fanned
out over worker processes (each worker owns one DuckDB connection with
its own bounded budget).

Usage: sweep_sf1.py <sfDir> <verifyOutDir> <resultsJson> [nproc] [skipCsv]

skipCsv names queries whose DuckDB replica is documented-infeasible at
this scale (e.g. the corpus x train kNN family, handled separately by
check_knn_sf1.py) — they are recorded as skipped, not failed.
"""
import glob
import importlib.util
import itertools
import json
import sys
from multiprocessing import Pool
from pathlib import Path

import duckdb
import pandas as pd

_spec = importlib.util.spec_from_file_location(
    "mimic_driver", Path(__file__).parent / "mimic_driver.py")
md = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(md)

SF = sys.argv[1]
OUT = sys.argv[2]
RESULTS = sys.argv[3]
NPROC = int(sys.argv[4]) if len(sys.argv) > 4 else 4
SKIP = set((sys.argv[5] if len(sys.argv) > 5 else "").split(",")) - {""}

_con = None


def _init():
    global _con
    _con = duckdb.connect()
    _con.execute("SET temp_directory='/tmp/duckdb_spill'")
    _con.execute("SET memory_limit='18GB'")
    # per-worker cap; workers share the disk, so keep each bounded
    _con.execute("SET max_temp_directory_size='15GB'")
    for t in md.TABLES:
        _con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def _check(item):
    name, sql = item
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        return name, {"err": "no spark output"}
    try:
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in files], ignore_index=True)
    except Exception as e:  # noqa: BLE001
        return name, {"err": f"spark read: {str(e)[:200]}"}
    try:
        oracle_df = _con.sql(sql).df()
    except Exception as e:  # noqa: BLE001
        return name, {"err": f"oracle: {str(e)[:300]}"}
    hm = md.df_hash(spark_df) == md.df_hash(oracle_df)
    res = {
        "rows": [len(spark_df), len(oracle_df)],
        "schema_match": sorted(spark_df.columns) == sorted(oracle_df.columns),
        "hash_match": hm,
    }
    if not hm:
        sdf = spark_df[sorted(spark_df.columns)]
        odf = oracle_df[sorted(oracle_df.columns)]
        srows = sorted(tuple(md._cell(v) for v in r)
                       for r in sdf.itertuples(index=False, name=None))
        orows = sorted(tuple(md._cell(v) for v in r)
                       for r in odf.itertuples(index=False, name=None))
        # zip_longest, not zip: a pure row-count mismatch (one side a
        # strict sorted prefix of the other) must still diagnose
        for a, b in itertools.zip_longest(srows, orows):
            if a != b:
                res["first_diff"] = {
                    "spark": a[:12] if a is not None else "<missing row>",
                    "oracle": b[:12] if b is not None else "<missing row>"}
                break
    return name, res


def main():
    oracles = json.loads((Path(OUT) / "oracle_sql.json").read_text())
    todo = sorted((n, q) for n, q in oracles.items() if n not in SKIP)
    results = {n: {"skipped": "documented-infeasible replica at this scale"}
               for n in SKIP if n in oracles}
    n_done = 0
    with Pool(NPROC, initializer=_init) as pool:
        for name, res in pool.imap_unordered(_check, todo):
            results[name] = res
            n_done += 1
            flag = "OK  " if res.get("hash_match") else (
                "SKIP" if "skipped" in res else "FAIL")
            print(f"{flag} [{n_done}/{len(todo)}] {name} "
                  f"{json.dumps(res.get('err', res.get('first_diff', '')))[:160]}",
                  flush=True)
    Path(RESULTS).write_text(json.dumps(results, indent=1, sort_keys=True))
    n_green = sum(1 for r in results.values() if r.get("hash_match"))
    # green rate over CHECKED queries only — documented skips are not
    # in the denominator (they were never compared)
    n_checked = sum(1 for r in results.values() if "skipped" not in r)
    print(f"GREEN {n_green}/{n_checked} checked "
          f"({len(results) - n_checked} documented skips) -> {RESULTS}")


if __name__ == "__main__":
    main()
