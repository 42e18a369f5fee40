#!/usr/bin/env python3
"""Sampled oracle for the corpus x train kNN family at 10x+ scales.

At sf1 the full DuckDB replica of the kNN-family oracles is infeasible
(6M probe rows x 1,207 train rows ~ 7e9 distance pairs), so those rows
were previously recorded `engine_ran_oracle_infeasible`. This checker
closes that gap with a DETERMINISTIC row sample: a probe row is sampled
iff the integer value of the first 13 hex chars of its `li_id` (the md5
row key both sides already share) is divisible by `mod`. The engine
side filters its already-written Verify output; the oracle side gets
the predicate INJECTED into the probe CTE (`... FROM lineitem WHERE
<prefix52 of the li_id md5 expression> % mod = 0`), so only sampled
probes are ever joined against the train slice — wrapping the whole
query in an outer filter was measured NOT to push through DuckDB's
window/group chain (it recomputed the full 7e8-pair join at sf0.1).
Values are then compared exactly (mimic_driver's stringify rules).

Usage: check_knn_sf1.py <sfDir> <verifyOutDir> [mod]
  mod defaults to 601 (~10k sampled probes at sf1's 6M lineitem).
"""
import datetime
import glob
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# every oracle that joins the full-corpus probe side against the
# bounded train slice AND emits per-probe rows keyed by li_id - the
# family the full replica cannot cover at sf1. q_calibration shares the
# cross join but aggregates li_id away into 10 corpus-wide bins, so a
# row sample cannot verify it; since r13 its PROBE side carries the
# same < 1e6 orderkey cap as the train slice, so the FULL replica is
# feasible at any sf and it runs in the main sweep, not here.
KNN_FAMILY = [
    "q_kneighbors", "q_knn_cls", "q_knn_cls_weighted",
    "q_knn_missing", "q_knn_nodata", "q_knn_proba", "q_knn_reg",
    "q_knn_reg_multi", "q_knn_weighted", "q_pipeline", "q_radius_reg",
]

def prefix52_sql(hex_expr: str) -> str:
    """52-bit prefix of an md5 HEX STRING expression - the same
    derivation TextFunctions.hexPrefix52Sql applies to md5()."""
    return ("list_sum(list_transform(range(1,14), t -> "
            f"(strpos('0123456789abcdef', substr({hex_expr}, t, 1)) - 1) * "
            "CAST(16^(13-t) AS BIGINT)))")


def prefix52(li_id: str) -> int:
    return int(li_id[:13], 16)


def extract_md5_expr(sql: str) -> str:
    """The probe CTE's li_id derivation: the balanced md5(CONCAT_WS(...))
    expression, extracted so the injected predicate can never drift from
    the oracle's own row key."""
    start = sql.index("md5(CONCAT_WS")
    depth = 0
    for i in range(start, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return sql[start:i + 1]
    raise ValueError("unbalanced md5(CONCAT_WS expression")


def inject_sample(sql: str, mod: int) -> str:
    """Add the sample predicate INSIDE the probe CTE. Every kNN-family
    oracle has exactly one bare `FROM lineitem)` (the probe side; the
    train CTE carries its own WHERE), asserted here."""
    target = "FROM lineitem)"
    if sql.count(target) != 1:
        raise ValueError(f"expected exactly one '{target}', "
                         f"found {sql.count(target)}")
    pred = f"{prefix52_sql(extract_md5_expr(sql))} % {mod} = 0"
    return sql.replace(target, f"FROM lineitem WHERE {pred})")


def _cell(v):
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return str(pd.Timestamp(v))
    return str(v)


def rows_of(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    return sorted(tuple(_cell(v) for v in row)
                  for row in df.itertuples(index=False, name=None))


def main(sf_dir: str, out_dir: str, mod: int) -> int:
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name in KNN_FAMILY:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"SKIP {name}: no spark output")
            failures += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files],
                             ignore_index=True)
        n_total = len(spark_df)
        sampled = spark_df[spark_df["li_id"].map(
            lambda h: prefix52(h) % mod == 0)]
        try:
            oracle_df = con.sql(inject_sample(oracles[name], mod)).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        srows, orows = rows_of(sampled), rows_of(oracle_df)
        cols_ok = sorted(sampled.columns) == sorted(oracle_df.columns)
        if cols_ok and srows == orows and len(srows) > 0:
            print(f"OK   {name} ({len(srows)} sampled of {n_total} rows)")
        else:
            failures += 1
            msg = "schema mismatch" if not cols_ok else (
                "empty sample" if not srows else "value mismatch")
            print(f"FAIL {name}: {msg} "
                  f"(spark {len(srows)} vs oracle {len(orows)} sampled rows)")
            for a, b in zip(srows, orows):
                if a != b:
                    print(f"     first diff: spark {a} vs oracle {b}")
                    break
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 601))
