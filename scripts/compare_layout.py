#!/usr/bin/env python3
"""Layout-determinism check: two Verify output dirs (produced under
different parallelism) must be BIT-IDENTICAL per query after a full
row sort — evidence that no result depends on partition placement.

Usage: compare_layout.py dirA dirB
"""
import sys
import hashlib
import os

import duckdb


def qhash(con, d, name):
    path = os.path.join(d, name, "*.parquet")
    rows = con.execute(
        f"SELECT * FROM read_parquet('{path}')").fetchall()
    cols = [c[0] for c in con.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(repr(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    h.update(repr(sorted(cols)).encode())
    for r in canon:
        h.update(repr(r).encode())
    return h.hexdigest(), len(rows)


def main():
    da, db = sys.argv[1], sys.argv[2]
    names = sorted(n for n in os.listdir(da)
                   if os.path.isdir(os.path.join(da, n)))
    con = duckdb.connect()
    bad = 0
    for n in names:
        if not os.path.isdir(os.path.join(db, n)):
            print(f"MISS {n} (absent in {db})")
            bad += 1
            continue
        (ha, ra), (hb, rb) = qhash(con, da, n), qhash(con, db, n)
        if ha != hb or ra != rb:
            print(f"DIFF {n} rows {ra}/{rb} hash {ha[:12]}/{hb[:12]}")
            bad += 1
        else:
            print(f"OK   {n} ({ra} rows)")
    print(f"compare_layout: {len(names) - bad}/{len(names)} identical")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
