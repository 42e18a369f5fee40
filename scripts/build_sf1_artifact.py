#!/usr/bin/env python3
"""Assemble CORRECTNESS_sf1_r12.json from the full-registry sweep
results (sweep_sf1.py), the sampled kNN-family checker output
(check_knn_sf1.py stdout), and the documented capacity skips.

Usage: build_sf1_artifact.py <sweepResultsJson> <knnLog> <outJson>
"""
import json
import re
import sys
from pathlib import Path

# Only genuine DuckDB resource exhaustion counts as a capacity skip;
# anything else carrying an err (missing spark output, parquet read
# errors, SQL errors) is an engine/read FAILURE and must surface as one.
CAPACITY_RE = re.compile(
    r"out of memory|memory limit|OutOfMemory|temp_directory|"
    r"temp directory|max_temp_directory_size|could not allocate|"
    r"failed to allocate", re.IGNORECASE)

sweep = json.loads(Path(sys.argv[1]).read_text())
knn_log = Path(sys.argv[2]).read_text() if Path(sys.argv[2]).exists() else ""
out = Path(sys.argv[3])

green = sorted(n for n, r in sweep.items() if r.get("hash_match"))
fails = {n: r for n, r in sweep.items()
         if not r.get("hash_match") and "skipped" not in r}
skips = sorted(n for n, r in sweep.items() if "skipped" in r)

knn_green = sorted(
    line.split()[1] for line in knn_log.splitlines()
    if line.startswith("OK"))
knn_fail = [line for line in knn_log.splitlines() if line.startswith("FAIL")]

artifact = {
    "dataset": ("testdata-sf1 (ScaleData 10x of sf0.1: 6M lineitem / "
                "1.5M orders / 1M events / 50k documents / 20k embeddings)"),
    "scope": ("r12 FULL-REGISTRY sweep (the r11 verdict's item 3): every "
              "registry query dumped via the parallel-write Verify mode "
              "(71 min engine side, zero failures), hash-checked against "
              "its DuckDB oracle at sf1; the corpus x train kNN family "
              "checked via the deterministic row-sampled oracle "
              "(check_knn_sf1.py)"),
    "n_green_full_oracle": len(green),
    "n_green_knn_sampled_oracle": len(knn_green),
    "oracles_green": green,
    "knn_sampled_oracle_green": knn_green,
    "knn_sampled_oracle_fail": knn_fail,
    "oracle_capacity_skips": {
        n: r.get("err", "")[:200] for n, r in fails.items()
        if "err" in r and CAPACITY_RE.search(r["err"])},
    "engine_or_read_failures": {
        n: r.get("err", "")[:200] for n, r in fails.items()
        if "err" in r and not CAPACITY_RE.search(r["err"])},
    "value_fails": {
        n: r for n, r in fails.items() if "err" not in r},
    "documented_infeasible": skips,
}
out.write_text(json.dumps(artifact, indent=1, sort_keys=False))
print(f"green(full)={len(green)} green(knn)={len(knn_green)} "
      f"capacity_skips={len(artifact['oracle_capacity_skips'])} "
      f"engine_or_read_failures={len(artifact['engine_or_read_failures'])} "
      f"value_fails={len(artifact['value_fails'])} -> {out}")
