#!/usr/bin/env python3
"""Merge per-cohort Bench artifacts (tools/run_bench_cohorts.sh) into one
sweep-shaped JSON: union of queries/errors, summed total, config from
cohort 0 plus the cohort count. Fails loudly on overlapping query keys
(cohorts are disjoint by construction; overlap means mismatched N)."""
import sys, os, json, glob

in_dir, out_path = sys.argv[1], sys.argv[2]
files = sorted(glob.glob(os.path.join(in_dir, "cohort_*_of_*.json")))
if not files:
    sys.exit(f"no cohort_*_of_*.json under {in_dir}")
queries, errors, config, sf = {}, {}, None, None
for f in files:
    d = json.load(open(f))
    dup = set(d["queries"]) & set(queries)
    if dup:
        sys.exit(f"overlapping keys across cohorts (mismatched N?): {sorted(dup)[:5]}")
    queries.update(d["queries"])
    errors.update(d.get("errors", {}))
    config = config or d.get("config")
    sf = sf or d.get("sf")
total = sum(v for v in queries.values() if v >= 0)
if config is not None:
    config["n_cohorts"] = len(files)
out = {"metric": "total", "value": total, "unit": "sec", "config": config,
       "queries": queries, "errors": errors, "sf": sf,
       "desc": f"merged from {len(files)} fresh-JVM cohorts"}
json.dump(out, open(out_path, "w"), indent=1)
print(f"{len(files)} cohorts, {len(queries)} queries, "
      f"{len(errors)} errors, total {total:.1f} s")
