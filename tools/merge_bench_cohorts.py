#!/usr/bin/env python3
"""Merge per-cohort Bench artifacts (tools/run_bench_cohorts.sh) into one
sweep-shaped JSON: union of queries/errors, summed total, config from
cohort 0 minus the per-cohort fields.

Validation (ADVICE r16 — a merged.json must never LOOK like a full sweep
while silently undercounting):
  - N is parsed from every `cohort_i_of_N.json` filename and must be the
    same across all files (stale files from a different-N sweep in a
    reused outdir fail loudly — round-robin slices of different N are
    disjoint, so the old overlap check alone could not catch them);
  - exactly cohorts 0..N-1 must be present (a crashed-before-artifact
    cohort or a `start>0` partial sweep fails loudly; pass
    --allow-partial to merge anyway, which stamps `"partial": true`);
  - overlapping query keys still fail (mismatched slicing);
  - a cohort whose artifact is the start-of-run stub (`"stub": true`)
    merges as all-errors — visible, not vanished.

The merged config drops the `cohort` field and recomputes `excluded` as
the intersection of the cohorts' exclusion lists (each cohort excludes
the other cohorts' queries; only the common exclusions — oracle-only
tiers — are excluded from the MERGED sweep), minus any stub cohorts'
error keys (a stub carries no config, so its slice survives the
intersection — those queries belong in `errors`, not `excluded`).
"""
import sys, os, json, glob, re

args = [a for a in sys.argv[1:] if a != "--allow-partial"]
allow_partial = "--allow-partial" in sys.argv[1:]
in_dir, out_path = args[0], args[1]
files = sorted(glob.glob(os.path.join(in_dir, "cohort_*_of_*.json")))
if not files:
    sys.exit(f"no cohort_*_of_*.json under {in_dir}")
parsed = []
for f in files:
    m = re.fullmatch(r"cohort_(\d+)_of_(\d+)\.json", os.path.basename(f))
    if not m:
        sys.exit(f"unparseable cohort filename: {f}")
    parsed.append((int(m.group(1)), int(m.group(2)), f))
ns = sorted({n for _, n, _ in parsed})
if len(ns) != 1:
    sys.exit(f"mixed cohort counts in {in_dir}: N={ns} — stale files from "
             f"a different sweep? clean the outdir or split the files")
n_expected = ns[0]
present = sorted(i for i, _, _ in parsed)
missing = sorted(set(range(n_expected)) - set(present))
extra = sorted(set(present) - set(range(n_expected)))
if extra:
    sys.exit(f"cohort indices out of range for N={n_expected}: {extra}")
if len(present) != len(set(present)):
    sys.exit(f"duplicate cohort indices: {present}")
if missing and not allow_partial:
    sys.exit(f"incomplete sweep: missing cohorts {missing} of N={n_expected} "
             f"(crashed before writing even the stub artifact, or a start>0 "
             f"partial run) — rerun them or pass --allow-partial")

queries, errors, config, sf = {}, {}, None, None
excluded_sets, n_stubs, stub_error_keys = [], 0, set()
for _, _, f in sorted(parsed):
    d = json.load(open(f))
    if d.get("stub"):
        n_stubs += 1
        # a stub carries no config, so its slice's queries never enter the
        # exclusion intersection below — without this they'd appear BOTH
        # in the merged `excluded` (every surviving cohort excluded them)
        # and in `errors` (the stub merges as all-errors)
        stub_error_keys |= set(d.get("errors", {}))
    dup = set(d["queries"]) & set(queries)
    if dup:
        sys.exit(f"overlapping keys across cohorts (mismatched N?): {sorted(dup)[:5]}")
    queries.update(d["queries"])
    errors.update(d.get("errors", {}))
    if d.get("config") is not None:
        config = config or dict(d["config"])
        if "excluded" in d["config"]:
            excluded_sets.append(set(d["config"]["excluded"]))
    sf = sf or d.get("sf")
total = sum(v for v in queries.values() if v >= 0)
if config is not None:
    config.pop("cohort", None)
    config["n_cohorts"] = n_expected
    if excluded_sets:
        config["excluded"] = sorted(
            set.intersection(*excluded_sets) - stub_error_keys)
out = {"metric": "total", "value": total, "unit": "sec", "config": config,
       "queries": queries, "errors": errors, "sf": sf,
       "desc": f"merged from {len(parsed)} fresh-JVM cohorts (N={n_expected})"}
if missing:
    out["partial"] = True
    out["missing_cohorts"] = missing
if n_stubs:
    out["stub_cohorts"] = n_stubs
json.dump(out, open(out_path, "w"), indent=1)
print(f"{len(parsed)}/{n_expected} cohorts ({n_stubs} stubs), "
      f"{len(queries)} queries, {len(errors)} errors, total {total:.1f} s")
