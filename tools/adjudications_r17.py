#!/usr/bin/env python3
"""Inject round-17 adjudications into STRESS_r17.json (run after the
sweeps write it).

Round-16 verdict item 6: the g3_pagerank adjudication (three rounds of
"drift" flags on a key whose wall time is 3-6 chained shuffle stages of
task scheduling, identical at sf0.01 and sf0.1) generalizes to every
driver-loop fixpoint key. Record each key's measured OVERHEAD FLOOR
(its sf0.01 wall seconds, where data mass is provably irrelevant —
the g3 control measured 0.96-1.08 s at BOTH sf0.01 and sf0.1) as kind
"overhead_floor"; tools/stress_diff.py then auto-suppresses a ratio
flag whose denominators sit within 3x the floor AND whose sf1 seconds
did not themselves grow super-linearly, instead of each round
re-deriving the fixed-overhead argument by hand
(stress_diff_selftest.py cases 10-12 cover the bound).

Floors come from committed measurement artifacts (STRESS_floor_r17
.json and STRESS_floor_r17b.json — StressSweep runs over the iterative
keys at sf0.01), never from memory. Two runs, per-key MIN: the first
key of any sweep absorbs the session's JIT/codegen warmup (run a: g9
first, 7.64 s; run b leads with the cheap q11_hybrid as the sacrificial
warm key, g9 drops to its true floor), and min-of-runs is the same
contention-robust estimator Bench uses. Usage:
    python3 tools/adjudications_r17.py [STRESS_r17.json [floor.json ...]]
"""
import json, sys

ART = sys.argv[1] if len(sys.argv) > 1 else "STRESS_r17.json"
FLOOR_FILES = sys.argv[2:] if len(sys.argv) > 2 else [
    "STRESS_floor_r17.json", "STRESS_floor_r17b.json"]

# driver-loop fixpoint keys: per-iteration job scheduling dominates at
# bench SFs (the g3 class); each runs a bounded number of chained
# shuffle stages whose cost is task dispatch, not data mass
ITERATIVE = [
    "g1_connected_components", "g2_bfs_walk", "g3_pagerank",
    "g5_kcore", "g6_label_propagation", "g7_incremental_cc",
    "g9_sssp", "j6_reconcile_fixpoint",
]


def main():
    runs = []
    for p in FLOOR_FILES:
        try:
            runs.append(json.load(open(p))["queries"])
        except FileNotFoundError:
            print(f"[adjudications] floor artifact missing: {p}")
    if not runs:
        sys.exit("no floor artifacts found")
    with open(ART) as f:
        d = json.load(f)
    adj = d.setdefault("adjudications", {})
    n = 0
    for k in ITERATIVE:
        secs = [r[k]["secs"] for r in runs
                if k in r and r[k].get("status") == "ok"]
        if not secs:
            print(f"[adjudications] no green floor measurement for {k}; skipped")
            continue
        floor = min(secs)
        adj[k] = {
            "kind": "overhead_floor",
            "floor_secs": round(floor, 3),
            "round": "r17",
            "verdict": (
                "driver-loop fixpoint: wall time at bench SFs is chained "
                "per-iteration task scheduling, not data mass (the r16 "
                "g3_pagerank control: same seconds at sf0.01 and sf0.1). "
                f"Floor = min over {len(secs)} sf0.01 sweep runs = "
                f"{floor:.2f}s (STRESS_floor_r17*.json; min-of-runs "
                "because a sweep's first key absorbs session warmup); "
                "stress_diff suppresses ratio flags whose denominators "
                "sit within 3x this floor and whose sf1 seconds did not "
                "themselves grow super-linearly."
            ),
        }
        n += 1
    with open(ART, "w") as f:
        json.dump(d, f, indent=1)
    print(f"[adjudications] wrote {n} overhead_floor entries into {ART}")


if __name__ == "__main__":
    main()
