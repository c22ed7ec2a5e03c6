#!/usr/bin/env python3
"""Generate the OPTIMIZATION_rNN appendix: every registered query with
before (round-start) vs after (post-optimization) bench numbers.
Usage: opt_checklist.py BEFORE.json AFTER.json [round]"""
import json
import sys

before = json.load(open(sys.argv[1]))
after = json.load(open(sys.argv[2]))
bc, ac = before["task_cpu_ms"], after["task_cpu_ms"]
bw, aw = before["queries"], after["queries"]
rnd = sys.argv[3] if len(sys.argv) > 3 else "r20"

# queries with targeted structural changes, per round
targeted_r19 = {
    "dedup_substring": "native md5 gram walk (CharGramMd5); digest-into-buffer",
    "dedup_substring_xx": "shares exciseImpl; Finding 0",
    "winnow_fingerprint": "O(len^2) substring walk removed (boundary offsets); digest-into-buffer",
    "jaccard_join_exact": "verify via zero-alloc SortedIntersectCount",
    "basket_affinity": "native OrderedPairs explode replaces nested HOF",
    "dedup_lines": "kept-only reassembly buffer (collect_list skips nulls)",
    "strip_boilerplate": "kept-only reassembly buffer (collect_list skips nulls)",
    "curate_incremental": "gate checks fused+overlapped; enumerated layout in appends",
    "ann_index_probe": "enumerated cell layout in build",
    "ann_index_append": "enumerated cell layout in build+append",
    "ann_index_pq": "enumerated cell layout incl. code table",
    "bm25_index_probe": "enumerated bucket layout; observe stats",
    "bm25_index_incremental": "enumerated bucket layout; observe stats",
    "grep_index_probe": "hash-range posting layout; observe doc count",
    "grep_index_append": "hash-range posting layout; observe doc count",
    "grep_regex_probe": "hash-range posting layout; observe doc count",
}
targeted_r20 = {
    "dedup_lines": "one-exchange segment counts (array_distinct before explode; fp off the wire)",
    "strip_boilerplate": "same rewrite tried, measured worse at tier, REVERTED (SCALE1000_r20_lines.json)",
    "ann_index_probe": "batched stats-prune: one metadata job for all segments (-1 job)",
    "ann_index_append": "batched stats-prune (-4 jobs)",
    "ann_index_pq": "batched stats-prune (-2 jobs)",
    "bm25_index_probe": "batched stats-prune (-2 jobs)",
    "bm25_index_incremental": "batched stats-prune (-8 jobs)",
    "curate_incremental": "batched stats-prune in both index probes (-21 jobs)",
}
targeted = targeted_r20 if rnd == "r20" else targeted_r19

print("| query | cpu_s before | cpu_s after | wall_s before | wall_s after | disposition |")
print("|---|---|---|---|---|---|")
for q in sorted(set(bw) | set(aw)):
    b_c = bc.get(q, -1) / 1000
    a_c = ac.get(q, -1) / 1000
    b_w = bw.get(q, -1)
    a_w = aw.get(q, -1)
    if q in targeted:
        disp = "OPTIMIZED: " + targeted[q]
    else:
        disp = "examined; Finding 0 (warm codegen) applies; shape left alone"
    print(f"| {q} | {b_c:.2f} | {a_c:.2f} | {b_w:.2f} | {a_w:.2f} | {disp} |")
