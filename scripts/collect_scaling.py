#!/usr/bin/env python3
"""Fold the per-scale headline JSONs from run_scaling.sh into
SCALING_r{N}.json with a least-squares growth exponent per query
(slope of log t vs log scale). Development tooling only."""
import json
import math
import sys

ROUND = sys.argv[1] if len(sys.argv) > 1 else "13"
SCALES = [1, 2, 4, 8]
# r16: the gram-operator tail — x16/x32 documents-only points for the
# queries whose corpus-token shuffles are fixed-cost-dominated at x8.
# Optional: absent files just skip the tail.
GRAM_SCALES = [16, 32]

runs = {}
loads = {}
loads_start = {}
for m in SCALES + GRAM_SCALES:
    try:
        with open(f"/tmp/graft_scale/headline_x{m}.json") as f:
            d = json.load(f)
    except OSError:
        if m in GRAM_SCALES:
            continue
        raise
    runs[m] = d["queries"]
    loads[m] = d.get("load")
    # r15: run_scaling.sh records the PRE-run 1-min load per scale (the
    # end-of-run load in the headline JSON is dominated by the bench's
    # own self-load on this 32-thread box and says nothing about
    # contention; the start load is what the wait_idle gate controls).
    try:
        with open(f"/tmp/graft_scale/load_start_x{m}.txt") as f:
            loads_start[m] = float(f.read().strip())
    except OSError:
        loads_start[m] = None

# Optional dedicated idle x1 re-anchor (r14 VERDICT item 4): a SHORT
# min-of-3 pass over a handful of sweep queries taken on a provably
# quiet box, so the exponent table has an x1 point whose recorded
# conditions are defensible. When present, each covered query ALSO gets
# an exponent recomputed from the idle anchor's x1 time (an idle x1 is
# never slower, so the re-anchored exponent is the conservative — i.e.
# steeper — one).
anchor = None
try:
    with open("/tmp/graft_scale/anchor_x1_idle.json") as f:
        anchor = json.load(f)
except OSError:
    pass

# Exact pair-ENUMERATION kernels: their contract is every pair above a
# similarity threshold, and on this embedding distribution ~12% of ALL
# pairs sit in the band (measured in stage_scale.py validation), so the
# OUTPUT itself grows quadratically — time is output-bound, no plan can
# beat it. Their 100 TB path is the indexed tier (v3/v5 ANN, d3 LSH,
# d4 SimHash), which this record shows scaling near-linearly.
# Per-query adjudication notes that belong IN the artifact (r16): flat
# exponents that are the data's fixed-cost floor rather than evidence of
# scaling, and linear-by-contract decode work.
ADJUDICATED = {
    "d14_substr_dedup": "FLAT IS THE FLOOR, not evidence: sf0.1 docs "
        "average 54 tokens (~5.5 fifty-grams each), so x32 is only 2.2M "
        "8-byte gram rows (69k at x1) - ~0.1s of shuffle inside the "
        "~0.2s per-job session floor at local[32]. The gram pipeline's "
        "data-sized stages are the same dupSubstrHits feed d15 carries "
        "to exp 0.67 once its doc-grain string tail dominates.",
    "d16_stream_dedup_replay": "FLAT IS THE FLOOR: one md5 + one window "
        "row per doc; 160k rows at x32 complete inside the per-job "
        "session floor. The replayed stream state is one cell per live "
        "content; the batch replay is one hash shuffle - linear by "
        "construction, too cheap to measure at these scales.",
    "d17_stream_substr_replay": "FLAT IS THE FLOOR: same gram volume "
        "arithmetic as d14 (2.2M gram rows at x32); the keep-first "
        "window adds no data-sized stage beyond d14's budget.",
    "m7_image_neardup": "DECODE-BOUND, LINEAR BY CONTRACT: every stored "
        "image must be codec-decoded exactly once per pass (~exp 1.0); "
        "there is no sublinear path through a decoder. The hash/banding "
        "tail after decode is the same sublinear shape as d4.",
}

OUTPUT_BOUND = {
    "d9_neardup_shuffle_kernel": "EXACT all-pairs cosine, brute-force by "
        "contract (SURVEY r13 stance): O(n^2*d) compute is the contract "
        "when exactness over every pair is required; r13 cut its constant "
        "(streamed cogroup, no wide pair-row materialization) but the "
        "exponent is inherent. Subquadratic contracts: d8 (SemDeDup "
        "cells), pair2 (ANN-mined), both in this record.",
}

queries = sorted(runs[1])
out = {"scales": SCALES, "unit": "sec", "repeat": 3,
       "load_by_scale": {str(m): loads.get(m) for m in sorted(loads)},
       "load_start_by_scale": {str(m): loads_start.get(m)
                               for m in sorted(loads)},
       "note": ("x-copies of documents/embeddings/events are id-shifted and "
                "content-synthesized to preserve the base's per-copy "
                "workload shape (scripts/stage_scale.py); r14 also "
                "inflates orders/lineitem/customer/supplier (consistent "
                "key shifts -> k disconnected trade-graph copies) so the "
                "iterative family g1/g4/rc1 measures real growth; "
                "region/nation/part fixed at sf0.1. "
                "exponent = least-squares slope of "
                "log(t) vs log(scale); <=1.0 is linear-or-better. "
                "Queries under 'output_bound' are exact-by-contract "
                "(adjudicated in SURVEY r13 stances rather than "
                "plan-fixed); the subquadratic contracts that replaced "
                "the r12 quadratic kernels (d8 SemDeDup cells, pair2 "
                "ANN-mined negatives) and the indexed tiers (v5, d3) "
                "are in this record."),
       "queries": {}}
for q in queries:
    ts = [runs[m].get(q, -1.0) for m in SCALES]
    if any(t <= 0 for t in ts):
        out["queries"][q] = {"times": ts, "exponent": None, "failed": True}
        continue
    xs = [math.log(m) for m in SCALES]
    ys = [math.log(t) for t in ts]
    n = len(xs)
    xbar, ybar = sum(xs) / n, sum(ys) / n
    slope = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / \
        sum((x - xbar) ** 2 for x in xs)
    entry = {
        "times": [round(t, 3) for t in ts],
        "x8_over_x1": round(ts[-1] / ts[0], 3),
        "exponent": round(slope, 3)}
    if q in OUTPUT_BOUND:
        entry["output_bound"] = OUTPUT_BOUND[q]
    if q in ADJUDICATED:
        entry["adjudication"] = ADJUDICATED[q]
    # gram tail: extend the fit through x16/x32 when this query ran there
    gts = [(m, runs[m][q]) for m in GRAM_SCALES
           if m in runs and runs[m].get(q, -1.0) > 0]
    if gts:
        exs = xs + [math.log(m) for m, _ in gts]
        eys = ys + [math.log(t) for _, t in gts]
        en = len(exs)
        exbar, eybar = sum(exs) / en, sum(eys) / en
        eslope = sum((x - exbar) * (y - eybar) for x, y in zip(exs, eys)) / \
            sum((x - exbar) ** 2 for x in exs)
        entry["times_gram_tail"] = {str(m): round(t, 3) for m, t in gts}
        entry["exponent_x1_x32"] = round(eslope, 3)
        entry["x32_over_x1"] = round(gts[-1][1] / ts[0], 3)
    if anchor and anchor["queries"].get(q, -1.0) > 0:
        t1 = anchor["queries"][q]
        ys2 = [math.log(t1)] + ys[1:]
        ybar2 = sum(ys2) / n
        slope2 = sum((x - xbar) * (y - ybar2) for x, y in zip(xs, ys2)) / \
            sum((x - xbar) ** 2 for x in xs)
        entry["x1_idle"] = round(t1, 3)
        entry["exponent_idle_anchor"] = round(slope2, 3)
    out["queries"][q] = entry

if anchor:
    out["x1_idle_anchor"] = {
        "load_start": anchor.get("load_start"),
        "load_end": anchor.get("load"),
        "queries": {k: round(v, 3) for k, v in anchor["queries"].items()},
        "note": ("dedicated min-of-3 x1 pass on a quiet box (start load "
                 "recorded before launch); exponent_idle_anchor uses its "
                 "x1 time — the conservative re-anchor, since an idle x1 "
                 "can only steepen the slope")}

path = f"SCALING_r{ROUND}.json"
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out["queries"], indent=1))
print(f"wrote {path}")
