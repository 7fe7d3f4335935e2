#!/usr/bin/env python3
"""Regression gate for the x1000 capstone cells (bench/capstone_<round>_<label>.json).

The capstone sweeps have reproduced their per-phase shuffle bytes
bit-for-bit across rounds 12-14 (SCALE.md "Capstone x1000 cells
regenerated at round-14 HEAD") while walls wobble 0.5-1.5x with JVM
amortization and box contention. This gate enforces exactly the stable
invariant and only that:

  * LOST:  a query present in OLD is absent in NEW (dropped coverage)
  * PHASE: a phase (build/first/steady) measured in OLD is absent in NEW
  * BYTES: a phase's shuffle read+write differs by more than --tol-bytes
           (default 1% — the only byte drift ever observed is n8's
           +3,953 B on 1.013 GB from one extra provenance record, ~4 ppm)
  * SPILL: a phase that was spill-free in OLD spills > --spill-floor-b
           in NEW (the "used to fit, now thrashes" signature)

Walls are NEVER gated here — they are printed informationally with
their ratio, because the adjudication rule (BASELINE.md) says wall
deltas on byte-identical plans are contention/amortization, adjudicated
by solo rep convergence, not by a threshold.

Usage:
  tools/capstone_check.py bench/capstone_r13_x1000.json bench/capstone_r14_x1000.json
"""
import argparse
import json
import sys

PHASES = ("build", "first", "steady")


def load(path):
    doc = json.load(open(path))
    return doc.get("queries", {})


def rw(cell):
    return cell.get("shuffle_read_b", 0) + cell.get("shuffle_write_b", 0)


def spill(cell):
    return cell.get("spill_mem_b", 0) + cell.get("spill_disk_b", 0)


def check(old, new, tol_bytes=0.01, spill_floor_b=64 * 1024 * 1024):
    """Return (fails, infos) comparing two capstone query dicts."""
    fails, infos = [], []
    for q in sorted(old):
        if q not in new:
            fails.append(f"LOST    {q} — present in old, absent in new")
            continue
        for ph in PHASES:
            oc, nc = old[q].get(ph), new[q].get(ph)
            if oc is None and nc is None:
                continue
            if oc is not None and nc is None:
                fails.append(f"PHASE   {q}:{ph} — measured before, absent now")
                continue
            if oc is None:
                infos.append(f"NEW     {q}:{ph} — {nc['sec']:.1f}s (no baseline)")
                continue
            ob, nb = rw(oc), rw(nc)
            if ob > 0 and abs(nb - ob) > tol_bytes * ob:
                fails.append(f"BYTES   {q}:{ph} — {ob} -> {nb} B "
                             f"(drift {abs(nb-ob)/ob:.2%} > {tol_bytes:.0%}; "
                             f"byte drift on a capstone phase is a plan or "
                             f"store-content change, not noise)")
            if spill(oc) == 0 and spill(nc) > spill_floor_b:
                fails.append(f"SPILL   {q}:{ph} — 0 -> {spill(nc)/1e6:.0f}MB "
                             f"(was spill-free)")
            ratio = nc["sec"] / oc["sec"] if oc["sec"] else float("inf")
            infos.append(f"WALL    {q}:{ph} — {oc['sec']:.1f}s -> {nc['sec']:.1f}s "
                         f"({ratio:.2f}x, informational — adjudicate by rep "
                         f"convergence, never gated)")
    for q in sorted(set(new) - set(old)):
        infos.append(f"NEW     {q} — no baseline, informational")
    return fails, infos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--tol-bytes", type=float, default=0.01)
    ap.add_argument("--spill-floor-b", type=int, default=64 * 1024 * 1024)
    args = ap.parse_args()

    fails, infos = check(load(args.old), load(args.new),
                         args.tol_bytes, args.spill_floor_b)
    for line in infos:
        print(line)
    if fails:
        print(f"\n{len(fails)} capstone regression(s) vs {args.old}:")
        for line in fails:
            print("  " + line)
        sys.exit(1)
    print(f"capstone check OK vs {args.old}: bytes stable, "
          f"no lost coverage, no new spill")


if __name__ == "__main__":
    main()
