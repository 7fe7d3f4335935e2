#!/usr/bin/env python3
"""Regression gate for the measured scale proof.

Compares a freshly-regenerated bench/scale_<NEW>_fresh.json against the
committed bench/scale_<OLD>_fresh.json cell by (scale label, query) cell
and exits nonzero when the new run regresses:

  * WALL:    new_sec > tol_wall * old_sec + abs_floor  (default 1.5x + 2 s
             — the absolute floor keeps sub-second cells from tripping on
             scheduler noise)
  * SHUFFLE: new read+write bytes > tol_shuffle * old and the delta
             exceeds 64 MB (a plan that moves 2x the bytes is a plan
             change, not noise)
  * SPILL:   new spill (mem+disk) > 64 MB where the old cell spilled
             nothing — the "silent 3x regression" signature: a cell that
             used to fit now thrashes
  * LOST:    a cell measured in OLD is skipped or absent in NEW (silently
             dropping coverage is itself a regression; an explicitly
             skipped-in-both cell is fine)

Cells new in NEW (newly declared queries) are reported informationally
and never fail the gate. Usage:

  tools/scale_check.py bench/scale_r10_fresh.json bench/scale_r11_fresh.json
  tools/scale_check.py OLD NEW --tol-wall 1.5 --tol-shuffle 2.0
"""
import argparse
import json
import sys


def cells(path):
    doc = json.load(open(path))
    out = {}
    for sc in doc["scales"]:
        label = sc["label"]
        for q, m in sc.get("queries", {}).items():
            out[(label, q)] = m
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--tol-wall", type=float, default=1.5)
    ap.add_argument("--abs-floor-sec", type=float, default=2.0)
    ap.add_argument("--tol-shuffle", type=float, default=2.0)
    ap.add_argument("--shuffle-floor-b", type=int, default=64 * 1024 * 1024)
    ap.add_argument("--spill-floor-b", type=int, default=64 * 1024 * 1024)
    args = ap.parse_args()

    old, new = cells(args.old), cells(args.new)
    fails, infos = [], []

    for key, om in sorted(old.items()):
        label, q = key
        nm = new.get(key)
        o_skip = om.get("skipped", False)
        if nm is None:
            if not o_skip:
                fails.append(f"LOST    {label}:{q} — measured in {args.old}, absent in {args.new}")
            else:
                # a skipped cell vanishing entirely is dropped COVERAGE
                # (query deleted, or the run died before emitting it) —
                # surface it so it can't disappear silently, even though
                # no measurement regressed
                infos.append(f"GONE    {label}:{q} — skipped in {args.old}, "
                             f"absent from {args.new} (coverage disappeared; verify the query still exists)")
            continue
        n_skip = nm.get("skipped", False)
        if o_skip or n_skip:
            if n_skip and not o_skip:
                fails.append(f"LOST    {label}:{q} — measured {om.get('sec', '?')}s before, now skipped")
            continue
        o_sec, n_sec = om["sec"], nm["sec"]
        o_sh = om.get("shuffle_read_b", 0) + om.get("shuffle_write_b", 0)
        n_sh = nm.get("shuffle_read_b", 0) + nm.get("shuffle_write_b", 0)
        if n_sec > args.tol_wall * o_sec + args.abs_floor_sec:
            # flat shuffle bytes on an inflated wall is the documented
            # contention / long-JVM signature (BASELINE.md "contention
            # rule") — still a failure (the run is not a valid basis),
            # but the triage is "adjudicate solo", not "find the plan
            # change"
            flat = o_sh > 0 and abs(n_sh - o_sh) <= 0.1 * o_sh
            hint = ("flat shuffle — likely contention; adjudicate solo "
                    "via graft.tools.TimeQuery / mem8g" if flat
                    else "shuffle moved too — check the plan")
            fails.append(f"WALL    {label}:{q} — {o_sec:.1f}s -> {n_sec:.1f}s "
                         f"(> {args.tol_wall}x + {args.abs_floor_sec}s; {hint})")
        if n_sh > args.tol_shuffle * o_sh and n_sh - o_sh > args.shuffle_floor_b:
            fails.append(f"SHUFFLE {label}:{q} — {o_sh/1e6:.0f}MB -> {n_sh/1e6:.0f}MB "
                         f"(> {args.tol_shuffle}x)")
        o_sp = om.get("spill_mem_b", 0) + om.get("spill_disk_b", 0)
        n_sp = nm.get("spill_mem_b", 0) + nm.get("spill_disk_b", 0)
        if o_sp == 0 and n_sp > args.spill_floor_b:
            fails.append(f"SPILL   {label}:{q} — 0 -> {n_sp/1e6:.0f}MB (was spill-free)")

    for key in sorted(set(new) - set(old)):
        label, q = key
        m = new[key]
        desc = "skipped" if m.get("skipped") else f"{m['sec']:.1f}s"
        infos.append(f"NEW     {label}:{q} — {desc} (no baseline, informational)")

    for line in infos:
        print(line)
    if fails:
        print(f"\n{len(fails)} scale regression(s) vs {args.old}:")
        for line in fails:
            print("  " + line)
        sys.exit(1)
    print(f"scale check OK: {len(old)} baseline cells, no regression vs {args.old}")


if __name__ == "__main__":
    main()
