#!/usr/bin/env python3
"""Render a merged CapstoneRun JSON (bench/capstone_rN_<label>.json) as
the SCALE.md capstone table: build / first / steady cells per query,
with shuffle r+w and the steady-state shuffle ratio against a baseline
scale cell (pass the corresponding scale_rN_fresh.json + label to get
the x100→x1000 decade column).

  tools/capstone_table.py bench/capstone_r13_x1000.json \
      [bench/scale_r13_fresh.json x100]
"""
import json
import sys


def fmt_b(b):
    if b >= 1e9:
        return f"{b/1e9:.2f} GB"
    if b >= 1e6:
        return f"{b/1e6:.0f} MB"
    return f"{b/1e3:.0f} KB"


def rw(m):
    return m["shuffle_read_b"] + m["shuffle_write_b"]


def spill(m):
    return m["spill_mem_b"] + m["spill_disk_b"]


def main(path, base_path=None, base_label=None):
    d = json.load(open(path))
    if "queries" not in d:  # a single per-query record, not the merge
        d = {"label": d["label"], "queries": {d["query"]: d}}
    base = {}
    if base_path:
        bd = json.load(open(base_path))
        for sc in bd["scales"]:
            if sc["label"] == base_label:
                base = {q: m for q, m in sc["queries"].items()
                        if not m.get("skipped")}
    hdr = ["query (" + d["label"] + ")", "build (s)", "first (s)",
           "steady (s)", "steady shuffle r+w", "spill"]
    if base:
        hdr.append(f"vs {base_label} shuffle")
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for q, rec in sorted(d["queries"].items()):
        b = rec.get("build")
        st, fi = rec["steady"], rec["first"]
        cells = [q,
                 f"{b['sec']:.1f}" if b else "(in-query)",
                 f"{fi['sec']:.1f}", f"{st['sec']:.1f}",
                 fmt_b(rw(st)),
                 "0" if spill(st) == 0 and spill(fi) == 0 and
                        (not b or spill(b) == 0) else
                 fmt_b(spill(st) + spill(fi) + (spill(b) if b else 0))]
        if base:
            bm = base.get(q)
            # em-dash when the baseline cell is missing OR moved zero
            # shuffle bytes (a no-shuffle query has no decade ratio)
            cells.append(f"{rw(st)/rw(bm):.2f}x/decade" if bm and rw(bm) else "—")
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main(sys.argv[1],
         sys.argv[2] if len(sys.argv) > 2 else None,
         sys.argv[3] if len(sys.argv) > 3 else None)
