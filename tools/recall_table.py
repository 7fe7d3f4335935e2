#!/usr/bin/env python3
"""Render the RecallRun JSON (target/recall_r9.json) as the SCALE.md
recall@5-vs-cost markdown table: one row per knob configuration, one
recall/sec column pair per corpus multiplier."""
import json
import sys


def main(path):
    d = json.load(open(path))
    scales = d["scales"]
    labels = [s["label"] for s in scales]
    names = list(scales[0]["configs"].keys())
    hdr = ["config"] + [f"{l} recall@5 (s)" for l in labels]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for n in names:
        cells = [n]
        for s in scales:
            c = s["configs"][n]
            cells.append(f"{c['recall']:.3f} ({c['sec']:.1f})")
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "target/recall_r9.json")
