#!/usr/bin/env python3
"""Render the ScaleRun JSON (target/scale_r9.json) as the SCALE.md
markdown tables: per-query wall seconds + shuffle/spill at each corpus
multiplier, with t(x10)/t(x1) and t(x100)/t(x10) ratios."""
import json
import sys


def fmt_b(b):
    if b >= 1e9:
        return f"{b/1e9:.1f} GB"
    if b >= 1e6:
        return f"{b/1e6:.0f} MB"
    return f"{b/1e3:.0f} KB"


def main(path):
    d = json.load(open(path))
    scales = d["scales"]
    labels = [s["label"] for s in scales]
    names = list(scales[0]["queries"].keys())

    # wall-time table with ratios
    hdr = ["query"] + [f"{l} (s)" for l in labels]
    for a, b in zip(labels, labels[1:]):
        hdr.append(f"t({b})/t({a})")
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    rows = names + ["prebuild"]
    for n in rows:
        cells = [n]
        secs = []
        for s in scales:
            q = s["prebuild"] if n == "prebuild" else s["queries"][n]
            if q.get("skipped"):
                secs.append(None)
                cells.append("skip")
            else:
                secs.append(q["sec"])
                cells.append(f"{q['sec']:.1f}")
        for a, b in zip(secs, secs[1:]):
            cells.append(f"**{b/a:.1f}**" if a and b else "—")
        print("| " + " | ".join(cells) + " |")
    print()

    # shuffle/spill table
    hdr2 = ["query"] + [f"{l} shuffle r+w / spill" for l in labels]
    print("| " + " | ".join(hdr2) + " |")
    print("|" + "---|" * len(hdr2))
    for n in rows:
        cells = [n]
        for s in scales:
            q = s["prebuild"] if n == "prebuild" else s["queries"][n]
            if q.get("skipped"):
                cells.append("skip")
            else:
                sh = q["shuffle_read_b"] + q["shuffle_write_b"]
                sp = q["spill_mem_b"] + q["spill_disk_b"]
                cells.append(fmt_b(sh) + (" / " + fmt_b(sp) if sp else ""))
        print("| " + " | ".join(cells) + " |")
    print()

    # u5 variants (+ the r9/r10 ad-hoc scaled-geometry block, which
    # round 11's ScaleRun no longer emits — the scale-safe configs are
    # declared capstone queries now; emit those rows only when present
    # so this renderer works on both JSON generations)
    variant_keys = [("u5_recompute_warm", "u5 recompute (warm)"),
                    ("u5_checkpoint_variant", "u5 +localCheckpoint"),
                    ("c5_scaled_geometry", "c5 @ scaled bits"),
                    ("d10_scaled_geometry", "d10 @ scaled bits")]
    present = [(k, l) for k, l in variant_keys if all(k in s for s in scales)]
    if present:
        print("| variant | " + " | ".join(f"{l} (s)" for l in labels) + " |")
        print("|" + "---|" * (len(labels) + 1))
        for key, label in present:
            cells = [label] + [f"{s[key]['sec']:.1f}" for s in scales]
            print("| " + " | ".join(cells) + " |")
        if all("scaled_bits" in s for s in scales):
            cells = ["scaled bits"] + [str(s["scaled_bits"]) for s in scales]
            print("| " + " | ".join(cells) + " |")
        print()

    if all("recall_at_5" in s for s in scales):
        print("| recall@5 | " + " | ".join(labels) + " |")
        print("|" + "---|" * (len(labels) + 1))
        for n in scales[0]["recall_at_5"]:
            cells = [n] + [f"{s['recall_at_5'][n]:.3f}" for s in scales]
            print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "target/scale_r9.json")
