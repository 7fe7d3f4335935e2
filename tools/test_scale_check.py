"""Smoke tests for the scale regression gate (tools/scale_check.py).

The gate carries real triage logic — contention classification on WALL
flags, LOST vs GONE coverage accounting — and it is what stands between
a regressed scale proof and a committed round. These tests drive it as
a subprocess on synthetic old/new JSON so every verdict path (WALL flat
/ WALL moved / SHUFFLE / SPILL / LOST-absent / LOST-skipped / GONE /
NEW / floors) is pinned.

Run:  python3 -m pytest tools/test_scale_check.py -q
(scripts/scale_proof.sh check runs it automatically before gating)
"""
import json
import subprocess
import sys
from pathlib import Path

TOOL = str(Path(__file__).resolve().parent / "scale_check.py")


def cell(sec=10.0, read=10**9, write=10**9, spill=0, skipped=False):
    if skipped:
        return {"skipped": True}
    return {
        "sec": sec,
        "shuffle_read_b": read,
        "shuffle_write_b": write,
        "spill_mem_b": 0,
        "spill_disk_b": spill,
        "gc_ms": 0,
        "cpu_sec": sec,
    }


def doc(queries_by_label):
    return {
        "metric": "scale",
        "scales": [
            {"label": lbl, "queries": qs} for lbl, qs in queries_by_label.items()
        ],
    }


def run(tmp_path, old, new, *extra):
    op, np_ = tmp_path / "old.json", tmp_path / "new.json"
    op.write_text(json.dumps(old))
    np_.write_text(json.dumps(new))
    p = subprocess.run(
        [sys.executable, TOOL, str(op), str(np_), *extra],
        capture_output=True,
        text=True,
    )
    return p.returncode, p.stdout


def test_identical_cells_pass(tmp_path):
    d = doc({"x100": {"q1": cell(), "q2": cell(sec=3.0)}})
    rc, out = run(tmp_path, d, d)
    assert rc == 0
    assert "no regression" in out


def test_wall_flag_with_flat_shuffle_says_contention(tmp_path):
    old = doc({"x100": {"q1": cell(sec=10.0)}})
    new = doc({"x100": {"q1": cell(sec=40.0)}})  # 4x wall, identical bytes
    rc, out = run(tmp_path, old, new)
    assert rc == 1
    assert "WALL" in out
    assert "flat shuffle" in out and "contention" in out


def test_wall_flag_with_moved_shuffle_says_plan(tmp_path):
    old = doc({"x100": {"q1": cell(sec=10.0, read=10**9, write=10**9)}})
    new = doc({"x100": {"q1": cell(sec=40.0, read=3 * 10**9, write=3 * 10**9)}})
    rc, out = run(tmp_path, old, new)
    assert rc == 1
    assert "WALL" in out
    assert "shuffle moved too" in out


def test_wall_abs_floor_spares_subsecond_cells(tmp_path):
    # 0.2 s -> 1.5 s is 7.5x but under the 2 s absolute floor: scheduler
    # noise on tiny cells must not trip the gate
    old = doc({"x100": {"q1": cell(sec=0.2, read=10**6, write=10**6)}})
    new = doc({"x100": {"q1": cell(sec=1.5, read=10**6, write=10**6)}})
    rc, out = run(tmp_path, old, new)
    assert rc == 0


def test_shuffle_flag_needs_ratio_and_absolute_delta(tmp_path):
    # 3x the bytes AND >64 MB over: flags
    old = doc({"x100": {"q1": cell(read=10**8, write=10**8)}})
    new = doc({"x100": {"q1": cell(read=3 * 10**8, write=3 * 10**8)}})
    rc, out = run(tmp_path, old, new)
    assert rc == 1 and "SHUFFLE" in out
    # 3x the bytes but kilobytes in absolute terms: spared by the floor
    old = doc({"x100": {"q1": cell(read=10**4, write=10**4)}})
    new = doc({"x100": {"q1": cell(read=3 * 10**4, write=3 * 10**4)}})
    rc, out = run(tmp_path, old, new)
    assert rc == 0


def test_spill_flag_on_previously_spill_free_cell(tmp_path):
    old = doc({"x100": {"q1": cell(spill=0)}})
    new = doc({"x100": {"q1": cell(spill=10**9)}})
    rc, out = run(tmp_path, old, new)
    assert rc == 1
    assert "SPILL" in out and "was spill-free" in out


def test_spill_floor_spares_small_spill(tmp_path):
    old = doc({"x100": {"q1": cell(spill=0)}})
    new = doc({"x100": {"q1": cell(spill=10**6)}})  # 1 MB < 64 MB floor
    rc, _ = run(tmp_path, old, new)
    assert rc == 0


def test_lost_cell_absent_from_new(tmp_path):
    old = doc({"x100": {"q1": cell(), "q2": cell()}})
    new = doc({"x100": {"q1": cell()}})
    rc, out = run(tmp_path, old, new)
    assert rc == 1
    assert "LOST" in out and "q2" in out


def test_lost_cell_now_skipped(tmp_path):
    old = doc({"x100": {"q1": cell()}})
    new = doc({"x100": {"q1": cell(skipped=True)}})
    rc, out = run(tmp_path, old, new)
    assert rc == 1
    assert "LOST" in out and "now skipped" in out


def test_gone_skipped_cell_vanishing_is_surfaced_not_fatal(tmp_path):
    # skipped in old, absent in new: coverage disappeared — surface it
    # as a GONE line (so it can't vanish silently) without failing
    old = doc({"x100": {"q1": cell(), "q2": cell(skipped=True)}})
    new = doc({"x100": {"q1": cell()}})
    rc, out = run(tmp_path, old, new)
    assert rc == 0
    assert "GONE" in out and "q2" in out and "coverage disappeared" in out


def test_skipped_in_both_is_fine(tmp_path):
    d = doc({"x100": {"q1": cell(), "q2": cell(skipped=True)}})
    rc, out = run(tmp_path, d, d)
    assert rc == 0
    assert "GONE" not in out and "LOST" not in out


def test_new_cell_is_informational(tmp_path):
    old = doc({"x100": {"q1": cell()}})
    new = doc({"x100": {"q1": cell(), "q9": cell(sec=5.0)}})
    rc, out = run(tmp_path, old, new)
    assert rc == 0
    assert "NEW" in out and "q9" in out


def test_labels_are_independent(tmp_path):
    # same query name under two labels: a regression at x100 must name
    # x100, not x10
    old = doc({"x10": {"q1": cell(sec=1.0)}, "x100": {"q1": cell(sec=10.0)}})
    new = doc({"x10": {"q1": cell(sec=1.0)}, "x100": {"q1": cell(sec=40.0)}})
    rc, out = run(tmp_path, old, new)
    assert rc == 1
    assert "x100:q1" in out and "x10:q1" not in out


def test_tolerance_flags_are_adjustable(tmp_path):
    old = doc({"x100": {"q1": cell(sec=10.0)}})
    new = doc({"x100": {"q1": cell(sec=40.0)}})
    rc, _ = run(tmp_path, old, new, "--tol-wall", "5.0")
    assert rc == 0
