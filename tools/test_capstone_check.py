"""Smoke tests for the capstone byte-stability gate (tools/capstone_check.py).

The gate enforces the one invariant the x1000 capstone sweeps have
held across rounds 12-14 — per-phase shuffle bytes reproduce within
tolerance, coverage never shrinks, spill-free phases stay spill-free —
while walls stay informational (the adjudication rule). These tests
drive it as a subprocess on synthetic old/new JSON so every verdict
path (BYTES / tolerance pass / SPILL / LOST / PHASE / NEW / wall-noise
pass) is pinned.

Run:  python3 -m pytest tools/test_capstone_check.py -q
(scripts/scale_proof.sh capstone-check runs it automatically first)
"""
import json
import subprocess
import sys
from pathlib import Path

TOOL = str(Path(__file__).resolve().parent / "capstone_check.py")


def cell(sec=10.0, read=10**9, write=10**9, spill=0):
    return {
        "sec": sec,
        "shuffle_read_b": read,
        "shuffle_write_b": write,
        "spill_mem_b": 0,
        "spill_disk_b": spill,
        "gc_ms": 0,
        "cpu_sec": sec,
    }


def doc(queries):
    return {"metric": "capstone", "label": "x1000", "queries": queries}


def run(tmp_path, old, new, *extra):
    op, np_ = tmp_path / "old.json", tmp_path / "new.json"
    op.write_text(json.dumps(doc(old)))
    np_.write_text(json.dumps(doc(new)))
    r = subprocess.run(
        [sys.executable, TOOL, str(op), str(np_), *extra],
        capture_output=True, text=True)
    return r.returncode, r.stdout


def q(build=None, first=None, steady=None):
    out = {}
    if build is not None:
        out["build"] = build
    if first is not None:
        out["first"] = first
    if steady is not None:
        out["steady"] = steady
    return out


def test_identical_bytes_noisy_wall_passes(tmp_path):
    # walls 0.5x and 1.5x on identical bytes: the observed regime — OK
    old = {"c3": q(first=cell(100.0), steady=cell(44.0))}
    new = {"c3": q(first=cell(50.0), steady=cell(66.0))}
    rc, out = run(tmp_path, old, new)
    assert rc == 0
    assert "capstone check OK" in out
    assert "informational" in out


def test_ppm_byte_drift_within_tolerance_passes(tmp_path):
    # n8's observed +3,953 B on 1.013 GB (~4 ppm) must pass the 1% gate
    old = {"n8": q(steady=cell(13.0, read=1013078077, write=0))}
    new = {"n8": q(steady=cell(8.5, read=1013082030, write=0))}
    rc, out = run(tmp_path, old, new)
    assert rc == 0


def test_byte_drift_beyond_tolerance_fails(tmp_path):
    old = {"c3": q(steady=cell(44.0, read=10**9, write=10**9))}
    new = {"c3": q(steady=cell(44.0, read=2 * 10**9, write=10**9))}
    rc, out = run(tmp_path, old, new)
    assert rc == 1
    assert "BYTES" in out


def test_new_spill_on_spill_free_phase_fails(tmp_path):
    old = {"d16": q(steady=cell(73.0))}
    new = {"d16": q(steady=cell(40.0, spill=200 * 1024 * 1024))}
    rc, out = run(tmp_path, old, new)
    assert rc == 1
    assert "SPILL" in out


def test_lost_query_fails(tmp_path):
    old = {"c3": q(steady=cell()), "c6": q(steady=cell())}
    new = {"c3": q(steady=cell())}
    rc, out = run(tmp_path, old, new)
    assert rc == 1
    assert "LOST" in out and "c6" in out


def test_lost_phase_fails(tmp_path):
    old = {"u5": q(build=cell(346.0), steady=cell(42.0))}
    new = {"u5": q(steady=cell(42.0))}
    rc, out = run(tmp_path, old, new)
    assert rc == 1
    assert "PHASE" in out and "build" in out


def test_new_query_and_new_phase_informational(tmp_path):
    old = {"c3": q(steady=cell())}
    new = {"c3": q(build=cell(50.0), steady=cell()), "x9": q(steady=cell())}
    rc, out = run(tmp_path, old, new)
    assert rc == 0
    assert "NEW" in out and "x9" in out and "c3:build" in out
