#!/usr/bin/env python3
"""Self-test for trend_gate's normalization + adjudication rules.

Synthetic artifact pairs, one assertion per rule:
    python3 tools/test_trend_gate.py        # prints PASS/FAIL per case

Covers (r15): the CPU witness downgrade (ext_busy), the io-probe
downgrade (self-relative median), --strict-env restoring the failure,
the >=20% io-leniency threshold for the st family, and the floor using
the same normalization as the ratio.
"""
import json
import os
import subprocess
import sys
import tempfile

GATE = os.path.join(os.path.dirname(__file__), "trend_gate.py")

BASE = {"metric": "total", "value": 10.0, "unit": "sec",
        "calib_ms": 6400, "calib_end_ms": 6400,
        "calib_io_ms": 400, "calib_io_end_ms": 400}


def run(old, new, *extra):
    with tempfile.TemporaryDirectory() as d:
        po, pn = os.path.join(d, "o.json"), os.path.join(d, "n.json")
        json.dump({**BASE, **old}, open(po, "w"))
        json.dump({**BASE, **new}, open(pn, "w"))
        r = subprocess.run([sys.executable, GATE, po, pn, *extra],
                           capture_output=True, text=True)
        return r.returncode, r.stdout


def case(name, want_exit, got, out):
    ok = got == want_exit
    print(f"{'PASS' if ok else 'FAIL'} {name} (exit {got}, want {want_exit})")
    if not ok:
        print(out)
    return ok


def main():
    results = []

    # 1. plain regression with no witness -> fail
    rc, out = run({"queries": {"q1": 2.0}}, {"queries": {"q1": 4.0}})
    results.append(case("plain 2x regression fails", 1, rc, out))

    # 2. CPU witness: flagged query ran under ext_busy 0.15 (old 0.01)
    #    -> ENV-ADJUDICATED, exit 0
    rc, out = run(
        {"queries": {"q1": 2.0}, "env": {"q1": [0.2, 0.01]}},
        {"queries": {"q1": 4.0}, "env": {"q1": [4.0, 0.15]}})
    results.append(case("ext_busy witness adjudicates", 0, rc, out))
    assert "ENV-ADJUDICATED" in out, out

    # 3. --strict-env disables the downgrade
    rc, out = run(
        {"queries": {"q1": 2.0}, "env": {"q1": [0.2, 0.01]}},
        {"queries": {"q1": 4.0}, "env": {"q1": [4.0, 0.15]}},
        "--strict-env")
    results.append(case("--strict-env restores the failure", 1, rc, out))

    # 4. quiet new run (ext_busy 0.02) -> witness must NOT fire
    rc, out = run(
        {"queries": {"q1": 2.0}, "env": {"q1": [0.2, 0.01]}},
        {"queries": {"q1": 4.0}, "env": {"q1": [0.5, 0.02]}})
    results.append(case("quiet-run flag still fails", 1, rc, out))

    # 5. io witness: probe 180 ms vs run median ~10 ms -> adjudicates
    rc, out = run(
        {"queries": {"q1": 2.0}, "env": {"q1": [0.2, 0.01, 9]}},
        {"queries": {"q1": 4.0, "q2": 1.0, "q3": 1.0},
         "env": {"q1": [0.3, 0.02, 180], "q2": [0.2, 0.0, 9],
                 "q3": [0.2, 0.0, 11]}})
    results.append(case("io-probe witness adjudicates", 0, rc, out))
    assert "io_probe" in out, out

    # 6. io probe elevated but under 3x median -> still fails
    rc, out = run(
        {"queries": {"q1": 2.0}, "env": {"q1": [0.2, 0.01, 9]}},
        {"queries": {"q1": 4.0, "q2": 1.0, "q3": 1.0},
         "env": {"q1": [0.3, 0.02, 20], "q2": [0.2, 0.0, 9],
                 "q3": [0.2, 0.0, 11]}})
    results.append(case("sub-3x io probe does not excuse", 1, rc, out))

    # 7. st-family io leniency: 12% slower probe -> NO leniency
    rc, out = run(
        {"queries": {"st1": 4.0}},
        {"queries": {"st1": 7.6}, "calib_io_ms": 450, "calib_io_end_ms": 450})
    results.append(case("12% io drift grants no st leniency", 1, rc, out))

    # 8. st-family io leniency: 2x slower probe -> normalized, passes
    rc, out = run(
        {"queries": {"st1": 4.0}},
        {"queries": {"st1": 7.6}, "calib_io_ms": 800, "calib_io_end_ms": 800})
    results.append(case("2x io drift normalizes the st family", 0, rc, out))

    # 9. floor uses the normalized time: raw 1.2 s that normalizes to
    #    0.8 s on a slow box sits under the 1.0 s floor -> ignored (a
    #    stable 20 s query keeps the shared-set total in bounds; only
    #    the per-query check is under test)
    rc, out = run(
        {"queries": {"q1": 0.4, "big": 20.0}},
        {"queries": {"q1": 1.2, "big": 20.0},
         "calib_ms": 9600, "calib_end_ms": 9600})
    results.append(case("floor applies post-normalization", 0, rc, out))

    if not all(results):
        sys.exit(1)
    print(f"all {len(results)} cases pass")


if __name__ == "__main__":
    main()
