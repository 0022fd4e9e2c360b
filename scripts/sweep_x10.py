#!/usr/bin/env python3
"""sf1-equivalent overfit sweep driver (driver-side tooling).

Runs scripts/check.py once PER QUERY against a graft.Verify dump made
at target/scale/x10, with a wall-clock guard per oracle, so every
tractable oracle gets hash-checked and the intractable tail is
recorded as timed-out instead of hanging the sweep.

Usage: python3 scripts/sweep_x10.py <sfDir> <verifyOutDir> [timeoutSec]

The hard-exclude list is the deliberately quadratic oracle set (exact
brute-force twins: all-pairs cosine / set-similarity / edit-distance /
within-cell semantic) — their losslessness is construction-
independently gate-checked at sf0.01/sf0.1 every verify run; at x10
row counts they are O(n^2) by design and excluded up front.
"""
import json
import subprocess
import sys
import time

HARD_EXCLUDE = {
    "cosine_pairs", "ann_lsh_pairs",
    "jaccard_prefix_join", "jaccard_probe",
    "containment_join", "containment_probe",
    "edit_distance_join", "edit_distance_probe",
    "semdedup", "semdedup_probe", "semdedup_greedy",
}


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 240
    names = sorted(json.load(open(f"{outdir}/oracle_sql.json")))
    res = {}
    for n in names:
        if n in HARD_EXCLUDE:
            res[n] = ("excluded", 0.0)
            print(f"EXCL {n} (quadratic oracle by design)", flush=True)
            continue
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "scripts/check.py", sfdir, outdir, n],
                capture_output=True, text=True, timeout=timeout)
            dt = time.time() - t0
            ok = p.returncode == 0 and "ALL GREEN" in p.stdout
            res[n] = ("pass" if ok else "FAIL", dt)
            print(("ok   " if ok else "FAIL ") + f"{n} {dt:.1f}s",
                  flush=True)
            if not ok:
                print(p.stdout[-600:], flush=True)
        except subprocess.TimeoutExpired:
            res[n] = ("timeout", float(timeout))
            print(f"TIME {n} >{timeout}s", flush=True)
    n_pass = sum(1 for s, _ in res.values() if s == "pass")
    n_fail = sum(1 for s, _ in res.values() if s == "FAIL")
    n_to = sum(1 for s, _ in res.values() if s == "timeout")
    n_ex = sum(1 for s, _ in res.values() if s == "excluded")
    print(f"\nSWEEP: {n_pass} pass / {n_fail} FAIL / {n_to} timeout / "
          f"{n_ex} excluded / {len(names)} total")
    if n_to:
        print("timeouts:", " ".join(
            n for n, (s, _) in sorted(res.items()) if s == "timeout"))
    if n_fail:
        print("FAILURES:", " ".join(
            n for n, (s, _) in sorted(res.items()) if s == "FAIL"))
    # timeouts are NOT green: intractable oracles are hard-excluded up
    # front, so an unexpected timeout means a plan/oracle regression
    # that was never hash-checked — the exit code must say so
    if n_fail or n_to:
        sys.exit(1)


if __name__ == "__main__":
    main()
