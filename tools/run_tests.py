#!/usr/bin/env python
"""CI test runner: the full suite in process-isolated groups.

A single `pytest tests/ -q` process accumulates XLA compile-cache memory
across ~200 tests and segfaulted at ~88% on the 2-vCPU/8-GB dev host
(VERDICT r4 weak #7). This runner splits the test files into NGROUPS
serial pytest processes — each group's compile arena dies with its
process — and fails if any group fails.

Usage: python tools/run_tests.py  [extra pytest args...]
"""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
NGROUPS = 4

# The few heavyweight files (multi-minute XLA compiles / 8-device meshes)
# are pinned to separate groups so no group concentrates the memory load.
HEAVY = [
    "test_sharded_mapper.py",
    "test_tsdf_color_pallas.py",
    "test_distributed.py",
    "test_dataset_replay.py",
]


def main() -> int:
    files = sorted(p.name for p in (REPO / "tests").glob("test_*.py"))
    groups = [[] for _ in range(NGROUPS)]
    for i, name in enumerate(h for h in HEAVY if h in files):
        groups[i % NGROUPS].append(name)
    rest = [f for f in files if f not in HEAVY]
    # Round-robin the rest (alphabetical spread keeps kernel-test files —
    # the compile-heavy ones — from clustering).
    for i, name in enumerate(rest):
        groups[i % NGROUPS].append(name)
    extra = sys.argv[1:]
    rc_all = 0
    for gi, group in enumerate(groups):
        if not group:
            continue
        cmd = [sys.executable, "-m", "pytest", "-q", *extra,
               *(f"tests/{f}" for f in group)]
        print(f"--- group {gi + 1}/{NGROUPS}: {len(group)} files ---",
              flush=True)
        rc = subprocess.run(cmd, cwd=REPO).returncode
        if rc == 5:  # no tests collected in this group — not a failure
            rc = 0
        if rc:
            print(f"group {gi + 1} FAILED (rc {rc})", flush=True)
            rc_all = rc
    print("ALL GROUPS PASSED" if rc_all == 0 else "SUITE FAILED",
          flush=True)
    return rc_all


if __name__ == "__main__":
    raise SystemExit(main())
