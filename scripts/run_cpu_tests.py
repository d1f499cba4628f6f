#!/usr/bin/env python
"""Run the full CPU suite (tests/) and record an auditable artifact
(round-3 ADVICE: the "full CPU suite re-run: N passed" claim had no
committed evidence, unlike the on-chip parity/TPU_TESTS.json).

    python scripts/run_cpu_tests.py

Writes parity/CPU_TESTS.json with the git sha, pass/fail counts, and
duration — same conventions as run_tpu_tests.py: `ok` requires exit code 0,
at least one PASS, and zero failures; the artifact itself is excluded from
the dirty-sha check (it is necessarily uncommitted while being refreshed),
and its sha pins the PARENT of the commit that adds it.
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "parity", "CPU_TESTS.json")


def main():
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=line"],
        cwd=REPO, capture_output=True, text=True,
    )
    dur = time.time() - t0
    tail = proc.stdout[-4000:]
    sys.stdout.write(tail)

    def count(label):
        m = re.search(rf"(\d+) {label}", tail)
        return int(m.group(1)) if m else 0

    passed, failed, skipped = count("passed"), count("failed"), count("skipped")
    sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                         capture_output=True, text=True).stdout.strip()
    status = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                            capture_output=True, text=True).stdout
    # Evidence artifacts the refresh pipeline itself (re)writes are excluded
    # from the dirty check — refreshing CPU+TPU evidence back-to-back before
    # ONE commit must record both as clean. Any OTHER uncommitted change
    # makes the run untrustworthy as round evidence: ok is forced false
    # (round-4 ADVICE: a '-dirty' red artifact shipped as the official
    # record) and bench.py's staleness guard refuses to scrape it anyway.
    evidence = ("parity/CPU_TESTS.json", "parity/TPU_TESTS.json",
                "parity/BENCH_DETAIL.json")
    dirty = bool([ln for ln in status.splitlines()
                  if ln.strip() and not any(e in ln for e in evidence)])
    green = bool(proc.returncode == 0 and passed > 0 and failed == 0)
    out = dict(
        ok=bool(green and not dirty),
        passed=passed, failed=failed, skipped=skipped,
        duration_s=round(dur, 1),
        invocation="python -m pytest tests/ -q (8 virtual CPU devices, f64 — conftest.py)",
        sha=sha + ("-dirty" if dirty else ""),
        sha_convention="parent-of-committing-commit",
        timestamp=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    )
    if green and dirty:
        out["ok_reason"] = "suite green but tree dirty: not round evidence"
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"wrote {OUT}")
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
