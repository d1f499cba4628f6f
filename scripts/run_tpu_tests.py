#!/usr/bin/env python
"""Run the on-hardware kernel suite (tests_tpu/) and record an auditable
artifact (round-2 VERDICT weak #7 / item 6: on-chip verification previously
left no trace of having run, at which commit, with what result).

    python scripts/run_tpu_tests.py

Writes parity/TPU_TESTS.json with the git sha, pass/fail counts, and
duration; bench.py folds `tpu_tests_ok` / `tpu_tests_sha` into its JSON
line so every benchmarked round carries fresh on-hardware evidence.

`ok` requires exit code 0 AND at least one test actually PASSING — an
all-skipped run (e.g. the TPU tunnel absent, tests_tpu/conftest.py skips
everything) is recorded as ok=false, never as a silent green.
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "parity", "TPU_TESTS.json")


def main():
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests_tpu/", "-q", "--tb=line"],
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
    # Evidence artifacts the refresh pipeline itself (re)writes are excluded
    # from the dirty check (they are necessarily uncommitted mid-refresh);
    # any OTHER uncommitted change forces ok=false — see run_cpu_tests.py.
    status = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                            capture_output=True, text=True).stdout
    evidence = ("parity/CPU_TESTS.json", "parity/TPU_TESTS.json",
                "parity/BENCH_DETAIL.json")
    dirty = bool([ln for ln in status.splitlines()
                  if ln.strip() and not any(e in ln for e in evidence)])
    green = bool(proc.returncode == 0 and passed > 0 and failed == 0)
    out = dict(
        ok=bool(green and not dirty),
        passed=passed, failed=failed, skipped=skipped,
        duration_s=round(dur, 1),
        sha=sha + ("-dirty" if dirty else ""),
        # `sha` pins the TREE the tests ran on; committing this artifact
        # necessarily creates a child commit, so the artifact's sha is
        # always the PARENT of the commit that adds it (round-3 VERDICT
        # weak #7: the bench's tpu_tests_sha can never equal the bench's
        # own commit — by construction, not staleness).
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
