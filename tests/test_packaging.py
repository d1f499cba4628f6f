"""Packaging + bench-evidence hygiene guards (round-4 VERDICT missing #1,
weak #1/#3).

- The core package must import (and its quickstart surface must work) with
  ONLY the declared core deps — matplotlib/scipy are extras.
- Bench evidence scraping: stale/dirty/red test artifacts must surface as
  `*_stale`, never as ok/passed fields describing a superseded tree.
- The printed bench line must stay inside the driver's 4 KB stdout tail.
"""

import json
import os
import subprocess
import sys

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_core_import_needs_no_extras():
    """`import historymatching_tpu` (and the lazy plotting/oracle gates) must
    not pull matplotlib or scipy: pyproject declares them as extras only.
    Runs in a subprocess with both blocked at the finder level, so a
    top-level import sneaking in fails loudly here rather than in a fresh
    `pip install historymatching_tpu` venv."""
    code = """
import sys

class _Block:
    def find_spec(self, name, path=None, target=None):
        if name.split('.')[0] in ('matplotlib', 'scipy'):
            raise ImportError(name + ' must be optional (extras), not core')
        return None

sys.meta_path.insert(0, _Block())
import historymatching_tpu as hm
assert hm.ResSim is not None and hm.es_mda is not None
print('core-import-ok')
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "core-import-ok" in r.stdout


def test_pyproject_declares_extras():
    with open(os.path.join(REPO, "pyproject.toml")) as f:
        txt = f.read()
    assert "optional-dependencies" in txt
    assert "matplotlib" in txt and "scipy" in txt


def _write(tmp_path, name, **kw):
    with open(os.path.join(tmp_path, name), "w") as f:
        json.dump(kw, f)


def test_tests_evidence_staleness_guard(tmp_path):
    """A test artifact whose sha is dirty or not HEAD-adjacent is reported
    ONLY as *_stale (round-4 weak #1: a stale red CPU_TESTS.json shipped as
    the round's official cpu_tests_ok:false)."""
    tmp = str(tmp_path)
    recent = ["aaa", "bbb", "ccc", "ddd"]
    # fresh + clean -> scraped
    _write(tmp, "CPU_TESTS.json", ok=True, passed=150, sha="bbb")
    out = bench._tpu_tests_fields(parity_dir=tmp, recent=recent)
    assert out == {"cpu_tests_ok": True, "cpu_tests_passed": 150,
                   "cpu_tests_sha": "bbb"}
    # dirty -> stale, no ok/passed scraped
    _write(tmp, "CPU_TESTS.json", ok=False, passed=145, sha="bbb-dirty")
    out = bench._tpu_tests_fields(parity_dir=tmp, recent=recent)
    assert out.get("cpu_tests_stale") is True
    assert "cpu_tests_ok" not in out and "cpu_tests_passed" not in out
    # old sha (not in recent window) -> stale
    _write(tmp, "CPU_TESTS.json", ok=True, passed=150, sha="zzz")
    _write(tmp, "TPU_TESTS.json", ok=True, passed=7, sha="aaa")
    out = bench._tpu_tests_fields(parity_dir=tmp, recent=recent)
    assert out.get("cpu_tests_stale") is True
    assert out.get("tpu_tests_ok") is True  # the fresh one still scrapes


def test_compact_line_fits_tail_window():
    """The printed line must carry the headline fields inside the driver's
    4 KB tail even when the full record is much larger (round-4 weak #3:
    BENCH_r04's tail began mid-rmse_seeds and `value` was lost)."""
    record = {
        "metric": "N=1000 fwd+ES-MDA(4) 64x64 nTime=40 wall-clock (1-chip)",
        "value": 5.41, "unit": "s", "vs_baseline": 1.85,
        "projected_v5e8_s": 0.68, "cpu_tests_ok": True, "tpu_tests_ok": True,
        "parity_ok": True, "parity_n_sweep_ok": True,
        "rmse_seeds": {str(s): [1.0, 0.9] for s in range(64)},
        "ies_rmse_seeds": {str(s): [1.0, 0.9] for s in range(64)},
        "trace_top_ops": {f"op{i}": 0.123 for i in range(40)},
        "parity_n_sweep": {str(n): [1.0, 1.1, 5] for n in range(100, 1100)},
        "padding": ["x" * 50] * 200,  # a hypothetical future bulky field
        "detail_file": "parity/BENCH_DETAIL.json",
    }
    text = bench.compact_line(record)
    assert len(text) <= bench.COMPACT_BUDGET
    line = json.loads(text)
    for k in ("metric", "value", "vs_baseline", "projected_v5e8_s",
              "cpu_tests_ok", "tpu_tests_ok", "parity_ok",
              "parity_n_sweep_ok", "detail_file"):
        assert k in line, k
    for k in bench.BULKY_FIELDS:
        assert k not in line, k


def test_plotting_init_backend_selection(monkeypatch):
    """plotting.init(): headless hosts get Agg; an explicit backend wins
    (reference tools/plotting.py:153-242 auto-detection, CI-testable slice)."""
    import matplotlib

    from historymatching_tpu import plotting

    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    monkeypatch.setattr(sys, "platform", "linux")
    assert plotting.init().lower() == "agg"
    assert plotting.init("pdf").lower() == "pdf"
    matplotlib.use("Agg", force=True)  # restore for the rest of the suite


def test_parity_sweep_gates_on_worst_seed(tmp_path, monkeypatch):
    """parity_n_sweep_ok encodes BOTH criteria: per-N median <= 1.05 AND
    worst seed <= MAX_RATIO_SWEEP (round-4 weak #6: N=384's 1.1005 max rode
    silently inside a median-only flag)."""
    kw = bench.bench_sim_kwargs()
    tmp = str(tmp_path)

    def artifact(name, med, mx, seeds):
        _write(tmp, name, sim_kwargs=kw, ratio_median=med, ratio_max=mx,
               seeds=seeds)

    artifact("PARITY_TPU.json", 1.006, 1.09, [1, 2, 3, 4, 5])
    artifact("PARITY_TPU_N384.json", 1.026, 1.1005, [1, 2, 3, 4, 5])
    monkeypatch.setattr(bench, "PARITY_REFS",
                        os.path.join(tmp, "cpu_f64_refs.json"))
    out = bench._parity_sweep_fields()
    assert out["parity_n_sweep_ok"] is True
    assert out["parity_n_sweep_ratio_max"] == 1.1005
    # a worst seed beyond the documented bound must fail the flag
    artifact("PARITY_TPU_N384.json", 1.026, 1.13, [1, 2, 3, 4, 5])
    out = bench._parity_sweep_fields()
    assert out["parity_n_sweep_ok"] is False
