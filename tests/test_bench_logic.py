"""Host-side logic of bench.py's variance handling (no TPU needed):
the two-pass re-time keeps the better %-of-SoL and reports both passes."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from spada_tpu.config import SpadaConfig  # noqa: E402


def test_second_pass_keeps_better_pct(monkeypatch):
    calls = {"n": 0}

    def fake_stats(fn, args, k=8, trials=3, roundtrip=None):
        calls["n"] += 1
        return 0.001, [0.001]  # pass 2 measures 1.0 ms

    import spada_tpu.utils.timing as timing

    monkeypatch.setattr(timing, "device_time_stats", fake_stats)

    entries = [
        {   # slower first pass: second pass (1.0 ms vs sol 0.8) wins
            "name": "w1", "pct_sol": 40.0, "elapsed_ms": 2.0,
            "pct_sol_belady": 20.0, "effective_gflops": 1.0,
            "_retime": (lambda *a: None, (), {
                "sol_s": 0.0008, "sol_belady_s": 0.0004,
                "mxu_flops": 2e9}),
        },
        {   # faster first pass: keeps its numbers
            "name": "w2", "pct_sol": 95.0, "elapsed_ms": 0.8421,
            "stream_gbps": 700.0,
            "_retime": (lambda *a: None, (), {"sol_s": 0.0008}),
        },
        {"name": "w3", "error": "entry failed: infra"},  # no retime
    ]
    bench._second_pass(entries, SpadaConfig(), rt=0.03)

    assert entries[0]["pct_sol"] == 80.0
    assert entries[0]["elapsed_ms"] == 1.0
    assert entries[0]["pct_sol_belady"] == 40.0
    assert entries[0]["effective_gflops"] == 2000.0
    assert entries[0]["passes"] == [40.0, 80.0]

    assert entries[1]["pct_sol"] == 95.0           # pass 2 (80) lost
    assert entries[1]["elapsed_ms"] == 0.8421
    assert entries[1]["passes"] == [95.0, 80.0]

    assert "passes" not in entries[2]
    assert calls["n"] == 2


def test_cached_workload_roundtrip(tmp_path, monkeypatch):
    """Disk-cached workloads reload exactly and never re-call the builder."""
    import os

    import bench as bmod
    from spada_tpu.io.workloads import banded_csr

    monkeypatch.setattr(bmod, "_CACHE_ROOT", str(tmp_path))
    m1 = bmod._cached_workload(
        "t-wl", lambda: banded_csr(256, 256, bandwidth=16, seed=0,
                                   dtype=np.float32))
    m2 = bmod._cached_workload(
        "t-wl", lambda: (_ for _ in ()).throw(
            AssertionError("builder re-called on cache hit")))
    assert m1.shape == m2.shape
    assert np.array_equal(m1.indptr, m2.indptr)
    assert np.array_equal(m1.indices, m2.indices)
    assert np.array_equal(m1.data, m2.data)
    assert os.path.exists(tmp_path / ".bench_cache" / "v1-t-wl.npz")


def test_spread_ms_clamps_negative():
    assert bench._spread_ms([-0.001, 0.002]) == [0.0, 2.0]
    assert bench._spread_ms([0.001, 0.003]) == [1.0, 3.0]
