"""Benchmark harness statistics (IQR, convergence protocol)."""
import numpy as np

from raytracing_tpu.bench.harness import benchmark, remove_outliers_iqr


def test_iqr_filter_removes_outliers():
    data = np.array([1.0, 1.1, 0.9, 1.05, 0.95, 50.0, -40.0])
    out = remove_outliers_iqr(data)
    assert 50.0 not in out and -40.0 not in out
    assert len(out) == 5


def test_iqr_keeps_uniform_data():
    data = np.full(20, 3.0)
    np.testing.assert_array_equal(remove_outliers_iqr(data), data)


def test_benchmark_converges_and_reports_rate():
    calls = []

    def fn():
        calls.append(1)

    res = benchmark(fn, ray_steps=10_000, trials=5, warmup=2, max_rounds=3)
    assert res.seconds > 0
    assert res.ray_steps_per_sec == 10_000 / res.seconds
    assert res.rounds <= 3
    # warmup + trials*rounds calls
    assert len(calls) == 2 + 5 * res.rounds
