"""Profiling utilities."""
import numpy as np

from raytracing_tpu.utils.profiling import StepRate, step_timer


def test_step_timer_sink():
    sink = []
    with step_timer(1000, sink=sink):
        sum(range(10000))
    assert len(sink) == 1
    r = sink[0]
    assert isinstance(r, StepRate)
    assert r.ray_steps == 1000 and r.seconds > 0
    assert abs(r.rate - 1000 / r.seconds) < 1e-6


def test_step_timer_prints(capsys):
    with step_timer(500):
        pass
    out = capsys.readouterr().out
    assert "ray-steps/s" in out
