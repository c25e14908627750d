"""Double-word float32 RK4 kernel: f64-grade trajectories at f32 hardware."""
import numpy as np
import pytest

import raytracing_tpu as rt
from raytracing_tpu.kernels.df import df_fisheye_trace


def _f64_truth(ds, steps):
    scen = rt.scenario("fisheye")
    med = rt.analytic_medium("fisheye")
    res = rt.trace("op12", scen, med, delta_s=ds, max_size=steps + 1,
                   mode="metrics", dtype=np.float64,
                   pos0=np.stack([np.ones(2), np.zeros(2)], -1),
                   theta0=np.full(2, np.pi / 2))
    return np.asarray(res.final.pos)[0]


def _df(ds, steps):
    pos = df_fisheye_trace(np.stack([np.ones(128), np.zeros(128)], -1),
                           np.full(128, np.pi / 2), np.float32(ds),
                           steps=steps, block_rays=128, interpret=True)
    return pos[0]


@pytest.mark.parametrize("div,bound", [(300, 2e-7), (1000, 4e-7), (4587, 6e-7)])
def test_df_matches_f64_rk4(div, bound):
    ds = float(np.float32(2 * np.pi / div))
    err = np.linalg.norm(_df(ds, div) - _f64_truth(ds, div))
    assert err < bound, err


@pytest.mark.slow  # heavyweight: deselected by -m 'not slow' (CLAUDE.md smoke tier)
def test_df_meets_north_star_rms():
    """BASELINE.json: RMS trajectory error <= 1e-6 vs the analytic fisheye
    circle, at the benchmark divisor, in pure float32 arithmetic.

    The trajectory is sampled at 10 evenly spaced arc lengths (re-simulated
    prefixes — the kernel keeps no history) and compared against the
    analytic circle at the f32-exact accumulated arc.
    """
    div = 4587
    ds = float(np.float32(2 * np.pi / div))
    errs = []
    for frac in range(1, 11):
        steps = div * frac // 10
        p = _df(ds, steps)
        s = steps * ds
        errs.append(np.linalg.norm(p - [np.cos(s), np.sin(s)]) ** 2)
    rms = float(np.sqrt(np.mean(errs)))
    # measured ~1.2e-7: the 1e-6 north star with ~8x margin
    assert rms < 5e-7, rms


def test_df_beats_plain_f32_kernel():
    """The point of df32: ~4-10x tighter than the Kahan-only plain kernel."""
    from raytracing_tpu.kernels.fused import fused_trace_final

    div = 4587
    ds = np.float32(2 * np.pi / div)
    scen = rt.scenario("fisheye")
    theta0 = np.full(128, np.pi / 2, np.float32)
    pos0 = np.stack([np.ones(128), np.zeros(128)], -1).astype(np.float32)
    plain, *_ = fused_trace_final(pos0, theta0, ds, field="fisheye",
                                  op="op12", steps=div, box=tuple(scen.box),
                                  block_rays=128, interpret=True)
    truth = _f64_truth(float(ds), div)
    err_plain = np.linalg.norm(np.asarray(plain)[0] - truth)
    err_df = np.linalg.norm(_df(float(ds), div) - truth)
    assert err_df < err_plain / 3, (err_df, err_plain)


def test_df_vert_matches_f64_rk4():
    """df32 kernel on the stratified field (k = -2 n u_x)."""
    from raytracing_tpu.kernels.df import df_trace
    scen = rt.scenario("vert")
    med = rt.analytic_medium("vert_heterogeneous")
    # Keep rays well away from the n = 1/(18+2y) pole at y = -9 (the df
    # kernel has no boundary mask; it is a precision path, not a search).
    # The stratified flow amplifies perturbations near ray turning points,
    # so both integrators must start from identical (f32-rounded) launch
    # data; keep rays away from the n = 1/(18+2y) pole at y = -9.
    ds = float(np.float32(0.0193))
    steps = 500
    theta0 = np.linspace(0.5, 1.3, 128).astype(np.float32).astype(np.float64)
    pos0 = np.tile(np.array([[-2.0, -2.0]]), (128, 1))
    pos = df_trace(pos0, theta0, np.float32(ds), steps=steps,
                   field="vert_heterogeneous", block_rays=128, interpret=True)
    import dataclasses
    big = dataclasses.replace(scen, box=(-1e9, 1e9, -1e9, 1e9))  # no exits
    res = rt.trace("op12", big, med, delta_s=ds, max_size=steps + 1,
                   mode="metrics", dtype=np.float64,
                   pos0=pos0, theta0=theta0)
    err = np.linalg.norm(pos - np.asarray(res.final.pos), axis=1)
    assert err.max() < 1e-6, err.max()


def test_df_rejects_unknown_field():
    from raytracing_tpu.kernels.df import df_trace
    with pytest.raises(ValueError, match="df kernel supports"):
        df_trace(np.zeros((128, 2)), np.zeros(128), 0.01, steps=2,
                 field="interface", block_rays=128, interpret=True)


def test_df_segmented_equals_oneshot():
    """Chained resumable df segments == one-shot, bit for bit."""
    from raytracing_tpu.kernels.df import df_trace
    r = 128
    pos0 = np.tile(np.array([[1.0, 0.0]], np.float32), (r, 1))
    theta0 = np.full(r, np.pi / 2.0, np.float32)
    ds = np.float32(2 * np.pi / 100)
    one = df_trace(pos0, theta0, ds, steps=230, field="fisheye",
                   block_rays=128, interpret=True, segment=None)
    seg = df_trace(pos0, theta0, ds, steps=230, field="fisheye",
                   block_rays=128, interpret=True, segment=64)
    np.testing.assert_array_equal(seg, one)
