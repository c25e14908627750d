"""Fused 3-D Pallas kernel: interpret-mode parity vs the scan tier.

Same testing contract as the 2-D fused kernels: the kernel runs in
interpret mode on CPU and must track engine/trace3d.py's f32 scan within
float-accumulation tolerance (the kernel adds Kahan compensation and
polynomial rotations, so bitwise equality is not expected — and Kahan
should only make positions better).  Kernel ``active`` means "never left
the box" (FusedFinal convention), the scan's means "still integrating":
the map between them is ``exit_step == step budget``.
"""
import numpy as np
import pytest

from raytracing_tpu.engine.trace3d import trace3d
from raytracing_tpu.kernels.fused3d import (FUSED3_OPS, Fused3Final,
                                            fused3d_trace_final)
from raytracing_tpu.media.fields3d import Stratified3D, analytic_medium3

R = 256
BOX = (-2.0, 2.0, -2.0, 2.0, -2.0, 2.0)


def _fan(r=R):
    tilt = np.linspace(0.0, 1.0, r).astype(np.float32)
    pos0 = np.tile([[1.0, 0.0, 0.0]], (r, 1)).astype(np.float32)
    dir0 = np.stack([np.zeros(r, np.float32), np.cos(tilt),
                     np.sin(tilt)], -1).astype(np.float32)
    return pos0, dir0


@pytest.mark.parametrize("op", FUSED3_OPS)
def test_parity_with_scan_tier_fisheye(op):
    pos0, dir0 = _fan()
    div = 300
    ds = np.float32(2 * np.pi / div)
    f = fused3d_trace_final(pos0, dir0, ds, field="fisheye", op=op,
                            steps=div, box=BOX, block_rays=R,
                            interpret=True)
    s = trace3d(op, analytic_medium3("fisheye"), pos0=pos0, dir0=dir0,
                delta_s=float(ds), steps=div, dtype=np.float32,
                mode="metrics", box=BOX)
    np.testing.assert_allclose(np.asarray(f.pos), np.asarray(s.final.pos),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(f.tangent),
                               np.asarray(s.final.unitv), atol=5e-5)
    np.testing.assert_allclose(np.asarray(f.traveltime),
                               np.asarray(s.final.traveltime), atol=5e-5)
    never_left = np.asarray(s.exit_step) == div
    np.testing.assert_array_equal(np.asarray(f.active), never_left)


def test_boundary_exit_parity_vert():
    """Rays leaving a tight box freeze; activity maps to the scan's exits
    (boundary-roundoff jitter may flip isolated lanes)."""
    r = 256
    th = np.linspace(0.1, 1.2, r)
    pos0 = np.zeros((r, 3), np.float32)
    dir0 = np.stack([np.cos(th) * 0.8, np.sin(th), np.cos(th) * 0.6],
                    -1).astype(np.float32)
    box = (-1.0, 3.0, -2.5, 1.0, -1.0, 3.0)
    steps, ds = 400, np.float32(0.02)
    f = fused3d_trace_final(pos0, dir0, ds, field="vert_heterogeneous",
                            op="op6", steps=steps, box=box, block_rays=r,
                            interpret=True)
    s = trace3d("op6", Stratified3D(
        __import__("raytracing_tpu").analytic_medium("vert_heterogeneous")),
        pos0=pos0, dir0=dir0, delta_s=float(ds), steps=steps,
        dtype=np.float32, mode="metrics", box=box)
    never_left = np.asarray(s.exit_step) == steps
    agree = np.asarray(f.active) == never_left
    assert agree.mean() > 0.99
    d = np.abs(np.asarray(f.pos)[agree] - np.asarray(s.final.pos)[agree])
    assert d.max() < 5e-5
    assert np.any(~never_left)          # the box actually clipped rays


def test_interface_field_parity():
    """The interface sigmoid twin (the only exp/THCK_PARAM field) tracks
    the scan tier too — a regression here would otherwise ship silently."""
    import raytracing_tpu as rt

    r = 256
    th = np.linspace(0.1, 1.2, r)
    pos0 = np.stack([np.full(r, -2.0), np.zeros(r), np.zeros(r)],
                    -1).astype(np.float32)
    dir0 = np.stack([np.cos(th) * 0.9, np.sin(th), np.cos(th) * 0.436],
                    -1).astype(np.float32)
    box = (-2.5, 20.0, -2.0, 4.0, -10.0, 10.0)
    steps, ds = 300, np.float32(0.02)
    f = fused3d_trace_final(pos0, dir0, ds, field="interface", op="op6",
                            steps=steps, box=box, block_rays=r,
                            interpret=True)
    s = trace3d("op6", Stratified3D(rt.analytic_medium("interface")),
                pos0=pos0, dir0=dir0, delta_s=float(ds), steps=steps,
                dtype=np.float32, mode="metrics", box=box)
    np.testing.assert_allclose(np.asarray(f.pos), np.asarray(s.final.pos),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(f.traveltime),
                               np.asarray(s.final.traveltime), atol=5e-5)


def test_step_limit_padding():
    """step_limit freezes rays mid-kernel: one compiled program, shorter
    effective trace — equals a kernel compiled at the short length."""
    pos0, dir0 = _fan()
    ds = np.float32(2 * np.pi / 300)
    a = fused3d_trace_final(pos0, dir0, ds, field="fisheye", op="op6",
                            steps=300, box=BOX, block_rays=R,
                            interpret=True, step_limit=150)
    b = fused3d_trace_final(pos0, dir0, ds, field="fisheye", op="op6",
                            steps=150, box=BOX, block_rays=R,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.traveltime),
                                  np.asarray(b.traveltime))


def test_named_errors():
    pos0, dir0 = _fan()
    kw = dict(steps=8, box=BOX, block_rays=R, interpret=True)
    with pytest.raises(ValueError, match="fields"):
        fused3d_trace_final(pos0, dir0, 0.01, field="warp", op="op6", **kw)
    with pytest.raises(ValueError, match="ops"):
        fused3d_trace_final(pos0, dir0, 0.01, field="fisheye", op="op5",
                            **kw)
    with pytest.raises(ValueError, match="box"):
        fused3d_trace_final(pos0, dir0, 0.01, field="fisheye", op="op6",
                            steps=8, box=BOX[:4], block_rays=R,
                            interpret=True)
    with pytest.raises(ValueError, match="multiple"):
        fused3d_trace_final(pos0[:100], dir0[:100], 0.01, field="fisheye",
                            op="op6", **kw)
    assert isinstance(
        fused3d_trace_final(pos0, dir0, 0.01, field="fisheye", op="op6",
                            **kw), Fused3Final)


def test_fast_trace3_dispatch():
    """fast_trace3 (engine/fast.py): analytic fisheye routes to the fused
    3-D kernel, a Custom3D falls back to the scan tier, both agree, and
    ragged batches are padded/truncated transparently."""
    from raytracing_tpu.engine.fast import fast_trace3
    from raytracing_tpu.media.fields3d import Custom3D

    pos0, dir0 = _fan()
    med = analytic_medium3("fisheye")
    kw = dict(pos0=pos0, dir0=dir0, delta_s=0.02, steps=200, box=BOX,
              block_rays=128)
    res, eng = fast_trace3("op6", med, **kw)
    assert eng == "fused3d"
    t = trace3d("op6", med, pos0=pos0, dir0=dir0, delta_s=0.02, steps=200,
                box=BOX, mode="metrics")
    np.testing.assert_allclose(np.asarray(res.pos),
                               np.asarray(t.final.pos), atol=5e-6)
    # scan fallback keeps the same result type
    cm = Custom3D(lambda x, y, z: 1.0 + 0.0 * x)
    res2, eng2 = fast_trace3("op6", cm, **kw)
    assert eng2 == "scan3d" and isinstance(res2, type(res))
    # ragged batch: 100 rays pad to the 128 block and come back as 100
    res3, eng3 = fast_trace3("op6", med, pos0=pos0[:100], dir0=dir0[:100],
                             delta_s=0.02, steps=200, box=BOX,
                             block_rays=128)
    assert eng3 == "fused3d" and res3.pos.shape == (100, 3)
    np.testing.assert_array_equal(np.asarray(res3.pos),
                                  np.asarray(res.pos)[:100])
    with pytest.raises(ValueError, match="box"):
        fast_trace3("op6", med, pos0=pos0, dir0=dir0, delta_s=0.02,
                    steps=8, box=BOX[:4])
