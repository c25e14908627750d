"""Sweep checkpoint/resume."""
import numpy as np
import pytest

import raytracing_tpu as rt
from raytracing_tpu.parallel import sweep as sw
from raytracing_tpu.utils.checkpoint import SweepCheckpoint

# heavyweight module: segmented chains / sharded meshes / full sweeps /
# interpret-mode kernel parity.  Deselect with -m 'not slow' (CLAUDE.md).
pytestmark = pytest.mark.slow


def test_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "ck.npz")
    ck = SweepCheckpoint(p, meta={"op": "op1"})
    ck.add_chunk(0, {"m": np.arange(4.0)})
    ck.add_chunk(1, {"m": np.arange(4.0) + 10})
    ck2 = SweepCheckpoint(p, meta={"op": "op1"})
    assert ck2.has_chunk(0) and ck2.has_chunk(1)
    out = ck2.assembled(2)
    np.testing.assert_array_equal(out["m"], np.concatenate([np.arange(4.0),
                                                            np.arange(4.0) + 10]))
    assert ck2.assembled(3) is None


def test_checkpoint_rejects_mismatched_sweep(tmp_path):
    p = str(tmp_path / "ck.npz")
    ck = SweepCheckpoint(p, meta={"op": "op1"})
    ck.add_chunk(0, {"m": np.zeros(2)})
    with pytest.raises(ValueError, match="different sweep"):
        SweepCheckpoint(p, meta={"op": "op2"})


def test_sweep_resumes_from_checkpoint(tmp_path):
    scen = rt.scenario("fisheye")
    med = rt.analytic_medium("fisheye")
    divs = np.arange(40.0, 8.0, -1.0)
    ds = 2 * np.pi / divs
    sizes = (divs + 1).astype(np.int64)
    p = str(tmp_path / "sweep.npz")
    kw = dict(n_turns=1, dtype=np.float64, chunk=8, checkpoint=p)
    full = sw.run_candidates("op1", scen, med, ds, sizes - 1,
                             int(sizes.max()), **kw)
    # second run must come purely from the checkpoint: poison the inputs so
    # any recomputation would produce different numbers
    resumed = sw.run_candidates("op1", scen, med, ds * 1.7, sizes - 1,
                                int(sizes.max()), **kw)
    np.testing.assert_array_equal(resumed["closure_pct"], full["closure_pct"])


def test_fused_sweep_checkpoint_resume(tmp_path):
    """The kernel-tier sweep persists candidate chunks and resumes."""
    import raytracing_tpu as rt
    from raytracing_tpu import config
    from raytracing_tpu.parallel.sweep import run_candidates_fused
    scen = rt.scenario("interface")
    ds = config.SIGMA / np.asarray([2.9, 2.8, 2.7, 2.6, 2.5], np.float64)
    sizes = np.ceil(scen.s_max / ds).astype(np.int64) + 1
    path = str(tmp_path / "fsweep.npz")
    full = run_candidates_fused("op8", scen, ds, sizes - 1,
                                int(sizes.max()) - 1, block_rays=128,
                                rays=128, checkpoint=path, chunk=2)
    # resume must reuse the stored chunks (same values, no recompute of
    # finished chunks — verified by matching output exactly)
    again = run_candidates_fused("op8", scen, ds, sizes - 1,
                                 int(sizes.max()) - 1, block_rays=128,
                                 rays=128, checkpoint=path, chunk=2)
    np.testing.assert_array_equal(again["mean_err"], full["mean_err"])
    np.testing.assert_array_equal(again["max_err"], full["max_err"])


def test_trace_checkpoint_resume_bit_identical(tmp_path):
    """A preempted segmented trace resumed from its checkpoint reproduces
    the uninterrupted run bit-for-bit (the saved state IS the kernel
    carry: Kahan compensations, tangent, accumulators, masks)."""
    import raytracing_tpu as rt
    from raytracing_tpu.engine.segmented import segmented_trace

    scen = rt.scenario("fisheye")
    r = 256
    theta0 = (np.pi / 2 + np.linspace(-0.02, 0.02, r)).astype(np.float32)
    pos0 = np.tile(np.array([[1.0, 0.0]], np.float32), (r, 1))
    kw = dict(steps=600, box=tuple(scen.box), field="fisheye", segment=64,
              block_rays=128, interpret=True)
    straight = segmented_trace("op6", pos0, theta0, np.float32(0.01), **kw)

    path = str(tmp_path / "trace.npz")
    # "preempted" run: checkpoint every 2 segments, abandon midway by
    # running a truncated trace with the same checkpoint file
    segmented_trace("op6", pos0, theta0, np.float32(0.01),
                    checkpoint=path, checkpoint_every=2,
                    steps=256, box=tuple(scen.box), field="fisheye",
                    segment=64, block_rays=128, interpret=True)
    # resume to the full length; must pick up at step 256
    resumed = segmented_trace("op6", pos0, theta0, np.float32(0.01),
                              checkpoint=path, checkpoint_every=2, **kw)
    for fa, fb in zip(straight, resumed):
        if fa is not None:
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))

    # mismatched configuration is refused, not silently reused
    with pytest.raises(ValueError, match="different trace"):
        segmented_trace("op1", pos0, theta0, np.float32(0.01),
                        checkpoint=path, **kw)
    with pytest.raises(ValueError, match="compact"):
        segmented_trace("op6", pos0, theta0, np.float32(0.01),
                        checkpoint=str(tmp_path / "x.npz"), compact=True,
                        **kw)


def test_trace_checkpoint_horizon_and_identity_guards(tmp_path):
    """Resume rules the horizon fix introduced: a checkpoint whose final
    segment was limit-clamped holds the state at exactly its old horizon
    and must refuse any other `steps`; an unclamped checkpoint refuses a
    horizon SHORTER than its progress; and the identity meta now pins the
    box and launch fan (a resume adopts the saved carry, so a different
    fan/box would silently hybridize two traces)."""
    import raytracing_tpu as rt
    from raytracing_tpu.engine.segmented import segmented_trace

    scen = rt.scenario("fisheye")
    r = 128
    theta0 = (np.pi / 2 + np.linspace(-0.02, 0.02, r)).astype(np.float32)
    pos0 = np.tile(np.array([[1.0, 0.0]], np.float32), (r, 1))
    base = dict(box=tuple(scen.box), field="fisheye", segment=64,
                block_rays=128, interpret=True, checkpoint_every=1)

    # steps=96 with segment=64: the 2nd segment is clamped (done=128 > 96)
    p1 = str(tmp_path / "clamped.npz")
    done = segmented_trace("op6", pos0, theta0, np.float32(0.01),
                           steps=96, checkpoint=p1, **base)
    with pytest.raises(ValueError, match="COMPLETED 96-step"):
        segmented_trace("op6", pos0, theta0, np.float32(0.01),
                        steps=192, checkpoint=p1, **base)
    # same steps: returns the saved state unchanged
    again = segmented_trace("op6", pos0, theta0, np.float32(0.01),
                            steps=96, checkpoint=p1, **base)
    np.testing.assert_array_equal(np.asarray(done.pos), np.asarray(again.pos))

    # unclamped checkpoint, shorter horizon than its progress: refused
    p2 = str(tmp_path / "long.npz")
    segmented_trace("op6", pos0, theta0, np.float32(0.01),
                    steps=256, checkpoint=p2, **base)
    with pytest.raises(ValueError, match="already integrated"):
        segmented_trace("op6", pos0, theta0, np.float32(0.01),
                        steps=128, checkpoint=p2, **base)

    # different launch fan / box: identity mismatch, named error
    with pytest.raises(ValueError, match="different trace"):
        segmented_trace("op6", pos0, theta0 + np.float32(0.1),
                        np.float32(0.01), steps=256, checkpoint=p2, **base)
    with pytest.raises(ValueError, match="different trace"):
        segmented_trace("op6", pos0, theta0, np.float32(0.01), steps=256,
                        checkpoint=p2, **{**base, "box": (-2.0, 2.0,
                                                          -2.0, 2.0)})


def test_trace_checkpoint_meta_pins_medium_tables(tmp_path):
    """Two stratified media with identical shapes but different samples
    must not share a checkpoint (the meta fingerprints the tables)."""
    import raytracing_tpu as rt
    from raytracing_tpu.engine.segmented import segmented_trace

    y = np.linspace(-1.5, 1.5, 41)
    m1 = rt.stratified_medium_from_samples(1.3 - 0.1 * y * y, y)
    m2 = rt.stratified_medium_from_samples(1.3 - 0.2 * y * y, y)
    r = 128
    theta0 = np.linspace(-0.2, 0.2, r).astype(np.float32)
    pos0 = np.stack([np.zeros(r), np.linspace(-0.5, 0.5, r)],
                    -1).astype(np.float32)
    p = str(tmp_path / "med.npz")
    kw = dict(steps=128, box=(-1e6, 1e6, -1.5, 1.5), segment=64,
              block_rays=128, interpret=True, checkpoint=p,
              checkpoint_every=1)
    segmented_trace("op6", pos0, theta0, np.float32(0.01), medium=m1, **kw)
    with pytest.raises(ValueError, match="different trace"):
        segmented_trace("op6", pos0, theta0, np.float32(0.01), medium=m2,
                        **kw)


def test_segmented_trace_rejects_zero_cadence():
    """compact_every=0 / checkpoint_every=0 / segment=0 used to spin the
    host loop forever; now a named error."""
    import raytracing_tpu as rt
    from raytracing_tpu.engine.segmented import segmented_trace

    scen = rt.scenario("fisheye")
    r = 128
    theta0 = np.full(r, np.pi / 2, np.float32)
    pos0 = np.tile(np.array([[1.0, 0.0]], np.float32), (r, 1))
    for bad in (dict(segment=0), dict(compact=True, compact_every=0),
                dict(checkpoint_every=0)):
        with pytest.raises(ValueError, match=">= 1"):
            segmented_trace("op6", pos0, theta0, np.float32(0.01),
                            steps=64, box=tuple(scen.box), field="fisheye",
                            block_rays=128, interpret=True,
                            **{"segment": 64, **bad})
