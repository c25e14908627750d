"""Sweep checkpoint/resume."""
import numpy as np
import pytest

import raytracing_tpu as rt
from raytracing_tpu.parallel import sweep as sw
from raytracing_tpu.utils.checkpoint import SweepCheckpoint


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
