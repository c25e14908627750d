"""Pallas fisheye kernel vs the jnp engine (interpret mode on CPU)."""
import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.engine import oracles
from raytracing_tpu.kernels.fisheye import fisheye_trace_final


def test_pallas_fisheye_matches_engine():
    R = 256
    div = 97
    steps = div  # one turn, n_turns=1 with reference's div+1 sizing
    ds = np.float32(2 * np.pi / div)
    theta0 = np.full(R, np.pi / 2.0, np.float32)
    pos0 = np.stack([np.ones(R), np.zeros(R)], -1).astype(np.float32)

    pos, tt = fisheye_trace_final(pos0, theta0, ds, steps=steps,
                                  block_rays=256, interpret=True)

    scen = rt.scenario("fisheye")
    med = rt.analytic_medium("fisheye")
    res = rt.trace("op1", scen, med, delta_s=ds, max_size=steps + 1,
                   mode="metrics", dtype=np.float32, pos0=pos0, theta0=theta0)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(res.final.pos),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(tt), np.asarray(res.final.traveltime),
                               atol=5e-5)


def test_pallas_fisheye_closure():
    R = 256
    div = 300
    ds = np.float32(2 * np.pi / div)
    theta0 = np.full(R, np.pi / 2.0, np.float32)
    pos0 = np.stack([np.ones(R), np.zeros(R)], -1).astype(np.float32)
    pos, _ = fisheye_trace_final(pos0, theta0, ds, steps=div,
                                 block_rays=256, interpret=True)
    closure = 100 * np.linalg.norm(np.asarray(pos)[0] - [1, 0]) / (2 * np.pi)
    assert closure < 0.1, closure


def test_runner_pipeline_results_identical():
    """make_fisheye_runner(pipeline=k) returns the same final positions as
    single-shot — the k queued launches are identical programs; only the
    completion-barrier placement differs (bench.py sustained protocol)."""
    from raytracing_tpu.kernels import fisheye as fk

    calls = []
    orig = fk.fisheye_trace_final

    def counting(*a, **kw):
        calls.append(1)
        return orig(*a, interpret=True, **kw)

    fk.fisheye_trace_final, run = counting, None
    try:
        run = fk.make_fisheye_runner(256, 64, 1, block_rays=256)
        p1 = np.asarray(run())
        n1 = len(calls)
        p3 = np.asarray(run(3))
        assert len(calls) - n1 == 3
        np.testing.assert_array_equal(p1, p3)
    finally:
        fk.fisheye_trace_final = orig
