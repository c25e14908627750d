"""Measure per-block ORIENTED windows on the 2-D grid tier (TPU).

The last lever ARCHITECTURE.md names for the coarse-divisor regime:
rectangular windows of the SAME gather-chunk count as the square class
((4,32)...(32,4) for one chunk, (8,32)/(32,8) for two), picked per block
per refresh by `_window_bases` so axis-dominated drift spends the lane
capacity along the motion instead of escalating to the next chunk class.
The kernel is shape-agnostic (per-block tw rides in the SMEM bases row),
so trajectories are bit-identical to square windows — this script only
decides whether orientation buys THROUGHPUT at the two calibrated
regimes (precision divisor 4587, reference coarse divisor 303,
RT_bench.py:1431-1450).

    python benchmarks/oriented_probe.py [--rays N] [--div 303]
                                        [--segs 2,3,4,5,6]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.engine.fast import _as_hermite
from raytracing_tpu.engine.segmented import grid_trace_tiled
from raytracing_tpu.media.spline import build_grid_medium


def _time(fn):
    t0 = time.time()
    res = fn()
    np.asarray(res.pos[:1])     # honest completion barrier
    cold = time.time() - t0
    t0 = time.time()
    res = fn()
    np.asarray(res.pos[:1])
    warm = time.time() - t0
    return cold, warm, res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--div", type=int, default=303)
    ap.add_argument("--segs", default="2,3,4,5,6")
    ap.add_argument("--op", default="op6")
    ap.add_argument("--pack", type=int, default=0,
                    help="run ONLY packed-refresh configs at this P "
                         "(engine/segmented._cells_packed)")
    ap.add_argument("--block", type=int, default=1024,
                    help="rays per kernel block (bigger blocks = fewer "
                         "window copies = fewer refresh bytes, at the "
                         "cost of larger bboxes)")
    args = ap.parse_args(argv)

    scen = rt.scenario("fisheye")
    hm = _as_hermite(build_grid_medium("fisheye", scen.box,
                                       dtype=np.float32))
    r = args.rays
    # device_put ONCE (see row_windows.py: numpy args re-upload ~12 MB
    # through the tunnel per call)
    theta0 = jax.device_put(
        (np.pi / 2 + np.linspace(-0.02, 0.02, r)).astype(np.float32))
    pos0 = jax.device_put(np.tile(np.array([1.0, 0.0], np.float32),
                                  (r, 1)))
    ds = 2 * np.pi / args.div
    steps = args.div            # one turn
    base = dict(steps=steps, box=tuple(scen.box), block_rays=args.block)

    def run(tag, **kw):
        from raytracing_tpu.engine.segmented import LAST_TILED_STATS
        cold, warm, res = _time(lambda: grid_trace_tiled(
            args.op, pos0, theta0, np.float32(ds), hm, **base, **kw))
        g = r * steps / warm / 1e9
        print(json.dumps({"config": tag, "div": args.div,
                          "cold_s": round(cold, 2),
                          "warm_s": round(warm, 3),
                          "gsteps_per_sec": round(g, 3),
                          "replays": LAST_TILED_STATS.get("replays"),
                          "min_segment": LAST_TILED_STATS.get(
                              "min_segment")}), flush=True)
        return res

    segs = [int(s) for s in args.segs.split(",") if s]
    if args.pack:
        # packed-refresh sweep (VERDICT r3 #4): the refresh gather is the
        # largest coarse-regime term (~0.27 of 0.6 s at div 303); P-cell
        # rows recover gather bandwidth (refresh_probe.py: 7.9 -> 13.3 ->
        # 19.9 GB/s at P=1/4/16).  Trajectories are bit-identical at equal
        # segmentation (tests/test_grid_tiled.py), so compare warm times
        # directly against logs_r4/08's unpacked rows.
        P = args.pack
        ref = run("auto (square ladder)")
        res = run(f"auto oriented pack={P}", oriented=True, pack=P)
        print(f"  bit-identical to auto: "
              f"{bool(np.array_equal(np.asarray(ref.pos), np.asarray(res.pos)))}",
              flush=True)
        for seg in segs:
            run(f"packed{P} 1-chunk seg={seg}", oriented=True, pack=P,
                tile_shape=(11, 11), segment=seg)
        for seg in segs:
            run(f"packed{P} 2-chunk seg={seg + 2}", oriented=True, pack=P,
                tile_shape=(16, 16), segment=seg + 2)
        return

    ref = run("auto (square ladder)")
    res = run("auto oriented", oriented=True)
    print(f"  bit-identical to auto: "
          f"{bool(np.array_equal(np.asarray(ref.pos), np.asarray(res.pos)))}",
          flush=True)
    for seg in segs:
        res = run(f"oriented 1-chunk seg={seg}", oriented=True,
                  tile_shape=(11, 11), segment=seg)
        same = bool(np.array_equal(np.asarray(ref.pos),
                                   np.asarray(res.pos)))
        print(f"  bit-identical to auto: {same}", flush=True)
    for seg in segs:
        run(f"oriented 2-chunk seg={seg + 2}", oriented=True,
            tile_shape=(16, 16), segment=seg + 2)


if __name__ == "__main__":
    main()
