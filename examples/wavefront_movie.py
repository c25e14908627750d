"""Reproduce the reference's wavefront movie for the stratified scenario.

Run anywhere (CPU is fine):  python examples/wavefront_movie.py
Writes wavefront_propagation.mp4 (or .gif without ffmpeg).
"""
import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.calibrated import calibrated
from raytracing_tpu.viz import plots

scen = rt.scenario("vert")
med = rt.analytic_medium("vert_heterogeneous")
ds, _ = calibrated("op6", "vert")
res = rt.trace("HySA", scen, med, delta_s=ds, dtype=np.float64)

_, path = plots.animate_wavefronts(res, scen, save="wavefront_propagation.mp4")
print("wrote", path)
plots.wavefront_report(res, travel_times=[0.1, 0.3, 0.5])
