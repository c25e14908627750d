"""DELTA_S convergence search, sharded over whatever devices exist.

Run:  python examples/delta_s_search.py
"""
import numpy as np

import jax

import raytracing_tpu as rt
from raytracing_tpu.parallel.mesh import make_mesh
from raytracing_tpu.parallel.sweep import delta_s_search

scen = rt.scenario("fisheye")
med = rt.analytic_medium("fisheye")
mesh = make_mesh() if len(jax.devices()) > 1 else None
res = delta_s_search("op4", scen, med, n_turns=10, dtype=np.float32,
                     mesh=mesh, checkpoint="fisheye_sweep.npz")
print(f"swept {len(res.divisors)} candidates; "
      f"selected divisor {res.divisor} -> DELTA_S = {res.delta_s_selected}")
