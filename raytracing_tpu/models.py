"""Model zoo: ready-to-trace (scenario, medium) pairings.

The framework's "model families" are the four physics scenarios
(RT_bench.py:104-119, 247-295), each available with its two medium backends.
This is the one-call entry point mirroring what the reference's __main__
assembles from globals (RT_bench.py:1550-1588)::

    model = raytracing_tpu.models.get("fisheye")
    res = rt.trace("HySA", model.scenario, model.medium, delta_s=..., ...)
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from raytracing_tpu import config
from raytracing_tpu.media.medium import analytic_medium


@dataclasses.dataclass(frozen=True)
class Model:
    name: str
    scenario: config.ScenarioConfig
    medium: Any          # AnalyticMedium or GridMedium
    medium_kind: str     # "analytic" | "grid"


MODEL_NAMES = config.SCENARIO_NAMES


def get(name: str, medium: str = "analytic", dtype=np.float32,
        n_turns: int = config.N_TURNS) -> Model:
    """Build a scenario + medium pairing.

    ``medium="grid"`` reproduces the reference's sampled-spline pipeline
    (slower to build, bit-faithful physics); ``"analytic"`` is exact and the
    fast path.
    """
    scen = config.scenario(name, n_turns=n_turns)
    if medium == "grid":
        from raytracing_tpu.media.spline import build_grid_medium

        med = build_grid_medium(scen.field, scen.box, dtype=dtype)
    elif medium == "analytic":
        med = analytic_medium(scen.field)
    else:
        raise ValueError(f"medium must be 'analytic' or 'grid', got {medium!r}")
    return Model(name=scen.name, scenario=scen, medium=med, medium_kind=medium)
