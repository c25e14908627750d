"""Calibrated DELTA_S tables (RT_bench.py:1408-1460).

Per-algorithm step sizes measured offline by the reference author on a grid
of SIGMA/3; these are the framework's accuracy/cost fixtures (SURVEY.md 2.13).
"""
from __future__ import annotations

from raytracing_tpu.config import SIGMA

#: interface / vert-heterogeneous scenarios: DELTA_S = SIGMA / divisor
#: (RT_bench.py:1413-1430)
INTERFACE_VERT_DIVISOR = {
    "op1": 38.64, "op2": 38.37, "op3": 2.34, "op4": 2.53, "op5": 2.53,
    "op6": 2.55, "op7": 30.05, "op8": 2.74, "op9": 2.74,
}

#: fisheye: number of unit-circle segments, benchmark set — steps matched to
#: the interface scenario's calibrated lengths (RT_bench.py:1431-1450)
FISHEYE_DIVISOR = {
    "op1": 4587, "op2": 4556, "op3": 278, "op4": 300, "op5": 300,
    "op6": 303, "op7": 3567, "op8": 325, "op9": 325,
}

#: fisheye: alternative set calibrated for <= 5 % closure error over N=10
#: turns (RT_bench.py:1444 comment)
FISHEYE_DIVISOR_N10 = {
    "op1": 149, "op2": 169, "op3": 182, "op4": 179, "op5": 179,
    "op6": 182, "op7": 191, "op8": 179, "op9": 179,
}

#: anisotropic scenario (RT_bench.py:1452-1455)
ANISO_DIVISOR = {"op10": 2.53, "op11": 2.74}


def calibrated(op_name: str, scenario_name: str, fisheye_set: str = "bench"):
    """Return (delta_s, fisheye_divisor_or_None) for an op/scenario pair."""
    if scenario_name == "fisheye":
        table = FISHEYE_DIVISOR if fisheye_set == "bench" else FISHEYE_DIVISOR_N10
        div = table[op_name]
        import numpy as np
        return 2.0 * np.pi / div, div
    if scenario_name == "aniso":
        return SIGMA / ANISO_DIVISOR[op_name], None
    return SIGMA / INTERFACE_VERT_DIVISOR[op_name], None


def calibrated_with_fallback(op_name: str, scenario_name: str,
                             fisheye_set: str = "bench"):
    """Calibrated step with the extension-op fallback chain.

    Extension ops borrow their base op's entry (op12 -> op8, opNn -> opN);
    combos the tables lack fall back to the 2nd-order-Taylor entry of the
    scenario (op8, or op11 on the aniso table, which only has op10/op11 —
    RT_bench.py:1452-1455).  This is the ONE resolution policy shared by the
    model zoo, CLI, and serving layer; it never raises for a known scenario.
    """
    base = "op8" if op_name == "op12" else op_name.rstrip("n")
    for candidate in (base, "op8", "op11"):
        try:
            return calibrated(candidate, scenario_name, fisheye_set)
        except KeyError:
            continue
    raise KeyError(f"no calibrated entry resolvable for {op_name!r} on "
                   f"{scenario_name!r}")
