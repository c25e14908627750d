"""3-D eigenrays: two-parameter boundary-value solving with the exact Q.

The 3-D twin of :mod:`engine.eigenray`.  A receiver in 3-D is hit by
tuning TWO launch angles, so bracketing becomes seeding (local minima of
the miss over a launch-direction grid) and the scalar Newton becomes a
2x2 solve — whose Jacobian is free and exact: with ``full_history``
tangents from :func:`engine.dynamic3d.trace_dynamic3`, the derivative of
the crossing-plane miss ``m = (y - yr, z - zr)`` w.r.t. the two launch
angles is

    M[i, j] = dpos_i/da_j - dpos_x/da_j * (u_i / u_x),   i in {y, z}

(the along-ray component cancels through the crossing-time adjustment,
exactly as the 2-D solver's ``q / cos(angle)`` — engine/eigenray.py).

Stages:

1. one dynamic fan over an (alpha, beta) grid of directions around
   ``center_dir``; for every receiver and range-crossing ordinal, grid
   cells that locally minimize |m|^2 seed one candidate each (multipath =
   several minima; arrivals finer than the grid pitch, or whose seed sits
   on the fan edge, are not found — widen/densify the fan);
2. damped Gauss-Newton on all candidates of all receivers at once, one
   batched dynamic trace per iteration, steps clamped to the grid pitch;
3. final evaluation: travel time, |det Q| amplitude, KMAH and residual
   miss per arrival.  The result duck-types :class:`engine.eigenray.
   Eigenrays` where it matters, so ``pressure`` / ``coherent_tl`` /
   ``incoherent_tl`` reduce 3-D arrivals unchanged.

Same precision note as 2-D: the Newton floor is the landing surface's
noise — build sampled media float64 for eigenray work.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np

from raytracing_tpu.engine.dynamic3d import (DYN3_COLS, DYN3_FULL_COLS,
                                             _transverse_frame,
                                             spreading_amplitude3,
                                             trace_dynamic3)

_X, _Y, _Z = 0, 1, 2
_TT = DYN3_COLS.index("traveltime")
_N = DYN3_COLS.index("n")
_DETQ = DYN3_COLS.index("detq")
_KMAH = DYN3_COLS.index("kmah")
_U = DYN3_FULL_COLS.index("ux")
_DPA = DYN3_FULL_COLS.index("dpax")
_DPB = DYN3_FULL_COLS.index("dpbx")


class Eigenrays3(NamedTuple):
    """3-D arrivals, flat over (receiver, path); sorted by receiver then
    travel time.  Field names match the 2-D :class:`Eigenrays` where the
    TL reductions read them."""

    receiver: Any     # (E,) int32
    dir0: Any         # (E, 3) launch direction of the arrival
    traveltime: Any   # (E,)
    miss: Any         # (E,) residual |(y, z) - receiver| at its range
    detq: Any         # (E,) paraxial det Q at the receiver
    kmah: Any         # (E,) int32
    amplitude: Any    # (E,) point-source spherical-spreading amplitude
    n: Any            # (E,)
    n0: Any           # (E,)
    converged: Any    # (E,) bool

    def for_receiver(self, i: int) -> "Eigenrays3":
        m = self.receiver == i
        return Eigenrays3(*[np.asarray(f)[m] for f in self])


def _crossings3(hist: np.ndarray, last: int, xr: float):
    """(m, C) interpolated crossing rows of the range plane ``x == xr``."""
    x = hist[: last + 1, _X]
    d = x - xr
    hit = np.where(d[:-1] * d[1:] < 0)[0]
    if hit.size == 0:
        return np.empty((0, hist.shape[1]))
    frac = (d[hit] / (x[hit] - x[hit + 1]))[:, None]
    out = hist[hit] + frac * (hist[hit + 1] - hist[hit])
    out[:, _KMAH] = hist[hit, _KMAH]
    return out


def _grid_dirs(center, a, b):
    import jax.numpy as jnp
    u0 = np.asarray(center, np.float64)
    u0 = u0 / np.linalg.norm(u0)
    e1, e2 = (np.asarray(v) for v in _transverse_frame(
        jnp.asarray(u0[None, :])))
    d = (u0[None, None, :] + a[:, None, None] * e1 + b[None, :, None] * e2)
    return (d / np.linalg.norm(d, axis=-1, keepdims=True),
            e1[0], e2[0])


def find_eigenrays3(method: str, medium, *, source, receivers, delta_s,
                    max_size: int, box=None, center_dir=None,
                    fan=(-0.3, 0.3, 25, -0.3, 0.3, 25), iters: int = 12,
                    tol: float = 1e-9) -> Eigenrays3:
    """Every fan-resolved 3-D ray path from ``source`` to each receiver.

    ``fan`` = (a_lo, a_hi, n_a, b_lo, b_hi, n_b): the launch-direction
    grid around ``center_dir`` (default: from the source toward the mean
    receiver).  See the module docstring for the algorithm and its
    resolution caveats.
    """
    source = np.asarray(source, np.float64)
    receivers = np.atleast_2d(np.asarray(receivers, np.float64))
    if center_dir is None:
        center_dir = receivers.mean(0) - source
    a_lo, a_hi, n_a, b_lo, b_hi, n_b = fan
    a = np.linspace(a_lo, a_hi, int(n_a))
    b = np.linspace(b_lo, b_hi, int(n_b))
    pitch = max((a_hi - a_lo) / max(int(n_a) - 1, 1),
                (b_hi - b_lo) / max(int(n_b) - 1, 1))
    dirs, _, _ = _grid_dirs(center_dir, a, b)
    dirs_flat = dirs.reshape(-1, 3)

    def run(dir_batch, full):
        pos0 = np.tile(source, (len(dir_batch), 1))
        res = trace_dynamic3(method, medium, pos0=pos0, dir0=dir_batch,
                             delta_s=delta_s, steps=int(max_size), box=box,
                             mode="history", full_history=full)
        return np.asarray(res.history), np.asarray(res.exit_step)

    hist, last = run(dirs_flat, full=False)

    # --- seed scan: grid-local minima of the miss per (receiver, ordinal)
    cand_dir, cand_rec, cand_ord = [], [], []
    for ri, (xr, yr, zr) in enumerate(receivers):
        per_ray = [_crossings3(hist[:, r], int(last[r]), xr)
                   for r in range(hist.shape[1])]
        k_max = max((len(c) for c in per_ray), default=0)
        for k in range(k_max):
            m2 = np.full((int(n_a), int(n_b)), np.inf)
            for r, c in enumerate(per_ray):
                if k < len(c):
                    m2[np.unravel_index(r, (int(n_a), int(n_b)))] = (
                        (c[k, _Y] - yr) ** 2 + (c[k, _Z] - zr) ** 2)
            # interior nodes beating their 4-neighborhood seed a candidate
            for i in range(1, int(n_a) - 1):
                for j in range(1, int(n_b) - 1):
                    v = m2[i, j]
                    if not np.isfinite(v):
                        continue
                    if (v <= m2[i - 1, j] and v <= m2[i + 1, j]
                            and v <= m2[i, j - 1] and v <= m2[i, j + 1]):
                        cand_dir.append(dirs[i, j])
                        cand_rec.append(ri)
                        cand_ord.append(k)
    if not cand_dir:
        z = np.empty(0)
        zi = np.empty(0, np.int32)
        return Eigenrays3(zi, np.empty((0, 3)), z, z, z, zi, z, z, z,
                          np.empty(0, bool))

    u = np.asarray(cand_dir, np.float64)
    rec = np.asarray(cand_rec, np.int32)
    ordk = np.asarray(cand_ord, np.int32)
    xr = receivers[rec, 0]
    tgt = receivers[rec, 1:3]

    def pick(c, j):
        # follow the candidate's seeded crossing ORDINAL (each ordinal is
        # its own landing surface); nearest-miss picking could hop to a
        # different crossing of a looping path mid-polish —
        # engine/eigenray.py has the same rule
        return c[min(int(ordk[j]), len(c) - 1)]

    # --- damped Gauss-Newton, all candidates in one trace per iteration --
    import jax.numpy as jnp
    miss = np.full(len(u), np.inf)
    for _ in range(int(iters)):
        h, l = run(u, full=True)
        delta = np.zeros((len(u), 2))
        for j in range(len(u)):
            c = _crossings3(h[:, j], int(l[j]), xr[j])
            if len(c) == 0:
                miss[j] = np.inf
                continue
            cj = pick(c, j)
            m = cj[[_Y, _Z]] - tgt[j]
            miss[j] = np.linalg.norm(m)
            uc = cj[_U:_U + 3]
            dpa = cj[_DPA:_DPA + 3]
            dpb = cj[_DPB:_DPB + 3]
            ux = uc[0] if abs(uc[0]) > 1e-9 else np.copysign(1e-9, uc[0])
            M = np.array([
                [dpa[1] - dpa[0] * uc[1] / ux, dpb[1] - dpb[0] * uc[1] / ux],
                [dpa[2] - dpa[0] * uc[2] / ux, dpb[2] - dpb[0] * uc[2] / ux]])
            det = M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0]
            if abs(det) > 1e-12 * (np.abs(M).max() ** 2 + 1e-30):
                d = -np.linalg.solve(M, m)
            else:               # near-caustic: damped gradient step
                d = -M.T @ m / (np.sum(M * M) + 1e-30)
            # clamp to one grid pitch: seeds are at most a cell away
            nrm = np.linalg.norm(d)
            if nrm > pitch:
                d *= pitch / nrm
            delta[j] = d
        if np.nanmax(np.where(np.isinf(miss), np.nan, miss),
                     initial=0.0) < tol and np.all(np.isfinite(miss)):
            break
        e1c, e2c = (np.asarray(v) for v in _transverse_frame(jnp.asarray(u)))
        u = u + delta[:, :1] * e1c + delta[:, 1:] * e2c
        u /= np.linalg.norm(u, axis=1, keepdims=True)

    # --- final evaluation --------------------------------------------------
    h, l = run(u, full=True)
    rows = np.zeros((len(u), h.shape[2]))
    ok = np.zeros(len(u), bool)
    for j in range(len(u)):
        c = _crossings3(h[:, j], int(l[j]), xr[j])
        if len(c):
            rows[j] = pick(c, j)
            ok[j] = True
    miss = np.where(ok, np.linalg.norm(rows[:, [_Y, _Z]] - tgt, axis=1),
                    np.inf)
    n0, _ = medium.n_and_grad3(*(np.asarray(v) for v in source))
    n0 = np.full(len(u), float(np.asarray(n0)))
    amp = np.asarray(spreading_amplitude3(rows[:, _DETQ], rows[:, _N], n0))

    order = np.lexsort((rows[:, _TT], rec))
    order = order[ok[order]]
    # dedup below the fan's resolving power; the travel-time guard keeps
    # same-direction arrivals of different crossing ordinals distinct
    # (same rationale as engine/eigenray.py)
    dedup = []
    for j in order:
        if not any(rec[j] == rec[i]
                   and np.linalg.norm(u[j] - u[i]) < 1e-3 * pitch
                   and abs(rows[j, _TT] - rows[i, _TT])
                   < 1e-6 * (1.0 + abs(rows[i, _TT]))
                   for i in dedup):
            dedup.append(j)
    order = np.asarray(dedup, int)
    return Eigenrays3(
        receiver=rec[order], dir0=u[order], traveltime=rows[order, _TT],
        miss=miss[order], detq=rows[order, _DETQ],
        kmah=rows[order, _KMAH].astype(np.int32), amplitude=amp[order],
        n=rows[order, _N], n0=n0[order],
        converged=miss[order] < max(tol * 1e3, 1e-6))
