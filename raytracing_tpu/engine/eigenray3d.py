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
                    tol: float = 1e-9,
                    on_host: bool | None = None) -> Eigenrays3:
    """Every fan-resolved 3-D ray path from ``source`` to each receiver.

    ``fan`` = (a_lo, a_hi, n_a, b_lo, b_hi, n_b): the launch-direction
    grid around ``center_dir`` (default: from the source toward the mean
    receiver).  See the module docstring for the algorithm and its
    resolution caveats.
    """
    import contextlib

    import jax

    from raytracing_tpu.engine.eigenray import _solve_device

    # the solve is dtype=np.float64 throughout; without a scoped x64
    # enable (serve daemon / CLI never set it globally) the arrays
    # silently downcast to f32 and the default tol=1e-9 is unreachable —
    # mirror find_eigenrays (engine/eigenray.py:220-222)
    if not jax.config.jax_enable_x64:
        x64 = jax.enable_x64(True)
    else:
        x64 = contextlib.nullcontext()
    # host-side solve over short fan traces with full-history readbacks:
    # route to the CPU backend when the default is a remote TPU (same
    # rationale, scoping, and on_host/RT_EIGENRAY_ON_HOST opt-out as
    # engine/eigenray.find_eigenrays)
    with x64, _solve_device(on_host):
        return _find_eigenrays3(method, medium, source=source,
                                receivers=receivers, delta_s=delta_s,
                                max_size=max_size, box=box,
                                center_dir=center_dir, fan=fan, iters=iters,
                                tol=tol)


def _find_eigenrays3(method, medium, *, source, receivers, delta_s,
                     max_size, box, center_dir, fan, iters,
                     tol) -> Eigenrays3:
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

    # --- seed scan: grid-local minima of the miss per (receiver, ordinal),
    # vectorized per unique range (engine/eigenray.py shares the crossing
    # machinery): one numpy pass serves every receiver at that range and
    # every ordinal at once, so full 3-D receiver grids stay cheap.
    from raytracing_tpu.engine.eigenray import _crossing_vals

    cand_dir, cand_rec, cand_ord = [], [], []
    uniq_xr, xr_inv = np.unique(receivers[:, 0], return_inverse=True)
    for ui, xru in enumerate(uniq_xr):
        yz = _crossing_vals(hist, last, xru, (_Y, _Z), _X)
        yz = yz.reshape(int(n_a), int(n_b), -1, 2)   # fan grid x ordinal
        for ri in np.where(xr_inv == ui)[0]:
            m2 = ((yz[..., 0] - receivers[ri, 1]) ** 2
                  + (yz[..., 1] - receivers[ri, 2]) ** 2)
            m2 = np.where(np.isnan(m2), np.inf, m2)
            # interior nodes beating their 4-neighborhood seed a candidate
            c = m2[1:-1, 1:-1]
            is_min = (np.isfinite(c)
                      & (c <= m2[:-2, 1:-1]) & (c <= m2[2:, 1:-1])
                      & (c <= m2[1:-1, :-2]) & (c <= m2[1:-1, 2:]))
            ii, jj, kk = np.nonzero(is_min)
            cand_dir.extend(dirs[ii + 1, jj + 1])
            cand_rec.extend([ri] * len(ii))
            cand_ord.extend(kk)
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

    # --- damped Gauss-Newton, all candidates in one trace per iteration --
    # (each candidate follows its seeded crossing ORDINAL — _pick_crossings
    # in engine/eigenray.py, shared; nearest-miss picking could hop to a
    # different crossing of a looping path mid-polish)
    import jax.numpy as jnp

    from raytracing_tpu.engine.eigenray import _pick_crossings

    miss = np.full(len(u), np.inf)
    for _ in range(int(iters)):
        h, l = run(u, full=True)
        st, found = _pick_crossings(h, l, xr, ordk, _X, _KMAH)
        m = st[:, [_Y, _Z]] - tgt                           # (J, 2)
        miss = np.where(found, np.linalg.norm(m, axis=1), np.inf)
        uc = st[:, _U:_U + 3]
        dpa, dpb = st[:, _DPA:_DPA + 3], st[:, _DPB:_DPB + 3]
        ux = np.where(np.abs(uc[:, 0]) > 1e-9, uc[:, 0],
                      np.copysign(1e-9, uc[:, 0]))
        m00 = dpa[:, 1] - dpa[:, 0] * uc[:, 1] / ux
        m01 = dpb[:, 1] - dpb[:, 0] * uc[:, 1] / ux
        m10 = dpa[:, 2] - dpa[:, 0] * uc[:, 2] / ux
        m11 = dpb[:, 2] - dpb[:, 0] * uc[:, 2] / ux
        det = m00 * m11 - m01 * m10
        mmax = np.maximum(np.maximum(np.abs(m00), np.abs(m01)),
                          np.maximum(np.abs(m10), np.abs(m11)))
        newton_ok = np.abs(det) > 1e-12 * (mmax ** 2 + 1e-30)
        safe_det = np.where(newton_ok, det, 1.0)
        d_n = np.stack([-(m11 * m[:, 0] - m01 * m[:, 1]) / safe_det,
                        -(m00 * m[:, 1] - m10 * m[:, 0]) / safe_det], 1)
        # near-caustic: damped gradient step -M^T m / |M|^2
        ss = m00 ** 2 + m01 ** 2 + m10 ** 2 + m11 ** 2 + 1e-30
        d_g = np.stack([-(m00 * m[:, 0] + m10 * m[:, 1]) / ss,
                        -(m01 * m[:, 0] + m11 * m[:, 1]) / ss], 1)
        delta = np.where(found[:, None],
                         np.where(newton_ok[:, None], d_n, d_g), 0.0)
        # clamp to one grid pitch: seeds are at most a cell away
        nrm = np.linalg.norm(delta, axis=1, keepdims=True)
        delta = np.where(nrm > pitch, delta * (pitch / np.maximum(nrm, 1e-300)),
                         delta)
        if np.nanmax(np.where(np.isinf(miss), np.nan, miss),
                     initial=0.0) < tol and np.all(np.isfinite(miss)):
            break
        e1c, e2c = (np.asarray(v) for v in _transverse_frame(jnp.asarray(u)))
        u = u + delta[:, :1] * e1c + delta[:, 1:] * e2c
        u /= np.linalg.norm(u, axis=1, keepdims=True)

    # --- final evaluation --------------------------------------------------
    h, l = run(u, full=True)
    rows, ok = _pick_crossings(h, l, xr, ordk, _X, _KMAH)
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
