"""Eigenray finding: boundary-value ray solutions source -> receiver.

The reference answers only the initial-value problem — launch a fan, see
where it lands (RT_bench.py:766-948).  Production use of a ray tracer
(transmission loss at a hydrophone, travel-time tomography picks) needs the
*boundary-value* problem: every launch angle whose ray passes through a
given receiver, with travel time, amplitude and caustic phase per arrival.

Strategy, batched end to end:

1. one dynamic fan trace (:func:`engine.dynamic.trace_dynamic`, history
   mode) from the source;
2. host-side range scan: for every receiver, every crossing of its range
   line ``x = xr`` is linearly interpolated per fan ray, and a sign change
   of ``y(xr) - yr`` between adjacent fan rays (same crossing ordinal)
   brackets one eigenray;
3. safeguarded Newton on the launch angle, batched over ALL brackets of
   ALL receivers in one dynamic trace per iteration.  The Newton slope is
   free: the derivative of crossing depth w.r.t. launch angle at fixed
   range is exactly ``q / cos(angle)`` — the along-ray component of the
   paraxial tangent cancels identically — so each iteration is quadratic
   where the plain fan would need thousands of rays for the same miss.

Multipath comes out naturally: each (receiver, ordinal, bracket) is its own
eigenray; :func:`coherent_tl` / :func:`incoherent_tl` then reduce arrivals
per receiver into the field, with each caustic passage (KMAH index from the
dynamic trace) contributing the standard -pi/2 phase shift.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np

from raytracing_tpu import config
from raytracing_tpu.engine.dynamic import (DYN_COLS, spreading_amplitude,
                                           trace_dynamic)

_X = DYN_COLS.index("x")
_Y = DYN_COLS.index("y")
_TT = DYN_COLS.index("traveltime")
_ANG = DYN_COLS.index("angle")
_Q = DYN_COLS.index("q")
_KMAH = DYN_COLS.index("kmah")
_N = DYN_COLS.index("n")


class Eigenrays(NamedTuple):
    """All arrivals found, flat over (receiver, path); sorted by receiver
    then travel time."""

    receiver: Any     # (E,) int32 index into the receivers argument
    theta0: Any       # (E,) launch angle of the arrival
    traveltime: Any   # (E,) optical path / travel time at the receiver
    y_err: Any        # (E,) residual depth miss at the receiver range
    q: Any            # (E,) transverse spreading at the receiver
    kmah: Any         # (E,) int32 caustic count along the path
    angle: Any        # (E,) ray angle at the receiver
    n: Any            # (E,) index at the receiver
    n0: Any           # (E,) index at the source
    amplitude: Any    # (E,) point-source pressure amplitude
    converged: Any    # (E,) bool: |y_err| under the requested tolerance

    def for_receiver(self, i: int) -> "Eigenrays":
        m = self.receiver == i
        return Eigenrays(*[np.asarray(f)[m] for f in self])


def _crossings(hist: np.ndarray, last: np.ndarray, xr: float):
    """Interpolated states of every crossing of ``x == xr``.

    ``hist`` is one ray's (S, 7) DYN_COLS history, valid through row
    ``last`` (frozen afterwards).  Returns an (m, 7) array of crossing
    states ordered along the ray (m may be 0).
    """
    x = hist[: last + 1, _X]
    d = x - xr
    hit = np.where(d[:-1] * d[1:] < 0)[0]
    if hit.size == 0:
        return np.empty((0, hist.shape[1]))
    frac = (d[hit] / (x[hit] - x[hit + 1]))[:, None]
    out = hist[hit] + frac * (hist[hit + 1] - hist[hit])
    out[:, _KMAH] = hist[hit, _KMAH]  # caustic count is step-quantized
    return out


def find_eigenrays(op_name: str, medium, *, source, receivers, delta_s,
                   max_size: int, box, fan=(0.0, np.pi / 2, 256),
                   gamma: float = 1.0, dtype=np.float64, iters: int = 12,
                   tol: float = 1e-9, max_arrivals: int | None = None
                   ) -> Eigenrays:
    """Find every fan-resolved ray path from ``source`` to each receiver.

    ``receivers`` is (K, 2); ``fan`` = (theta_lo, theta_hi, count) bounds
    the launch-angle search (arrivals outside it, or multipath finer than
    the fan pitch, are not found — widen/densify the fan for more).
    ``box`` clips rays as in the forward engine; ``max_size`` bounds the
    step count.  ``max_arrivals`` (optional) caps the bracket-candidate
    count — looping paths multiply range crossings, and each candidate
    re-traces per Newton iteration; servers should set it.  Returns a
    flat :class:`Eigenrays`; an empty one if no path crosses any receiver
    range.

    The achievable miss is the noise floor of the landing curve
    ``y(xr; theta0)``, set by the medium's evaluation precision: analytic
    and f64-table media converge to ~1e-15, while float32 coefficient
    tables (the kernel-tier default for sampled media) floor around 1e-5 —
    build sampled media with ``dtype=np.float64`` for eigenray work.
    """
    import contextlib

    import jax

    # the Newton polish needs the landing curve at the requested precision;
    # scope an x64 enable to this solve instead of requiring global config
    if np.dtype(dtype).itemsize == 8 and not jax.config.jax_enable_x64:
        x64 = jax.enable_x64(True)
    else:
        x64 = contextlib.nullcontext()
    with x64:
        return _find_eigenrays(op_name, medium, source=source,
                               receivers=receivers, delta_s=delta_s,
                               max_size=max_size, box=box, fan=fan,
                               gamma=gamma, dtype=dtype, iters=iters,
                               tol=tol, max_arrivals=max_arrivals)


def _find_eigenrays(op_name, medium, *, source, receivers, delta_s,
                    max_size, box, fan, gamma, dtype, iters,
                    tol, max_arrivals=None) -> Eigenrays:
    source = np.asarray(source, dtype)
    receivers = np.atleast_2d(np.asarray(receivers, dtype))
    th_lo, th_hi, n_fan = fan
    # a custom launch container: trace_dynamic reads only gamma/box from it
    # (pos0/theta0/max_size are passed explicitly per call below)
    scen = config.ScenarioConfig(
        name="custom", key="-", field="", gamma=float(gamma),
        ray_count=int(n_fan),
        theta0=np.linspace(th_lo, th_hi, int(n_fan)),
        pos0=np.tile(source, (int(n_fan), 1)), s_max=0.0,
        box=tuple(float(b) for b in box))

    def fan_trace(theta0):
        pos0 = np.tile(source, (len(theta0), 1))
        res = trace_dynamic(op_name, scen, medium, delta_s=delta_s,
                            dtype=dtype, pos0=pos0, theta0=theta0,
                            max_size=max_size, mode="history")
        return np.asarray(res.history), np.asarray(res.exit_step)

    hist, last = fan_trace(np.asarray(scen.theta0, dtype))

    # --- bracket scan: per receiver, per crossing ordinal ------------------
    cand_th_lo, cand_th_hi, cand_rec = [], [], []
    cand_flo, cand_ord = [], []
    for ri, (xr, yr) in enumerate(receivers):
        per_ray = [_crossings(hist[:, r], last[r], xr)
                   for r in range(hist.shape[1])]
        depth = np.full((hist.shape[1], max(len(c) for c in per_ray) or 1),
                        np.nan)
        for r, c in enumerate(per_ray):
            depth[r, : len(c)] = c[:, _Y]
        f = depth - yr
        for k in range(depth.shape[1]):
            fk = f[:, k]
            ok = ~np.isnan(fk[:-1]) & ~np.isnan(fk[1:])
            s0, s1 = np.sign(fk[:-1]), np.sign(fk[1:])
            # any sign TRANSITION brackets a root — including an exact hit
            # (a fan ray landing dead on the receiver, e.g. the axial ray
            # of a symmetric waveguide, makes f == 0: the plain product
            # test f0*f1 < 0 would drop it).  An exact hit flags both of
            # its neighboring intervals; the duplicate converges to the
            # same root and is merged below.
            sign = ok & (s0 != s1) & ~((s0 == 0) & (s1 == 0))
            for r in np.where(sign)[0]:
                cand_th_lo.append(scen.theta0[r])
                cand_th_hi.append(scen.theta0[r + 1])
                cand_flo.append(fk[r])
                cand_rec.append(ri)
                cand_ord.append(k)
    if not cand_th_lo:
        z = np.empty(0)
        zi = np.empty(0, np.int32)
        return Eigenrays(zi, z, z, z, z, zi, z, z, z, z,
                         np.empty(0, bool))
    if max_arrivals is not None and len(cand_th_lo) > int(max_arrivals):
        raise ValueError(
            f"{len(cand_th_lo)} bracket candidates exceed max_arrivals "
            f"{int(max_arrivals)} (looping paths multiply crossings); "
            f"shorten the trace, shrink the fan, or raise the cap")

    lo = np.asarray(cand_th_lo, dtype)
    hi = np.asarray(cand_th_hi, dtype)
    flo = np.asarray(cand_flo, dtype)
    rec = np.asarray(cand_rec, np.int32)
    ordk = np.asarray(cand_ord, np.int32)
    xr = receivers[rec, 0]
    yr = receivers[rec, 1]
    th = 0.5 * (lo + hi)

    def pick(c, j):
        """The candidate's bracketed crossing: its fan-scan ORDINAL.

        Rays can cross a receiver range several times (loops, turn-backs);
        each ordinal is its own landing curve and its own bracket, so the
        polish must follow ordinal k, not whichever crossing happens to
        land nearest the receiver depth.  If the current angle's path has
        fewer crossings than k (family boundary), fall back to the last —
        the bracket logic treats the miss as off-family anyway.
        """
        return c[min(int(ordk[j]), len(c) - 1)]

    # --- safeguarded Newton, batched over every candidate ------------------
    state = np.zeros((len(th), 7))
    fcur = np.full(len(th), np.inf)
    for _ in range(int(iters)):
        h, l = fan_trace(th)
        for j in range(len(th)):
            c = _crossings(h[:, j], l[j], xr[j])
            if len(c) == 0:
                fcur[j] = np.nan
                continue
            cj = pick(c, j)
            state[j] = cj
            fcur[j] = cj[_Y] - yr[j]
        # convergence check BEFORE any update: the final evaluation must
        # see the angle these residuals belong to, not the next proposal
        if np.all(np.isfinite(fcur)) and np.abs(fcur).max() < tol:
            break
        lost = np.isnan(fcur)
        # bracket bookkeeping on real signs only; a vanished crossing says
        # nothing about which half holds the root, so the bracket stays
        # put and the next probe walks toward lo (whose fan ray crossed)
        neg = ~lost & (fcur * flo > 0)
        lo = np.where(neg, th, lo)
        hi = np.where(~lost & ~neg, th, hi)
        # Newton proposal from the exact paraxial slope dy/dth = q / cos(a)
        slope = state[:, _Q] / np.cos(state[:, _ANG])
        with np.errstate(divide="ignore", invalid="ignore"):
            prop = th - fcur / slope
        mid = 0.5 * (lo + hi)
        use = ~lost & np.isfinite(prop) & (prop > lo) & (prop < hi)
        th = np.where(use, prop, np.where(lost, 0.5 * (lo + th), mid))

    # --- final evaluation at the converged angles ---------------------------
    h, l = fan_trace(th)
    rows = np.zeros((len(th), 7))
    ok = np.zeros(len(th), bool)
    for j in range(len(th)):
        c = _crossings(h[:, j], l[j], xr[j])
        if len(c):
            rows[j] = pick(c, j)
            ok[j] = True
    y_err = np.where(ok, rows[:, _Y] - yr, np.inf)
    n0, _ = medium.n_and_grad(source[0], source[1])
    n0 = np.full(len(th), float(np.asarray(n0)))
    amp = np.asarray(spreading_amplitude(rows[:, _Q], rows[:, _N], n0))
    order = np.lexsort((rows[:, _TT], rec))
    keep = ok[order]
    order = order[keep]
    # merge duplicate roots: adjacent brackets around an exact fan hit — or
    # around a root where the landing curve is nearly flat, so Newton stops
    # within tol at slightly different angles — converge to the same
    # arrival.  Arrivals separated by less than 1e-3 fan pitch are beyond
    # the fan's resolving power (documented above); the travel-time guard
    # keeps same-angle arrivals of DIFFERENT crossing ordinals distinct
    # (one ray can pass a receiver range several times).
    pitch = (float(th_hi) - float(th_lo)) / max(int(n_fan) - 1, 1)
    tts = rows[:, _TT]
    dedup = []
    for j in order:
        dup = any(rec[j] == rec[i] and abs(th[j] - th[i]) < 1e-3 * pitch
                  and abs(tts[j] - tts[i]) < 1e-6 * (1.0 + abs(tts[i]))
                  for i in dedup)
        if not dup:
            dedup.append(j)
    order = np.asarray(dedup, int)
    return Eigenrays(
        receiver=rec[order], theta0=th[order],
        traveltime=rows[order, _TT], y_err=y_err[order],
        q=rows[order, _Q], kmah=rows[order, _KMAH].astype(np.int32),
        angle=rows[order, _ANG], n=rows[order, _N], n0=n0[order],
        amplitude=amp[order],
        converged=np.abs(y_err[order]) < max(tol * 1e3, 1e-6))


def pressure(eig: Eigenrays, omega: float, n_receivers: int) -> np.ndarray:
    """Coherent complex pressure per receiver at angular frequency omega.

    Each arrival contributes ``A exp(i(omega tau - pi/2 kmah))`` — the
    standard KMAH phase advance of -pi/2 per caustic passage.
    """
    ph = omega * np.asarray(eig.traveltime) - 0.5 * np.pi * np.asarray(eig.kmah)
    contrib = np.asarray(eig.amplitude) * np.exp(1j * ph)
    p = np.zeros(n_receivers, complex)
    np.add.at(p, np.asarray(eig.receiver), contrib)
    return p


def coherent_tl(eig: Eigenrays, omega: float, n_receivers: int) -> np.ndarray:
    """-20 log10 |sum of arrivals| per receiver (dB re 1 m); inf if none."""
    with np.errstate(divide="ignore"):
        return -20.0 * np.log10(np.abs(pressure(eig, omega, n_receivers)))


def incoherent_tl(eig: Eigenrays, n_receivers: int) -> np.ndarray:
    """-10 log10 sum |A|^2 per receiver — the phase-averaged field."""
    e = np.zeros(n_receivers)
    np.add.at(e, np.asarray(eig.receiver), np.asarray(eig.amplitude) ** 2)
    with np.errstate(divide="ignore"):
        return -10.0 * np.log10(e)
