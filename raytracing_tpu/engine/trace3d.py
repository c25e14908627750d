"""3-D ray integration: the op matrix in vector form.

The reference integrates in the plane — one launch angle, 2-D cross
products for turn direction, atan2 angle solvers (RT_bench.py:298-407).
This tier generalizes the same method families to 3-D by replacing the
angle with the unit tangent ``u`` (3,), on which every reference update has
an exact vector form:

* momentum-impulse (op1/op8 solver, RT_bench.py:393-407): the 2-D
  ``atan2(n sin t + J_y, n cos t + J_x)`` IS the direction of the momentum
  vector ``p = n u`` after the trapezoidal impulse ``J = ds (g0 + g1)/2``;
  in 3-D, ``u' = normalize(n u + J)``.
* RK2 / AnDF (op2/op6 solver, RT_bench.py:374-391): d(theta)/ds =
  (cos t g_y - sin t g_x)/n is the 2-D shadow of the Fermat tangent ODE
  ``du/ds = (g - (g.u) u)/n``; the two-stage update evaluates the slope at
  the start and at the advanced point, exactly like ``tfinal_2o``.
* position steppers (RT_bench.py:300-333): first- and second-order Taylor
  are already vector formulas; they port verbatim.

Methods: ``op1`` (t1 + impulse), ``op2``/AnDF (t1 + RK2), ``op6``/HySA
(t2 + RK2), ``op8`` (t2 + impulse).  The curvature/golden/window families
are intrinsically planar constructions (signed 2-D turning circles, scalar
bracket searches, atan2 of differenced positions) and are not lifted;
:func:`trace3d` rejects them by name.

Oracles (tests/test_trace3d.py): exact straight lines in homogeneous
media; Maxwell-fisheye closure and planarity in 3-D (the field is
spherically symmetric, so each ray stays in its launch plane and closes);
the Bouguer invariant ``n |r x u|`` for any spherically symmetric medium;
horizontal-slowness conservation in stratified media at the 2-D oracle's
O(ds^2) grade — with the horizontal AZIMUTH conserved to roundoff (both
solvers scale u_x and u_z by one common factor per step, so the
horizontal direction never turns); and 3-D/2-D reduction against the
parity engine (second-order agreement, identical exit steps).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

#: history row layout of :func:`trace3d` (mode="history")
TRACE3_COLS = ("x", "y", "z", "traveltime", "n", "ux", "uy", "uz")

#: 3-D method matrix: name -> (stepper order, angle solver)
METHODS3 = {
    "op1": (1, "impulse"),
    "op2": (1, "rk2"),
    "op6": (2, "rk2"),
    "op8": (2, "impulse"),
}
_ALIASES3 = {"AnDF": "op2", "HySA": "op6"}


class Ray3State(NamedTuple):
    """State of a 3-D ray batch; leading shape (R,)."""

    pos: Any          # (R, 3)
    unitv: Any        # (R, 3) unit tangent
    n: Any            # (R,)
    grad: Any         # (R, 3)
    traveltime: Any   # (R,) optical path
    dist_sim: Any     # (R,)
    dist_real: Any    # (R,)
    active: Any       # (R,) bool
    exit_step: Any    # (R,) int32
    slow_count: Any   # (R,) Welford count over (p_x, p_z) samples, or None
    slow_mean: Any    # (R, 2) running mean of horizontal slowness, or None
    slow_m2: Any      # (R, 2) running squared deviations, or None


class Trace3Result(NamedTuple):
    final: Ray3State
    exit_step: Any
    dist_real: Any
    dist_sim: Any
    history: Any      # (max_size, R, 8) TRACE3_COLS rows, or None

    def horizontal_slowness_cv_pct(self):
        """Per-ray CV (%) of (p_x, p_z) from the Welford tracker — the 3-D
        form of the reference's momentum oracle (RT_bench.py:957-958).
        Returns (R, 2); rays launched with a ~zero component report nan
        there (no relative spread exists)."""
        st = self.final
        if st.slow_count is None:
            raise ValueError("trace3d ran without stats=True")
        var = st.slow_m2 / st.slow_count[..., None]
        mean = st.slow_mean
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(np.abs(np.asarray(mean)) > 1e-12,
                            100.0 * np.sqrt(np.asarray(var))
                            / np.abs(np.asarray(mean)), np.nan)


def canonical3(name: str) -> str:
    name = _ALIASES3.get(name, name)
    if name not in METHODS3:
        raise ValueError(
            f"3-D tracing supports {sorted(METHODS3)} (+ aliases "
            f"{sorted(_ALIASES3)}); got {name!r}.  The curvature, golden "
            f"and window families are planar constructions (signed 2-D "
            f"turning circles / scalar searches) with no 3-D lift.")
    return name


def _eval3(medium, pos):
    n, (gx, gy, gz) = medium.n_and_grad3(pos[..., 0], pos[..., 1],
                                         pos[..., 2])
    return n, jnp.stack([gx, gy, gz], axis=-1)


def _normalize(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _rodrigues(u, rho):
    """Rotate ``u`` by the rotation VECTOR ``rho`` (axis * angle).

    Exact rotation — |u| is preserved identically (no renormalize), and a
    zero vector is exactly the identity.  For planar dynamics (rho always
    along the plane normal) this reduces to ``theta += |rho|`` — the 2-D
    angle update.
    """
    # division-free Rodrigues: sinc/versine forms keep the map smooth (and
    # jvp-differentiable, engine/dynamic3d.py) through rho == 0, where a
    # plain norm(rho) has a NaN derivative.  The floor must SQUARE to a
    # normal number: autodiff's quotient rule divides by (a2 + floor)^2,
    # and flooring at finfo.tiny underflows that square to 0/0 = NaN.
    a2 = jnp.sum(rho * rho, axis=-1, keepdims=True)
    tiny = jnp.asarray(np.finfo(u.dtype).tiny ** 0.45, u.dtype)
    a = jnp.sqrt(a2 + tiny)
    sinc = jnp.sin(a) / a
    vers = (1.0 - jnp.cos(a)) / (a2 + tiny)
    return (u * jnp.cos(a) + jnp.cross(rho, u) * sinc
            + rho * jnp.sum(rho * u, axis=-1, keepdims=True) * vers)


def _step3(order: int, solver: str, pt, medium, delta_s):
    """One 3-D integration step; ``pt`` = (pos, unitv, n, grad)."""
    pos, u, n, g = pt
    ds = delta_s
    if order == 1:
        pos2 = pos + u * ds                      # first_order_taylor
    else:
        gdotu = jnp.sum(g * u, axis=-1, keepdims=True)
        pos2 = (pos + u * ds                     # second_order_taylor
                + (g - gdotu * u) * (ds * ds) / (2.0 * n[..., None]))
    n2, g2 = _eval3(medium, pos2)

    if solver == "impulse":
        # trapezoidal momentum impulse, direction of p = n u (theta_cost_t)
        p = n[..., None] * u + ds * (g + g2) / 2.0
        u2 = _normalize(p)
    else:
        # two-stage RK2 on du/ds = (g - (g.u) u)/n, composed as ROTATION
        # VECTORS: rho_i = u_i x k_i, u' = Rodrigues(u, (rho1 + rho2)/2).
        # For planar dynamics the rhos align with the plane normal and
        # this IS tfinal_2o's ``theta += (k1 + k2)/2`` — add-and-normalize
        # or transverse-projection forms lose that scheme's symmetric
        # error cancellation (measured on the fisheye circle at 600
        # steps: 5.7e-5 / 1.7e-4 closure vs 3.1e-9 for the 2-D engine;
        # the rotation-vector form matches the 2-D grade).
        k1 = ds * (g - jnp.sum(g * u, axis=-1, keepdims=True) * u) \
            / n[..., None]
        rho1 = jnp.cross(u, k1)
        um = _rodrigues(u, rho1)
        k2 = ds * (g2 - jnp.sum(g2 * um, axis=-1, keepdims=True) * um) \
            / n2[..., None]
        u2 = _rodrigues(u, (rho1 + jnp.cross(um, k2)) / 2.0)
    return pos2, u2, n2, g2


@functools.lru_cache(maxsize=None)
def _build_trace3_fn(method: str, max_size: int, box, mode: str,
                     with_stats: bool, dtype_name: str):
    dtype = np.dtype(dtype_name)
    order, solver = METHODS3[method]
    history = mode == "history"

    def run(st0: Ray3State, medium, delta_s, step_limit):
        def body(st: Ray3State, i):
            pos2, u2, n2, g2 = _step3(order, solver,
                                      (st.pos, st.unitv, st.n, st.grad),
                                      medium, delta_s)
            dist = jnp.linalg.norm(pos2 - st.pos, axis=-1)
            tt2 = st.traveltime + dist * (st.n + n2) / 2.0

            if with_stats:
                p_hor = n2[..., None] * u2[..., (0, 2)]
                cnt = st.slow_count + 1.0
                delta = p_hor - st.slow_mean
                mean = st.slow_mean + delta / cnt[..., None]
                m2 = st.slow_m2 + delta * (p_hor - mean)
            else:
                cnt = mean = m2 = None

            new = Ray3State(
                pos=pos2, unitv=u2, n=n2, grad=g2, traveltime=tt2,
                dist_sim=st.dist_sim + dist,
                dist_real=st.dist_real + delta_s,
                active=st.active, exit_step=st.exit_step,
                slow_count=cnt, slow_mean=mean, slow_m2=m2)

            def sel(a, b):
                m = st.active.reshape(
                    st.active.shape + (1,) * (a.ndim - st.active.ndim))
                return jnp.where(m, a, b)

            st2 = jax.tree.map(sel, new, st)

            if box is None:
                out = jnp.zeros_like(st.active)
            else:
                x, y, z = st2.pos[..., 0], st2.pos[..., 1], st2.pos[..., 2]
                out = ((x < box[0]) | (x > box[1]) | (y < box[2])
                       | (y > box[3]) | (z < box[4]) | (z > box[5]))
            exit2 = jnp.where(st.active & out, i, st.exit_step)
            st2 = st2._replace(active=st.active & ~out & (i < step_limit),
                               exit_step=exit2)
            if history:
                row = jnp.stack([st2.pos[..., 0], st2.pos[..., 1],
                                 st2.pos[..., 2], st2.traveltime, st2.n,
                                 st2.unitv[..., 0], st2.unitv[..., 1],
                                 st2.unitv[..., 2]], axis=-1)
                return st2, row
            return st2, None

        st0 = st0._replace(exit_step=jnp.minimum(st0.exit_step, step_limit))
        steps = jnp.arange(1, max_size, dtype=jnp.int32)
        final, rows = jax.lax.scan(body, st0, steps)
        if history:
            row0 = jnp.stack([st0.pos[..., 0], st0.pos[..., 1],
                              st0.pos[..., 2], st0.traveltime, st0.n,
                              st0.unitv[..., 0], st0.unitv[..., 1],
                              st0.unitv[..., 2]], axis=-1)
            hist = jnp.concatenate([row0[None], rows], axis=0)
        else:
            hist = None
        return Trace3Result(final=final, exit_step=final.exit_step,
                            dist_real=final.dist_real,
                            dist_sim=final.dist_sim, history=hist)

    return run, jax.jit(run)


def initial_state3(pos0, dir0, medium, *, with_stats: bool,
                   max_size: int) -> Ray3State:
    pos0 = jnp.asarray(pos0)
    u0 = _normalize(jnp.asarray(dir0))
    n0, g0 = _eval3(medium, pos0)
    zeros = jnp.zeros_like(n0)
    p_hor0 = n0[..., None] * u0[..., (0, 2)] if with_stats else None
    # every field derives from n0/p_hor0 (*_like / arithmetic), so under
    # shard_map the carry inherits the launch arrays' varying mesh axes
    return Ray3State(
        pos=pos0, unitv=u0, n=n0, grad=g0, traveltime=zeros,
        dist_sim=zeros, dist_real=zeros,
        active=jnp.ones_like(n0, dtype=bool),
        exit_step=jnp.full_like(n0, max_size - 1).astype(jnp.int32),
        slow_count=jnp.ones_like(n0) if with_stats else None,
        slow_mean=p_hor0,
        slow_m2=jnp.zeros_like(p_hor0) if with_stats else None)


def trace3d(method: str, medium, *, pos0, dir0, delta_s: float, steps: int,
            box=None, mode: str = "history", dtype=np.float32,
            stats: bool = False, step_limit: int | None = None,
            jit: bool = True) -> Trace3Result:
    """Trace a batch of 3-D rays through ``medium``.

    ``pos0``/``dir0`` are (R, 3) launch points and directions (normalized
    internally); ``box`` is (x0, x1, y0, y1, z0, z1) or None for an
    unbounded domain; ``stats=True`` tracks Welford statistics of the
    horizontal slowness vector (the 3-D conservation oracle for stratified
    media).  Everything else mirrors the 2-D :func:`engine.trace.trace`.
    """
    method = canonical3(method)
    dtype = np.dtype(dtype)
    if mode not in ("history", "metrics"):
        raise ValueError(f"mode must be 'history' or 'metrics', got {mode!r}")
    pos0 = jnp.asarray(pos0, dtype)
    dir0 = jnp.asarray(dir0, dtype)
    if pos0.ndim != 2 or pos0.shape[-1] != 3 or dir0.shape != pos0.shape:
        raise ValueError(f"pos0/dir0 must both be (rays, 3), got "
                         f"{pos0.shape} / {dir0.shape}")
    max_size = int(steps) + 1
    if step_limit is None:
        step_limit = max_size - 1
    box_t = tuple(float(b) for b in box) if box is not None else None
    if box_t is not None and len(box_t) != 6:
        raise ValueError(f"box must be 6 floats (x0,x1,y0,y1,z0,z1), "
                         f"got {box!r}")
    run, run_jit = _build_trace3_fn(method, max_size, box_t, mode,
                                    bool(stats), dtype.name)
    st0 = initial_state3(pos0, dir0, medium, with_stats=bool(stats),
                         max_size=max_size)
    fn = run_jit if jit else run
    return fn(st0, medium, jnp.asarray(delta_s, dtype),
              jnp.asarray(step_limit, jnp.int32))


def bouguer_invariant(result: Trace3Result):
    """``n |r x u|`` along each history row — exactly conserved by the true
    dynamics in any spherically symmetric medium (the optical Bouguer
    theorem), so its drift measures pure integrator error."""
    if result.history is None:
        raise ValueError("bouguer_invariant needs mode='history'")
    h = np.asarray(result.history)
    r = h[..., 0:3]
    u = h[..., 5:8]
    n = h[..., 4]
    return n * np.linalg.norm(np.cross(r, u), axis=-1)
