"""Hermite node form of the 2-D grid medium: the kernel-friendly layout.

A C1 piecewise-bicubic spline is determined inside each cell by the values
and (normalized) derivatives ``(f, df/dv, df/du, d2f/dvdu)`` at its four
corner nodes — the cubic Hermite form.  Converting the per-cell coefficient
tables of :class:`media.spline.GridMedium` (16 floats/cell/component) to
per-NODE data (4 floats/node/component) shrinks the fisheye medium from
~34 MB to ~9 MB and, crucially, turns the evaluation into *corner-node
gathers*: a ray only ever needs the 4x4 node block around its current cell,
which a supercell kernel can carry in VMEM across integration steps
(kernels/gridfused.py) instead of issuing three HBM spline gathers per step
(the reference's FITPACK cost, RT_bench.py:435-464, 141-156).

Packed channel layout (one row per node, ``(ny*nx, 9)``):

    0: Z            (sampled n; bilinear interpolation needs values only)
    1-4: dn/dx spline  f, f_v, f_u, f_vu   (v = normalized y, u = x)
    5-8: dn/dy spline  f, f_v, f_u, f_vu

Within a cell the bicubic value reconstructs from the 2x2 corners with the
standard Hermite basis h00/h10/h01/h11 — exactly equal to the per-cell
polynomial (tested to f64 round-off in tests/test_hermite.py).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct

from raytracing_tpu.media.spline import GridMedium


def _node_data(cells: np.ndarray) -> np.ndarray:
    """(ncy, ncx, 4, 4) power-basis cells -> (ncy+1, ncx+1, 4) node data.

    Node (I, J) takes (f, f_v, f_u, f_vu) from the adjacent cell
    (min(I, ncy-1), min(J, ncx-1)) at in-cell offsets (I - ciy, J - cix)
    in {0, 1}; C1 continuity of the source spline makes the choice of
    adjacent cell immaterial.
    """
    ncy, ncx = cells.shape[:2]
    out = np.empty((ncy + 1, ncx + 1, 4), cells.dtype)

    def powers(t):
        return (np.array([1.0, t, t * t, t ** 3], cells.dtype),
                np.array([0.0, 1.0, 2.0 * t, 3.0 * t * t], cells.dtype))

    p0, d0 = powers(0.0)
    p1, d1 = powers(1.0)
    # interior + bottom/left edge nodes from their own cell at offset 0
    out[:ncy, :ncx, 0] = np.einsum("yxab,a,b->yx", cells, p0, p0)
    out[:ncy, :ncx, 1] = np.einsum("yxab,a,b->yx", cells, d0, p0)
    out[:ncy, :ncx, 2] = np.einsum("yxab,a,b->yx", cells, p0, d0)
    out[:ncy, :ncx, 3] = np.einsum("yxab,a,b->yx", cells, d0, d0)
    # top row from the last cell row at v = 1
    out[ncy, :ncx, 0] = np.einsum("xab,a,b->x", cells[-1], p1, p0)
    out[ncy, :ncx, 1] = np.einsum("xab,a,b->x", cells[-1], d1, p0)
    out[ncy, :ncx, 2] = np.einsum("xab,a,b->x", cells[-1], p1, d0)
    out[ncy, :ncx, 3] = np.einsum("xab,a,b->x", cells[-1], d1, d0)
    # right column at u = 1
    out[:ncy, ncx, 0] = np.einsum("yab,a,b->y", cells[:, -1], p0, p1)
    out[:ncy, ncx, 1] = np.einsum("yab,a,b->y", cells[:, -1], d0, p1)
    out[:ncy, ncx, 2] = np.einsum("yab,a,b->y", cells[:, -1], p0, d1)
    out[:ncy, ncx, 3] = np.einsum("yab,a,b->y", cells[:, -1], d0, d1)
    # far corner at (1, 1)
    c = cells[-1, -1]
    out[ncy, ncx, 0] = np.einsum("ab,a,b->", c, p1, p1)
    out[ncy, ncx, 1] = np.einsum("ab,a,b->", c, d1, p1)
    out[ncy, ncx, 2] = np.einsum("ab,a,b->", c, p1, d1)
    out[ncy, ncx, 3] = np.einsum("ab,a,b->", c, d1, d1)
    return out


@struct.dataclass
class HermiteGridMedium:
    """2-D grid medium in packed Hermite node form.

    Evaluates identically to the source :class:`GridMedium` (same spline,
    different representation).  ``nodes`` is (ny*nx, 9) — see module
    docstring for channels.
    """

    nodes: Any       # (ny*nx, 9)
    x0: float = struct.field(pytree_node=False)
    y0: float = struct.field(pytree_node=False)
    inv_hx: float = struct.field(pytree_node=False)
    inv_hy: float = struct.field(pytree_node=False)
    nx: int = struct.field(pytree_node=False)
    ny: int = struct.field(pytree_node=False)
    #: table-wide bounds for the ray-curvature estimate (sizes the window
    #: margins in engine/segmented; 0.0 = unknown pre-round-3 pickles,
    #: consumers fall back to a fixed slack).  ``kappa_max`` is the
    #: POINTWISE max of |grad n| / n over the nodes — the actual bound on
    #: |du/ds| = |grad_perp n| / n.  Do NOT reconstruct it as
    #: g_max / n_min: the factored form pairs extremes from different
    #: table regions (the reference's +-3 grid padding puts n_min in
    #: corners no ray visits) and overestimated kappa by 27x on the
    #: fisheye grid, mis-sizing every coarse-divisor window.
    n_min: float = struct.field(pytree_node=False, default=1.0)
    g_max: float = struct.field(pytree_node=False, default=0.0)
    kappa_max: float = struct.field(pytree_node=False, default=0.0)

    def _cell(self, x, y):
        fx = (x - self.x0) * self.inv_hx
        fy = (y - self.y0) * self.inv_hy
        fx = jnp.clip(fx, 0.0, float(self.nx - 1))
        fy = jnp.clip(fy, 0.0, float(self.ny - 1))
        ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, self.nx - 2)
        iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, self.ny - 2)
        return ix, iy, fx - ix, fy - iy

    def n_and_grad(self, x, y):
        """Reference (gather-based) evaluation; the supercell kernel is the
        production path."""
        ix, iy, ux, uy = self._cell(x, y)
        flat = iy * self.nx + ix
        c00 = self.nodes[flat]                    # (..., 9)
        c01 = self.nodes[flat + 1]
        c10 = self.nodes[flat + self.nx]
        c11 = self.nodes[flat + self.nx + 1]
        n = ((1 - uy) * ((1 - ux) * c00[..., 0] + ux * c01[..., 0])
             + uy * ((1 - ux) * c10[..., 0] + ux * c11[..., 0]))
        gx = _hermite2d(c00[..., 1:5], c01[..., 1:5], c10[..., 1:5],
                        c11[..., 1:5], uy, ux)
        gy = _hermite2d(c00[..., 5:9], c01[..., 5:9], c10[..., 5:9],
                        c11[..., 5:9], uy, ux)
        return n, (gx, gy)

    def n(self, x, y):
        return self.n_and_grad(x, y)[0]


def hermite_basis(t):
    """(h00, h10, h01, h11) at t — value/derivative blending weights."""
    t2 = t * t
    t3 = t2 * t
    return (2 * t3 - 3 * t2 + 1, t3 - 2 * t2 + t,
            -2 * t3 + 3 * t2, t3 - t2)


def _hermite2d(c00, c01, c10, c11, v, u):
    """Bicubic Hermite from 4-corner (f, f_v, f_u, f_vu) stacks."""
    hv0, gv0, hv1, gv1 = hermite_basis(v)
    hu0, gu0, hu1, gu1 = hermite_basis(u)

    def corner(c, hv, gv, hu, gu):
        return (c[..., 0] * hv * hu + c[..., 1] * gv * hu
                + c[..., 2] * hv * gu + c[..., 3] * gv * gu)

    return (corner(c00, hv0, gv0, hu0, gu0) + corner(c01, hv0, gv0, hu1, gu1)
            + corner(c10, hv1, gv1, hu0, gu0) + corner(c11, hv1, gv1, hu1, gu1))


#: max of the 1-D cubic Hermite derivative basis |h10|=|h11| on [0,1]
#: (attained at t=1/3: t(1-t)^2 = 4/27); the value bases h00+h01
#: partition unity, so a per-cell interpolant bound needs only corner
#: maxima of each channel weighted by these
_HERM_D = 4.0 / 27.0


def kappa_cell_bound(nodes):
    """Rigorous per-CELL bound on |grad n| / n over the whole table.

    The drift-predicted window margins (engine/segmented) need a bound on
    the ray curvature |du/ds| = |grad_perp n| / n that holds BETWEEN
    nodes: the bicubic gradient can overshoot its node samples inside a
    cell (sharp features in a user grid from grid_medium_from_samples),
    and a node-sampled max would then under-size the sagitta margin —
    a mid-segment window escape the containment flag cannot see (it
    re-checks at refresh time, after _tile_nag already gathered wrong
    cells).  Per cell: |p(u,v)| <= max|f_corner| + 4/27 (max|f_u| +
    max|f_v|) + (4/27)^2 max|f_uv| from the Hermite basis extrema, n's
    bilinear minimum is a corner minimum, and each cell pairs ITS OWN
    gradient bound with ITS OWN n (no cross-table extremes — see the
    kappa_max field note).  ``nodes`` is (ny, nx, 9) float.
    """
    def cmax(a):
        a = np.abs(a)
        return np.maximum(np.maximum(a[:-1, :-1], a[:-1, 1:]),
                          np.maximum(a[1:, :-1], a[1:, 1:]))

    def gbound(ch):                        # ch: (ny, nx, 4) per component
        return (cmax(ch[..., 0])
                + _HERM_D * (cmax(ch[..., 1]) + cmax(ch[..., 2]))
                + _HERM_D * _HERM_D * cmax(ch[..., 3]))

    g = np.sqrt(gbound(nodes[..., 1:5]) ** 2 + gbound(nodes[..., 5:9]) ** 2)
    n0 = nodes[..., 0]
    nmin = np.minimum(np.minimum(n0[:-1, :-1], n0[:-1, 1:]),
                      np.minimum(n0[1:, :-1], n0[1:, 1:]))
    return float((g / np.maximum(nmin, 1e-6)).max())


def build_hermite_medium(gm: GridMedium, dtype=np.float32) -> HermiteGridMedium:
    """Convert a GridMedium's per-cell tables to packed Hermite node form."""
    ny, nx = gm.ny, gm.nx
    cx = np.asarray(gm.cx, np.float64).reshape(ny - 1, nx - 1, 4, 4)
    cy = np.asarray(gm.cy, np.float64).reshape(ny - 1, nx - 1, 4, 4)
    nodes = np.empty((ny, nx, 9), np.float64)
    nodes[..., 0] = np.asarray(gm.Z, np.float64)
    nodes[..., 1:5] = _node_data(cx)
    nodes[..., 5:9] = _node_data(cy)
    g_mag = np.sqrt(nodes[..., 1] ** 2 + nodes[..., 5] ** 2)
    return HermiteGridMedium(
        nodes=jnp.asarray(nodes.reshape(ny * nx, 9), dtype),
        x0=gm.x0, y0=gm.y0, inv_hx=gm.inv_hx, inv_hy=gm.inv_hy,
        nx=nx, ny=ny,
        n_min=float(max(nodes[..., 0].min(), 1e-6)),
        g_max=float(g_mag.max()),
        kappa_max=kappa_cell_bound(nodes))
