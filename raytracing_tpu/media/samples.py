"""Shared entry points for MEASURED media: one family dispatch, one trim.

Two pieces of logic used to be duplicated across every user-facing
surface (CLI ``--medium-file``, serve ``/v1/trace_samples`` +
``/v1/calibrate_samples``, the fast-trace/sweep compaction sites) and had
started to drift; this module is their single home:

* :func:`medium_from_samples` — raw (samples, x, y) arrays to a medium of
  the requested family plus the default trace box.  The reference can only
  trace fields hard-coded in its source (RT_bench.py:104-116); measured
  media are this framework's extension, so every surface must agree on
  how a samples payload becomes a medium.
* :func:`compact_for_trace` — the stratified-table reachability trim
  (media/spline.compact_stratified and its C1 twin) with the one blessed
  margin rule: the box's y-extent widened by two steps, so a clamped ray
  that leaves the box mid-step still evaluates the untrimmed field.
"""
from __future__ import annotations

import numpy as np


def medium_from_samples(samples, x=None, y=None, *, family: str = "parity",
                        dtype=np.float32):
    """``(medium, default_box, kind)`` from raw measured-index arrays.

    ``samples`` is a (ny,) profile (with coordinate vector ``y``) or a
    (ny, nx) grid (with ``x`` and ``y``); ``family`` picks the
    reference-parity builders (media/spline.py) or the consistent-gradient
    C1 builders (media/c1.py).  ``default_box`` spans the sampled region
    (profiles are x-independent: unbounded in x); ``kind`` is
    ``"profile"`` or ``"grid"``.  ``dtype`` sets the coefficient-table
    precision (kernel tracing keeps the f32 default; eigenray work wants
    f64 tables — engine/eigenray.py dtype note — and needs jax x64 enabled
    at BUILD time or the request silently downcasts).  Axis validation
    (ascending uniform, matching lengths) lives in the builders themselves
    (spline.check_uniform_grid/_check_profile); this function only
    dispatches.  Raises ValueError on a bad family/rank or missing axis.
    """
    if family not in ("parity", "c1"):
        raise ValueError(f"family must be 'parity' or 'c1', got {family!r}")
    samples = np.asarray(samples, np.float64)
    if y is None:
        raise ValueError("samples need the 'y' coordinate vector")
    y = np.asarray(y, np.float64)
    if samples.ndim == 1:
        from raytracing_tpu.media.c1 import c1_stratified_from_samples
        from raytracing_tpu.media.spline import stratified_medium_from_samples

        medium = (c1_stratified_from_samples(samples, y, dtype=dtype)
                  if family == "c1"
                  else stratified_medium_from_samples(samples, y, dtype=dtype))
        return medium, (-1e30, 1e30, float(y[0]), float(y[-1])), "profile"
    if samples.ndim == 2:
        if x is None:
            raise ValueError("2-D samples need the 'x' coordinate vector")
        x = np.asarray(x, np.float64)
        from raytracing_tpu.media.c1 import c1_medium_from_samples
        from raytracing_tpu.media.spline import grid_medium_from_samples

        medium = (c1_medium_from_samples(samples, x, y, dtype=dtype)
                  if family == "c1"
                  else grid_medium_from_samples(samples, x, y, dtype=dtype))
        box = (float(x[0]), float(x[-1]), float(y[0]), float(y[-1]))
        return medium, box, "grid"
    raise ValueError(f"samples must be 1-D or 2-D, got {samples.ndim}-D")


def compact_for_trace(medium, box, delta_s):
    """Trim a stratified medium's table to the rays reachable from ``box``.

    Dispatches :func:`media.spline.compact_stratified` /
    :func:`media.c1.compact_c1_stratified` by family and applies the one
    blessed margin — ``box`` y-extent ± 2·delta_s (a boxed ray's last step
    can land at most ~delta_s outside before the exit mask freezes it).
    Non-stratified media pass through unchanged, so call sites can apply
    this unconditionally.
    """
    from raytracing_tpu.media.c1 import (C1StratifiedMedium,
                                         compact_c1_stratified)
    from raytracing_tpu.media.spline import (StratifiedGridMedium,
                                             compact_stratified)

    y_range = (box[2] - 2 * float(delta_s), box[3] + 2 * float(delta_s))
    if isinstance(medium, StratifiedGridMedium):
        return compact_stratified(medium, y_range=y_range)
    if isinstance(medium, C1StratifiedMedium):
        return compact_c1_stratified(medium, y_range=y_range)
    return medium
