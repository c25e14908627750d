"""Horizontal refraction by an ocean eddy — tracing the reference cannot do.

The reference (and any 2-D tracer) confines rays to a vertical plane.
Real oceans refract rays HORIZONTALLY too: a mesoscale eddy is a
sound-speed anomaly in (x, z) that bends paths out of their launch plane.
This example traces the same fan twice through a Munk-style channel —
once purely stratified, once with a warm eddy parked beside the track —
and measures the out-of-plane deflection (``rt.trace3d``,
engine/trace3d.py):

* stratified control: z stays identically zero and the horizontal
  slowness azimuth is conserved to roundoff (the 3-D conservation oracle);
* with the eddy: rays passing near it deflect by kilometers in z, arrive
  at different depths, and the azimuth invariant breaks — the signature a
  2-D code structurally cannot produce.

Run:  python examples/eddy_3d.py [rays] [steps]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

# f64 end to end: the planarity assertion is a roundoff-grade statement
jax.config.update("jax_enable_x64", True)

import raytracing_tpu as rt  # noqa: E402

rays = int(sys.argv[1]) if len(sys.argv) > 1 else 64
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3000

# -- Munk-style channel (axis -1 km) + a warm eddy at (20, -1, +3) km -----
def n_munk(y):
    eta = 2.0 * (y + 1.0)
    c = 1.49 * (1.0 + 0.0057 * (eta - 1.0 + jnp.exp(-eta)))
    return 1.445 / c          # slowness, ~1 at the axis


EDDY = dict(x0=20.0, z0=3.0, L=4.0, eps=-4e-3)   # warm core: faster sound


def n_eddy(x, y, z):
    bump = jnp.exp(-((x - EDDY["x0"]) ** 2 + (z - EDDY["z0"]) ** 2)
                   / EDDY["L"] ** 2)
    return n_munk(y) * (1.0 + EDDY["eps"] * bump)


control = rt.Custom3D(lambda x, y, z: n_munk(y) + 0.0 * x + 0.0 * z)
with_eddy = rt.Custom3D(n_eddy)

# fan: source on the channel axis, launch along +x with vertical spread
tilt = np.linspace(-0.1, 0.1, rays)
pos0 = np.tile([[0.0, -1.0, 0.0]], (rays, 1))
dir0 = np.stack([np.cos(tilt), np.sin(tilt), np.zeros(rays)], -1)
ds = 0.015                                            # 15 m arc steps
box = (-1.0, 60.0, -3.0, 0.0, -30.0, 30.0)

ctl = rt.trace3d("op6", control, pos0=pos0, dir0=dir0, delta_s=ds,
                 steps=steps, box=box, dtype=np.float64, mode="metrics",
                 stats=True)
edd = rt.trace3d("op6", with_eddy, pos0=pos0, dir0=dir0, delta_s=ds,
                 steps=steps, box=box, dtype=np.float64, mode="metrics")

pc, pe = np.asarray(ctl.final.pos), np.asarray(edd.final.pos)
uc, ue = np.asarray(ctl.final.unitv), np.asarray(edd.final.unitv)

z_ctl = np.abs(pc[:, 2]).max()
z_edd = np.abs(pe[:, 2]).max()
az_edd = np.abs(np.arctan2(ue[:, 2], ue[:, 0])).max()
cv = ctl.horizontal_slowness_cv_pct()
dz_depth = np.abs(pe[:, 1] - pc[:, 1]).max()

rng = pc[:, 0].max()
print(f"Munk channel, {rays}-ray fan, {steps} x {ds * 1e3:.0f} m steps "
      f"(~{rng:.0f} km range)")
print(f"stratified control : max |z| = {z_ctl:.2e} km (planar), "
      f"slowness CV <= {np.nanmax(cv):.2e} %")
print(f"with eddy          : max |z| = {z_edd:.3f} km out-of-plane, "
      f"azimuth deflection up to {np.degrees(az_edd):.3f} deg")
print(f"arrival depth shift: up to {dz_depth * 1e3:.0f} m")

assert z_ctl < 1e-12, "control must stay in its launch plane"
assert np.nanmax(cv) < 0.05, "3-D conservation oracle (stratified)"
assert z_edd > 0.05, "the eddy must push rays visibly out of plane"
# the shift depends on where the fan's depth-cycle phase lands at the
# box exit, so the bar is "clearly nonzero", not a fixed magnitude (the
# control fan is bit-identical absent the eddy)
assert dz_depth > 3e-4, "eddy changes vertical arrival structure"

# -- the field-level payoff: the eddy refocuses energy (rt.trace_dynamic3:
# exact 2x2 paraxial Jacobian -> spherical-spreading TL along the ray) ----
axial = (np.zeros((1, 3)), np.array([[1.0, 0.0, 0.0]]))
tl = {}
for name, m in (("control", control), ("eddy", with_eddy)):
    dres = rt.trace_dynamic3("op6", m, pos0=axial[0] + [[0.0, -1.0, 0.0]],
                             dir0=axial[1], delta_s=ds, steps=steps,
                             box=box, mode="metrics")
    tl[name] = float(np.asarray(dres.transmission_loss_db())[0])
print(f"axial-ray TL at {rng:.0f} km: control {tl['control']:.2f} dB, "
      f"with eddy {tl['eddy']:.2f} dB "
      f"(focusing shift {tl['control'] - tl['eddy']:+.2f} dB)")
assert np.isfinite(tl["eddy"]) and abs(tl["control"] - tl["eddy"]) > 1e-4

# -- the measured-field story: the same eddy from RAW 3-D SAMPLES ---------
# A survey doesn't hand you a closed form; it hands you a gridded field.
# Sample n_eddy around the eddy, build tri-Hermite tables
# (rt.c1_medium3_from_samples, media/grid3.py), and check the sampled
# medium reproduces the analytic trace — the 3-D form of the reference's
# sample -> fit -> trace pipeline (RT_bench.py:412-464).
gx = np.linspace(10.0, 30.0, 51)          # 0.4 km pitch across the eddy
gy = np.linspace(-3.0, 0.0, 61)           # 50 m pitch down the channel
gz = np.linspace(-10.0, 10.0, 51)
Zg, Yg, Xg = np.meshgrid(gz, gy, gx, indexing="ij")
F = np.asarray(n_eddy(jnp.asarray(Xg), jnp.asarray(Yg), jnp.asarray(Zg)))
sampled = rt.c1_medium3_from_samples(F, gx, gy, gz, dtype=np.float64)

seg_steps = 1100                           # ~16.5 km inside the grid
pos0s = np.tile([[12.0, -1.0, 0.0]], (rays, 1))
box_s = (10.2, 29.8, -3.0, 0.0, -9.8, 9.8)
smp = rt.trace3d("op6", sampled, pos0=pos0s, dir0=dir0, delta_s=ds,
                 steps=seg_steps, box=box_s, dtype=np.float64,
                 mode="metrics")
ana = rt.trace3d("op6", with_eddy, pos0=pos0s, dir0=dir0, delta_s=ds,
                 steps=seg_steps, box=box_s, dtype=np.float64,
                 mode="metrics")
ps, pa = np.asarray(smp.final.pos), np.asarray(ana.final.pos)
dev = np.abs(ps - pa).max()
z_smp = np.abs(ps[:, 2]).max()
print(f"from raw samples   : max |z| = {z_smp:.3f} km out-of-plane, "
      f"max deviation vs analytic = {dev * 1e3:.2f} m over "
      f"{seg_steps * ds:.0f} km")
assert z_smp > 0.02, "sampled eddy must still deflect out of plane"
assert dev < 2e-3, f"sampled medium must track the analytic field ({dev})"
print("ok")
