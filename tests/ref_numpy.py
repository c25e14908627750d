"""Scalar numpy mirror of the integrator, for cross-checking the JAX engine.

This is an independent, deliberately-naive float64 transcription of the same
physics the package implements (Fermat equations of motion with the
MxSA/AnDF/HySA step pairings and the anisotropic momentum algorithm,
per "On ray tracing for sharp changing media", JASA 146(3):1595-1604, and
RT_bench.py's documented behavior).  It follows the *reference's* control
flow — per-ray Python loop, data-dependent break, while-loop golden search,
mutable position window — so that comparing it against the vmapped
``lax.scan`` engine exercises exactly the things most likely to be wrong
there: masking, early exit, window priming, and golden's fixed trip count.
"""
from __future__ import annotations

import sys

import numpy as np

from raytracing_tpu import config

GOLD_TOL = np.sqrt(sys.float_info.epsilon)
GOLD_RATIO = config.GOLD_RATIO
DELTA_G = config.DELTA_G


# -- media ------------------------------------------------------------------
def make_medium(field):
    sqrt2 = np.sqrt(2.0)
    if field == "interface":
        def n_and_grad(x, y):
            e = np.exp(-y / config.THCK_PARAM)
            sig = 1.0 / (1.0 + e)
            n = sqrt2 - (sqrt2 - 1.0) * sig
            dndy = -(sqrt2 - 1.0) * sig * (1.0 - sig) / config.THCK_PARAM
            return n, np.array([0.0, dndy])
    elif field == "fisheye":
        def n_and_grad(x, y):
            n = 1.0 / (1.0 + x * x + y * y)
            return n, -2.0 * n * n * np.array([x, y])
    elif field == "vert_heterogeneous":
        def n_and_grad(x, y):
            n = 1.0 / (18.0 + 2.0 * y)
            return n, np.array([0.0, -2.0 * n * n])
    else:
        raise ValueError(field)
    return n_and_grad


def anisotropy(theta, gamma):
    return np.sqrt((gamma * np.sin(theta)) ** 2 + np.cos(theta) ** 2)


def moment(n, theta, gamma, trig, quad):
    coef = anisotropy(theta, gamma)
    return n * coef * trig * (1.0 + quad * (gamma ** 2 - 1.0) / coef ** 2)


def moments(theta, n, unitv, gamma):
    return np.array([
        moment(n, theta, gamma, unitv[0], -unitv[1] ** 2),
        moment(n, theta, gamma, unitv[1], unitv[0] ** 2),
    ])


def impulse(a, b, step):
    return step * (a + b) / 2.0


def golden(func, a, b):
    """While-loop golden search, reference-style (RT_bench.py:175-199)."""
    c = b - (b - a) * GOLD_RATIO
    d = a + (b - a) * GOLD_RATIO
    while abs(c - d) > GOLD_TOL:
        if func(c) < func(d):
            b = d
        else:
            a = c
        c = b - (b - a) * GOLD_RATIO
        d = a + (b - a) * GOLD_RATIO
    return (b + a) / 2.0


# -- steppers ---------------------------------------------------------------
def taylor1(pos, unitv, step):
    return pos + unitv * step


def taylor2(pos, unitv, step, n, grad):
    return pos + unitv * step + (grad - np.dot(grad, unitv) * unitv) * step ** 2 / (2.0 * n)


def curvature(angle, grad, unitv, n, pos, step):
    curv = np.linalg.norm(grad - np.dot(grad, unitv) * unitv) / n
    if curv < GOLD_TOL:
        return taylor1(pos, unitv, step), False
    d = curv * step
    if grad[0] * unitv[1] - grad[1] * unitv[0] > 0:
        delta = np.array([np.sin(angle) - np.sin(angle - d),
                          np.cos(angle - d) - np.cos(angle)])
    else:
        delta = np.array([np.sin(angle + d) - np.sin(angle),
                          -np.cos(angle + d) + np.cos(angle)])
    return pos + delta / curv, True


# -- angle solvers ----------------------------------------------------------
def theta_cost(init_n, angle, i_grad, f_grad, step):
    return np.arctan2(init_n * np.sin(angle) + impulse(i_grad[1], f_grad[1], step),
                      init_n * np.cos(angle) + impulse(i_grad[0], f_grad[0], step))


def rk2(angle, step, init_n, final_n, i_grad, f_grad):
    k1 = step * (np.cos(angle) * i_grad[1] - np.sin(angle) * i_grad[0]) / init_n
    k2 = step * (np.cos(angle + k1) * f_grad[1] - np.sin(angle + k1) * f_grad[0]) / final_n
    return angle + (k1 + k2) / 2.0


def iso_cost(theta, final_n, init_n, unitv, i_grad, f_grad, step):
    rx = final_n * np.cos(theta) - init_n * unitv[0] - impulse(i_grad[0], f_grad[0], step)
    ry = final_n * np.sin(theta) - init_n * unitv[1] - impulse(i_grad[1], f_grad[1], step)
    return rx ** 2 + ry ** 2


def aniso_cost(theta, final_n, mi, coef_i, i_grad, f_grad, step, gamma):
    coef_f = anisotropy(theta, gamma)
    mf_x = moment(final_n, theta, gamma, np.cos(theta), -np.sin(theta) ** 2)
    mf_y = moment(final_n, theta, gamma, np.sin(theta), np.cos(theta) ** 2)
    rx = mf_x - mi[0] - impulse(coef_i * i_grad[0], coef_f * f_grad[0], step)
    ry = mf_y - mi[1] - impulse(coef_i * i_grad[1], coef_f * f_grad[1], step)
    return rx ** 2 + ry ** 2


# -- single-step op dispatch -------------------------------------------------
def step_op(op, angle, n, grad, unitv, pos, coef, window, step_idx,
            n_and_grad, gamma, step):
    """One integration step; ``window`` is a list of recent positions."""
    stepper, solver = {
        "op1": ("t1", "cost"), "op2": ("t1", "rk2"), "op3": ("cv", "rk2"),
        "op4": ("cv", "cost"), "op5": ("cv", "golden"), "op6": ("t2", "rk2"),
        "op7": ("t2", "fd"), "op8": ("t2", "cost"), "op9": ("t2", "golden"),
        "op10": ("cv", "golden_aniso"), "op11": ("t2", "golden_aniso"),
    }[op]

    if stepper == "t1":
        f_pos, sig = taylor1(pos, unitv, step), True
    elif stepper == "t2":
        f_pos, sig = taylor2(pos, unitv, step, n, grad), True
    else:
        f_pos, sig = curvature(angle, grad, unitv, n, pos, step)

    f_n, f_grad = n_and_grad(f_pos[0], f_pos[1])

    if not sig:
        f_angle = angle
    elif solver == "cost":
        f_angle = theta_cost(n, angle, grad, f_grad, step)
    elif solver == "rk2":
        f_angle = rk2(angle, step, n, f_n, grad, f_grad)
    elif solver == "golden":
        f_angle = golden(lambda t: iso_cost(t, f_n, n, unitv, grad, f_grad, step),
                         angle - DELTA_G, angle + DELTA_G)
    elif solver == "golden_aniso":
        mi = np.array([moment(n, angle, gamma, unitv[0], -unitv[1] ** 2),
                       moment(n, angle, gamma, unitv[1], unitv[0] ** 2)])
        f_angle = golden(lambda t: aniso_cost(t, f_n, mi, coef, grad, f_grad, step, gamma),
                         angle - DELTA_G, angle + DELTA_G)
    else:  # fd with order ramp
        window.append(f_pos.copy())
        w = window[-4:] if len(window) >= 4 else window
        if step_idx == 1:
            x = w[-1] - w[-2]
        elif step_idx == 2:
            x = 3 * w[-1] - 4 * w[-2] + w[-3]
        else:
            x = 11 * w[-1] - 18 * w[-2] + 9 * w[-3] - 2 * w[-4]
        f_angle = np.arctan2(x[1], x[0])

    return f_pos, f_angle, f_n, f_grad


def trace(op, scen, delta_s, divisor=None, n_turns=config.N_TURNS):
    """Per-ray serial integration mirroring ``trazar`` (RT_bench.py:766-948)."""
    n_and_grad = make_medium(scen.field)
    gamma = scen.gamma
    max_size = scen.max_size(delta_s, divisor, n_turns)
    limx_i, limx_s, limy_i, limy_s = scen.box
    R = scen.ray_count
    s_ray = np.zeros((max_size, 6, R))
    n_ray = np.zeros((max_size, R))
    d_ray = np.zeros((3, R))

    for k in range(R):
        pos = scen.pos0[k].astype(np.float64).copy()
        angle = float(scen.theta0[k])
        unitv = np.array([np.cos(angle), np.sin(angle)])
        n, grad = n_and_grad(pos[0], pos[1])
        coef = anisotropy(angle, gamma)
        m = moments(angle, n, unitv, gamma)
        s_ray[0, 0:2, k] = pos
        s_ray[0, 2:4, k] = m
        s_ray[0, 5, k] = angle
        n_ray[0, k] = coef * n
        dist_sim = dist_real = 0.0
        window = [pos.copy()]
        i = max_size - 1
        for i in range(1, max_size):
            f_pos, f_angle, f_n, f_grad = step_op(
                op, angle, n, grad, unitv, pos, coef, window, i,
                n_and_grad, gamma, delta_s)
            dist = np.linalg.norm(pos - f_pos)
            dist_sim += dist
            dist_real += delta_s
            pos, angle, n, grad = f_pos, f_angle, f_n, f_grad
            unitv = np.array([np.cos(angle), np.sin(angle)])
            coef = anisotropy(angle, gamma)
            m = moments(angle, n, unitv, gamma)
            s_ray[i, 0:2, k] = pos
            s_ray[i, 2:4, k] = m
            s_ray[i, 5, k] = angle
            n_ray[i, k] = coef * n
            s_ray[i, 4, k] = s_ray[i - 1, 4, k] + dist * (n_ray[i - 1, k] + n_ray[i, k]) / 2.0
            if pos[0] > limx_s or pos[0] < limx_i or pos[1] > limy_s or pos[1] < limy_i:
                break
        d_ray[0, k] = dist_real
        d_ray[1, k] = dist_sim
        d_ray[2, k] = i
    return s_ray, n_ray, d_ray
