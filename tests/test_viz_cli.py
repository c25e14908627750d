"""Visualization analysis + CLI pipeline (headless, CPU)."""
import dataclasses
import io

import numpy as np
import pytest

import raytracing_tpu as rt
from raytracing_tpu.viz import plots


@pytest.fixture(scope="module")
def vert_result():
    scen = dataclasses.replace(rt.scenario("vert"), s_max=6.0)
    med = rt.analytic_medium("vert_heterogeneous")
    return rt.trace("op8", scen, med, delta_s=0.01, dtype=np.float64), scen


def test_wavefront_normals_match_ray_angles(vert_result):
    """Physical cross-check the reference prints (RT_bench.py:1024-1039):
    wavefront normals must agree with ray group angles."""
    result, _ = vert_result
    wf = plots.wavefront(result, 0.3)
    assert wf is not None
    assert wf.points.shape[0] > 5
    # interior points: normal-vs-ray-angle agreement well under 0.05 rad
    interior = wf.angle_diffs[2:-2]
    assert np.median(interior) < 0.05, wf.angle_diffs


def test_wavefront_none_when_too_early(vert_result):
    result, _ = vert_result
    assert plots.wavefront(result, 1e9) is None


def test_plot_static_and_momentum(tmp_path, vert_result):
    result, scen = vert_result
    fig, fronts = plots.plot_static(result, scen,
                                    save=str(tmp_path / "static.png"))
    assert (tmp_path / "static.png").exists()
    assert len(fronts) > 0
    plots.plot_momentum(result, scen, delta_s=0.01,
                        save=str(tmp_path / "mom.png"))
    assert (tmp_path / "mom.png").exists()


def test_cli_noninteractive_fisheye(capsys):
    from raytracing_tpu import cli
    res = cli.main(["--scenario", "fisheye", "--op", "1",
                    "--delta-s", "default", "--medium", "analytic",
                    "--dtype", "float64", "--n-turns", "1"])
    assert res is not None
    out = capsys.readouterr().out
    assert "RESULTS" in out and "Closure error" in out


def test_cli_interactive_flow(capsys, monkeypatch):
    """Drive the reference's menu flow: scenario 2, algorithm 1, no search,
    no calibrated (default), no benchmark."""
    from raytracing_tpu import cli
    import raytracing_tpu.config as cfg
    answers = iter(["2", "1", "n", "n", "n"])
    monkeypatch.setattr(cfg, "N_TURNS", 1)
    res = cli.interactive(input_fn=lambda _: next(answers))
    out = capsys.readouterr().out
    assert "Choose a Test Option" in out
    assert "Closure error" in out


def test_cli_op_aliases():
    from raytracing_tpu import cli
    assert cli.op_for_choice("aniso", "1") == "op10"
    assert cli.op_for_choice("aniso", "2") == "op11"
    assert cli.op_for_choice("vert", "7") == "op7"


def test_animate_wavefronts_saves_gif(tmp_path, vert_result):
    result, scen = vert_result
    from raytracing_tpu.viz import plots
    ani, path = plots.animate_wavefronts(result, scen, frames=4,
                                         save=str(tmp_path / "wf.mp4"))
    # no ffmpeg in this image -> pillow fallback rewrites the extension
    assert path.endswith(".gif") or path.endswith(".mp4")
    import os
    assert os.path.getsize(path) > 0


def test_cli_interactive_vert_static(capsys, monkeypatch):
    """Scenario 3 through the menus: calibrated step, static plot + report."""
    from raytracing_tpu import cli
    answers = iter(["3", "8", "n", "y", "n", "1"])
    res = cli.interactive(input_fn=lambda _: next(answers))
    out = capsys.readouterr().out
    assert "Coefficient of Variation" in out
    assert "Travel Time" in out  # wavefront report ran


def test_cli_rays_batch_mode(capsys):
    from raytracing_tpu import cli
    out = cli.main(["--scenario", "fisheye", "--op", "6", "--rays", "256",
                    "--medium", "analytic", "--n-turns", "1",
                    "--delta-s", "default"])
    text = capsys.readouterr().out
    assert "ray-steps/s" in text and "Closure error" in text


def test_cli_medium_file_mode(capsys, tmp_path):
    """--medium-file traces a measured .npz medium end-to-end (both
    dimensionalities), saves positions, and demands its required flags."""
    from raytracing_tpu import cli

    y = np.linspace(-2.0, 1.0, 61)
    np.savez(tmp_path / "prof.npz", samples=1.0 + 0.3 * np.tanh(2.0 * y), y=y)
    gx = np.linspace(-2.0, 2.0, 41)
    gy = np.linspace(-1.5, 1.5, 31)
    np.savez(tmp_path / "lens.npz",
             samples=1.0 / (1.0 + 0.4 * gx[None, :] ** 2
                            + 0.6 * gy[:, None] ** 2), x=gx, y=gy)

    out_npy = tmp_path / "pos.npy"
    res = cli.main(["--medium-file", str(tmp_path / "prof.npz"),
                    "--op", "op6", "--delta-s-value", "0.01",
                    "--steps", "80", "--rays", "128", "--family", "c1",
                    "--box", "-5", "5", "-2", "1",
                    "--launch", "0.0", "-1.5", "-0.5", "0.3",
                    "--save-pos", str(out_npy)])
    text = capsys.readouterr().out
    assert res is not None and "profile (c1)" in text
    assert np.load(out_npy).shape == (128, 2)
    # x-independent medium -> the conservation report; C1 media conserve
    # p_x to the analytic floor
    import re
    m = re.search(r"CV\(p_x\).*max (\d+\.\d+) %", text)
    assert m and float(m[1]) < 0.05, text

    png = tmp_path / "rays.png"
    res = cli.main(["--medium-file", str(tmp_path / "lens.npz"),
                    "--op", "6", "--delta-s-value", "0.01",
                    "--steps", "60", "--rays", "256",
                    "--launch", "-1.5", "-0.3", "0.3", "0.0",
                    "--plot", "static", "--save-plot", str(png)])
    text = capsys.readouterr().out
    assert res is not None and "41 grid (parity)" in text
    assert "CV(p_x)" not in text        # 2-D medium: p_x not invariant
    assert png.exists() and png.stat().st_size > 1000

    with pytest.raises(SystemExit):
        cli.main(["--medium-file", str(tmp_path / "lens.npz")])
    assert "--delta-s-value" in capsys.readouterr().err


def test_cli_medium_file_calibrate(capsys, tmp_path):
    """--calibrate picks delta_s by self-convergence, then traces at it."""
    from raytracing_tpu import cli

    y = np.linspace(-2.0, 1.0, 61)
    np.savez(tmp_path / "prof.npz", samples=1.0 + 0.3 * np.tanh(2.0 * y), y=y)
    res = cli.main(["--medium-file", str(tmp_path / "prof.npz"),
                    "--op", "op6", "--calibrate", "1e-2",
                    "--arc-length", "1.0", "--rays", "128",
                    "--family", "c1", "--box", "-5", "5", "-2", "1",
                    "--launch", "0.0", "-1.5", "-0.5", "0.3"])
    text = capsys.readouterr().out
    assert res is not None
    assert "calibrated (61-sample profile): delta_s" in text
    assert "profile (c1)" in text

    with pytest.raises(SystemExit):
        cli.main(["--medium-file", str(tmp_path / "prof.npz"),
                  "--op", "op6", "--calibrate", "1e-2",
                  "--launch", "0.0", "-1.5", "-0.5", "0.3"])
    assert "--arc-length" in capsys.readouterr().err


def test_cli_search_flow(capsys, monkeypatch):
    """DELTA_S search through the CLI (narrowed candidate range)."""
    import raytracing_tpu.config as cfg
    from raytracing_tpu import cli
    monkeypatch.setattr(cfg, "DELTA_S_DIVISOR_FISHEYE_UPPER_LIMIT", 40.0)
    res = cli.main(["--scenario", "fisheye", "--op", "1", "--delta-s", "search",
                    "--medium", "analytic", "--dtype", "float64",
                    "--n-turns", "1"])
    out = capsys.readouterr().out
    assert "FINDING SUITABLE DIVISOR" in out
    assert "Found best divisor!" in out
    assert res is not None


def test_cli_aniso_flow(capsys):
    from raytracing_tpu import cli
    res = cli.main(["--scenario", "aniso", "--op", "2", "--delta-s", "default",
                    "--medium", "analytic", "--dtype", "float64"])
    out = capsys.readouterr().out
    assert res is not None
    assert "Coefficient of Variation" in out


def test_cli_calibrated_fallback_extension_ops(capsys):
    """run_pipeline('calibrated') must not KeyError on ops absent from the
    calibrated table (op12 borrows op8's entry; combos fall back to op8)."""
    from raytracing_tpu import cli, config
    scen = config.scenario("fisheye")
    res = cli.run_pipeline(scen, "op12", delta_s_mode="calibrated",
                           medium_kind="analytic", n_turns=1,
                           printer=lambda *a, **k: None)
    assert res is not None


def test_cli_eigenrays(capsys, tmp_path):
    """--eigenrays solves source->receiver arrivals through a measured
    profile and reports per-receiver transmission loss."""
    from raytracing_tpu import cli

    y = np.linspace(-1.5, 1.5, 61)
    np.savez(tmp_path / "wg.npz", samples=1.2 - 0.25 * y * y, y=y)
    res = cli.main(["--medium-file", str(tmp_path / "wg.npz"),
                    "--op", "op6", "--delta-s-value", "0.02",
                    "--steps", "520", "--family", "c1",
                    "--box", "-1", "10", "-1.5", "1.5",
                    "--eigenrays", "0", "0",
                    "--receiver", "8", "0", "--receiver", "8", "0.3",
                    "--fan", "-0.45", "0.45", "96", "--omega", "40"])
    text = capsys.readouterr().out
    assert "TL incoherent" in text and "coherent" in text
    assert len(res.theta0) >= 2
    assert bool(np.all(np.asarray(res.converged)))
    assert "WARNING" not in text

    # golden op rejected with guidance; missing receivers is a usage error
    with pytest.raises(SystemExit):
        cli.main(["--medium-file", str(tmp_path / "wg.npz"), "--op", "op5",
                  "--delta-s-value", "0.02", "--steps", "40",
                  "--eigenrays", "0", "0", "--receiver", "1", "0"])
    with pytest.raises(SystemExit):
        cli.main(["--medium-file", str(tmp_path / "wg.npz"), "--op", "op6",
                  "--delta-s-value", "0.02", "--steps", "40",
                  "--eigenrays", "0", "0"])


def test_plot_eigenrays_and_tl(tmp_path):
    """Eigenray path plot + TL curve render headless and save."""
    import jax.numpy as jnp

    from raytracing_tpu.engine.eigenray import find_eigenrays
    from raytracing_tpu.media.medium import CustomMedium
    from raytracing_tpu.viz import plots

    med = CustomMedium(lambda x, y: 1.5 - 0.5 * y * y + 0.0 * x)
    receivers = [[12.0, 0.0], [12.0, 0.4]]
    box = (-1, 15, -1.5, 1.5)
    eig = find_eigenrays("op6", med, source=(0, 0), receivers=receivers,
                         delta_s=0.02, max_size=900, box=box,
                         fan=(-0.6, 0.6, 96))
    assert len(eig.theta0) >= 2
    fig = plots.plot_eigenrays(eig, "op6", med, source=(0, 0),
                               receivers=receivers, delta_s=0.02, steps=900,
                               box=box, save=str(tmp_path / "eig.png"))
    assert (tmp_path / "eig.png").stat().st_size > 0
    fig2 = plots.plot_transmission_loss(eig, receivers, omega=40.0,
                                        save=str(tmp_path / "tl.png"))
    assert (tmp_path / "tl.png").stat().st_size > 0
    import matplotlib.pyplot as plt
    plt.close(fig)
    plt.close(fig2)


def test_plot_rays3d(tmp_path):
    import jax.numpy as jnp

    from raytracing_tpu.engine.trace3d import trace3d
    from raytracing_tpu.media.fields3d import Custom3D
    from raytracing_tpu.viz import plots

    med = Custom3D(lambda x, y, z: 1.5 - 0.5 * y * y + 0.0 * x * z)
    th = np.linspace(-0.3, 0.3, 6)
    res = trace3d("op6", med, pos0=np.zeros((6, 3)),
                  dir0=np.stack([np.cos(th), np.sin(th),
                                 np.full(6, 0.1)], -1),
                  delta_s=0.05, steps=200, dtype=np.float64,
                  box=(-1, 12, -2, 2, -2, 2))
    fig = plots.plot_rays3d(res, box=(-1, 12, -2, 2, -2, 2),
                            save=str(tmp_path / "r3.png"))
    assert (tmp_path / "r3.png").stat().st_size > 0
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_cli_eigenrays3(capsys, tmp_path):
    """--eigenrays3 lifts a measured profile to 3-D and reports arrivals
    + TL per (x, y, z) receiver (the CLI twin of /v1/eigenrays3)."""
    from raytracing_tpu import cli

    y = np.linspace(-1.5, 1.5, 61)
    np.savez(tmp_path / "wg.npz", samples=1.2 - 0.25 * y * y, y=y)
    res = cli.main(["--medium-file", str(tmp_path / "wg.npz"),
                    "--op", "6", "--delta-s-value", "0.02",
                    "--steps", "420", "--family", "c1",
                    "--eigenrays3", "0", "0", "0",
                    "--receiver3", "6", "0", "0.3",
                    "--fan3", "-0.4", "0.4", "13", "-0.4", "0.4", "13",
                    "--omega", "40"])
    text = capsys.readouterr().out
    assert "lifted to 3-D" in text and "TL incoherent" in text
    assert len(np.asarray(res.traveltime)) >= 1
    assert bool(np.all(np.asarray(res.converged)))

    # a 2-D grid file is rejected with guidance; missing receivers errors
    Z = np.ones((8, 9))
    np.savez(tmp_path / "grid.npz", samples=Z,
             x=np.linspace(0, 1, 9), y=np.linspace(0, 1, 8))
    with pytest.raises(SystemExit):
        cli.main(["--medium-file", str(tmp_path / "grid.npz"), "--op", "6",
                  "--delta-s-value", "0.02", "--steps", "40",
                  "--eigenrays3", "0", "0.5", "0",
                  "--receiver3", "1", "0.5", "0"])
    with pytest.raises(SystemExit):
        cli.main(["--medium-file", str(tmp_path / "wg.npz"), "--op", "6",
                  "--delta-s-value", "0.02", "--steps", "40",
                  "--eigenrays3", "0", "0", "0"])
