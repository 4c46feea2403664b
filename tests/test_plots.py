"""Smoke-render every figure function to files."""
import os

import numpy as np

from blindno.eval import plots


def test_all_figures_render(tmp_path, rng):
    x = np.linspace(0, 1, 80)
    u_gt = -np.exp(-(((x - 0.5) / 0.1) ** 2))
    models = {"blindno": u_gt * 1.02, "nio": u_gt * 0.9, "fno": u_gt * 1.1}
    plots.plot_drift_comparison(x, u_gt, models, str(tmp_path / "drift.png"))

    t = np.linspace(0, 1, 50)
    ref = np.abs(rng.standard_normal((50, 80))) + 1.0
    trajs = {k: ref + 0.01 * rng.standard_normal((50, 80)) for k in models}
    plots.plot_error_over_time(t, trajs, ref, str(tmp_path / "eot.png"))
    plots.plot_final_density(x, trajs, ref, str(tmp_path / "final.png"))
    plots.plot_spacetime_density(ref, str(tmp_path / "st.png"), title="|psi|")
    plots.plot_field_2d(rng.standard_normal((61, 61)), str(tmp_path / "f2d.png"),
                        clamp_nonpositive=True)
    for f in ("drift.png", "eot.png", "final.png", "st.png", "f2d.png"):
        assert os.path.getsize(tmp_path / f) > 1000
