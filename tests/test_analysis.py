"""Analysis/diagnostics module tests."""
import os

import numpy as np

from iterative_learning_nmpc_tpu.learning import analysis as an


def test_pca(rng):
    # data concentrated along a known direction
    d = rng.normal(size=(500, 1)) @ np.array([[3.0, 1.0, 0.0, 0.0]])
    d += 0.01 * rng.normal(size=(500, 4))
    proj, comps, ratio = an.pca(d, 2)
    assert proj.shape == (500, 2)
    assert ratio[0] > 0.95
    direction = comps[0] / np.linalg.norm(comps[0])
    expected = np.array([3.0, 1.0, 0.0, 0.0]) / np.sqrt(10)
    assert abs(abs(direction @ expected) - 1.0) < 1e-3


def test_velocity_goal_error():
    v = np.zeros((10, 3))
    v[:, 0] = 0.25
    g = np.zeros((10, 3))
    g[:, 0] = 0.3
    err, mean_err = an.velocity_goal_error(v, g)
    assert abs(mean_err[0] - 0.05) < 1e-12


def test_butterworth_smoothing(rng):
    t = np.arange(0, 4, 1e-3)
    clean = np.sin(2 * np.pi * 1 * t)  # 1 Hz
    noisy = clean + 0.3 * np.sin(2 * np.pi * 100 * t)  # 100 Hz noise
    smoothed = an.butterworth_lowpass(noisy, cutoff_hz=5.0)
    # away from filtfilt edge transients the noise is gone
    assert np.abs(smoothed - clean)[500:-500].max() < 0.05


def test_distance_and_bounds(rng):
    nom = np.zeros((100, 4))
    nom_t = np.arange(100) * 0.01
    s = np.ones((5, 4)) * 2.0
    d = an.perturbed_vs_nominal_distance(s, np.arange(5) * 0.01, nom, nom_t)
    np.testing.assert_allclose(d, 4.0)
    lo, hi = an.action_bounds(np.array([[1.0, -2.0], [3.0, 0.0]]))
    np.testing.assert_allclose(lo, [1.0, -2.0])
    np.testing.assert_allclose(hi, [3.0, 0.0])


def test_figures_build(tmp_path, rng):
    states = [rng.normal(size=(100, 6)), rng.normal(1.0, 1.0, size=(80, 6))]
    f1 = an.plot_pca_analysis(states, save_path=str(tmp_path / "pca.png"))
    f2 = an.plot_dataset_distribution(states, dims=range(4),
                                      save_path=str(tmp_path / "dist.png"))
    times = np.arange(50) * 1e-3
    f3 = an.plot_policy_tracking(times, rng.normal(size=(50, 3)) * 0.1,
                                 np.zeros((50, 3)),
                                 save_path=str(tmp_path / "track.png"))
    f4 = an.plot_feet_position(times, rng.normal(size=(50, 12)),
                               save_path=str(tmp_path / "feet.png"))
    for name in ("pca.png", "dist.png", "track.png", "feet.png"):
        assert (tmp_path / name).exists()


def test_new_figure_builders(tmp_path, ):
    """The round-2 figure additions (perturbed-vs-nominal, smoothing
    comparison, action bounds, expert segments) render and save."""
    import os

    rng = np.random.default_rng(2)
    T = 200
    t = np.arange(T) * 1e-3
    nom = rng.normal(size=(T, 8)) * 0.1
    pert = nom + np.where(t[:, None] > 0.1, 6.0, 0.0)
    f = an.plot_perturbed_vs_nominal(t, pert, t, nom, threshold=4.0,
                                     save_path=str(tmp_path / "pvn.png"))
    assert os.path.exists(str(tmp_path / "pvn.png"))

    sig = np.sin(2 * np.pi * 2.0 * t)[:, None] + 0.2 * rng.normal(size=(T, 1))
    an.plot_smoothing_comparison(t, sig, cutoff_hz=5.0, fs_hz=1000.0,
                                 save_path=str(tmp_path / "sm.png"))
    assert os.path.exists(str(tmp_path / "sm.png"))

    acts = rng.normal(size=(T, 12)) * 0.3
    jl = np.tile([[-1.0, 1.0]], (12, 1))
    an.plot_action_bounds(acts, joint_limits=jl,
                          save_path=str(tmp_path / "ab.png"))
    assert os.path.exists(str(tmp_path / "ab.png"))

    mode = (t > 0.05).astype(float)
    fig = an.plot_expert_segments(t, mode, save_path=str(tmp_path / "exp.png"))
    assert os.path.exists(str(tmp_path / "exp.png"))
    assert "75" in fig.axes[0].get_title() or "%" in fig.axes[0].get_title()


def test_analyze_dataset_cli(tmp_path):
    """examples/analyze_dataset.py drives every figure builder over npz
    (the runnable counterpart of the reference's plot scripts)."""
    import subprocess
    import sys

    rng = np.random.default_rng(3)
    T = 120
    np.savez(tmp_path / "roll.npz",
             state=rng.normal(size=(T, 44)),
             action=rng.normal(size=(T, 12)),
             vc_goal=np.tile([0.3, 0.0, 0.0], (T, 1)),
             time=np.arange(T) * 1e-3,
             feet_pos_w=rng.normal(size=(T, 4, 3)),
             is_expert=(np.arange(T) % 40 < 10))
    np.savez(tmp_path / "nom.npz",
             state=rng.normal(size=(T, 44)),
             time=np.arange(T) * 1e-3)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "analyze_dataset.py"),
         "--dataset", str(tmp_path / "roll.npz"),
         "--nominal", str(tmp_path / "nom.npz"),
         "--out", str(tmp_path / "figs")],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    for name in ("pca.png", "distributions.png", "action_bounds.png",
                 "tracking.png", "feet.png", "ood_distance.png",
                 "smoothing.png", "expert_segments.png"):
        assert os.path.exists(str(tmp_path / "figs" / name)), name
