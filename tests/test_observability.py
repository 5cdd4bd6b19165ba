"""Plan-vs-realized plotting + scene-overlay callbacks (VERDICT r1 item 6;
reference `mpc.py:601-685` plan overlays, `Rollout_MPC.py:74-128` +
`Rollout_combined_controller.py:28-58` visual callbacks)."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mpc(go2):
    from iterative_learning_nmpc_tpu.mpc.controller import LocomotionMPC

    return LocomotionMPC(go2, gait_name="trot", compute_timings=False,
                         solve_async=False)


def test_plot_traj_overlays(mpc, tmp_path):
    """All six variables plot; q/v/tau carry the dashed plan overlay."""
    n = 50
    rng = np.random.default_rng(0)
    mpc.q_full = list(rng.normal(size=(n, 18)))
    mpc.v_full = list(rng.normal(size=(n, 18)))
    mpc.tau_full = list(rng.normal(size=(n, 12)))
    mpc.q_plan_full = list(rng.normal(size=(n, 18)))
    mpc.v_plan_full = list(rng.normal(size=(n, 18)))
    mpc.tau_plan_full = list(rng.normal(size=(n, 12)))
    mpc.a_plan_full = list(rng.normal(size=(n, 18)))
    mpc.f_plan_full = list(rng.normal(size=(n, 4, 3)))
    mpc.dt_plan_full = [0.04] * n

    for var, ncurves in (("q", 2), ("v", 2), ("tau", 2), ("a", 1), ("f", 1),
                         ("dt", 1)):
        path = str(tmp_path / f"{var}.png")
        fig = mpc.plot_traj(var, save_path=path)
        assert os.path.exists(path)
        # first axis carries realized+plan (2 lines) or plan-only (1)
        assert len(fig.axes[0].lines) == ncurves, var
    with pytest.raises(ValueError):
        mpc.plot_traj("nope")


def test_plan_rows_recorded_in_closed_loop(mpc, go2):
    """Stepping the controller against MuJoCo records time-aligned plan rows
    alongside the realized state."""
    from iterative_learning_nmpc_tpu.sim.mujoco_sim import Simulator

    mpc.reset(reset_solver=False)
    sim = Simulator(go2)
    mpc.set_command(np.array([0.2, 0.0, 0.0]))
    sim.run(sim_time=0.06, controller=mpc, stop_on_fall=False)
    assert len(mpc.q_plan_full) == len(mpc.q_full) > 0
    assert len(mpc.f_plan_full) == len(mpc.q_full)
    assert np.asarray(mpc.f_plan_full).shape[1:] == (4, 3)
    assert len(mpc.dt_plan_full) == len(mpc.q_full)


def test_visual_callback_marker_injection(mpc, go2):
    """Overlay markers append to an MjvScene without a GL context: planned
    contacts, base-ref boxes, force capsule, and the expert/learner mode
    sphere all land in the scene."""
    import mujoco

    from iterative_learning_nmpc_tpu.sim.mujoco_sim import Simulator
    from iterative_learning_nmpc_tpu.sim.visual import MPCVisualCallback

    sim = Simulator(go2)
    scene = mujoco.MjvScene(sim.model, maxgeom=100)
    scene.ngeom = 0

    class FakeCombined:
        mpc_active = True

    mpc._last_base_ref = np.r_[0.1, 0.0, 0.3, np.zeros(9)]
    mpc._last_base_ref_e = np.r_[0.4, 0.0, 0.3, np.zeros(9)]
    cnt_loc = np.zeros((4, 5, 3))
    cnt_loc[:, 1, :2] = [[0.2, 0.15], [0.2, -0.15], [-0.2, 0.15], [-0.2, -0.15]]
    mpc._last_cnt_loc = cnt_loc
    sim.data.xfrc_applied[sim.trunk_body][:3] = [50.0, 0.0, 0.0]

    cb = MPCVisualCallback(mpc, combined=FakeCombined(),
                           trunk_body=sim.trunk_body)
    cb.render(scene, sim.data)
    # 4 contact spheres + 2 ref boxes + 1 force capsule + 1 mode sphere
    assert scene.ngeom == 8
    # mode sphere is red (expert)
    rgba = np.asarray(scene.geoms[scene.ngeom - 1].rgba)
    assert rgba[0] > 0.9 and rgba[2] < 0.3

    FakeCombined.mpc_active = False
    scene.ngeom = 0
    cb.render(scene, sim.data)
    rgba = np.asarray(scene.geoms[scene.ngeom - 1].rgba)
    assert rgba[2] > 0.9  # learner = blue
