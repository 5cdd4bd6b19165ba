"""End-to-end closed-loop MPC test: Go2 trot in MuJoCo (the minimum
end-to-end slice from SURVEY.md §7.4)."""
import numpy as np
import pytest

from iterative_learning_nmpc_tpu.mpc.controller import LocomotionMPC
from iterative_learning_nmpc_tpu.sim.mujoco_sim import ForceWindow, Simulator


@pytest.mark.slow
def test_go2_trot_velocity_tracking(go2):
    sim = Simulator(go2)
    mpc = LocomotionMPC(go2, gait_name="trot", solve_async=False, compute_timings=True)
    v_des = 0.3
    mpc.set_command(np.array([v_des, 0.0, 0.0]))
    res = sim.run(sim_time=2.0, controller=mpc)

    assert not res.fell, f"robot fell: {res}"
    assert not res.diverged
    z = sim.data.qpos[2]
    assert 0.22 < z < 0.38, f"base height off nominal: {z}"
    # realized forward speed within 0.1 m/s of command (the reference's
    # SafeDAgger velocity-tracking tolerance, Rollout_combined_controller.py:430)
    x_progress = sim.data.qpos[0]
    # allow the first ~0.3 s for the gait transient
    assert abs(x_progress / res.sim_time - v_des) < 0.12, x_progress
    # attitude sane
    quat = sim.data.qpos[3:7]
    assert abs(quat[0]) > 0.97  # < ~14 deg total tilt


@pytest.mark.slow
def test_go2_trot_survives_push(go2):
    sim = Simulator(go2)
    mpc = LocomotionMPC(go2, gait_name="trot", solve_async=False)
    mpc.set_command(np.array([0.0, 0.0, 0.0]))
    push = [ForceWindow(start=0.7, end=0.9, force=np.array([40.0, 20.0, 0.0]))]
    res = sim.run(sim_time=1.6, controller=mpc, force_schedule=push)
    assert not res.fell, f"robot fell after push: {res}"
    assert 0.2 < sim.data.qpos[2] < 0.4


@pytest.mark.slow
def test_go2_trot_turning(go2):
    """Yaw-rate command turns the robot (regression: w_des ordering bug put
    the yaw rate in the roll-rate reference slot)."""
    from iterative_learning_nmpc_tpu.models import transforms_np as tnp

    sim = Simulator(go2)
    mpc = LocomotionMPC(go2, gait_name="trot", solve_async=False)
    mpc.set_command(np.array([0.2, 0.0, 0.0]), w_yaw=0.4)
    res = sim.run(sim_time=2.0, controller=mpc)
    assert not res.fell
    ypr = tnp.matrix_to_ypr(tnp.quat_wxyz_to_matrix(sim.data.qpos[3:7]))
    # turned substantially in the commanded direction
    assert ypr[0] > 0.4, ypr
    assert abs(ypr[1]) < 0.3 and abs(ypr[2]) < 0.3


@pytest.mark.slow
def test_divergence_cold_reboot_recovery(go2):
    """Fault injection (SURVEY §5): a solver exception mid-run triggers an
    automatic phase-aligned cold reboot (recover_on_divergence), and the
    robot keeps walking — vs the reference, which latches diverged and
    free-runs the last plan forever (`mpc.py:562-569`)."""
    sim = Simulator(go2)
    mpc = LocomotionMPC(go2, gait_name="trot", solve_async=False,
                        recover_on_divergence=2)
    mpc.set_command(np.array([0.2, 0.0, 0.0]))
    orig = mpc.optimize
    calls = {"n": 0}

    def flaky(q, v):
        calls["n"] += 1
        if calls["n"] == 10:
            raise RuntimeError("injected solver fault")
        return orig(q, v)

    mpc.optimize = flaky
    res = sim.run(sim_time=2.0, controller=mpc)
    assert calls["n"] > 10, "replanning did not continue after the fault"
    assert not mpc.diverged
    assert mpc._recoveries_left == 1
    assert not res.fell, res
    assert 0.2 < sim.data.qpos[2] < 0.4
    # two cold boots happened: initial + the post-fault reboot
    assert len(mpc.boot_offsets) >= 2, mpc.boot_offsets
