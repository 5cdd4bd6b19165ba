"""On-device batched simulator tests (+ MuJoCo cross-check on standing)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.models import dynamics as dyn
from iterative_learning_nmpc_tpu.sim import jax_sim


def _standing_state(spec):
    q = jnp.asarray(spec.q_home)
    p0 = dyn.foot_positions(spec, q)
    q = q.at[2].add(-p0[0, 2] + spec.foot_radius)
    return q, jnp.zeros(18)


def test_standing_under_pd(go2):
    """PD toward the home pose must hold the robot near its standing height."""
    q0, v0 = _standing_state(go2)
    T = 500
    targets = jnp.tile(q0[6:][None], (T, 1))
    Q, V = jax.jit(lambda q, v: jax_sim.pd_rollout(go2, q, v, targets, kp=150.0, kd=6.0))(q0, v0)
    z = np.asarray(Q[:, 2])
    assert abs(z[-1] - float(q0[2])) < 0.05, z[-1]
    # compliant contact jitters a little; bounded velocities = stable stand
    assert np.abs(np.asarray(V[-1])).max() < 4.0
    assert np.abs(np.asarray(Q[-1, 3:6])).max() < 0.2  # still upright


def test_contact_forces_support_weight(go2):
    q0, v0 = _standing_state(go2)
    # statically pressed slightly into the ground
    q0 = q0.at[2].add(-0.002)
    f = jax_sim.contact_forces(go2, q0, v0, jax_sim.default_contact_params())
    f = np.asarray(f)
    assert np.all(f[:, 2] > 0)
    total = f[:, 2].sum()
    weight = 9.81 * float(np.asarray(go2.mass).sum())
    assert 0.3 * weight < total < 5 * weight


def test_freefall_matches_gravity(go2):
    q0, v0 = _standing_state(go2)
    q0 = q0.at[2].set(1.0)  # airborne
    T = 100
    targets = jnp.tile(q0[6:][None], (T, 1))
    Q, V = jax_sim.pd_rollout(go2, q0, v0, targets)
    vz = float(V[-1, 2])
    assert vz == pytest.approx(-9.81 * T * 1e-3, rel=0.05)


def test_batched_policy_rollout_shapes(go2):
    q0, v0 = _standing_state(go2)
    B, T = 8, 50

    def apply_fn(x):
        # stand-still "policy": output the home joint targets
        return jnp.asarray(go2.q_home)[6:]

    rollout = jax_sim.make_batched_policy_rollout(go2, apply_fn, T, kp=150.0, kd=6.0)
    q0b = jnp.tile(q0[None], (B, 1))
    v0b = jnp.tile(v0[None], (B, 1))
    vdes = jnp.zeros((B, 3))
    Q, V, fell = rollout(q0b, v0b, vdes)
    assert Q.shape == (B, T, 18)
    assert not bool(np.asarray(fell).any())
