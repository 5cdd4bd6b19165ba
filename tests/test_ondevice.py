"""On-device batched closed-loop MPC rollout tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.learning.ondevice import make_batched_mpc_rollout
from iterative_learning_nmpc_tpu.models import dynamics as dyn


def _x0(spec):
    q0 = np.asarray(spec.q_home, np.float32).copy()
    p0 = np.asarray(jax.jit(lambda q: dyn.foot_positions(spec, q))(q0))
    q0[2] += -p0[0, 2] + float(np.asarray(spec.foot_radius))
    return np.concatenate([q0, np.zeros(18, np.float32)])


@pytest.mark.slow
def test_batched_closed_loop_trot(go2):
    x0 = _x0(go2)
    B = 4
    rng = np.random.default_rng(0)
    x0b = np.tile(x0[None], (B, 1))
    x0b[:, 6:18] += rng.normal(0, 0.02, (B, 12)).astype(np.float32)
    vdes = np.tile(np.array([[0.3, 0.0, 0.0]], np.float32), (B, 1))
    rollout = make_batched_mpc_rollout(go2, n_intervals=20)
    out = rollout(jnp.asarray(x0b), jnp.asarray(vdes))

    assert out.q.shape == (B, 800, 18)
    assert out.state44.shape == (B, 800, 44)
    assert out.action.shape == (B, 800, 12)
    # all environments stay up for the 0.8 s horizon
    assert float(out.valid.mean()) > 0.9
    z = np.asarray(out.q[:, :, 2])
    assert z.min() > 0.15 and z.max() < 0.45
    # walks forward, tracking the 0.3 m/s command to within ~35% even over
    # this short (ramp-dominated) 0.8 s window
    mean_vx = np.asarray(out.q[:, -1, 0]).mean() / (out.q.shape[1] * 1e-3)
    assert mean_vx > 0.2, mean_vx
    # dataset rows are finite and the action encoding is near the joint range
    assert np.isfinite(np.asarray(out.state44)).all()
    act = np.asarray(out.action)
    assert np.abs(act).max() < 4.0


@pytest.mark.slow
def test_randomized_rollout(go2):
    from iterative_learning_nmpc_tpu.learning.randomize import (
        randomize_payload,
        randomize_terrain,
    )

    x0 = _x0(go2)
    B = 4
    x0b = jnp.asarray(np.tile(x0[None], (B, 1)))
    vdes = jnp.asarray(np.tile(np.array([[0.2, 0, 0]], np.float32), (B, 1)))
    rollout = make_batched_mpc_rollout(go2, n_intervals=12)
    ps = randomize_payload(go2, jax.random.PRNGKey(0), B, mass_range=(0.5, 2.5))
    tr = randomize_terrain(jax.random.PRNGKey(1), B)
    out = rollout(x0b, vdes, ps, tr)
    # payloads actually differ per env
    assert np.asarray(ps.mass[:, 5]).std() > 0.1
    # the nominal-model MPC keeps the randomized plants up
    assert float(out.valid.mean()) > 0.7
    z = np.asarray(out.q[:, -1, 2])
    assert np.all(z > 0.15)
