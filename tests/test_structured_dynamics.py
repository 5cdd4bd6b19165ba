"""Structured (production) dynamics vs the generic tree oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.models import dynamics as fast
from iterative_learning_nmpc_tpu.models import tree_dynamics as ref


def _rand_state(spec, rng):
    q = np.array(spec.q_home, dtype=np.float64)
    q[:3] += rng.uniform(-0.5, 0.5, 3)
    q[3:6] = rng.uniform(-0.4, 0.4, 3)
    q[6:] += rng.uniform(-0.4, 0.4, spec.nu)
    v = rng.uniform(-1.5, 1.5, spec.nv)
    a = rng.uniform(-6.0, 6.0, spec.nv)
    f = rng.uniform(-40.0, 40.0, (4, 3))
    return tuple(jnp.asarray(x, jnp.float32) for x in (q, v, a, f))


@pytest.mark.parametrize("robot", ["go2", "solo12"])
def test_structured_matches_tree(robot, rng, go2, solo12):
    spec = {"go2": go2, "solo12": solo12}[robot]
    for _ in range(3):
        q, v, a, f = _rand_state(spec, rng)
        np.testing.assert_allclose(
            np.asarray(fast.foot_positions(spec, q)),
            np.asarray(ref.foot_positions(spec, q)), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(fast.foot_velocities(spec, q, v)),
            np.asarray(ref.foot_velocities(spec, q, v)), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(fast.rnea(spec, q, v, a, f_ext_feet=f)),
            np.asarray(ref.rnea(spec, q, v, a, f_ext_feet=f)),
            rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(fast.mass_matrix(spec, q)),
            np.asarray(ref.mass_matrix(spec, q)), rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(fast.centroidal_momentum(spec, q, v)),
            np.asarray(ref.centroidal_momentum(spec, q, v)), rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(fast.com_position(spec, q)),
            np.asarray(ref.com_position(spec, q)), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(fast.centroidal_momentum_rate(spec, q, v, a)),
            np.asarray(ref.centroidal_momentum_rate(spec, q, v, a)),
            rtol=5e-3, atol=5e-2)
        np.testing.assert_allclose(
            np.asarray(fast.foot_jacobians(spec, q)),
            np.asarray(ref.foot_jacobians(spec, q)), atol=1e-5)


def test_forward_dynamics_matches(go2, rng):
    q, v, a, f = _rand_state(go2, rng)
    tau = jnp.asarray(rng.uniform(-8, 8, 12), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fast.forward_dynamics(go2, q, v, tau, f_ext_feet=f)),
        np.asarray(ref.forward_dynamics(go2, q, v, tau, f_ext_feet=f)),
        rtol=1e-3, atol=2e-2)
