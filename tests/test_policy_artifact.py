"""Regression pin on the shipped DAgger policy artifact.

assets/policy_go2_trot_ondevice_dagger.pkl is the final policy of a full
OnDeviceSafeDagger run (scripts/exp_dagger_transfer.py: 128k-row BC seed,
2 goals x 3 iterations, 32 envs/iteration, all data from the jax_sim
plant). Measured at training time (2026-08): walks 5.0 s at 0.3 m/s in
jax_sim without falling (x=1.60 m); in MuJoCo survives 5 s under the
combined controller at commanded progress (x=1.58, expert ratio 0.80).
This test pins the jax_sim walking capability so learning-stack or
jax_sim regressions that would silently degrade trained-policy quality
fail loudly. Reference protocol: `DAgger/test/test_policy_rollout.py:41-55`
(checkpoint survival logging).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets",
    "policy_go2_trot_ondevice_dagger.pkl")


@pytest.mark.slow
def test_dagger_artifact_walks_in_jax_sim(go2):
    from iterative_learning_nmpc_tpu.learning.network import load_policy
    from iterative_learning_nmpc_tpu.models import dynamics as dyn
    from iterative_learning_nmpc_tpu.sim import jax_sim

    net, variables, norm = load_policy(ARTIFACT)
    assert norm is not None
    mu_s, sd_s, mu_g, sd_g = [np.asarray(x, np.float32) for x in norm]
    sd_s = np.where(sd_s > 1e-8, sd_s, 1.0)

    def apply_fn(x):
        s, g = x[:44], x[44:]
        s = s.at[1:].set((s[1:] - mu_s[1:]) / sd_s[1:])
        g = (g - mu_g) / sd_g
        return net.apply(variables, jnp.concatenate([s, g])[None],
                         train=False)[0]

    q0 = np.asarray(go2.q_home, np.float32).copy()
    p0 = np.asarray(jax.jit(lambda q: dyn.foot_positions(go2, q))(q0))
    q0[2] += -p0[0, 2] + float(np.asarray(go2.foot_radius))

    T = 4000
    rollout = jax_sim.make_batched_policy_rollout(go2, apply_fn, T)
    Q, V, fell = rollout(jnp.asarray(q0)[None], jnp.zeros((1, 18)),
                         jnp.asarray([[0.3, 0.0, 0.0]], jnp.float32))
    Q = np.asarray(Q[0])
    # walks the full 4 s: upright, no fall, commanded-direction progress
    assert not bool(np.asarray(fell)[0]), "artifact policy fell in jax_sim"
    assert Q[:, 2].min() > 0.15
    assert np.abs(Q[:, 4:6]).max() < 0.6
    assert Q[-1, 0] > 0.8, Q[-1, 0]  # >= ~0.2 m/s realized at 0.3 command
