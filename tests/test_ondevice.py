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


@pytest.mark.slow
def test_ondevice_safedagger_switch(go2):
    """Fully on-device SafeDAgger (VERDICT r1 item 10): policy + expert both
    act every step; the jnp safety monitor + hysteresis hand control to the
    MPC when the (untrained, unsafe) policy can't track, and every row
    carries is_expert for the DAgger relabeling filter."""
    import types

    x0 = _x0(go2)
    B = 2
    x0b = jnp.asarray(np.tile(x0[None], (B, 1)))
    vdes = jnp.asarray(np.tile(np.array([[0.3, 0.0, 0.0]], np.float32), (B, 1)))

    # "hold home pose" policy: perfectly stable standing, but cannot track
    # the 0.3 m/s command -> the velocity-tracking monitor trips right after
    # the hysteresis delay (same trigger class as the reference's
    # unsafe-tracking rule, Rollout_combined_controller.py:433-441)
    q_home_j = jnp.asarray(np.asarray(go2.q_home)[6:], jnp.float32)
    net = types.SimpleNamespace(
        apply=lambda variables, x, train=False: jnp.tile(
            q_home_j[None], (x.shape[0], 1)))
    delay = 20
    rollout = make_batched_mpc_rollout(
        go2, n_intervals=8, policy=(net, {}, None),
        delay_steps=delay, mpc_min_steps=60,
    )
    out = rollout(x0b, vdes)
    T = out.q.shape[1]
    exp = np.asarray(out.is_expert)
    assert out.is_expert.shape == (B, T)
    # policy-only during the hysteresis delay (reference :449-456)
    assert np.all(exp[:, :delay] == 0.0)
    # the monitor hands over to the expert (v_des=0.3 vs standstill trips
    # the 0.10 m/s tracking tolerance right after the delay) and the latch
    # keeps it engaged for >= mpc_min_steps
    assert np.all(exp[:, delay + 1:delay + 60] == 1.0)
    # the expert keeps the robot up after taking over
    assert float(out.valid.mean()) > 0.9
    # expert-row filter yields a usable dataset (the DAgger data step)
    rows = (exp > 0.5) & (np.asarray(out.valid) > 0.5)
    assert rows.sum() > 0.5 * B * T
    assert np.isfinite(np.asarray(out.state44)[rows]).all()


def test_ondevice_plain_rollout_is_all_expert(go2):
    """Without a policy the rollout is the plain expert datagen: is_expert
    is identically 1 (full compatibility with the BC pipeline)."""
    x0 = _x0(go2)
    x0b = jnp.asarray(x0[None])
    vdes = jnp.asarray(np.array([[0.2, 0.0, 0.0]], np.float32))
    rollout = make_batched_mpc_rollout(go2, n_intervals=2)
    out = rollout(x0b, vdes)
    assert np.all(np.asarray(out.is_expert) == 1.0)


@pytest.mark.slow
def test_force_window_fault_injection(go2):
    """On-device scheduled base wrench (the reference's 50-70 N push
    sampler, fully batched): a violent lateral push must knock the
    standing-command env over while the unpushed twin stays up."""
    from iterative_learning_nmpc_tpu.learning.randomize import (
        sample_force_windows,
    )

    x0 = _x0(go2)
    B = 2
    x0b = np.tile(x0[None], (B, 1))
    vdes = np.zeros((B, 3), np.float32)
    rollout = make_batched_mpc_rollout(go2, n_intervals=15)
    T = 15 * 40
    # env 0: no push; env 1: absurd 400 N lateral shove for 0.3 s
    fw = np.zeros((B, 5), np.float32)
    fw[1] = [100, 400, 0.0, 400.0, 0.0]
    out = rollout(jnp.asarray(x0b), jnp.asarray(vdes),
                  force_windows=jnp.asarray(fw))
    valid = np.asarray(out.valid)
    assert valid[0].min() > 0.5, "unpushed env fell"
    assert valid[1].min() < 0.5, "400 N push did not destabilize"

    # the sampler produces windows inside the rollout and at reference
    # magnitudes
    wins = np.asarray(sample_force_windows(jax.random.PRNGKey(0), 64, T))
    assert (wins[:, 0] >= 0).all() and (wins[:, 1] <= T + 1).all()
    mags = np.linalg.norm(wins[:, 2:], axis=1)
    assert (mags >= 49.9).all() and (mags <= 70.1).all()
