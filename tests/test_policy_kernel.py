"""Fused policy+PD Pallas kernel vs Flax reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.learning.network import init_network
from iterative_learning_nmpc_tpu.ops.policy_kernel import (
    fold_batchnorm,
    make_fused_policy_pd,
    policy_pd_reference,
)


@pytest.fixture(scope="module")
def net_and_layers():
    net, variables = init_network(jax.random.PRNGKey(0), 47, 12,
                                  num_hidden_layer=3, hidden_dim=512,
                                  batch_norm=True)
    # give batch stats non-trivial values so folding is actually exercised
    bs = jax.tree.map(lambda x: x, variables["batch_stats"])
    key = jax.random.PRNGKey(1)
    new_bs = {}
    for name, d in bs.items():
        k1, k2, key = jax.random.split(key, 3)
        new_bs[name] = {
            "mean": 0.1 * jax.random.normal(k1, d["mean"].shape),
            "var": 1.0 + 0.3 * jax.random.uniform(k2, d["var"].shape),
        }
    variables = {"params": variables["params"], "batch_stats": new_bs}
    return net, variables


def test_fold_batchnorm_matches_flax(net_and_layers, rng):
    net, variables = net_and_layers
    layers = fold_batchnorm(variables)
    x = jnp.asarray(rng.normal(size=(32, 47)), jnp.float32)
    ref = net.apply(variables, x, train=False)
    folded, _ = policy_pd_reference(layers, 0.0, 0.0, x, jnp.zeros((32, 12)),
                                    jnp.zeros((32, 12)))
    np.testing.assert_allclose(np.asarray(folded), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_kernel_matches_reference(net_and_layers, rng):
    net, variables = net_and_layers
    layers = fold_batchnorm(variables)
    B = 256
    x = jnp.asarray(rng.normal(size=(B, 47)), jnp.float32)
    qj = jnp.asarray(rng.normal(size=(B, 12)), jnp.float32)
    vj = jnp.asarray(rng.normal(size=(B, 12)), jnp.float32)
    kp, kd = 20.0, 1.5

    fn = make_fused_policy_pd(layers, kp, kd, tile_b=128, interpret=True)
    acts, taus = fn(x, qj, vj)
    a_ref, t_ref = policy_pd_reference(layers, kp, kd, x, qj, vj)
    np.testing.assert_allclose(np.asarray(acts), np.asarray(a_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(taus), np.asarray(t_ref),
                               rtol=2e-4, atol=1e-3)


def test_kernel_single_tile(net_and_layers, rng):
    net, variables = net_and_layers
    layers = fold_batchnorm(variables)
    B = 64  # smaller than tile -> single-tile path
    x = jnp.asarray(rng.normal(size=(B, 47)), jnp.float32)
    qj = jnp.zeros((B, 12))
    vj = jnp.zeros((B, 12))
    fn = make_fused_policy_pd(layers, 20.0, 1.5, tile_b=256, interpret=True)
    acts, _ = fn(x, qj, vj)
    a_ref, _ = policy_pd_reference(layers, 20.0, 1.5, x, qj, vj)
    np.testing.assert_allclose(np.asarray(acts), np.asarray(a_ref),
                               rtol=2e-4, atol=2e-5)
