"""Pallas TPU kernel: fused batched policy inference + PD torque.

The serving hot path of the learning stack — the reference runs one torch MLP
forward per 1 ms control step (`RolloutPolicy.py:338-362`); at pod-scale
datagen we run it for thousands of environments per step. This kernel fuses
the whole observation->torque computation:

    h1 = relu(x @ W1 + b1)
    h2 = relu(h1 @ W2 + b2)
    h3 = relu(h2 @ W3 + b3)
    a  = h3 @ W4 + b4                      (joint PD targets)
    tau = kp * (a - q_joints) - kd * v_joints

into a single VMEM-resident pass: weights (~2.3 MB for 47->512x3->12) stay
on-chip, each batch tile does 4 MXU matmuls + elementwise VPU ops with no
HBM round-trips between layers. Inference-mode BatchNorm folds into the
Dense weights (`fold_batchnorm`), so the deployed network is dense-only.
"""
from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_batchnorm(variables, eps: float = 1e-5):
    """Fold inference-mode BatchNorm layers into the adjacent Dense weights.

    Flax module layout (learning/network.py): Dense_i -> BatchNorm_i -> relu
    for hidden layers, final Dense has no norm. Returns [(W, b), ...] with
    y = x @ W + b reproducing net.apply(variables, x, train=False).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    layers: List[Tuple[np.ndarray, np.ndarray]] = []
    i = 0
    while f"Dense_{i}" in params:
        W = np.asarray(params[f"Dense_{i}"]["kernel"], np.float32)
        b = np.asarray(params[f"Dense_{i}"]["bias"], np.float32)
        bn_p = params.get(f"BatchNorm_{i}")
        bn_s = stats.get(f"BatchNorm_{i}") if stats else None
        if bn_p is not None and bn_s is not None:
            mean = np.asarray(bn_s["mean"], np.float32)
            var = np.asarray(bn_s["var"], np.float32)
            scale = np.asarray(bn_p["scale"], np.float32)
            bias = np.asarray(bn_p["bias"], np.float32)
            inv = scale / np.sqrt(var + eps)
            W = W * inv[None, :]
            b = (b - mean) * inv + bias
        layers.append((W, b))
        i += 1
    return layers


def _policy_pd_kernel(x_ref, qj_ref, vj_ref,
                      w1_ref, b1_ref, w2_ref, b2_ref,
                      w3_ref, b3_ref, w4_ref, b4_ref,
                      kp_ref, kd_ref,
                      act_ref, tau_ref, *, compute_dtype=jnp.float32):
    cd = compute_dtype

    # explicit DEFAULT precision: the package sets highest-precision matmuls
    # globally (needed for the solver), which Mosaic rejects for bf16 inputs
    prec = jax.lax.Precision.DEFAULT if cd == jnp.bfloat16 else None

    def dense(h, w_ref, b_ref, relu):
        out = (
            jnp.dot(h.astype(cd), w_ref[:].astype(cd),
                    preferred_element_type=jnp.float32, precision=prec)
            + b_ref[:]
        )
        return jnp.maximum(out, 0.0) if relu else out

    # first layer stays fp32 (K=47 is not bf16-tile aligned); the square
    # 512x512 layers carry the FLOPs and take the low-precision path
    h = jnp.maximum(
        jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:],
        0.0,
    )
    h = dense(h, w2_ref, b2_ref, True)
    h = dense(h, w3_ref, b3_ref, True)
    a = dense(h, w4_ref, b4_ref, False)
    act_ref[:] = a
    kp = kp_ref[0, 0]
    kd = kd_ref[0, 0]
    tau_ref[:] = kp * (a - qj_ref[:]) - kd * vj_ref[:]


def make_fused_policy_pd(layers, kp: float, kd: float, tile_b: int = 256,
                         interpret: bool = False, compute_dtype=jnp.float32):
    """Build the fused inference+PD function.

    Args:
      layers: [(W1,b1),...,(W4,b4)] from fold_batchnorm.
      tile_b: batch tile per grid step (rows per MXU pass).
      compute_dtype: matmul input dtype; jnp.bfloat16 halves the MXU passes
        (fp32 accumulation kept) — fine for exploration rollouts, use fp32
        for the deployed controller.
    Returns:
      fn(x (B, n_in), q_joints (B, 12), v_joints (B, 12))
        -> (actions (B, 12), torques (B, 12));  B must be a multiple of tile_b
        or smaller than it (single tile).
    """
    (W1, b1), (W2, b2), (W3, b3), (W4, b4) = layers
    n_in = W1.shape[0]
    n_out = W4.shape[1]
    consts = [jnp.asarray(a) for a in
              (W1, b1[None, :], W2, b2[None, :], W3, b3[None, :], W4, b4[None, :])]
    kp_a = jnp.full((1, 1), kp, jnp.float32)
    kd_a = jnp.full((1, 1), kd, jnp.float32)

    def fn(x, qj, vj):
        B = x.shape[0]
        tb = min(tile_b, B)
        assert B % tb == 0, f"batch {B} not a multiple of tile {tb}"
        grid = (B // tb,)
        row_spec = lambda d: pl.BlockSpec((tb, d), lambda i: (i, 0),
                                          memory_space=pltpu.ANY if False else pltpu.VMEM)
        full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                      memory_space=pltpu.VMEM)
        smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        acts, taus = pl.pallas_call(
            partial(_policy_pd_kernel, compute_dtype=compute_dtype),
            grid=grid,
            in_specs=[row_spec(n_in), row_spec(12), row_spec(12)]
            + [full(c) for c in consts]
            + [smem, smem],
            out_specs=[row_spec(n_out), row_spec(12)],
            out_shape=[
                jax.ShapeDtypeStruct((B, n_out), jnp.float32),
                jax.ShapeDtypeStruct((B, 12), jnp.float32),
            ],
            interpret=interpret,
        )(x, qj, vj, *consts, kp_a, kd_a)
        return acts, taus

    return fn


def policy_pd_reference(layers, kp, kd, x, qj, vj):
    """Plain-JAX reference for testing."""
    h = x
    for i, (W, b) in enumerate(layers):
        h = h @ jnp.asarray(W) + jnp.asarray(b)
        if i < len(layers) - 1:
            h = jnp.maximum(h, 0.0)
    tau = kp * (h - qj) - kd * vj
    return h, tau
