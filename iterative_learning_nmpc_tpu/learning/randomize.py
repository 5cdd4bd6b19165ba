"""Domain randomization for pod-scale datagen (BASELINE.json config #5:
"terrain/payload randomization, sharded aggregation").

RobotSpec is a pytree, so per-environment physical randomization is just a
batched spec axis under vmap: payload mass/CoM shifts scale the trunk leaves,
terrain is per-env ground height + contact stiffness/friction in the
simulator parameters. The same randomized spec drives both the plant AND the
controller model when model mismatch is not wanted, or only the plant for
robustness datagen (model-plant mismatch is the realistic setting).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..robots.spec import RobotSpec
from ..sim.jax_sim import ContactParams, default_contact_params


class TerrainParams(NamedTuple):
    ground_height: jax.Array   # () per env
    contact: ContactParams


def randomize_payload(
    spec: RobotSpec,
    key: jax.Array,
    n: int,
    mass_range: Tuple[float, float] = (0.0, 3.0),
    com_shift: float = 0.03,
) -> RobotSpec:
    """Batched spec with per-env extra trunk payload and CoM shift.

    Returns a RobotSpec whose `mass` / `com` leaves have a leading batch
    axis — feed through `jax.vmap(fn)` with `in_axes=(spec_axes, ...)` where
    `spec_axes = payload_spec_axes(spec)`.
    """
    k1, k2 = jax.random.split(key)
    extra = jax.random.uniform(k1, (n,), minval=mass_range[0], maxval=mass_range[1])
    shift = jax.random.uniform(k2, (n, 2), minval=-com_shift, maxval=com_shift)

    mass = jnp.broadcast_to(jnp.asarray(spec.mass)[None], (n,) + spec.mass.shape)
    mass = mass.at[:, 5].add(extra)
    com = jnp.broadcast_to(jnp.asarray(spec.com)[None], (n,) + spec.com.shape)
    # payload shifts the trunk CoM: weighted average of trunk + payload
    trunk_m = jnp.asarray(spec.mass)[5]
    w_extra = (extra / (trunk_m + extra))[:, None]
    com = com.at[:, 5, :2].add(w_extra * shift)
    return dataclasses.replace(spec, mass=mass, com=com)


def payload_spec_axes(spec: RobotSpec):
    """in_axes pytree for a payload-randomized spec: batch only mass/com."""
    return dataclasses.replace(
        jax.tree.map(lambda _: None, spec), mass=0, com=0
    )


def randomize_terrain(
    key: jax.Array,
    n: int,
    height_range: Tuple[float, float] = (-0.02, 0.02),
    stiffness_range: Tuple[float, float] = (1.0e4, 4.0e4),
    friction_range: Tuple[float, float] = (0.5, 1.0),
) -> TerrainParams:
    """Per-env terrain: ground offset, contact stiffness, friction."""
    k1, k2, k3 = jax.random.split(key, 3)
    base = default_contact_params()
    return TerrainParams(
        ground_height=jax.random.uniform(
            k1, (n,), minval=height_range[0], maxval=height_range[1]
        ),
        contact=ContactParams(
            stiffness=jax.random.uniform(
                k2, (n,), minval=stiffness_range[0], maxval=stiffness_range[1]
            ),
            damping=jnp.broadcast_to(base.damping, (n,)),
            friction_mu=jax.random.uniform(
                k3, (n,), minval=friction_range[0], maxval=friction_range[1]
            ),
            vel_smoothing=jnp.broadcast_to(base.vel_smoothing, (n,)),
        ),
    )


def sample_force_windows(
    key: jax.Array,
    n: int,
    total_steps: int,
    magnitude_range: Tuple[float, float] = (50.0, 70.0),
    duration_range_s: Tuple[float, float] = (0.2, 0.4),
    sim_dt: float = 1.0e-3,
) -> jax.Array:
    """(n, 5) scheduled base-wrench windows [start_step, end_step, fx, fy, fz]
    for `make_batched_mpc_rollout(force_windows=...)` — the reference's
    random push sampler (`data_collection_force_perturbation.py:213-248`:
    50-70 N magnitude, 0.2-0.4 s duration, uniform direction) as a batched
    on-device fault-injection schedule."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mag = jax.random.uniform(k1, (n,), minval=magnitude_range[0],
                             maxval=magnitude_range[1])
    # uniform direction on S^2 (matches the reference's normalized gaussian)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    dur = jax.random.uniform(k3, (n,), minval=duration_range_s[0],
                             maxval=duration_range_s[1]) / sim_dt
    start = jax.random.uniform(k4, (n,)) * jnp.maximum(
        total_steps - dur, 1.0)
    return jnp.concatenate(
        [start[:, None], (start + dur)[:, None], mag[:, None] * d], axis=1)
