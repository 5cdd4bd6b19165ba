"""Plan interpolation to the control rate, on device.

The reference interpolates each new plan on the host with SciPy
CubicHermiteSpline (`mpc.py:371-414`) and repeats inputs (`mpc.py:544-545`).
Here the whole interpolation (and the feed-forward RNEA torques along the
interpolated plan) happens inside the jitted plan function — one device
round-trip per replan instead of per-step host math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def hermite_interp(t_knots, y, dy, t_query):
    """Cubic Hermite interpolation, vectorized over query points and dims.

    Args:
      t_knots: (K,) strictly increasing knot times.
      y: (K, D) values; dy: (K, D) derivatives at knots.
      t_query: (T,) query times (clipped into the knot range).
    Returns:
      (T, D) interpolated values.
    """
    K = t_knots.shape[0]
    tq = jnp.clip(t_query, t_knots[0], t_knots[-1])
    idx = jnp.clip(jnp.searchsorted(t_knots, tq, side="right") - 1, 0, K - 2)
    t0 = t_knots[idx]
    t1 = t_knots[idx + 1]
    h = jnp.maximum(t1 - t0, 1e-9)
    s = ((tq - t0) / h)[:, None]
    y0, y1 = y[idx], y[idx + 1]
    d0, d1 = dy[idx], dy[idx + 1]
    h00 = (1 + 2 * s) * (1 - s) ** 2
    h10 = s * (1 - s) ** 2
    h01 = s * s * (3 - 2 * s)
    h11 = s * s * (s - 1)
    return h00 * y0 + h10 * (h[:, None] * d0) + h01 * y1 + h11 * (h[:, None] * d1)


def interpolate_plan(q_sol, v_sol, a_sol, dt_sol, n_interp: int):
    """(q, v) Hermite-interpolated + (a,) ZOH-indexed at n_interp uniform steps.

    Mirrors `interpolate_state_trajectory` (`mpc.py:371-414`): q interpolated
    with derivative v; v interpolated with derivative a (a prepended).
    Returns arrays of length n_interp starting one step after the initial
    state (the reference drops index 0).
    """
    N = a_sol.shape[0]
    t_knots = jnp.concatenate([jnp.zeros(1, dt_sol.dtype), jnp.cumsum(dt_sol)])
    t_query = jnp.linspace(t_knots[0], t_knots[-1], n_interp + 1)[1:]
    q_plan = hermite_interp(t_knots, q_sol, v_sol, t_query)
    a_knots = jnp.concatenate([a_sol[:1], a_sol], axis=0)
    v_plan = hermite_interp(t_knots, v_sol, a_knots, t_query)
    # zero-order hold for inputs (mpc.py:142 id_repeat semantics)
    id_repeat = jnp.int32(jnp.linspace(0.0, 1.0, n_interp) * (N - 1))
    return q_plan, v_plan, id_repeat
