"""Per-node dt optimization (enable_time_opt, reference
config_abstract.py:49-52 + solver.py:124-125,423-427)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.gait.planner import ContactPlanner
from iterative_learning_nmpc_tpu.models import dynamics as dyn
from iterative_learning_nmpc_tpu.mpc.config import get_quadruped_config
from iterative_learning_nmpc_tpu.solver.sqp import TrajOptSolver, make_params


@pytest.mark.slow
def test_time_opt_trot_solve(go2):
    gait, opt, cost = get_quadruped_config("trot", "go2")
    opt.enable_time_opt = True
    solver = TrajOptSolver(go2, opt, cost)
    assert solver.nu == 31
    N = solver.N
    dt_min, dt_max = opt.get_dt_bounds()

    planner = ContactPlanner(go2.feet_frame_names, solver.dt_nodes, gait)
    q0 = jnp.asarray(go2.q_home)
    p0 = dyn.foot_positions(go2, q0)
    q0 = q0.at[2].add(-p0[0, 2])
    # an aggressive initial velocity makes non-uniform timing attractive
    v0 = jnp.zeros(18).at[0].set(0.6)
    x0 = np.concatenate([np.asarray(q0), np.asarray(v0)]).astype(np.float32)
    cnt = planner.get_contacts(0, N + 1)
    base_ref = np.zeros(12, np.float32)
    base_ref[:3] = np.asarray(q0[:3])
    base_ref[2] = gait.nom_height
    base_ref[6] = 0.3
    params = make_params(solver, x0, cnt, base_ref=base_ref,
                         step_height=gait.step_height)
    X, U = jax.jit(solver.cold_start)(params)
    assert U.shape == (N, 31)
    sol = jax.jit(lambda X, U, p: solver.solve(X, U, p, 25))(X, U, params)

    assert np.isfinite(float(sol.stats.cost))
    dts = np.asarray(sol.dt_sol(params.dt))
    # node durations stay within the configured bounds
    assert dts.min() > dt_min - 1e-4, dts.min()
    assert dts.max() < dt_max + 1e-4, dts.max()
    # ... and the optimizer actually uses the freedom
    assert dts.std() > 1e-5
    # true (bilinear-dynamics) defects are small
    defect = float(jnp.abs(solver._defects(sol.X, sol.U, params)).max())
    assert defect < 1e-2, defect  # bilinear dynamics close defects asymptotically
    # still a sane gait
    q = np.asarray(sol.q)
    assert np.all(q[:, 2] > 0.18) and np.all(q[:, 2] < 0.42)


def test_fixed_dt_unchanged(go2):
    """The fixed-dt path keeps NU=30 inputs and the exact-linear merit."""
    gait, opt, cost = get_quadruped_config("trot", "go2")
    solver = TrajOptSolver(go2, opt, cost)
    assert solver.nu == 30 and not solver.time_opt
