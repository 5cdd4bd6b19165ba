"""Policy warm starts with the SHIPPED artifact cut solver work.

BASELINE.json north star: "learned-policy warm-starts feed back into the
solver to cut iterations". Measured here with the real
assets/policy_go2_trot_ondevice_dagger.pkl on three start states (settled
home stand, a perturbed mid-gait state, a post-divergence recovery state
with height droop + tilt + lateral velocity), iterations-to-nlp_tol via
SolveStats.sqp_iters (early stop at step_norm <= nlp_tol):

| init (vs state)           | home        | midgait     | recovery     |
|---------------------------|-------------|-------------|--------------|
| naive (x0-replicated,     | 15*, 7933   | 15*, 5806   | 15*, 14174   |
|   zero inputs — acados-   |             |             |              |
|   style cold)             |             |             |              |
| engineered cold_start     |  6, 1741    |  6,  904    |  7,  5878    |
| policy warm start         |  5, 1757    | 15,  904    | 15,  5878    |

(* = hit the 15-iteration cap without reaching nlp_tol; cost = GN cost
after the run. CPU fp32, 2026-08; regenerate with scripts/bench_warmstart.py.)

BACKEND NUANCE (BENCH_WARMSTART.json, TPU): on the TPU the naive init
happens to reach the good basin on these instances (6-11 iters) while the
policy start converges through the slow phase-mismatch tail (13-15) and
its plant-rollout boot costs 195 ms vs 28 ms — so the measured value of
the policy warm start is basin ROBUSTNESS (it reaches the good solution
on BOTH backends; the naive start lands in 3-8x-worse local minima on
CPU fp32), not a universal iteration cut. This test pins the CPU
behavior, where the suite runs.

Readings pinned below:
- vs the REFERENCE-style naive init the policy warm start is a strict win
  on every state: it converges to the good solution while naive stalls at
  3-8x higher cost at the iteration cap.
- vs this repo's engineered stationary cold_start: strict iteration cut
  from rest (5 < 6); on mid-gait states the policy's EMERGENT gait phase
  cannot be synced to the planner's node-0 contact schedule, so the warm
  trajectory converges to the same cost but through a slow step-norm tail
  (honest negative result, documented in solver/warmstart.py).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iterative_learning_nmpc_tpu.gait.planner import ContactPlanner
from iterative_learning_nmpc_tpu.learning.network import load_policy
from iterative_learning_nmpc_tpu.models import dynamics as dyn
from iterative_learning_nmpc_tpu.mpc.config import get_quadruped_config
from iterative_learning_nmpc_tpu.solver.sqp import TrajOptSolver, make_params
from iterative_learning_nmpc_tpu.solver.warmstart import policy_warmstart

ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets",
    "policy_go2_trot_ondevice_dagger.pkl")


def _artifact_apply():
    net, variables, norm = load_policy(ARTIFACT)
    mu_s, sd_s, mu_g, sd_g = [np.asarray(x, np.float32) for x in norm]
    sd_s = np.where(sd_s > 1e-8, sd_s, 1.0)

    def apply_fn(x):
        s, g = x[:44], x[44:]
        s = s.at[1:].set((s[1:] - mu_s[1:]) / sd_s[1:])
        g = (g - mu_g) / sd_g
        return net.apply(variables, jnp.concatenate([s, g])[None],
                         train=False)[0]

    return apply_fn


def _start_states(spec):
    q0 = np.asarray(spec.q_home, np.float32).copy()
    p0 = np.asarray(jax.jit(lambda q: dyn.foot_positions(spec, q))(q0))
    q0[2] += -p0[0, 2] + float(np.asarray(spec.foot_radius))
    states = {}
    states["home"] = np.concatenate([q0, np.zeros(18, np.float32)])
    qs = q0.copy()
    qs[2] -= 0.02
    qs[6:18] += np.random.default_rng(1).normal(0, 0.05, 12).astype(np.float32)
    vs = np.zeros(18, np.float32)
    vs[0] = 0.3
    states["midgait"] = np.concatenate([qs, vs])
    # post-divergence recovery: height droop, tilt, off-axis velocity
    qr = q0.copy()
    qr[2] -= 0.06
    qr[4] = 0.15
    qr[5] = -0.1
    vr = np.zeros(18, np.float32)
    vr[[0, 1, 2]] = (0.1, -0.2, -0.3)
    states["recovery"] = np.concatenate([qr, vr])
    return states


@pytest.mark.slow
def test_artifact_warmstart_cuts_solver_work(go2):
    gait, opt, cost = get_quadruped_config("trot", "go2")
    solver = TrajOptSolver(go2, opt, cost)
    N = solver.N
    planner = ContactPlanner(go2.feet_frame_names, solver.dt_nodes, gait)
    apply_fn = _artifact_apply()
    v_des = np.array([0.3, 0.0, 0.0], np.float32)

    solve = jax.jit(lambda X, U, p, n: solver.solve(X, U, p, n),
                    static_argnums=3)
    ws = jax.jit(lambda p: policy_warmstart(solver, apply_fn, p, v_des))
    cold = jax.jit(solver.cold_start)

    results = {}
    for name, x0 in _start_states(go2).items():
        cnt = planner.get_contacts(0, N + 1)
        base_ref = np.zeros(12, np.float32)
        base_ref[:3] = x0[:3]
        base_ref[2] = gait.nom_height
        base_ref[6] = v_des[0]
        p = make_params(solver, x0, cnt, base_ref=base_ref,
                        step_height=gait.step_height)
        Xn = jnp.tile(jnp.asarray(x0)[None], (N + 1, 1))
        Un = jnp.zeros((N, 30), jnp.float32)
        sn = solve(Xn, Un, p, 15)
        Xc, Uc = cold(p)
        sc = solve(Xc, Uc, p, 15)
        Xw, Uw = ws(p)
        assert np.isfinite(np.asarray(Xw)).all()
        assert np.isfinite(np.asarray(Uw)).all()
        sw = solve(Xw, Uw, p, 15)
        results[name] = dict(
            naive=(int(sn.stats.sqp_iters), float(sn.stats.cost)),
            cold=(int(sc.stats.sqp_iters), float(sc.stats.cost)),
            warm=(int(sw.stats.sqp_iters), float(sw.stats.cost)),
        )

    for name, r in results.items():
        # strict win vs the reference-style naive init on EVERY state:
        # fewer-or-equal iterations AND a strictly (much) better solution
        assert r["warm"][0] <= r["naive"][0], (name, r)
        assert r["warm"][1] < 0.8 * r["naive"][1], (name, r)
        # and the warm solve must land on the engineered-cold solution
        assert r["warm"][1] < 1.05 * r["cold"][1] + 20.0, (name, r)

    # strict ITERATION reduction where the gait phase is alignable: the
    # from-rest cold-boot state (the production first-solve path)
    assert results["home"]["warm"][0] < results["home"]["cold"][0], results
    assert results["home"]["naive"][0] == 15, results  # naive never converges