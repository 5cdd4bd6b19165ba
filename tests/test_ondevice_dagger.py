"""Fully on-TPU SafeDAgger outer loop (collect -> relabel -> aggregate ->
retrain), reference semantics from `DAgger/example/iter_locosafedagger.py`
with the data step batched on device."""
import os

import numpy as np
import pytest

import jax

from iterative_learning_nmpc_tpu.learning.dagger import (
    OnDeviceSafeDagger,
    SafeDaggerConfig,
)
from iterative_learning_nmpc_tpu.learning.database import Database
from iterative_learning_nmpc_tpu.learning.network import (
    init_network,
    load_policy,
    save_policy,
)


@pytest.mark.slow
def test_ondevice_dagger_outer_loop(go2, tmp_path):
    """Two full iterations: the (untrained) policy is unsafe, the expert
    takes over, expert rows aggregate, the policy retrains warm-started —
    and the single compiled rollout is reused across iterations (retrained
    weights + norm enter as traced arguments)."""
    net, variables = init_network(
        jax.random.PRNGKey(0), 47, 12, num_hidden_layer=2, hidden_dim=32)
    policy0 = save_policy(
        str(tmp_path / "policy0.pkl"), variables, None,
        dict(input_size=47, output_size=12, num_hidden_layer=2,
             hidden_dim=32, batch_norm=True, dropout_rate=0.0))

    cfg = SafeDaggerConfig(
        record_dir=str(tmp_path / "dagger"),
        sim_time=0.32,                    # 8 replan intervals
        database_size=100_000,
        n_epochs=2,
        batch_size=64,
        delay_steps=20,
        mpc_min_steps=60,
        goals=((0.3, 0.0, 0.0),),
        n_iterations_per_goal=2,
    )
    pipe = OnDeviceSafeDagger(go2, cfg, policy0, batch=2)
    final_policy = pipe.run()

    # both iterations ran a data step; the unsafe policy forced the expert in
    assert len(pipe.expert_ratio_history) == 2
    assert pipe.expert_ratio_history[0] > 0.3

    # aggregation grows across iterations
    d0 = Database(limit=10**6)
    d0.load_saved_database(
        os.path.join(cfg.record_dir, "goal0_iter0", "agg_dataset.hdf5"))
    d1 = Database(limit=10**6)
    d1.load_saved_database(
        os.path.join(cfg.record_dir, "goal0_iter1", "agg_dataset.hdf5"))
    assert len(d1) > len(d0) > 0

    # the retrained policy payload is loadable and carries norm stats
    assert final_policy != policy0 and os.path.exists(final_policy)
    net2, vars2, norm2 = load_policy(final_policy)
    assert norm2 is not None
    out = net2.apply(vars2, np.zeros((1, 47), np.float32), train=False)
    assert np.isfinite(np.asarray(out)).all()
