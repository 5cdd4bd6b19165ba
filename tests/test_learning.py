"""Learning-stack tests: dataset semantics, policy training, controllers."""
import os

import numpy as np
import pytest

from iterative_learning_nmpc_tpu.learning.database import Database
from iterative_learning_nmpc_tpu.learning.network import (
    init_network,
    load_policy,
    save_policy,
)
from iterative_learning_nmpc_tpu.learning.train import (
    BehavioralCloning,
    TrainConfig,
    compute_ood_mask,
)


def _fill_db(n=256, state_dim=44, rng=None):
    rng = rng or np.random.default_rng(0)
    db = Database(limit=1000, goal_type="vc")
    states = rng.normal(size=(n, state_dim))
    states[:, 0] = rng.uniform(0, 1, n)  # phase column
    actions = rng.normal(size=(n, 12))
    goals = rng.normal(size=(n, 3))
    db.append(states, actions, vc_goals=goals,
              traj_id=np.zeros(n), times=np.arange(n) * 1e-3)
    return db, states, actions, goals


def test_database_normalization_skips_phase(rng):
    db, states, actions, goals = _fill_db(rng=rng)
    x, y = db[0]
    # column 0 (phase) must be untouched by normalization
    assert x[0] == pytest.approx(states[0, 0])
    # other columns are z-scored
    expect = (states[0, 1] - states[:, 1].mean()) / states[:, 1].std()
    assert x[1] == pytest.approx(expect, rel=1e-6)
    # x = [state || goal], y = action
    assert x.shape == (47,)
    np.testing.assert_allclose(y, actions[0])


def test_database_ring_overflow():
    db = Database(limit=10, goal_type="vc")
    for i in range(3):
        db.append(np.full((5, 4), i), np.full((5, 2), i), vc_goals=np.full((5, 3), i))
    assert len(db) == 10
    # oldest rows evicted: remaining are the last 10 appended (batch 1 tail + batch 2)
    vals = db.states_array()[:, 0]
    assert vals.min() >= 1.0


def test_database_hdf5_roundtrip(tmp_path):
    db, states, actions, goals = _fill_db()
    p = str(tmp_path / "db.hdf5")
    db.save_as_hdf5(p, config={"hello": 1})
    db2 = Database(limit=1000, goal_type="vc")
    db2.load_saved_database(p)
    assert len(db2) == len(db)
    np.testing.assert_allclose(db2.states_array(), db.states_array())
    assert os.path.exists(str(tmp_path / "db_config.pkl"))


def test_npz_roundtrip(tmp_path):
    db, *_ = _fill_db()
    p = str(tmp_path / "db.npz")
    db.save_as_npz(p)
    db2 = Database(limit=1000, goal_type="vc")
    db2.load_from_npz(p)
    np.testing.assert_allclose(db2.states_array(), db.states_array())


def test_network_shapes_and_checkpoint(tmp_path):
    import jax
    import jax.numpy as jnp

    net, variables = init_network(jax.random.PRNGKey(0), 47, 12,
                                  num_hidden_layer=3, hidden_dim=64,
                                  batch_norm=True)
    x = jnp.ones((8, 47))
    out = net.apply(variables, x, train=False)
    assert out.shape == (8, 12)
    p = str(tmp_path / "policy.pkl")
    save_policy(p, variables, norm_policy_input=[np.zeros(44), np.ones(44), 0.0, 1.0],
                net_config=dict(input_size=47, output_size=12,
                                num_hidden_layer=3, hidden_dim=64, batch_norm=True))
    net2, vars2, norm = load_policy(p)
    out2 = net2.apply(vars2, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
    assert norm[1].shape == (44,)


def test_bc_training_reduces_loss(tmp_path, rng):
    # learnable mapping: action = linear(state)
    n = 512
    W = rng.normal(size=(47, 12)) * 0.3
    states = rng.normal(size=(n, 44))
    states[:, 0] = 0.0
    goals = rng.normal(size=(n, 3))
    X_raw = np.concatenate([states, goals], axis=1)
    actions = X_raw @ W
    db = Database(limit=2048, goal_type="vc", norm_input=False)
    db.append(states, actions, vc_goals=goals)
    cfg = TrainConfig(n_epochs=30, batch_size=64, hidden_dim=64,
                      num_hidden_layer=2, learning_rate=1e-3,
                      save_dir=str(tmp_path), run_name="t", ckpt_every=10)
    bc = BehavioralCloning(cfg)
    path = bc.run(db)
    assert os.path.exists(path)
    losses = [m["train_loss"] for m in bc.metrics]
    assert losses[-1] < 0.5 * losses[0]


def test_ood_mask():
    nom = np.zeros((100, 4))
    nom_t = np.arange(100) * 0.01
    states = np.zeros((10, 4))
    states[5:] = 10.0  # far from nominal
    t = np.arange(10) * 0.01
    mask = compute_ood_mask(states, nom, t, nom_t, threshold=4.0)
    assert mask.sum() == 5


def test_safety_monitor(go2):
    from iterative_learning_nmpc_tpu.learning.combined_controller import (
        CombinedController,
    )
    from iterative_learning_nmpc_tpu.sim.mujoco_sim import Simulator

    sim = Simulator(go2)

    class _Stub:
        torques_dof = np.zeros(18)
        diverged = False

        def compute_torques_dof(self, d):
            pass

        def set_command(self, *a):
            pass

    cc = CombinedController(sim, _Stub(), _Stub(), v_des=np.zeros(3))
    # nominal standing pose is safe
    assert not cc.check_unsafe_state_v2(sim.data)
    # drop the base below the height bound -> unsafe
    sim.data.qpos[2] = 0.1
    assert cc.check_unsafe_state_v2(sim.data)
    sim.reset()
    # violate a joint bound (thigh below 25 deg)
    sim.data.qpos[8] = 0.0
    assert cc.check_unsafe_state_v2(sim.data)
    sim.reset()
    # velocity-tracking failure
    cc.v_des = np.array([0.5, 0.0, 0.0])
    assert cc.check_unsafe_state_v2(sim.data)


def test_nullspace_perturbation(go2, rng):
    from iterative_learning_nmpc_tpu.learning.rollouts import nullspace_perturbation
    from iterative_learning_nmpc_tpu.models import dynamics as dyn
    import jax.numpy as jnp

    q = np.asarray(go2.q_home, dtype=np.float64).copy()
    p0 = np.asarray(dyn.foot_positions(go2, jnp.asarray(q)))
    q[2] += -p0[0, 2] + float(np.asarray(go2.foot_radius))
    # put the swing pair (FR, RL) mid-swing: flex to lift the feet
    for base in (9, 12):  # FR, RL joint offsets in q
        q[base + 1] += 0.25   # thigh
        q[base + 2] -= 0.35   # calf
    v = np.zeros(18)
    contact = np.array([1, 0, 0, 1])  # trot stance pair
    ground0 = float(np.asarray(go2.foot_radius))
    feet0 = np.asarray(dyn.foot_positions(go2, jnp.asarray(q, jnp.float32)))
    assert feet0[1, 2] > ground0 + 0.03 and feet0[2, 2] > ground0 + 0.03  # precondition
    qp, vp = nullspace_perturbation(go2, q, v, contact, np.random.default_rng(3))
    assert not np.allclose(qp, q)  # something moved
    feet = np.asarray(dyn.foot_positions(go2, jnp.asarray(qp, jnp.float32)))
    ground = float(np.asarray(go2.foot_radius))
    # stance feet stay near the ground, swing feet keep clearance
    assert abs(feet[0, 2] - ground) < 0.031
    assert abs(feet[3, 2] - ground) < 0.031
    assert feet[1, 2] > ground + 0.019
    assert feet[2, 2] > ground + 0.019
    # stance foot velocity stays ~0 (contact-consistent)
    vf = np.asarray(dyn.foot_velocities(go2, jnp.asarray(qp, jnp.float32),
                                        jnp.asarray(vp, jnp.float32)))
    assert np.abs(vf[[0, 3]]).max() < 0.15


def test_bc_training_with_dropout(tmp_path, rng):
    """Dropout-variant training runs and learns (regression: missing dropout
    rngs crashed / silently disabled dropout)."""
    n = 256
    states = rng.normal(size=(n, 44))
    states[:, 0] = 0.0
    goals = rng.normal(size=(n, 3))
    actions = np.concatenate([states, goals], axis=1) @ rng.normal(size=(47, 12)) * 0.2
    db = Database(limit=1024, goal_type="vc", norm_input=False)
    db.append(states, actions, vc_goals=goals)
    cfg = TrainConfig(n_epochs=15, batch_size=64, hidden_dim=64,
                      num_hidden_layer=2, learning_rate=1e-3,
                      batch_norm=False, dropout_rate=0.2,
                      save_dir=str(tmp_path), run_name="drop", ckpt_every=10)
    bc = BehavioralCloning(cfg)
    path = bc.run(db)
    assert os.path.exists(path)
    losses = [m["train_loss"] for m in bc.metrics]
    assert losses[-1] < losses[0]


def test_ood_pipeline_end_to_end(tmp_path, rng):
    """OOD path wired end-to-end (VERDICT r1 item 5, reference
    `test_train_policy.py:127-158` semantics): the collection stores the
    per-row mask in the HDF5, the trainer reads it back, and OOD rows carry
    the x5 sampling weight."""
    from iterative_learning_nmpc_tpu.learning.datagen import (
        PretrainConfig, PretrainDataCollection)
    from iterative_learning_nmpc_tpu.learning.train import make_sample_weights
    from iterative_learning_nmpc_tpu.robots.go2 import go2_spec

    # synthesize two "rollouts" as npz files: a nominal and a perturbed one
    # whose second half drifts far (L2 > threshold) from the nominal
    rec = str(tmp_path / "rec")
    os.makedirs(rec, exist_ok=True)
    n = 40
    t = np.arange(n) * 1e-3
    nom_states = rng.normal(size=(n, 44)) * 0.1
    pert_states = nom_states.copy()
    pert_states[n // 2:] += 10.0
    def dump(path, states):
        np.savez(path, state=states, action=rng.normal(size=(n, 12)),
                 vc_goals=np.tile([0.3, 0.0, 0.0], (n, 1)),
                 cc_goals=rng.normal(size=(n, 3)), time=t,
                 q=np.zeros((n, 19)), v=np.zeros((n, 18)))
    nom_path = os.path.join(rec, "nominal.npz")
    pert_path = os.path.join(rec, "perturbed.npz")
    dump(nom_path, nom_states)
    dump(pert_path, pert_states)

    cfg = PretrainConfig(record_dir=rec, ood_threshold=4.0)
    dc = PretrainDataCollection(go2_spec(), cfg)
    out = dc.save_training_dataset_with_ood([(nom_path, [nom_path, pert_path])])

    # reload: mask round-trips through the HDF5
    db = Database(limit=10_000, goal_type="vc")
    db.load_saved_database(out)
    ood = db.ood_array()
    assert len(db) == 2 * n
    assert ood[:n].sum() == 0                       # nominal rows are ID
    assert ood[n:n + n // 2].sum() == 0             # pre-drift rows are ID
    assert ood[n + n // 2:].all()                   # drifted rows are OOD

    # the trainer's sampler gives OOD rows exactly the x5 weight
    w = make_sample_weights(len(db), ood, 5.0)
    assert np.all(w[ood] == 5.0) and np.all(w[~ood] == 1.0)

    # and the full trainer consumes the mask end-to-end
    tc = TrainConfig(n_epochs=2, batch_size=16, hidden_dim=32,
                     num_hidden_layer=1, save_dir=str(tmp_path),
                     run_name="ood_e2e", ckpt_every=10)
    bc = BehavioralCloning(tc)
    path = bc.run(db, ood_mask=ood)
    assert os.path.exists(path)
