"""Native C++ replay store vs the Python Database semantics."""
import numpy as np
import pytest

from iterative_learning_nmpc_tpu.learning.fast_database import (
    FastDatabase,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_append_gather(rng):
    db = FastDatabase(limit=100, state_dim=4, action_dim=2, goal_dim=3)
    s = rng.normal(size=(10, 4))
    a = rng.normal(size=(10, 2))
    g = rng.normal(size=(10, 3))
    db.append(s, a, g, traj_ids=np.arange(10), times=np.arange(10.0))
    assert len(db) == 10
    ss, aa, gg = db.gather(np.arange(10))
    np.testing.assert_allclose(ss, s)
    np.testing.assert_allclose(aa, a)
    np.testing.assert_allclose(gg, g)


def test_ring_overflow(rng):
    db = FastDatabase(limit=8, state_dim=2, action_dim=1, goal_dim=1)
    for i in range(4):
        db.append(np.full((3, 2), i), np.full((3, 1), i), np.full((3, 1), i))
    assert len(db) == 8
    ss, _, _ = db.gather(np.arange(8))
    # oldest rows (value 0, and one row of value 1) evicted
    assert ss[:, 0].min() >= 1.0
    assert ss[-1, 0] == 3.0


def test_mean_std_matches_numpy(rng):
    db = FastDatabase(limit=1000, state_dim=5, action_dim=1, goal_dim=1)
    s = rng.normal(2.0, 3.0, size=(400, 5))
    db.append(s, np.zeros((400, 1)), np.zeros((400, 1)))
    mean, std = db.mean_std()
    np.testing.assert_allclose(mean, s.mean(0), rtol=1e-10)
    np.testing.assert_allclose(std, s.std(0), rtol=1e-10)


def test_weighted_sampling(rng):
    db = FastDatabase(limit=100, state_dim=1, action_dim=1, goal_dim=1)
    s = np.arange(100, dtype=np.float64)[:, None]
    db.append(s, s, s)
    w = np.zeros(100)
    w[:10] = 1.0  # only the first 10 rows can be drawn
    ss, _, _ = db.sample(1000, weights=w, seed=42)
    assert ss.max() < 10
    # roughly uniform over the allowed rows
    counts = np.bincount(ss[:, 0].astype(int), minlength=10)
    assert counts.min() > 50


def test_save_load(tmp_path, rng):
    db = FastDatabase(limit=50, state_dim=3, action_dim=2, goal_dim=1)
    s = rng.normal(size=(20, 3))
    db.append(s, rng.normal(size=(20, 2)), rng.normal(size=(20, 1)))
    p = str(tmp_path / "buf.bin")
    db.save(p)
    db2 = FastDatabase.load(p, state_dim=3, action_dim=2, goal_dim=1)
    assert len(db2) == 20
    ss, _, _ = db2.gather(np.arange(20))
    np.testing.assert_allclose(ss, s)
