"""Orbax checkpoint save/restore roundtrip + best-metric snapshots +
tolerant weight update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salience_detr_tpu.utils.checkpoint import (
    CheckpointManager,
    HighestCheckpoint,
    tolerant_update,
)


def small_state(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "step": jnp.asarray(3),
        "params": {
            "dense": {"kernel": jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))},
            "norm": {"scale": jnp.ones((8,))},
        },
    }


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
        state = small_state()
        mgr.save(0, jax.device_get(state))
        mgr.save(1, jax.device_get(jax.tree.map(lambda x: x + 1, state)))
        assert mgr.latest_step() == 1
        restored = mgr.restore(jax.device_get(state))
        np.testing.assert_allclose(
            restored["params"]["dense"]["kernel"],
            np.asarray(state["params"]["dense"]["kernel"]) + 1,
        )

    def test_retention(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
        for i in range(4):
            mgr.save(i, jax.device_get(small_state(i)))
        assert mgr.latest_step() == 3
        steps = mgr.manager.all_steps()
        assert len(steps) <= 2

    def test_best_snapshot(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        best = HighestCheckpoint(mgr)
        s1, s2 = small_state(1), small_state(2)
        best.update(jax.device_get(s1), ap=0.3, ap50=0.5)
        best.update(jax.device_get(s2), ap=0.2, ap50=0.6)  # ap50 improves only
        restored = mgr.restore_named("best_ap", jax.device_get(s1))
        np.testing.assert_allclose(
            restored["params"]["dense"]["kernel"], s1["params"]["dense"]["kernel"]
        )
        restored50 = mgr.restore_named("best_ap50", jax.device_get(s1))
        np.testing.assert_allclose(
            restored50["params"]["dense"]["kernel"], s2["params"]["dense"]["kernel"]
        )

    def test_restore_weights_from_train_checkpoint(self, tmp_path):
        """Eval/export restore must work WITHOUT an optimizer-state template:
        a train checkpoint carries the full AdamW state, which the eval
        process can neither reconstruct nor wants (reference test.py:107-112
        loads weights only)."""
        import optax

        from salience_detr_tpu.parallel.train_step import TrainState

        params = small_state()["params"]
        tx = optax.adam(1e-3)
        full = TrainState(
            step=jnp.asarray(7, jnp.int32), params=params,
            frozen={"bn": {"mean": jnp.zeros(8)}}, batch_stats={},
            opt_state=tx.init(params),
        )
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(0, jax.device_get(full))
        got = mgr.restore_weights()
        assert int(got["step"]) == 7
        np.testing.assert_allclose(
            got["params"]["dense"]["kernel"], params["dense"]["kernel"]
        )
        np.testing.assert_allclose(got["frozen"]["bn"]["mean"], 0.0)
        empty = CheckpointManager(str(tmp_path / "empty"))
        assert empty.restore_weights() is None

    def test_tolerant_update(self):
        params = small_state()["params"]
        updates = {
            "dense/kernel": np.zeros((4, 8), np.float32),
            "norm/scale": np.zeros((99,), np.float32),  # shape mismatch
            "missing/param": np.zeros((1,), np.float32),  # not in tree
        }
        new, applied, mismatches = tolerant_update(params, updates)
        assert applied == 1
        assert len(mismatches) == 2
        np.testing.assert_allclose(new["dense"]["kernel"], 0.0)
        np.testing.assert_allclose(new["norm"]["scale"], 1.0)


def test_metadata_sidecar(tmp_path):
    """Class vocabulary rides with the checkpoints (the reference's in-.pth
    _classes_ buffer, main.py:139-141)."""
    from salience_detr_tpu.utils.checkpoint import CheckpointManager

    m = CheckpointManager(str(tmp_path / "ck"))
    assert m.read_metadata() is None
    m.write_metadata({"class_names": {"1": "cat", "2": "dog"}, "seed": 3})
    got = m.read_metadata()
    assert got["class_names"]["2"] == "dog" and got["seed"] == 3
