"""Epoch RNG freshness: train.py folds the epoch into the key before each
``train_one_epoch`` call, so different epochs must draw different
denoising/dropout noise streams (a prior revision reused the same key every
epoch, replaying identical noise)."""

import jax
import numpy as np

from salience_detr_tpu.engine.train import train_one_epoch


class _SilentLogger:
    def info(self, *a, **k):
        pass

    error = info


def _run_epoch(rng, epoch, n_steps=3):
    seen = []

    def fake_train_step(state, batch, step_rng):
        seen.append(np.asarray(jax.random.key_data(step_rng)))
        return state, {"loss": np.float32(0.0)}

    loader = [{"images": None}] * n_steps
    train_one_epoch(
        fake_train_step, state=None, loader=loader,
        rng=jax.random.fold_in(rng, epoch), epoch=epoch,
        print_freq=1000, logger=_SilentLogger(),
    )
    return seen


def test_epochs_draw_distinct_noise_streams():
    rng = jax.random.PRNGKey(7)
    e0 = _run_epoch(rng, epoch=0)
    e1 = _run_epoch(rng, epoch=1)
    assert len(e0) == len(e1) == 3
    for k0, k1 in zip(e0, e1):
        assert not np.array_equal(k0, k1), "epochs replay identical noise"
    # and resume-determinism: replaying the same epoch gives the same stream
    e0b = _run_epoch(rng, epoch=0)
    for k0, k0b in zip(e0, e0b):
        np.testing.assert_array_equal(k0, k0b)
