"""Multi-device GSPMD validation: the full train step over an 8-device CPU
mesh (SURVEY.md §4's answer to 'test distributed without a cluster')."""

import jax
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast lane


def test_dryrun_multichip_8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_shapes():
    """Driver contract sanity via eval_shape of the flagship model (entry()
    itself initializes full-size parameters — compiled separately on TPU)."""
    import jax.numpy as jnp

    from salience_detr_tpu.models.factory import SalienceDETRConfig, build_salience_detr

    cfg = SalienceDETRConfig(dtype=jnp.bfloat16)
    model, *_ = build_salience_detr(cfg)
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    sizes = jnp.full((1, 2), 128, jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, sizes, train=False)
    )
    assert "params" in shapes
