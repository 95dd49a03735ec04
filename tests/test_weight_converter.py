"""Converter coverage test: the torch->flax rule set must cover the FULL
flagship parameter tree bidirectionally (uses eval_shape — no compute)."""

import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.models.bricks.criterion import Targets
from salience_detr_tpu.models.factory import SalienceDETRConfig, build_salience_detr
from salience_detr_tpu.utils.weight_converter import (
    flatten_variables,
    salience_detr_r50_rules,
)


def test_rules_cover_full_tree():
    cfg = SalienceDETRConfig()
    model, _, _, _ = build_salience_detr(cfg)
    B, H, W, M = 1, 64, 64, 4
    images = jnp.zeros((B, H, W, 3))
    sizes = jnp.full((B, 2), 32, jnp.int32)
    targets = Targets(
        jnp.zeros((B, M), jnp.int32), jnp.full((B, M, 4), 0.5), jnp.ones((B, M), bool)
    )
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "denoising": jax.random.PRNGKey(1)},
            images, sizes, targets, train=True,
        )
    )
    flat = flatten_variables(
        jax.tree.map(lambda x: np.zeros(x.shape, np.float32), shapes)
    )
    rules = salience_detr_r50_rules()
    dsts = {dst for _, dst, _ in rules}

    tree_paths = set(flat.keys())
    missing_in_rules = sorted(tree_paths - dsts)
    extra_in_rules = sorted(dsts - tree_paths)
    assert not missing_in_rules, f"params not covered by converter: {missing_in_rules[:20]}"
    assert not extra_in_rules, f"converter rules with no target param: {extra_in_rules[:20]}"

    # no duplicate destinations
    assert len(dsts) == len(rules)
