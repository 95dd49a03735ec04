"""Optimizer construction: AdamW with the reference's 6-way param grouping,
warmup + MultiStep schedule, gradient clipping, and stage freezing.

Numerical spec:
* param groups — /root/reference/optimizer/param_dict.py:79-146
  (finetune_backbone_and_linear_projection): backbone and deformable-attention
  linear projections (sampling_offsets / reference_points) train at 0.1x lr;
  norm/bias parameters get weight_decay 0.  Keyword semantics are replicated
  against the reference's *torch* parameter names: norms wrapped inside
  Conv(Norm)Activation blocks escape the "norm" keyword there (sequential
  index names), so our ConvNormAct norm submodules are deliberately named
  without a lowercase "norm" substring;
* schedule — AdamW lr 1e-4 wd 1e-4 (/root/reference/configs/
  train_config.py:43), MultiStepLR([10], 0.1) (:44), linear warmup from
  1/1000 over min(1000, steps_per_epoch) iterations in epoch 0 only
  (/root/reference/util/engine.py:30-35), grad clip 0.1 (:59-60);
* freezing — frozen backbone stages get zeroed updates (the reference flips
  requires_grad, /root/reference/models/backbones/resnet.py:428-436).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def param_group_of(path: Tuple[Any, ...]) -> str:
    """Classify a flattened param path into the reference's 6 groups."""
    comps = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    comps = [str(c) for c in comps]
    leaf = comps[-1]
    is_backbone = len(comps) > 0 and comps[0] == "backbone"
    is_proj = any(c in ("sampling_offsets", "reference_points") for c in comps)
    is_norm_bias = leaf == "bias" or any("norm" in c for c in comps)

    if is_backbone and not is_proj:
        return "backbone_norm" if is_norm_bias else "backbone"
    if is_proj and not is_backbone:
        return "linear_projection_norm" if is_norm_bias else "linear_projection"
    return "other_norm" if is_norm_bias else "other"


LR_MULT = {
    "other": 1.0,
    "other_norm": 1.0,
    "backbone": 0.1,
    "backbone_norm": 0.1,
    "linear_projection": 0.1,
    "linear_projection_norm": 0.1,
}
WD_APPLIES = {
    "other": True,
    "backbone": True,
    "linear_projection": True,
    "other_norm": False,
    "backbone_norm": False,
    "linear_projection_norm": False,
}


def _is_norm_module_comp(c: str) -> bool:
    """Whether a path component names a normalization submodule (the
    reference keys off module classes, param_dict.py:31-38; our module names
    follow fixed conventions: *norm*, bn*, *_bn, fbn, ln/ln_*/*_ln, gn)."""
    c = c.lower()
    return (
        "norm" in c
        or c.startswith("bn")
        or c.endswith("_bn")
        or c in ("fbn", "ln", "gn")
        or c.startswith("ln_")
        or c.endswith("_ln")
    )


def _group_backbone_only(path: Tuple[Any, ...]) -> str:
    """finetune_backbone_param (/root/reference/optimizer/param_dict.py:15-28):
    two groups — backbone at 0.1x lr, everything else at 1x; uniform wd."""
    comps = [str(getattr(p, "key", getattr(p, "name", str(p)))) for p in path]
    return "backbone" if comps and comps[0] == "backbone" else "other"


def _group_no_norm_wd(path: Tuple[Any, ...]) -> str:
    """finetune_backbone_with_no_norm_weight_decay
    (/root/reference/optimizer/param_dict.py:31-76): four groups — norm-module
    parameters (scale AND bias, but not biases of other modules) get wd 0;
    backbone params get 0.1x lr."""
    comps = [str(getattr(p, "key", getattr(p, "name", str(p)))) for p in path]
    is_backbone = bool(comps) and comps[0] == "backbone"
    is_norm = any(_is_norm_module_comp(c) for c in comps[:-1])
    if is_backbone:
        return "backbone_norm" if is_norm else "backbone"
    return "other_norm" if is_norm else "other"


# grouping-name -> (classifier, lr multipliers, wd applicability); the
# reference selects these via cfg (param_dict.py exposes all three builders)
PARAM_GROUPINGS = {
    "finetune_backbone_and_linear_projection": (param_group_of, LR_MULT, WD_APPLIES),
    "finetune_backbone_param": (
        _group_backbone_only,
        {"other": 1.0, "backbone": 0.1},
        {"other": True, "backbone": True},
    ),
    "finetune_backbone_with_no_norm_weight_decay": (
        _group_no_norm_wd,
        {"other": 1.0, "other_norm": 1.0, "backbone": 0.1, "backbone_norm": 0.1},
        {"other": True, "backbone": True, "other_norm": False, "backbone_norm": False},
    ),
}


def make_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    milestones: Sequence[int] = (10,),
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 1000,
    warmup_steps: Optional[int] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Warmup (epoch 0 only) + MultiStep epoch decay, as a function of step."""
    if warmup_steps is None:
        warmup_steps = min(1000, steps_per_epoch)
    milestone_steps = jnp.asarray([m * steps_per_epoch for m in milestones])

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(
            step < warmup_steps,
            warmup_factor + (1.0 - warmup_factor) * step / max(warmup_steps, 1),
            1.0,
        )
        decay = gamma ** jnp.sum(step >= milestone_steps.astype(jnp.float32))
        return base_lr * warm * decay

    return schedule


def build_optimizer(
    params,
    lr_schedule: Callable,
    weight_decay: float = 1e-4,
    betas: Tuple[float, float] = (0.9, 0.999),
    max_norm: float = 0.1,
    frozen_predicate: Optional[Callable[[Tuple[Any, ...]], bool]] = None,
    grouping: str = "finetune_backbone_and_linear_projection",
) -> optax.GradientTransformation:
    """AdamW with per-group lr multipliers / wd masks / freezing."""

    classify, lr_table, wd_table = PARAM_GROUPINGS[grouping]
    groups = jax.tree_util.tree_map_with_path(lambda p, _: classify(p), params)
    lr_mult = jax.tree.map(lambda g: lr_table[g], groups)
    wd_mask = jax.tree.map(lambda g: wd_table[g], groups)
    if frozen_predicate is not None:
        trainable = jax.tree_util.tree_map_with_path(
            lambda p, _: not frozen_predicate(_strip_backbone(p)), params
        )
    else:
        trainable = jax.tree.map(lambda _: True, params)

    def scale_by_group_lr():
        def init(params):
            return optax.EmptyState()

        def update(updates, state, params=None):
            updates = jax.tree.map(lambda u, m: u * m, updates, lr_mult)
            return updates, state

        return optax.GradientTransformation(init, update)

    def freeze_mask():
        def init(params):
            return optax.EmptyState()

        def update(updates, state, params=None):
            updates = jax.tree.map(
                lambda u, t: u if t else jnp.zeros_like(u), updates, trainable
            )
            return updates, state

        return optax.GradientTransformation(init, update)

    return optax.chain(
        freeze_mask(),
        optax.clip_by_global_norm(max_norm),
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=1e-8),
        optax.add_decayed_weights(weight_decay, mask=wd_mask),
        scale_by_group_lr(),
        optax.scale_by_learning_rate(lr_schedule),
    )


def _strip_backbone(path):
    """frozen_param_predicate expects backbone-relative paths."""
    comps = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if comps and str(comps[0]) == "backbone":
        return tuple(str(c) for c in comps[1:])
    return ("__not_backbone__",)
