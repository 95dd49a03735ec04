"""GSPMD train/eval steps.

One jitted program covers forward, CDN generation, on-device Hungarian
matching, all losses, backward, clip, and the optimizer update — the
reference's per-iteration host syncs (scipy matching at set_criterion.py:126,
loss .item() at util/engine.py:70) do not exist here; metrics leave the
device only at the logging interval.

Data parallelism: batch arrays sharded on the ``dp`` mesh axis, state
replicated; XLA inserts the gradient all-reduce (SURVEY.md §2.12's
TPU-native equivalent).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from salience_detr_tpu.models.bricks.criterion import Targets
from salience_detr_tpu.models.detectors.salience_detr import compute_loss


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    frozen: Any  # FrozenBatchNorm statistics
    batch_stats: Any  # RepVGG BatchNorm running stats
    opt_state: Any


def create_train_state(model, tx, images, image_sizes, targets, seed: int = 0) -> TrainState:
    variables = jax.jit(
        lambda: model.init(
            {
                "params": jax.random.PRNGKey(seed),
                "denoising": jax.random.PRNGKey(seed + 1),
                "dropout": jax.random.PRNGKey(seed + 2),
            },
            images, image_sizes, targets, train=True,
        )
    )()
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def make_train_step(
    model,
    criterion,
    salience_criterion,
    tx: optax.GradientTransformation,
    weight_dict: Dict[str, float],
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    accumulate_steps: int = 1,
) -> Callable:
    """Build the jitted train step; if ``mesh`` is given, shard the batch on
    its 'dp' axis and replicate the state.

    ``accumulate_steps > 1`` splits the batch into micro-batches inside the
    compiled step and averages gradients (the reference's
    ``accelerator.accumulate``, /root/reference/util/engine.py:44 +
    main.py:36-38) — batch dims must be divisible by it."""

    def micro_grads(state, batch, rng, num_boxes):
        targets = Targets(batch["labels"], batch["boxes"], batch["gt_valid"])
        dn_rng, drop_rng = jax.random.split(rng)

        def loss_fn(params):
            variables = {"params": params, "frozen": state.frozen}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            outputs, mutated = model.apply(
                variables,
                batch["images"],
                batch["image_sizes"],
                targets,
                train=True,
                rngs={"denoising": dn_rng, "dropout": drop_rng},
                mutable=["batch_stats"],
            )
            losses = compute_loss(
                outputs, targets, batch["image_sizes"], criterion,
                salience_criterion, num_boxes, weight_dict,
                denoising_nums=model.denoising_nums,
            )
            total = sum(jnp.asarray(v, jnp.float32) for v in losses.values())
            return total, (losses, mutated.get("batch_stats", state.batch_stats))

        return jax.value_and_grad(loss_fn, has_aux=True)(state.params)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        if accumulate_steps <= 1:
            # reference num_boxes normalization (set_criterion.py:141-147):
            # global count clamped to >= 1 (see criterion.py docstring for the
            # world_size rounding difference)
            num_boxes = jnp.maximum(
                jnp.sum(batch["gt_valid"]).astype(jnp.float32), 1.0
            )
            (total, (losses, new_batch_stats)), grads = micro_grads(
                state, batch, rng, num_boxes
            )
        else:
            # unrolled micro-batches; each normalized by its own num_boxes,
            # gradients averaged (accelerator.accumulate semantics)
            A = accumulate_steps
            if batch["images"].shape[0] % A != 0:
                raise ValueError(
                    f"batch size {batch['images'].shape[0]} is not divisible "
                    f"by --accumulate-steps {A}"
                )
            mbs = batch["images"].shape[0] // A
            rngs = jax.random.split(rng, A)
            grads = total = losses = None
            new_batch_stats = state.batch_stats
            for a in range(A):
                mb = jax.tree.map(lambda x: x[a * mbs : (a + 1) * mbs], batch)
                nb = jnp.maximum(jnp.sum(mb["gt_valid"]).astype(jnp.float32), 1.0)
                st = state.replace(batch_stats=new_batch_stats)
                (t, (l, new_batch_stats)), g = micro_grads(st, mb, rngs[a], nb)
                grads = g if grads is None else jax.tree.map(jnp.add, grads, g)
                total = t if total is None else total + t
                losses = l if losses is None else jax.tree.map(jnp.add, losses, l)
            grads = jax.tree.map(lambda x: x / A, grads)
            total = total / A
            losses = jax.tree.map(lambda x: x / A, losses)

        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = grad_norm
        return new_state, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("dp"))
        return jax.jit(
            step_fn,
            in_shardings=(repl, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, postprocess, mesh: Optional[Mesh] = None) -> Callable:
    """Jitted eval forward + postprocess -> per-image top-k detections."""

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        variables = {"params": state.params, "frozen": state.frozen}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        outputs = model.apply(
            variables, batch["images"], batch["image_sizes"], train=False
        )
        return postprocess(
            outputs["pred_class"][-1],
            outputs["pred_coord"][-1],
            batch["orig_sizes"],
        )

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("dp"))
        return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=data)
    return jax.jit(step_fn)
