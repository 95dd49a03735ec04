"""True device timing under async/remote platforms.

The axon tunnel's block_until_ready does not reliably synchronize, so
measuring wall-clock around dispatches is meaningless.  ``device_time``
chains N executions inside ONE compiled program via a fori_loop carry
dependency and times a real device_get round trip."""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _tree_scalar(tree) -> jnp.ndarray:
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    acc = jnp.float32(0.0)
    for l in leaves:
        if jnp.issubdtype(l.dtype, jnp.floating):
            acc = acc + l.astype(jnp.float32).sum()
    return acc


def device_time(fn: Callable, args: Sequence, iters: int = 10, warmup: bool = True) -> float:
    """Average seconds per call of fn(*args), measured on device."""

    # Perturb the SMALLEST floating arg: the perturbation materializes a copy
    # of that arg every iteration, so applying it to a large array would
    # inflate the measurement by a full read+write of it per call.
    float_idx = [
        i for i, a in enumerate(args)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
    ]
    target = (
        min(float_idx, key=lambda i: args[i].size * args[i].dtype.itemsize)
        if float_idx else None
    )

    def perturb(args, carry):
        out = []
        for i, a in enumerate(args):
            if i == target:
                out.append(a + (carry * 1e-30).astype(a.dtype))
            else:
                out.append(a)
        return tuple(out)

    @jax.jit
    def run(n, *args):
        def body(i, carry):
            return carry + _tree_scalar(fn(*perturb(args, carry))) * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    if warmup:
        jax.device_get(run(1, *args))
    t0 = time.perf_counter()
    jax.device_get(run(iters, *args))
    return (time.perf_counter() - t0) / iters
