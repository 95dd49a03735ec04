"""Benchmark: images/sec/chip for ResNet-50 Salience-DETR inference at the
800x1344 eval canvas (the reference's 800x1333 padded to /32,
/root/reference/util/misc.py:75-104), bf16 compute.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Timing methodology: the remote-tunnel platform's block_until_ready does not
reliably synchronize, so N forward passes are chained INSIDE one compiled
program via a lax.fori_loop data dependency and the wall clock wraps a real
device_get of the carried scalar — one RPC, true device time.

Baseline anchor: the reference publishes no throughput numbers
(SURVEY.md §6).  We anchor on an estimated ~15 img/s for the reference R50 on
a modern datacenter GPU at 800x1333 (deformable-DETR-class models run 10-20
FPS there; Salience-DETR claims ~70% of dense two-stage FLOPs).
BASELINE.json's target is >=2x that per chip, so vs_baseline is
value / (2 * 15.0) — >= 1.0 means the north-star throughput target is met.
"""

import json
import os
import time

import jax

# persistent compile cache: the 1-core host takes minutes per fresh compile
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache"),
)
import jax.numpy as jnp
import numpy as np

REF_GPU_IMG_S = 15.0
TARGET_MULT = 2.0


def main():
    from salience_detr_tpu.models.factory import SalienceDETRConfig, build_salience_detr

    batch = 4
    H, W = 800, 1344
    iters = 10
    cfg = SalienceDETRConfig(dtype=jnp.bfloat16, shared_sampling_locations=True)
    model, _, _, _ = build_salience_detr(cfg)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-2, 2, size=(batch, H, W, 3)).astype(np.float32))
    image_sizes = jnp.asarray([[H, W]] * batch, np.int32)

    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, image_sizes, train=False)
    )()

    @jax.jit
    def bench_n(images, image_sizes, n):
        def body(i, carry):
            # the tiny carry perturbation forces sequential execution of all
            # n forwards (prevents hoisting/CSE) without changing numerics
            out = model.apply(
                variables, images + carry * 1e-30, image_sizes, train=False
            )
            return carry + out["pred_class"][-1].astype(jnp.float32).sum() * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # compile + warmup (device_get forces real completion)
    jax.device_get(bench_n(images, image_sizes, 1))

    t0 = time.perf_counter()
    jax.device_get(bench_n(images, image_sizes, iters))
    dt = time.perf_counter() - t0

    img_s = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "images/sec/chip R50 800x1344 inference bf16",
                "value": round(img_s, 3),
                "unit": "img/s",
                "vs_baseline": round(img_s / (TARGET_MULT * REF_GPU_IMG_S), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
