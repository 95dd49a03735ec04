"""Benchmark: images/sec/chip for ResNet-50 Salience-DETR inference at the
800x1344 eval canvas (the reference's 800x1333 padded to /32,
/root/reference/util/misc.py:75-104), bf16 compute — plus the full training
step (fwd + CDN + Hungarian + NMS + losses + bwd + AdamW) at the same canvas.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.
The headline metric stays inference img/s; extras carry the train-step rate
("train_img_s"), run-to-run spread, and MFU (XLA HLO cost-analysis FLOPs vs
the v5e bf16 peak) so every round records throughput AND efficiency.

Timing methodology: the remote-tunnel platform's block_until_ready does not
reliably synchronize, so N iterations are chained INSIDE one compiled program
via a lax.fori_loop data dependency and the wall clock wraps a real
device_get of the carried scalar — one RPC, true device time.  Each phase is
timed BENCH_REPEATS times (default 3) and the MEDIAN is reported with the
min-max spread, making the record robust to tunnel variance (the round-3
20.7-vs-30.2 img/s discrepancy was partly attributed to single-shot timing).

Baseline anchor: the reference publishes no throughput numbers
(SURVEY.md §6).  We anchor on an estimated ~15 img/s for the reference R50 on
a modern datacenter GPU at 800x1333 (deformable-DETR-class models run 10-20
FPS there; Salience-DETR claims ~70% of dense two-stage FLOPs).  This anchor
is self-declared and unvalidated — the reference repo ships no benchmark
numbers to pin it.  BASELINE.json's target is >=2x that per chip, so
vs_baseline is value / (2 * 15.0) — >= 1.0 means the north-star throughput
target is met.  The MFU extras exist precisely so progress is measurable
without this anchor.
"""

import json
import os
import statistics
import time

import jax

# persistent compile cache: the 1-core host takes minutes per fresh compile
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)
import jax.numpy as jnp
import numpy as np

REF_GPU_IMG_S = 15.0
TARGET_MULT = 2.0
# TPU v5e (v5 lite) bf16 peak per chip; override for other hardware
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))


def _flops_of(compiled) -> float:
    """HLO cost-analysis FLOPs of a compiled computation (0.0 if the
    platform's PJRT client does not expose cost analysis)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _median_spread(dts):
    med = statistics.median(dts)
    spread = (max(dts) - min(dts)) / med * 100.0 if med > 0 else 0.0
    return med, spread


def bench_inference(model, variables, images, image_sizes, iters=10):
    """Returns (median_seconds_for_iters, spread_pct, flops_per_forward)."""

    def fwd(images, image_sizes):
        return model.apply(variables, images, image_sizes, train=False)

    @jax.jit
    def bench_n(images, image_sizes, n):
        def body(i, carry):
            # the tiny carry perturbation forces sequential execution of all
            # n forwards (prevents hoisting/CSE) without changing numerics
            out = fwd(images + carry * 1e-30, image_sizes)
            return carry + out["pred_class"][-1].astype(jnp.float32).sum() * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jax.device_get(bench_n(images, image_sizes, 1))  # compile + warmup
    dts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.device_get(bench_n(images, image_sizes, iters))
        dts.append(time.perf_counter() - t0)
    flops = _flops_of(jax.jit(fwd).lower(images, image_sizes).compile())
    med, spread = _median_spread(dts)
    return med, spread, flops


def bench_train(model, criterion, sal_criterion, images, image_sizes, iters=3):
    """Full train step timing; returns (median_seconds_for_iters, spread_pct,
    flops_per_step)."""
    import optax

    from salience_detr_tpu.models.bricks.criterion import Targets, default_weight_dict
    from salience_detr_tpu.parallel.train_step import create_train_state, make_train_step

    B = images.shape[0]
    M = 24
    rng = np.random.default_rng(1)
    cxy = rng.uniform(0.25, 0.7, (B, M, 2))
    wh = rng.uniform(0.05, 0.25, (B, M, 2))
    targets = Targets(
        jnp.asarray(rng.integers(0, 91, (B, M)), jnp.int32),
        jnp.asarray(np.concatenate([cxy, wh], -1), jnp.float32),
        jnp.ones((B, M), bool),
    )
    tx = optax.adamw(1e-4)
    state = create_train_state(model, tx, images, image_sizes, targets)
    step = make_train_step(
        model, criterion, sal_criterion, tx, default_weight_dict(), donate=False
    )
    batch = {
        "images": images, "image_sizes": image_sizes, "labels": targets.labels,
        "boxes": targets.boxes, "gt_valid": targets.valid,
    }
    key = jax.random.PRNGKey(0)
    state, metrics = step(state, batch, key)  # compile + warmup
    jax.device_get(metrics["loss"])
    dts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch, key)
        jax.device_get(metrics["loss"])
        dts.append(time.perf_counter() - t0)
    flops = _flops_of(step.lower(state, batch, key).compile())
    med, spread = _median_spread(dts)
    return med, spread, flops


def main():
    from salience_detr_tpu.models.factory import SalienceDETRConfig, build_salience_detr

    batch = int(os.environ.get("BENCH_BATCH", 4))
    H, W = 800, 1344
    iters = 10
    # BENCH_SAMPLING selects the deformable-sampling variant: "shared"
    # (1 location group), "groups<G>" (G groups), or "exact" (per-head,
    # checkpoint-exact numerics), with an optional "_dec<D>" decoder
    # cross-attn override (D=0 exact, D>=1 groups).  The flagship default is
    # chosen by the paired quality campaign in ROADMAP.md.
    sampling = os.environ.get("BENCH_SAMPLING", "shared_dec0")
    dec_groups = -1
    if "_dec" in sampling:
        sampling, dec = sampling.split("_dec")
        dec_groups = int(dec)
    if sampling.startswith("groups"):
        groups = int(sampling[len("groups"):])
    elif sampling == "shared":
        groups = 1
    else:
        groups = 0  # exact per-head
    cfg = SalienceDETRConfig(
        dtype=jnp.bfloat16,
        shared_sampling_locations=groups > 0,
        sampling_groups=groups,
        decoder_sampling_groups=dec_groups,
        sort_encoder_prefix=os.environ.get("BENCH_SORT_PREFIX", "0") == "1",
        remat_policy=os.environ.get("REMAT_POLICY", "full"),
    )
    model, criterion, sal_criterion, _ = build_salience_detr(cfg)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-2, 2, size=(batch, H, W, 3)).astype(np.float32))
    image_sizes = jnp.asarray([[H, W]] * batch, np.int32)

    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images, image_sizes, train=False)
    )()

    t_start = time.perf_counter()
    dt, spread, fwd_flops = bench_inference(model, variables, images, image_sizes, iters)
    img_s = batch * iters / dt
    del variables

    result = {
        "metric": "images/sec/chip R50 800x1344 inference bf16",
        "value": round(img_s, 3),
        "unit": "img/s",
        "vs_baseline": round(img_s / (TARGET_MULT * REF_GPU_IMG_S), 4),
        "spread_pct": round(spread, 1),
    }
    if fwd_flops > 0:
        achieved = fwd_flops * iters / dt / 1e12
        result["infer_tflops"] = round(achieved, 2)
        result["infer_mfu_pct"] = round(achieved / PEAK_TFLOPS * 100.0, 2)

    # train-step rate: skipped when the inference phase burned the window on
    # fresh compiles (keeps the driver's bench slot safe)
    if (time.perf_counter() - t_start) < float(os.environ.get("BENCH_TRAIN_BUDGET", 900)):
        try:
            train_iters = 3
            dt_train, tr_spread, step_flops = bench_train(
                model, criterion, sal_criterion, images, image_sizes, train_iters
            )
            result["train_img_s"] = round(batch * train_iters / dt_train, 3)
            result["train_spread_pct"] = round(tr_spread, 1)
            if step_flops > 0:
                achieved = step_flops * train_iters / dt_train / 1e12
                result["train_tflops"] = round(achieved, 2)
                result["train_mfu_pct"] = round(achieved / PEAK_TFLOPS * 100.0, 2)
        except Exception as e:  # noqa: BLE001 — never lose the headline metric
            result["train_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(result))


if __name__ == "__main__":
    main()
