"""On-chip bench for the LARGE backbone configs (VERDICT r4 #3).

BASELINE.json lists Swin-L / ConvNeXt-L / FocalNet-L-LRF configs
(reference `configs/salience_detr/salience_detr_{swin_l,convnext_l,
focalnet_large_lrf}_800_1333.py`, Model Zoo README.md:66-68) but until
round 5 they had never been stepped on the TPU — only converter/CPU
tested.  This tool puts each one on the chip at the real 800x1344 canvas:

* inference img/s (bench.py's chained-fori_loop methodology, median of
  BENCH_REPEATS),
* one compiled TRAIN step (fwd + CDN + Hungarian + losses + bwd + AdamW)
  and its img/s,
* XLA cost-analysis FLOPs -> MFU,
* compiled peak-HBM estimate (temp + args + output),
* the largest OOM-free inference batch from a doubling probe.

Writes one JSON object per config to --out (default
docs/backbone_bench_r5.json).

Usage:
    python tools/backbone_bench.py                       # all four configs
    python tools/backbone_bench.py --configs swin_l      # subset
    python tools/backbone_bench.py --skip-train          # inference only
"""

from __future__ import annotations

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time
import traceback

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)
import jax.numpy as jnp
import numpy as np

CONFIGS = {
    "resnet50": "configs/salience_detr/salience_detr_resnet50_800_1333.py",
    "swin_l": "configs/salience_detr/salience_detr_swin_l_800_1333.py",
    "convnext_l": "configs/salience_detr/salience_detr_convnext_l_800_1333.py",
    "focalnet_large_lrf":
        "configs/salience_detr/salience_detr_focalnet_large_lrf_800_1333.py",
}
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))


def _mem_gib(compiled):
    try:
        m = compiled.memory_analysis()
        tot = (m.temp_size_in_bytes + m.argument_size_in_bytes
               + m.output_size_in_bytes)
        return round(tot / 2**30, 2)
    except Exception:
        return None


def bench_one(name, cfg_path, batch, train_batch, iters, skip_train):
    from bench import REPEATS, _flops_of, _median_spread, bench_train
    from salience_detr_tpu.models.factory import build_salience_detr
    from salience_detr_tpu.utils.config import Config

    cfg = Config(cfg_path).model_config
    cfg.dtype = jnp.bfloat16
    model, criterion, sal_criterion, _ = build_salience_detr(cfg)

    H, W = 800, 1344
    rng = np.random.default_rng(0)

    def make_inputs(B):
        images = jnp.asarray(
            rng.uniform(-2, 2, size=(B, H, W, 3)).astype(np.float32))
        sizes = jnp.asarray([[H, W]] * B, np.int32)
        return images, sizes

    images, sizes = make_inputs(batch)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, images, sizes, train=False)
    )()
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"]))

    def fwd(images, sizes):
        return model.apply(variables, images, sizes, train=False)

    @jax.jit
    def bench_n(images, sizes, n):
        def body(i, carry):
            out = fwd(images + carry * 1e-30, sizes)
            return carry + out["pred_class"][-1].astype(jnp.float32).sum() * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    rec = {"config": name, "canvas": [H, W], "batch": batch,
           "params_m": round(n_params / 1e6, 1)}

    compiled = jax.jit(fwd).lower(images, sizes).compile()
    rec["infer_peak_hbm_gib"] = _mem_gib(compiled)
    fwd_flops = _flops_of(compiled)

    jax.device_get(bench_n(images, sizes, 1))  # compile + warmup
    dts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.device_get(bench_n(images, sizes, iters))
        dts.append(time.perf_counter() - t0)
    med, spread = _median_spread(dts)
    rec["infer_img_s"] = round(batch * iters / med, 2)
    rec["infer_spread_pct"] = round(spread, 1)
    if fwd_flops > 0:
        tf = fwd_flops * iters / med / 1e12
        rec["infer_tflops"] = round(tf, 2)
        rec["infer_mfu_pct"] = round(tf / PEAK_TFLOPS * 100.0, 2)

    # largest OOM-free inference batch: doubling probe from `batch`
    ok_b = batch
    b = batch * 2
    while b <= 16:
        try:
            im2, sz2 = make_inputs(b)
            jax.device_get(jax.jit(fwd)(im2, sz2)["pred_class"][-1].sum())
            ok_b = b
            b *= 2
        except Exception as e:
            rec["oom_at_batch"] = {"batch": b, "error": f"{type(e).__name__}"}
            break
    rec["max_infer_batch"] = ok_b

    if not skip_train:
        del variables
        try:
            im_t, sz_t = make_inputs(train_batch)
            dt_train, tr_spread, step_flops = bench_train(
                model, criterion, sal_criterion, im_t, sz_t, iters=3)
            rec["train_batch"] = train_batch
            rec["train_img_s"] = round(train_batch * 3 / dt_train, 2)
            rec["train_spread_pct"] = round(tr_spread, 1)
            if step_flops > 0:
                tf = step_flops * 3 / dt_train / 1e12
                rec["train_tflops"] = round(tf, 2)
                rec["train_mfu_pct"] = round(tf / PEAK_TFLOPS * 100.0, 2)
        except Exception as e:  # record the failure, keep the sweep going
            rec["train_error"] = f"{type(e).__name__}: {e}"[:300]
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*", default=list(CONFIGS))
    p.add_argument("--batch", type=int, default=2,
                   help="inference batch for the L-size backbones")
    p.add_argument("--train-batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--out", default="docs/backbone_bench_r5.json")
    args = p.parse_args()

    # merge with prior runs (a retry of one config must not clobber the rest)
    results = []
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                results = json.load(f).get("results", [])
        except Exception:
            results = []
    for name in args.configs:
        print(f"== {name} ==", flush=True)
        try:
            rec = bench_one(name, CONFIGS[name], args.batch, args.train_batch,
                            args.iters, args.skip_train)
        except Exception as e:
            traceback.print_exc()
            rec = {"config": name, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(rec), flush=True)
        results = [r for r in results if r.get("config") != name] + [rec]
        # flush per config so a crash mid-sweep loses nothing
        with open(args.out, "w") as f:
            json.dump({"canvas": [800, 1344], "results": results}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
