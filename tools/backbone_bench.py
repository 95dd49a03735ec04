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


def _split_programs(model, variables):
    """Backbone+neck and transformer-rest as TWO jitted programs.

    The single whole-model program for the L-size backbones exceeds what
    the remote compile helper survives (observed: transport broken-pipe =
    helper killed mid-compile on Swin-L and ConvNeXt-L at 800x1344, while
    the full R50 program compiles fine).  Splitting at the feature handoff
    halves the per-program compile footprint; the reported latency is the
    SUM of both programs (one extra HBM feature roundtrip vs fused — a
    few MB, negligible at these sizes).  The rest-program body mirrors
    SalienceDETR.__call__'s eval path (models/detectors/salience_detr.py).
    """
    from salience_detr_tpu.ops import misc as misc_ops
    from salience_detr_tpu.ops.pos_encoding import sine_position_embedding

    def bb(m, images):
        return m.neck(m.backbone(images.astype(m.dtype), train=False))

    def backbone_fn(images):
        return model.apply(variables, images, method=bb)

    def rest(m, feats, image_sizes, canvas):
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        valid_hw = misc_ops.multi_level_valid_sizes(image_sizes, canvas, shapes)
        masks = [misc_ops.rect_mask(v, s) for v, s in zip(valid_hw, shapes)]
        pos_embeds = [
            sine_position_embedding(
                mm, num_pos_feats=m.transformer.embed_dim // 2,
                normalize=True, offset=-0.5,
            ).astype(m.dtype)
            for mm in masks
        ]
        vr = misc_ops.valid_ratios(valid_hw, shapes)
        outputs_class, outputs_coord, *_ = m.transformer(
            feats, masks, pos_embeds, valid_hw, vr,
            None, None, None, train=False,
        )
        return outputs_class, outputs_coord

    def rest_fn(feats, sizes, canvas):
        return model.apply(variables, feats, sizes, canvas, method=rest)

    return backbone_fn, rest_fn


def bench_one(name, cfg_path, batch, train_batch, iters, skip_train,
              split=False):
    from bench import REPEATS, _flops_of, _median_spread, bench_train
    from salience_detr_tpu.models.factory import build_salience_detr
    from salience_detr_tpu.utils.config import Config

    cfg = Config(cfg_path).model_config
    cfg.dtype = jnp.bfloat16
    model, criterion, sal_criterion, _ = build_salience_detr(cfg)

    # canvas override for CPU smoke tests of the harness itself
    H = int(os.environ.get("BB_BENCH_H", 800))
    W = int(os.environ.get("BB_BENCH_W", 1344))
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

    if split:
        return _bench_split(name, model, variables, images, sizes, batch,
                            iters, n_params, H, W)

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


def _bench_split(name, model, variables, images, sizes, batch, iters,
                 n_params, H, W):
    from bench import REPEATS, _flops_of, _median_spread

    backbone_fn, rest_fn = _split_programs(model, variables)
    rec = {"config": name, "canvas": [H, W], "batch": batch,
           "params_m": round(n_params / 1e6, 1), "mode": "split-compile"}

    bb_c = jax.jit(backbone_fn).lower(images).compile()
    feats = bb_c(images)
    jax.block_until_ready(feats)
    rest_j = jax.jit(rest_fn, static_argnames=("canvas",))
    rest_c = rest_j.lower(feats, sizes, (H, W)).compile()

    rec["backbone_peak_hbm_gib"] = _mem_gib(bb_c)
    rec["rest_peak_hbm_gib"] = _mem_gib(rest_c)
    flops = (_flops_of(bb_c) or 0.0) + (_flops_of(rest_c) or 0.0)

    # chained timing (bench.py methodology) per program; total = sum
    @jax.jit
    def bench_bb(images, n):
        def body(i, carry):
            f = backbone_fn(images + carry * 1e-30)
            return carry + f[0].astype(jnp.float32).sum() * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @jax.jit
    def bench_rest(feats, sizes, n):
        def body(i, carry):
            oc, _ = rest_fn(
                [f + carry * 1e-30 for f in feats], sizes, (H, W))
            return carry + oc[-1].astype(jnp.float32).sum() * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jax.device_get(bench_bb(images, 1))
    jax.device_get(bench_rest(feats, sizes, 1))
    t_bb, t_rest = [], []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.device_get(bench_bb(images, iters))
        t_bb.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.device_get(bench_rest(feats, sizes, iters))
        t_rest.append(time.perf_counter() - t0)
    med_bb, sp_bb = _median_spread(t_bb)
    med_rest, sp_rest = _median_spread(t_rest)
    med = med_bb + med_rest
    rec["infer_img_s"] = round(batch * iters / med, 2)
    rec["backbone_ms"] = round(med_bb / iters * 1e3, 1)
    rec["transformer_ms"] = round(med_rest / iters * 1e3, 1)
    rec["infer_spread_pct"] = round(max(sp_bb, sp_rest), 1)
    if flops > 0:
        tf = flops * iters / med / 1e12
        rec["infer_tflops"] = round(tf, 2)
        rec["infer_mfu_pct"] = round(tf / PEAK_TFLOPS * 100.0, 2)
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*", default=list(CONFIGS))
    p.add_argument("--batch", type=int, default=2,
                   help="inference batch for the L-size backbones")
    p.add_argument("--train-batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--split", action="store_true",
                   help="compile backbone+neck and transformer as two "
                   "programs (the remote compile helper dies on the "
                   "single-program L-backbone compile)")
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
                            args.iters, args.skip_train, split=args.split)
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
