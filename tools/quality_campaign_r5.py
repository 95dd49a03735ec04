"""Round-5 paired quality campaign: exact vs hybrid sampling at the REAL
800x1344 canvas, with AP curves and an int8-gather eval overlay.

Scales up the r4 campaign (tools/validate_static_shapes.py at 128x128,
2k steps) along every axis VERDICT r4 #2 asked for:

* **steps**: >= 10k per run (5x r4) with an AP checkpoint curve (periodic
  eval), not just a final number;
* **canvas**: the real 800x1344 eval canvas (the reference's 800x1333 padded
  to /32) so the salience level budgets, limit ranges ((-1,64),(64,128),
  (128,256),(256,inf)) and the encoder's ~17.7k-token gather geometry run at
  deployment scale;
* **generator**: a richer synthetic scene than r4's axis-aligned color
  rectangles — 6 classes (3 colors x {rectangle, ellipse}), log-uniform
  object scales 16..640 px spanning all four salience level ranges,
  background gradients + noise + low-contrast distractor clutter, bounded
  overlap;
* **variants**: exact (per-head sampling everywhere — reference numerics,
  /root/reference/models/bricks/ms_deform_attn.py:215-377), hybrid
  (`shared_dec0`: head-shared encoder sampling + exact per-head decoder —
  the shipping flagship), and hybrid+int8 — the SAME hybrid checkpoints
  evaluated through the int8 quad-gather core (MSDA_GATHER_QUANT=int8,
  ops/deform_attn.ms_deform_attn_core_shared_q8).  int8 is an eval-only
  byte-reduction, so it needs no extra training runs: every periodic eval of
  a hybrid run is performed twice (bf16 gather and int8 gather) on the same
  params.

Pairing: one seed drives dataset generation, loader order, param init, and
all training noise streams, so per-seed variant deltas are free of data/init
noise (same protocol as r4, ROADMAP.md "Quality evidence").

The transformer keeps the FULL flagship geometry (embed 256, 8 heads, 6+6
layers, 900 queries, CDN denoising) because per-head-vs-shared sampling is a
property of the 8-head attention; the backbone defaults to resnet18 and the
batch to 2 to fit the 12h round budget (both configurable).

Usage (one run = one variant x one seed; drive with tools/quality_campaign_r5.sh):
    python tools/quality_campaign_r5.py --variant hybrid --seed 0 \
        --steps 10000 --eval-every 1000 --out docs/quality_campaign_r5.jsonl

Appends ONE JSON line per run:
    {"variant", "seed", "steps", "curve": [{"step", "ap", "ap50"}...],
     "int8_curve": [...only for hybrid...], "img_s": ...}
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

NUM_CLASSES = 7  # ids 1..6 used; 3 colors x 2 shapes
COLORS = {0: (225, 60, 50), 1: (60, 205, 70), 2: (65, 70, 220)}


def make_rich_dataset(root, n_images, seed, canvas):
    """Detectable-but-nontrivial scenes at the full canvas: multi-scale
    objects (16..640 px, log-uniform — covers every salience limit_range
    bucket), two shape families per color, gradient+noise background, and
    low-contrast distractor clutter that must NOT be detected."""
    import cv2

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    H, W = canvas
    images, annotations = [], []
    aid = 0
    for i in range(n_images):
        # background: smooth gradient + moderate noise
        gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
        base = (
            40
            + 30 * gx / W * rng.uniform(-1, 1)
            + 30 * gy / H * rng.uniform(-1, 1)
        )
        img = np.clip(
            base[..., None] + rng.normal(0, 18, (H, W, 3)), 0, 95
        ).astype(np.uint8)
        # low-contrast distractor clutter (gray blobs, not annotated)
        for _ in range(int(rng.integers(3, 9))):
            dw = int(rng.integers(20, min(160, W - 1)))
            dh = int(rng.integers(20, min(160, H - 1)))
            x = int(rng.integers(0, W - dw))
            y = int(rng.integers(0, H - dh))
            tone = int(rng.integers(70, 110))
            cv2.rectangle(img, (x, y), (x + int(dw), y + int(dh)),
                          (tone, tone, tone), -1)

        boxes = []
        # objects largest-first so smaller ones stay visible on top
        sizes = np.exp(rng.uniform(np.log(16), np.log(640),
                                   int(rng.integers(2, 13))))
        for s in np.sort(sizes)[::-1]:
            ar = rng.uniform(0.5, 2.0)
            bw = float(np.clip(s * np.sqrt(ar), 12, W - 2))
            bh = float(np.clip(s / np.sqrt(ar), 12, H - 2))
            ok = False
            for _ in range(8):  # rejection-sample low-overlap placement
                x = float(rng.uniform(0, W - bw))
                y = float(rng.uniform(0, H - bh))
                cand = np.array([x, y, x + bw, y + bh])
                if all(_iou(cand, b) < 0.3 for b in boxes):
                    ok = True
                    break
            if not ok:
                continue
            color_id = int(rng.integers(0, 3))
            shape_id = int(rng.integers(0, 2))
            cls = 1 + color_id * 2 + shape_id
            color = COLORS[color_id]
            jitter = tuple(int(np.clip(c + rng.integers(-25, 26), 0, 255))
                           for c in color)
            x0, y0, x1, y1 = int(x), int(y), int(x + bw), int(y + bh)
            if shape_id == 0:
                cv2.rectangle(img, (x0, y0), (x1, y1), jitter, -1)
            else:
                cv2.ellipse(
                    img, ((x0 + x1) // 2, (y0 + y1) // 2),
                    (max((x1 - x0) // 2, 1), max((y1 - y0) // 2, 1)),
                    0, 0, 360, jitter, -1,
                )
            boxes.append(cand)
            annotations.append({
                "id": aid, "image_id": i, "category_id": cls,
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            aid += 1
        cv2.imwrite(os.path.join(img_dir, f"{i}.jpg"), img[..., ::-1])
        images.append(
            {"id": i, "file_name": f"{i}.jpg", "height": H, "width": W})
    ann = {
        "images": images, "annotations": annotations,
        "categories": [{"id": c, "name": f"c{c}"} for c in range(1, NUM_CLASSES)],
    }
    ann_file = os.path.join(root, "ann.json")
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return img_dir, ann_file


def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", choices=["exact", "hybrid"], required=True)
    p.add_argument("--seed", type=int, required=True)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--eval-every", type=int, default=1000)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--canvas", type=int, nargs=2, default=(800, 1344))
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--n-train", type=int, default=192)
    p.add_argument("--n-val", type=int, default=48)
    p.add_argument("--workdir", default="/tmp/qc_r5")
    p.add_argument("--out", default="docs/quality_campaign_r5.jsonl")
    p.add_argument("--no-int8-overlay", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from salience_detr_tpu.data.coco import CocoDetection
    from salience_detr_tpu.data.loader import DetectionLoader
    from salience_detr_tpu.data.transforms import PRESETS
    from salience_detr_tpu.engine.optim import build_optimizer, make_lr_schedule
    from salience_detr_tpu.engine.train import evaluate
    from salience_detr_tpu.models.backbones.resnet import frozen_param_predicate
    from salience_detr_tpu.models.bricks.criterion import Targets, default_weight_dict
    from salience_detr_tpu.models.detectors.salience_detr import normalize_images
    from salience_detr_tpu.models.factory import SalienceDETRConfig, build_salience_detr
    from salience_detr_tpu.parallel.train_step import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )
    from salience_detr_tpu.utils.coco_eval import CocoEvaluator

    canvas = tuple(args.canvas)
    seed_root = os.path.join(args.workdir, f"seed{args.seed}")
    train_img, train_ann = make_rich_dataset(
        os.path.join(seed_root, "train"), args.n_train, args.seed, canvas)
    val_img, val_ann = make_rich_dataset(
        os.path.join(seed_root, "val"), args.n_val, args.seed + 9000, canvas)

    # FULL flagship transformer geometry (embed 256, 8 heads, 6+6 layers,
    # 900 queries, CDN) — only backbone depth and batch are economized
    cfg = SalienceDETRConfig(
        backbone=args.backbone,
        num_classes=NUM_CLASSES,
        dtype=jnp.bfloat16,
        shared_sampling_locations=args.variant == "hybrid",
        sampling_groups=0,
        decoder_sampling_groups=0 if args.variant == "hybrid" else -1,
        backbone_freeze_indices=(),
        min_size=canvas[0], max_size=canvas[1],
    )
    model, crit, sal, post = build_salience_detr(cfg)

    train_ds = CocoDetection(train_img, train_ann, transforms=PRESETS["hflip"], train=True)
    val_ds = CocoDetection(val_img, val_ann)
    M = 16
    train_loader = DetectionLoader(
        train_ds, args.batch, canvas_hw=canvas, max_gt=M, shuffle=True,
        seed=args.seed, num_workers=2,
    )
    val_loader = DetectionLoader(
        val_ds, args.batch, canvas_hw=canvas, max_gt=M, shuffle=False,
        drop_last=False, num_workers=2,
        eval_min_size=cfg.min_size, eval_max_size=cfg.max_size,
    )

    B, (H, W) = args.batch, canvas
    images0 = jnp.zeros((B, H, W, 3), jnp.float32)
    sizes0 = jnp.full((B, 2), 32, jnp.int32)
    targets0 = Targets(
        jnp.zeros((B, M), jnp.int32), jnp.full((B, M, 4), 0.5),
        jnp.zeros((B, M), bool),
    )
    schedule = make_lr_schedule(
        2e-4, steps_per_epoch=10**6, warmup_steps=200)
    params0 = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "denoising": jax.random.PRNGKey(1)},
            images0, sizes0, targets0, train=True,
        )
    )["params"]
    tx = build_optimizer(params0, schedule, max_norm=0.1,
                         frozen_predicate=frozen_param_predicate(()))
    state = create_train_state(model, tx, images0, sizes0, targets0, seed=args.seed)
    step = make_train_step(model, crit, sal, tx,
                           default_weight_dict(cfg.num_decoder_layers))

    # two separate jitted eval programs, one per gather-quant mode; each
    # traces on its FIRST call inside evaluate(), so run_eval pins the env
    # var (read by attention._gather_quant at trace time) around every call
    eval_steps = {"none": make_eval_step(model, post)}
    if args.variant == "hybrid" and not args.no_int8_overlay:
        eval_steps["int8"] = make_eval_step(model, post)

    def to_device(batch):
        out = dict(batch)
        out["images"] = normalize_images(
            jnp.asarray(batch["images"], jnp.float32) / 255.0)
        return out

    def run_eval(quant):
        prev = os.environ.get("MSDA_GATHER_QUANT")
        os.environ["MSDA_GATHER_QUANT"] = quant
        try:
            evaluator = CocoEvaluator(val_ds.coco)
            stats = evaluate(
                eval_steps[quant], state, map(to_device, iter(val_loader)),
                evaluator,
            )
        finally:
            if prev is None:
                os.environ.pop("MSDA_GATHER_QUANT", None)
            else:
                os.environ["MSDA_GATHER_QUANT"] = prev
        return round(float(stats["AP"]), 4), round(float(stats["AP50"]), 4)

    curve, int8_curve = [], []
    i, epoch = 0, 0
    key = jax.random.PRNGKey(7 + 1000 * args.seed)
    t_train = 0.0
    while i < args.steps:
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            t0 = time.perf_counter()
            state, metrics = step(state, to_device(batch), jax.random.fold_in(key, i))
            if i % 100 == 0:
                loss = float(metrics["loss"])  # host sync; also paces t_train
                print(f"[{args.variant} s{args.seed}] step {i:5d} "
                      f"loss {loss:.3f}", flush=True)
                assert np.isfinite(loss), f"non-finite loss at step {i}"
            t_train += time.perf_counter() - t0
            i += 1
            if i % args.eval_every == 0 or i >= args.steps:
                ap, ap50 = run_eval("none")
                curve.append({"step": i, "ap": ap, "ap50": ap50})
                msg = f"  eval@{i}: AP {ap:.3f} AP50 {ap50:.3f}"
                if "int8" in eval_steps:
                    ap8, ap508 = run_eval("int8")
                    int8_curve.append({"step": i, "ap": ap8, "ap50": ap508})
                    msg += f" | int8 AP {ap8:.3f} AP50 {ap508:.3f}"
                print(msg, flush=True)
            if i >= args.steps:
                break
        epoch += 1

    result = {
        "variant": args.variant,
        "seed": args.seed,
        "steps": args.steps,
        "canvas": list(canvas),
        "batch": args.batch,
        "backbone": args.backbone,
        "curve": curve,
        "img_s": round(args.batch * args.steps / max(t_train, 1e-9), 3),
    }
    if int8_curve:
        result["int8_curve"] = int8_curve
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
