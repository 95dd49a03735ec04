"""On-hardware rehearsal of the full CLI stack: train.py -> test.py as real
subprocesses on the default JAX platform (the TPU chip under axon; CPU when
forced), on a detectable synthetic COCO dataset (colored rectangles — the
same generator as tools/validate_static_shapes.py).

Why this exists: the test suite runs the CLIs on the virtual CPU platform and
tools/validate_static_shapes.py drives the library directly — neither proves
that the *shipped entry points* (config loader -> loader workers -> device
prefetch -> compiled train step -> orbax checkpoint -> eval CLI -> native
COCOeval) run end-to-end on the actual accelerator.  This is the rehearsal
the reference performs implicitly every time someone trains on GPU
(/root/reference/main.py:24-201, test.py:61-141).

Usage:
    python tools/cli_rehearsal.py [--epochs 40] [--workdir /tmp/cli_rehearsal]

Prints ONE JSON line:
    {"train_ap50": ..., "test_cli_ap50": ..., "epochs": N, "platform": ...,
     "passed": bool}
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.validate_static_shapes import CANVAS, make_dataset  # noqa: E402


MODEL_CFG = """\
import jax.numpy as jnp
from salience_detr_tpu.models.factory import SalienceDETRConfig
model_config = SalienceDETRConfig(
    backbone='resnet18', embed_dim=64, num_classes=4,
    num_queries=30, num_encoder_layers=2, num_decoder_layers=2,
    num_heads=4, dim_feedforward=96, topk_sa=16,
    layer_filter_ratio=(1.0, 0.5), denoising_nums=8,
    max_num_embedding=32,
    # flagship hybrid sampling: head-shared encoder, exact per-head decoder
    shared_sampling_locations=True, decoder_sampling_groups=0,
    backbone_freeze_indices=(), min_size={min_size}, max_size={max_size},
    select_box_nums_for_evaluation=20,
)
"""

TRAIN_CFG = """\
num_epochs = {epochs}
batch_size = 4
num_workers = 2
print_freq = 16
max_norm = 0.5
output_dir = r'{out_dir}'
train_transform = 'hflip'
train_img_folder = r'{train_img}'
train_ann_file = r'{train_ann}'
test_img_folder = r'{val_img}'
test_ann_file = r'{val_ann}'
model_path = r'{model_cfg}'
resume_from_checkpoint = None
learning_rate = 3e-4
lr_milestones = [1000]
warmup_steps = 50
train_canvas = {canvas}
max_gt = 8
"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40,
                   help="64 imgs / batch 4 = 16 steps per epoch")
    p.add_argument("--workdir", default="/tmp/cli_rehearsal")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--min-ap50", type=float, default=0.30)
    p.add_argument("--timeout", type=int, default=3000, help="per-CLI seconds")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    train_img, train_ann = make_dataset(
        os.path.join(args.workdir, "train"), n_images=64, seed=args.seed)
    val_img, val_ann = make_dataset(
        os.path.join(args.workdir, "val"), n_images=16, seed=args.seed + 500)

    model_cfg = os.path.join(args.workdir, "model.py")
    with open(model_cfg, "w") as f:
        f.write(MODEL_CFG.format(min_size=CANVAS[0], max_size=CANVAS[1]))
    out_dir = os.path.join(args.workdir, "out")
    train_cfg = os.path.join(args.workdir, "train.py")
    with open(train_cfg, "w") as f:
        f.write(TRAIN_CFG.format(
            epochs=args.epochs, out_dir=out_dir, train_img=train_img,
            train_ann=train_ann, val_img=val_img, val_ann=val_ann,
            model_cfg=model_cfg, canvas=tuple(CANVAS)))

    env = dict(os.environ)
    # prepend (not replace): the ambient PYTHONPATH can carry the TPU-tunnel
    # sitecustomize that registers the 'axon' PJRT plugin — dropping it while
    # JAX_PLATFORMS=axon persists leaves the child with no usable backend
    ambient = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + ambient if ambient else "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config-file", train_cfg, "--seed", str(args.seed),
         "--mixed-precision", "bf16"],
        capture_output=True, text=True, timeout=args.timeout, env=env, cwd=REPO)
    log = r.stdout + r.stderr
    if r.returncode != 0:
        print(log[-4000:], file=sys.stderr)
        raise SystemExit(f"train.py failed rc={r.returncode}")
    # last per-epoch val AP50 from the training log's evaluator table
    ap50s = re.findall(r"AP50=([01]\.\d+)", log)
    train_ap50 = float(ap50s[-1]) if ap50s else float("nan")

    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "test.py"),
         "--model-config", model_cfg,
         "--coco-img", val_img, "--coco-ann", val_ann,
         "--checkpoint", os.path.join(out_dir, "checkpoints"),
         "--canvas", str(CANVAS[0]), str(CANVAS[1]),
         "--batch-size", "4", "--max-gt", "8"],
        capture_output=True, text=True, timeout=args.timeout, env=env, cwd=REPO)
    log2 = r2.stdout + r2.stderr
    if r2.returncode != 0:
        print(log2[-4000:], file=sys.stderr)
        raise SystemExit(f"test.py failed rc={r2.returncode}")
    ap50s2 = re.findall(r"AP50=([01]\.\d+)", log2)
    test_ap50 = float(ap50s2[-1]) if ap50s2 else float("nan")

    # third CLI: folder inference with viz + predictions JSON
    pred_json = os.path.join(args.workdir, "inference_preds.json")
    r3 = subprocess.run(
        [sys.executable, os.path.join(REPO, "inference.py"),
         "--image-dir", val_img, "--model-config", model_cfg,
         "--checkpoint", os.path.join(out_dir, "checkpoints"),
         "--show-dir", os.path.join(args.workdir, "vis"),
         "--save-results", pred_json,
         "--canvas", str(CANVAS[0]), str(CANVAS[1])],
        capture_output=True, text=True, timeout=args.timeout, env=env, cwd=REPO)
    if r3.returncode != 0:
        print((r3.stdout + r3.stderr)[-4000:], file=sys.stderr)
        raise SystemExit(f"inference.py failed rc={r3.returncode}")
    with open(pred_json) as f:
        n_preds = sum(len(e["boxes"]) for e in json.load(f))  # total detections
    n_vis = len(os.listdir(os.path.join(args.workdir, "vis")))

    import jax

    result = {
        "train_ap50": train_ap50,
        "test_cli_ap50": test_ap50,
        "inference_preds": n_preds,
        "inference_vis": n_vis,
        "epochs": args.epochs,
        "platform": jax.devices()[0].platform,
        "passed": test_ap50 >= args.min_ap50 and n_preds > 0 and n_vis == 16,
    }
    print(json.dumps(result))
    if not result["passed"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
