"""Custom-dataset fine-tune rehearsal (the reference's defect-detection
workflow, README.md:27 + optimizer/param_dict.py:79-146) driven end-to-end
through the shipped CLIs on the default JAX platform (TPU under axon):

1. **Pretrain** a small exact-sampling model on a 6-class synthetic "base"
   dataset via ``train.py`` (simulates the COCO-pretrained model zoo ckpt).
2. **Export** the pretrained orbax checkpoint to a reference-layout torch
   .pth via ``tools/export_torch_checkpoint.py`` (the inverse converter).
3. **Fine-tune** on a small custom dataset with NON-COCO category ids
   (11/57/89 — sparse, like real defect datasets) and 3 unseen colors, via
   ``train.py`` with ``finetune_weights=<exported .pth>`` — i.e. the
   fine-tune consumes CONVERTED pretrained weights through the tolerant
   merge (class-count heads differ and are skipped), with the backbone
   freeze rules and the finetune param-group LR rules active.
4. **Scratch baseline**: the identical fine-tune run without pretrained
   weights.
5. **JSON-less eval**: the fine-tuned best checkpoint is re-scored with a
   GT index synthesized by ``convert_to_coco_api`` from the raw dataset
   (no COCO JSON), proving the custom-dataset eval path on hardware.

Prints ONE JSON line {"finetune_ap50", "scratch_ap50", "uplift",
"jsonless_ap50", "platform", "passed"} and appends it to --out.
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.quality_campaign_r5 import make_rich_dataset  # noqa: E402

CANVAS = (256, 320)

MODEL_CFG = """\
import jax.numpy as jnp
from salience_detr_tpu.models.factory import SalienceDETRConfig
model_config = SalienceDETRConfig(
    backbone='resnet18', embed_dim=64, num_classes={num_classes},
    num_queries=30, num_encoder_layers=2, num_decoder_layers=2,
    num_heads=4, dim_feedforward=96, topk_sa=16,
    layer_filter_ratio=(1.0, 0.5), denoising_nums=8,
    max_num_embedding=48,  # >= level-0 grid max(32, 40) at the 256x320 canvas
    # exact per-head sampling: required for reference-layout .pth export
    shared_sampling_locations=False,
    backbone_freeze_indices={freeze},
    min_size={min_size}, max_size={max_size},
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
finetune_weights = {finetune_weights}
learning_rate = 3e-4
lr_milestones = [1000]
warmup_steps = 50
train_canvas = {canvas}
max_gt = 14
param_dicts = 'finetune_backbone_and_linear_projection'
"""

DEFECT_IDS = (11, 57, 89)  # sparse non-COCO-contiguous category ids
DEFECT_COLORS = {11: (235, 215, 50), 57: (50, 220, 220), 89: (225, 60, 215)}


def make_defect_dataset(root, n_images, seed):
    """3 unseen-color classes with non-COCO ids on the same clutter/noise
    background family as the base generator."""
    import cv2
    import numpy as np

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    H, W = CANVAS
    images, annotations = [], []
    aid = 0
    for i in range(n_images):
        img = np.clip(
            rng.normal(55, 18, (H, W, 3)), 0, 95).astype(np.uint8)
        for _ in range(int(rng.integers(2, 7))):
            dw, dh = rng.integers(12, 60, 2)
            x = int(rng.integers(0, W - dw))
            y = int(rng.integers(0, H - dh))
            tone = int(rng.integers(70, 110))
            cv2.rectangle(img, (x, y), (x + int(dw), y + int(dh)),
                          (tone, tone, tone), -1)
        for _ in range(int(rng.integers(1, 5))):
            cid = int(rng.choice(DEFECT_IDS))
            bw, bh = (int(v) for v in rng.integers(24, 90, 2))
            x = int(rng.integers(0, W - bw))
            y = int(rng.integers(0, H - bh))
            color = DEFECT_COLORS[cid]
            jitter = tuple(int(np.clip(c + rng.integers(-20, 21), 0, 255))
                           for c in color)
            if rng.random() < 0.5:
                cv2.rectangle(img, (x, y), (x + bw, y + bh), jitter, -1)
            else:
                cv2.ellipse(img, (x + bw // 2, y + bh // 2),
                            (bw // 2, bh // 2), 0, 0, 360, jitter, -1)
            annotations.append({
                "id": aid, "image_id": i, "category_id": cid,
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
            })
            aid += 1
        cv2.imwrite(os.path.join(img_dir, f"{i}.jpg"), img)
        images.append({"id": i, "file_name": f"{i}.jpg", "height": H, "width": W})
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": c, "name": f"defect_{c}"} for c in DEFECT_IDS]}
    ann_file = os.path.join(root, "ann.json")
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return img_dir, ann_file


def _cli_env():
    """REHEARSAL_CPU=1 pins the CLI subprocesses to the single local CPU
    device (the tests' isolation recipe); default = ambient platform (TPU)."""
    env = dict(os.environ)
    if os.environ.get("REHEARSAL_CPU") == "1":
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = ""
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    return env


def run_train(workdir, name, model_cfg_src, train_cfg_kw, timeout):
    out_dir = os.path.join(workdir, name)
    os.makedirs(out_dir, exist_ok=True)
    model_cfg = os.path.join(out_dir, "model.py")
    with open(model_cfg, "w") as f:
        f.write(model_cfg_src)
    train_cfg = os.path.join(out_dir, "train.py.cfg.py")
    with open(train_cfg, "w") as f:
        f.write(TRAIN_CFG.format(out_dir=out_dir, model_cfg=model_cfg,
                                 canvas=tuple(CANVAS), **train_cfg_kw))
    proc = subprocess.run(
        [sys.executable, "train.py", "--config-file", train_cfg, "--seed", "0"],
        cwd=REPO, capture_output=True, text=True, timeout=timeout,
        env=_cli_env(),
    )
    sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
    if proc.returncode != 0:
        raise RuntimeError(f"{name} train.py failed rc={proc.returncode}")
    # last per-epoch AP50 from the eval tables train.py logs (same parse as
    # tools/cli_rehearsal.py)
    ap50s = re.findall(r"AP50=([01]\.\d+)", proc.stdout + proc.stderr)
    return out_dir, (float(ap50s[-1]) if ap50s else float("nan"))


def jsonless_eval(out_dir, model_cfg_path, img_dir, ann_file):
    """Re-score the saved checkpoint against a convert_to_coco_api index
    (built from raw dataset samples, NOT the JSON)."""
    import jax
    import jax.numpy as jnp

    from salience_detr_tpu.data.coco import CocoDetection
    from salience_detr_tpu.data.loader import DetectionLoader
    from salience_detr_tpu.engine.train import evaluate
    from salience_detr_tpu.models.detectors.salience_detr import normalize_images
    from salience_detr_tpu.models.factory import build_salience_detr
    from salience_detr_tpu.parallel.train_step import TrainState, make_eval_step
    from salience_detr_tpu.utils.checkpoint import CheckpointManager
    from salience_detr_tpu.utils.coco_eval import CocoEvaluator
    from salience_detr_tpu.utils.coco_utils import convert_to_coco_api
    from salience_detr_tpu.utils.config import Config

    cfg = Config(model_cfg_path).model_config
    model, _, _, post = build_salience_detr(cfg)
    ds = CocoDetection(img_dir, ann_file)
    # strip the JSON-backed index: the eval GT comes from raw samples only
    index = convert_to_coco_api(ds)
    loader = DetectionLoader(
        ds, 4, canvas_hw=CANVAS, max_gt=14, shuffle=False, drop_last=False,
        num_workers=2, eval_min_size=cfg.min_size, eval_max_size=cfg.max_size,
    )
    restored = CheckpointManager(os.path.join(out_dir, "checkpoints")).restore_weights()
    assert restored is not None
    state = TrainState(
        step=jnp.asarray(restored["step"], jnp.int32),
        params=restored["params"], frozen=restored["frozen"],
        batch_stats=restored["batch_stats"], opt_state=None,
    )

    eval_step = make_eval_step(model, post)

    def to_device(batch):
        out = dict(batch)
        out["images"] = normalize_images(
            jnp.asarray(batch["images"], jnp.float32) / 255.0)
        return out

    stats = evaluate(eval_step, state, map(to_device, iter(loader)),
                     CocoEvaluator(index))
    return float(stats["AP50"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/finetune_rehearsal")
    p.add_argument("--pretrain-epochs", type=int, default=40)
    p.add_argument("--finetune-epochs", type=int, default=12)
    p.add_argument("--timeout", type=int, default=3600)
    p.add_argument("--out", default="docs/finetune_rehearsal_r5.json")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)

    # base (pretrain) data: the rich 6-class generator at the small canvas
    base_tr_img, base_tr_ann = make_rich_dataset(
        os.path.join(args.workdir, "base_train"), 64, seed=0, canvas=CANVAS)
    base_va_img, base_va_ann = make_rich_dataset(
        os.path.join(args.workdir, "base_val"), 16, seed=500, canvas=CANVAS)
    # defect (fine-tune) data: non-COCO ids, unseen colors, less data
    dft_tr_img, dft_tr_ann = make_defect_dataset(
        os.path.join(args.workdir, "defect_train"), 32, seed=7)
    dft_va_img, dft_va_ann = make_defect_dataset(
        os.path.join(args.workdir, "defect_val"), 16, seed=777)

    base_model_src = MODEL_CFG.format(
        num_classes=7, freeze=(), min_size=CANVAS[0], max_size=CANVAS[1])
    pre_dir, pre_ap50 = run_train(
        args.workdir, "pretrain", base_model_src,
        dict(epochs=args.pretrain_epochs, train_img=base_tr_img,
             train_ann=base_tr_ann, val_img=base_va_img, val_ann=base_va_ann,
             finetune_weights="None"),
        args.timeout,
    )
    print(f"pretrain AP50 {pre_ap50:.3f}", file=sys.stderr)

    # export pretrained weights to reference torch layout
    pth = os.path.join(args.workdir, "pretrained_base.pth")
    proc = subprocess.run(
        [sys.executable, "tools/export_torch_checkpoint.py",
         "--model-config", os.path.join(pre_dir, "model.py"),
         "--checkpoint", os.path.join(pre_dir, "checkpoints"),
         "--out", pth],
        cwd=REPO, capture_output=True, text=True, timeout=600, env=_cli_env(),
    )
    sys.stderr.write(proc.stdout[-800:] + proc.stderr[-800:])
    assert proc.returncode == 0, "export_torch_checkpoint failed"

    # fine-tune model: num_classes must cover the sparse defect ids; the
    # stem+stage-0 freeze and the finetune param-group rules are active
    ft_model_src = MODEL_CFG.format(
        num_classes=max(DEFECT_IDS) + 1, freeze=(0,),
        min_size=CANVAS[0], max_size=CANVAS[1])
    ft_kw = dict(epochs=args.finetune_epochs, train_img=dft_tr_img,
                 train_ann=dft_tr_ann, val_img=dft_va_img, val_ann=dft_va_ann)
    ft_dir, ft_ap50 = run_train(
        args.workdir, "finetune", ft_model_src,
        dict(finetune_weights=f"r'{pth}'", **ft_kw), args.timeout)
    sc_dir, sc_ap50 = run_train(
        args.workdir, "scratch", ft_model_src,
        dict(finetune_weights="None", **ft_kw), args.timeout)

    jl_ap50 = jsonless_eval(
        ft_dir, os.path.join(ft_dir, "model.py"), dft_va_img, dft_va_ann)

    import jax

    result = {
        "pretrain_ap50": round(pre_ap50, 4),
        "finetune_ap50": round(ft_ap50, 4),
        "scratch_ap50": round(sc_ap50, 4),
        "uplift": round(ft_ap50 - sc_ap50, 4),
        "jsonless_ap50": round(jl_ap50, 4),
        "platform": jax.devices()[0].platform,
        "passed": bool(ft_ap50 > sc_ap50),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
