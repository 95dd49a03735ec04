"""Generate the repo's interactive notebooks (the reference ships
inference.ipynb + grad_cam/{grad_cam,feat_show}.ipynb as user-facing
walkthroughs; ours are JAX-native equivalents of the same workflows,
backed by the library code the CLIs use).

Run: python tools/make_notebooks.py  (re-emits all three .ipynb files)
"""

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def nb(cells):
    return {
        "cells": [
            {
                "cell_type": kind,
                "metadata": {},
                "source": src.splitlines(keepends=True),
                **({"outputs": [], "execution_count": None} if kind == "code" else {}),
            }
            for kind, src in cells
        ],
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python", "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


PREAMBLE = """\
import os
import sys

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from matplotlib import pyplot as plt

# run from the repo root (mirrors the reference notebooks' os.chdir dance)
if not os.path.exists("salience_detr_tpu"):
    os.chdir(os.path.dirname(os.path.abspath(".")))
sys.path.insert(0, os.path.abspath("."))
"""

LOAD_MODEL = """\
from salience_detr_tpu.models.factory import build_salience_detr
from salience_detr_tpu.parallel.train_step import TrainState
from salience_detr_tpu.utils.checkpoint import CheckpointManager
from salience_detr_tpu.utils.config import Config

model_cfg = Config("configs/salience_detr/salience_detr_resnet50_800_1333.py").model_config
model, _, _, postprocess = build_salience_detr(model_cfg)

H, W = 800, 1344  # eval canvas: the reference's 800x1333 padded to /32
variables = jax.jit(
    lambda: model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, H, W, 3)), jnp.full((1, 2), 32, jnp.int32), train=False,
    )
)()
params, frozen, batch_stats = (
    variables["params"], variables.get("frozen", {}), variables.get("batch_stats", {}),
)

# Restore trained weights.  CHECKPOINT_DIR is an orbax directory written by
# train.py; to evaluate a released reference .pth instead, convert it once:
#   python test.py --torch-checkpoint salience_detr_resnet50.pth ...
# (test.py converts + evaluates in checkpoint-exact mode; see also
#  salience_detr_tpu/utils/weight_converter.py)
CHECKPOINT_DIR = "checkpoints/salience_detr_resnet50"  # <- point at your run
class_names = None
if os.path.isdir(CHECKPOINT_DIR):
    mgr = CheckpointManager(CHECKPOINT_DIR)
    restored = mgr.restore_weights()
    if restored is not None:
        params, frozen, batch_stats = (
            restored["params"], restored["frozen"], restored["batch_stats"])
        print(f"restored step {restored['step']}")
    meta = mgr.read_metadata()
    if meta:
        class_names = meta.get("class_names")  # class vocab rides the ckpt
else:
    print("no checkpoint found - continuing with random init (boxes will be noise)")
"""

PREP_IMAGE = """\
from salience_detr_tpu.data.transforms import shortest_size
from salience_detr_tpu.models.detectors.salience_detr import normalize_images

IMAGE_PATH = "tests/assets/demo.jpg"  # <- any image
if not os.path.exists(IMAGE_PATH):
    # fall back to a synthetic scene so the notebook runs out of the box
    os.makedirs(os.path.dirname(IMAGE_PATH), exist_ok=True)
    demo = np.full((480, 640, 3), 80, np.uint8)
    cv2.rectangle(demo, (100, 120), (260, 330), (220, 60, 50), -1)
    cv2.circle(demo, (450, 200), 70, (60, 200, 70), -1)
    cv2.imwrite(IMAGE_PATH, demo[:, :, ::-1])

image = cv2.cvtColor(cv2.imread(IMAGE_PATH), cv2.COLOR_BGR2RGB)
orig_h, orig_w = image.shape[:2]

# eval-time geometry: shortest-size resize (reference EvalResize semantics,
# base_detector.py:44-49) then zero-pad onto the static canvas
sample = shortest_size(
    {"image": image, "boxes": np.zeros((0, 4), np.float32),
     "labels": np.zeros((0,), np.int64)},
    model_cfg.min_size, model_cfg.max_size,
)
resized = sample["image"]
rh, rw = resized.shape[:2]
canvas = np.zeros((1, H, W, 3), np.float32)
canvas[0, :rh, :rw] = resized / 255.0
images = normalize_images(jnp.asarray(canvas))
image_sizes = jnp.asarray([[rh, rw]], jnp.int32)
plt.imshow(image); plt.axis("off");
"""

INFER = """\
@jax.jit
def forward(images, image_sizes, orig_sizes):
    out = model.apply(
        {"params": params, "frozen": frozen,
         **({"batch_stats": batch_stats} if batch_stats else {})},
        images, image_sizes, train=False,
    )
    # top-300 postprocess in original-image coordinates
    return postprocess(out["pred_class"][-1], out["pred_coord"][-1], orig_sizes)

dets = jax.device_get(forward(images, image_sizes, jnp.asarray([[orig_h, orig_w]], jnp.int32)))
keep = dets["valid"][0].astype(bool) & (dets["scores"][0] > 0.5)
boxes, scores, labels = dets["boxes"][0][keep], dets["scores"][0][keep], dets["labels"][0][keep]
print(f"{keep.sum()} detections above 0.5")
"""

VIZ = """\
from salience_detr_tpu.utils.visualize import plot_bounding_boxes_on_image

shown = plot_bounding_boxes_on_image(
    image, boxes, labels, scores, class_names=class_names, score_threshold=0.5,
)
plt.figure(figsize=(10, 7)); plt.imshow(shown); plt.axis("off");
"""

inference_nb = nb([
    ("markdown",
     "# Salience-DETR (TPU) — single-image inference\n\n"
     "JAX-native walkthrough of the reference's `inference.ipynb`: build a "
     "model from a config file, restore trained weights, run one image, and "
     "visualize the detections.  For folder-scale inference use the "
     "`inference.py` CLI, which adds batching, device prefetch and JSON "
     "export.\n\n## 1. Import necessary packages"),
    ("code", PREAMBLE),
    ("markdown",
     "## 2. Load a model and class information\n\nClass names ride the "
     "checkpoint as metadata (the reference encodes `CLASSES` into its "
     ".pth the same way)."),
    ("code", LOAD_MODEL),
    ("markdown", "## 3. Prepare the image\n\nEval geometry is the reference's "
     "shortest-size resize onto a static 800x1344 canvas."),
    ("code", PREP_IMAGE),
    ("markdown", "## 4. Inference on the image"),
    ("code", INFER),
    ("markdown", "## 5. Visualize results"),
    ("code", VIZ),
])

GRADCAM_BODY = """\
from tools.grad_cam import make_cam_fn

feature_level = 1   # neck level the CAM differentiates against (0..3)
top_k = 5           # detections whose class scores drive the CAM

cam_fn = make_cam_fn(model, {"params": params, "frozen": frozen,
                             **({"batch_stats": batch_stats} if batch_stats else {})},
                     level=feature_level, top_k=top_k)
cam, dets = jax.device_get(cam_fn(images, image_sizes))
cam = np.asarray(cam[0], np.float32)
"""

GRADCAM_VIZ = """\
# upsample the CAM to the resized image, colorize, and alpha-blend
cam_hw = cv2.resize(cam, (rw, rh))
cam_hw = (cam_hw - cam_hw.min()) / max(cam_hw.max() - cam_hw.min(), 1e-6)
heat = cv2.applyColorMap((cam_hw * 255).astype(np.uint8), cv2.COLORMAP_JET)[:, :, ::-1]
overlay = (0.5 * heat + 0.5 * resized).astype(np.uint8)

plt.figure(figsize=(10, 7)); plt.imshow(overlay); plt.axis("off")
plt.title(f"Grad-CAM, neck level {feature_level}");
"""

grad_cam_nb = nb([
    ("markdown",
     "# Grad-CAM for detections\n\nJAX equivalent of the reference's "
     "`grad_cam/grad_cam.ipynb`: class-activation maps of the top "
     "detections' class scores w.r.t. a chosen neck feature level.  Instead "
     "of a backward hook on the layer, the gradient is taken against an "
     "additive zero probe on that activation (`tools/grad_cam.py`), which "
     "is the functional-JAX idiom for the same quantity.\n\n"
     "### Preliminary: model, image, inference (as in inference.ipynb)"),
    ("code", PREAMBLE),
    ("code", LOAD_MODEL),
    ("code", PREP_IMAGE),
    ("markdown", "### Grad-CAM\n\nChannel weights = spatially pooled "
     "gradients of the summed top-k class scores; CAM = ReLU(sum_c w_c A_c)."),
    ("code", GRADCAM_BODY),
    ("code", GRADCAM_VIZ),
])

FEAT_BODY = """\
# capture the multi-level backbone/neck feature maps.  The reference uses a
# forward hook on model.backbone; functionally we just call the submodules
# through the bound module - same tensors, no hook machinery.
bound = model.bind({"params": params, "frozen": frozen,
                    **({"batch_stats": batch_stats} if batch_stats else {})})

@jax.jit
def feature_maps(images):
    feats = bound.backbone(images.astype(model.dtype), train=False)
    necked = bound.neck(feats)
    return [f.astype(jnp.float32) for f in feats], [f.astype(jnp.float32) for f in necked]

backbone_feats, neck_feats = jax.device_get(feature_maps(images))
print("backbone:", [f.shape for f in backbone_feats])
print("neck:    ", [f.shape for f in neck_feats])
"""

FEAT_VIZ = """\
# channel-mean per level (the reference plots value[0].mean(0))
plt.figure(figsize=(16, 4))
for i, f in enumerate(neck_feats):
    plt.subplot(1, len(neck_feats), i + 1)
    plt.imshow(np.abs(f[0]).mean(-1), cmap="jet")
    plt.title(f"neck level {i}  {f.shape[1]}x{f.shape[2]}")
    plt.axis("off")
"""

FEAT_SALIENCE = """\
# Salience-DETR's own learned foreground confidence: tools/feature_viz.py
# renders the hierarchical salience maps the encoder filters tokens by -
# run it for per-image heatmap files:
#   python tools/feature_viz.py --image-dir <dir> --checkpoint <ckpt>
"""

feat_show_nb = nb([
    ("markdown",
     "# Feature-map visualization\n\nJAX equivalent of the reference's "
     "`grad_cam/feat_show.ipynb`: render the multi-scale feature maps the "
     "detector computes for an image.\n\n### Preliminary"),
    ("code", PREAMBLE),
    ("code", LOAD_MODEL),
    ("code", PREP_IMAGE),
    ("markdown", "### Extract feature maps"),
    ("code", FEAT_BODY),
    ("markdown", "### Plot per-level channel means"),
    ("code", FEAT_VIZ),
    ("markdown", "### See also: salience maps"),
    ("code", FEAT_SALIENCE),
])


def main():
    out = {
        os.path.join(ROOT, "inference.ipynb"): inference_nb,
        os.path.join(ROOT, "grad_cam", "grad_cam.ipynb"): grad_cam_nb,
        os.path.join(ROOT, "grad_cam", "feat_show.ipynb"): feat_show_nb,
    }
    for path, notebook in out.items():
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(notebook, f, indent=1)
        print("wrote", os.path.relpath(path, ROOT))


if __name__ == "__main__":
    main()
