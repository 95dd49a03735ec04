"""End-to-end inference CLI: train.py produces an orbax TRAINING checkpoint
(opt_state + train-only denoising_generator params included), then
inference.py must restore it weights-only and produce visualizations +
a predictions JSON (the reference's inference.py:31-113 flow).

Regression: inference.py once restored with the eval-mode template
(opt_state=None, no denoising branch), which orbax rejects as a structure
mismatch — caught by the on-TPU CLI rehearsal (tools/cli_rehearsal.py)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast lane


@pytest.fixture
def synthetic_coco(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "train"
    img_dir.mkdir()
    images, annotations = [], []
    aid = 0
    for i in range(4):
        h, w = 96, 128
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        images.append({"id": i, "file_name": f"{i}.jpg", "height": h, "width": w})
        for _ in range(2):
            x, y = rng.uniform(5, 60, 2)
            bw, bh = rng.uniform(10, 30, 2)
            annotations.append({
                "id": aid, "image_id": i, "category_id": int(rng.integers(1, 4)),
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
            })
            aid += 1
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": c, "name": f"c{c}"} for c in (1, 2, 3)]}
    (tmp_path / "train.json").write_text(json.dumps(ann))
    return tmp_path


def test_inference_cli_restores_training_checkpoint(synthetic_coco, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model_cfg = tmp_path / "tiny_model.py"
    model_cfg.write_text(
        "import jax.numpy as jnp\n"
        "from salience_detr_tpu.models.factory import SalienceDETRConfig\n"
        "model_config = SalienceDETRConfig(\n"
        "    backbone='resnet18', embed_dim=32, num_classes=5, num_queries=24,\n"
        "    num_encoder_layers=2, num_decoder_layers=2, num_heads=4,\n"
        "    dim_feedforward=64, topk_sa=12, layer_filter_ratio=(1.0, 0.5),\n"
        "    denoising_nums=4, dn_max_gt=2, max_num_embedding=16,\n"
        "    shared_sampling_locations=True, min_size=96, max_size=128,\n"
        "    select_box_nums_for_evaluation=20,\n"
        ")\n"
    )
    train_cfg = tmp_path / "tiny_train.py"
    train_cfg.write_text(
        f"num_epochs = 1\n"
        f"batch_size = 2\n"
        f"num_workers = 2\n"
        f"print_freq = 1\n"
        f"max_norm = 0.1\n"
        f"output_dir = r'{tmp_path / 'out'}'\n"
        f"train_transform = 'hflip'\n"
        f"train_img_folder = r'{synthetic_coco / 'train'}'\n"
        f"train_ann_file = r'{synthetic_coco / 'train.json'}'\n"
        f"test_img_folder = r'{synthetic_coco / 'train'}'\n"
        f"test_ann_file = r'{synthetic_coco / 'train.json'}'\n"
        f"model_path = r'{model_cfg}'\n"
        f"resume_from_checkpoint = None\n"
        f"learning_rate = 1e-4\n"
        f"train_canvas = (96, 128)\n"
        f"max_gt = 8\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # single CPU device; the tiny batch can't shard over 8
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    r1 = subprocess.run(
        [sys.executable, os.path.join(repo, "train.py"),
         "--config-file", str(train_cfg), "--seed", "0",
         "--mixed-precision", "no", "--dry-run-steps", "2"],
        capture_output=True, text=True, timeout=3000, env=env, cwd=repo,
    )
    assert r1.returncode == 0, r1.stderr[-4000:]
    ckpt_dir = tmp_path / "out" / "checkpoints"
    assert ckpt_dir.exists()

    preds = tmp_path / "preds.json"
    vis = tmp_path / "vis"
    r2 = subprocess.run(
        [sys.executable, os.path.join(repo, "inference.py"),
         "--image-dir", str(synthetic_coco / "train"),
         "--model-config", str(model_cfg),
         "--checkpoint", str(ckpt_dir),
         "--show-dir", str(vis), "--save-results", str(preds),
         "--canvas", "96", "128", "--score-threshold", "0.0"],
        capture_output=True, text=True, timeout=3000, env=env, cwd=repo,
    )
    assert r2.returncode == 0, (r2.stdout + r2.stderr)[-4000:]
    results = json.loads(preds.read_text())
    assert len(results) == 4  # one record per image
    assert len(os.listdir(vis)) == 4
    # restored (not re-initialized) weights: the CLI logs the restore
    assert "Restored checkpoint" in (r2.stdout + r2.stderr), r2.stdout[-2000:]
