"""Preemption handling e2e: SIGTERM during training must produce a clean
exit with a resumable checkpoint (GracefulShutdown wiring in train.py; the
reference has no preemption story — recovery there is manual re-launch,
SURVEY.md §5.3)."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast lane


def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    aid = 0
    for i in range(8):
        h, w = 96, 128
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        images.append({"id": i, "file_name": f"{i}.jpg", "height": h, "width": w})
        x, y = rng.uniform(5, 60, 2)
        bw, bh = rng.uniform(10, 30, 2)
        annotations.append({
            "id": aid, "image_id": i, "category_id": 1,
            "bbox": [float(x), float(y), float(bw), float(bh)],
            "area": float(bw * bh), "iscrowd": 0,
        })
        aid += 1
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "c1"}],
    }))

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
        f"num_epochs = 50\n"  # far more than will run before the signal
        f"batch_size = 2\n"
        f"num_workers = 2\n"
        f"print_freq = 1\n"
        f"max_norm = 0.1\n"
        f"output_dir = r'{tmp_path / 'out'}'\n"
        f"train_transform = 'hflip'\n"
        f"train_img_folder = r'{img_dir}'\n"
        f"train_ann_file = r'{ann_file}'\n"
        f"test_img_folder = r'{img_dir}'\n"
        f"test_ann_file = r'{ann_file}'\n"
        f"model_path = r'{model_cfg}'\n"
        f"resume_from_checkpoint = None\n"
        f"learning_rate = 1e-4\n"
        f"train_canvas = (96, 128)\n"
        f"max_gt = 8\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "train.py"),
         "--config-file", str(train_cfg), "--seed", "0",
         "--mixed-precision", "no"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=repo,
    )
    log_file = tmp_path / "out" / "log.rank0.txt"
    try:
        # wait until the training loop is live (the epoch header logs from
        # inside train_one_epoch, after the signal handlers are installed)
        deadline = time.time() + 1500
        while time.time() < deadline:
            if log_file.exists() and "Epoch: [0]" in log_file.read_text():
                break
            if proc.poll() is not None:
                out, err = proc.communicate()
                pytest.fail(f"train.py died before training: {err[-4000:]}")
            time.sleep(2)
        else:
            pytest.fail("training loop never started")

        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=900)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()

    assert proc.returncode == 0, err[-4000:]
    log_text = log_file.read_text()
    assert "preemption checkpoint saved" in log_text, log_text[-3000:]
    ckpt_root = tmp_path / "out" / "checkpoints"
    assert (ckpt_root / "0").exists(), list(ckpt_root.iterdir())
    # the checkpoint must be resumable: metadata sidecar written
    meta = json.loads((ckpt_root / "metadata.json").read_text())
    assert meta["seed"] == 0
