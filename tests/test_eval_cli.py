"""E2E eval CLI: random-weight model over synthetic COCO -> metrics +
prediction dump -> re-score path."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast lane


@pytest.fixture
def synthetic_val(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "val"
    img_dir.mkdir()
    images, annotations = [], []
    aid = 0
    for i in range(4):
        h, w = 96, 128
        cv2.imwrite(str(img_dir / f"{i}.jpg"), rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
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
    (tmp_path / "val.json").write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": c, "name": f"c{c}"} for c in (1, 2, 3)],
    }))
    return tmp_path


def test_eval_cli_and_rescore(synthetic_val, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model_cfg = tmp_path / "tiny_model.py"
    model_cfg.write_text(
        "from salience_detr_tpu.models.factory import SalienceDETRConfig\n"
        "model_config = SalienceDETRConfig(\n"
        "    backbone='resnet18', embed_dim=32, num_classes=5, num_queries=24,\n"
        "    num_encoder_layers=2, num_decoder_layers=2, num_heads=4,\n"
        "    dim_feedforward=64, topk_sa=12, layer_filter_ratio=(1.0, 0.5),\n"
        "    shared_sampling_locations=True, min_size=96, max_size=128,\n"
        "    select_box_nums_for_evaluation=20,\n"
        ")\n"
    )
    env = dict(os.environ)
    env.update(PYTHONPATH=repo, JAX_PLATFORMS="cpu", XLA_FLAGS="")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    pred_file = str(tmp_path / "pred.json")

    result = subprocess.run(
        [sys.executable, os.path.join(repo, "test.py"),
         "--coco-img", str(synthetic_val / "val"),
         "--coco-ann", str(synthetic_val / "val.json"),
         "--model-config", str(model_cfg),
         "--batch-size", "2", "--canvas", "96", "128", "--max-gt", "8",
         "--save-results", pred_file],
        capture_output=True, text=True, timeout=2400, env=env, cwd=repo,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    preds = json.load(open(pred_file))
    assert preds, "no predictions dumped"

    # re-score path
    result2 = subprocess.run(
        [sys.executable, os.path.join(repo, "test.py"),
         "--coco-img", str(synthetic_val / "val"),
         "--coco-ann", str(synthetic_val / "val.json"),
         "--result-file", pred_file],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo,
    )
    assert result2.returncode == 0, result2.stderr[-4000:]
    assert "AP=" in result2.stdout
