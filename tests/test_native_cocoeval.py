"""Native C++ cocoeval matcher vs the numpy implementation (differential)."""

import json

import numpy as np
import pytest

from salience_detr_tpu.data.coco import CocoIndex
from salience_detr_tpu.utils.coco_eval import CocoEvaluator


@pytest.fixture
def random_dataset(tmp_path):
    rng = np.random.default_rng(0)
    images, annotations = [], []
    aid = 0
    for i in range(6):
        images.append({"id": i, "width": 300, "height": 300, "file_name": f"{i}.jpg"})
        for _ in range(int(rng.integers(0, 8))):
            x, y = rng.uniform(0, 220, 2)
            w, h = rng.uniform(10, 70, 2)
            annotations.append({
                "id": aid, "image_id": i, "category_id": int(rng.integers(1, 4)),
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(w * h), "iscrowd": int(rng.random() < 0.15),
            })
            aid += 1
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": c, "name": f"c{c}"} for c in (1, 2, 3)]}
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    return CocoIndex(str(p))


def make_predictions(rng, n_imgs=6):
    preds = {}
    for i in range(n_imgs):
        n = int(rng.integers(0, 20))
        xy = rng.uniform(0, 230, (n, 2))
        wh = rng.uniform(8, 80, (n, 2))
        preds[i] = {
            "boxes": np.concatenate([xy, xy + wh], -1),
            "scores": rng.uniform(size=n),
            "labels": rng.integers(1, 4, n),
        }
    return preds


def test_native_matches_numpy(random_dataset):
    rng = np.random.default_rng(1)
    preds = make_predictions(rng)

    ev_native = CocoEvaluator(random_dataset, use_native=True)
    ev_numpy = CocoEvaluator(random_dataset, use_native=False)
    if ev_native._native is None:
        pytest.skip("native toolchain unavailable")
    ev_native.update(preds)
    ev_numpy.update(preds)
    ev_native.accumulate()
    ev_numpy.accumulate()
    s1, s2 = ev_native.summarize(), ev_numpy.summarize()
    for k in s1:
        assert s1[k] == pytest.approx(s2[k], abs=1e-9), k
