"""Host input-pipeline throughput microbenchmark (VERDICT r2 weak #8).

Measures how many images/s the thread-based DetectionLoader can decode +
augment + pack on this host, independent of the device — the number that
must exceed the chip's img/s for the input pipeline not to be the training
bottleneck (the reference uses torch DataLoader process workers,
/root/reference/main.py:96-118; under the GIL, cv2/numpy release it for the
heavy kernels, which is what this measures).

Usage:
    python tools/bench_loader.py [--num-images 64] [--batch-size 4]
        [--canvas 800 1344] [--num-workers 8] [--transform detr]

Prints one JSON line: {"metric": "loader_img_s", ...}.
"""

from __future__ import annotations

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import tempfile
import time

import numpy as np


def make_synthetic_coco(root: str, n_images: int, hw=(600, 900), n_boxes=12):
    """JPEG-backed synthetic COCO split (decode cost matters: real JPEGs)."""
    import cv2

    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "img")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations, aid = [], [], 0
    for i in range(n_images):
        h = int(rng.integers(int(hw[0] * 0.7), hw[0]))
        w = int(rng.integers(int(hw[1] * 0.7), hw[1]))
        # non-constant content so JPEG decode does real work
        yy, xx = np.mgrid[0:h, 0:w]
        img = (
            (np.sin(xx / 17.0)[..., None] * 127 + 128) * 0.5
            + rng.integers(0, 255, (h, w, 3)) * 0.5
        ).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"{i}.jpg"), img)
        images.append({"id": i, "file_name": f"{i}.jpg", "height": h, "width": w})
        for _ in range(n_boxes):
            x, y = rng.uniform(5, w * 0.6), rng.uniform(5, h * 0.6)
            bw, bh = rng.uniform(10, w * 0.3), rng.uniform(10, h * 0.3)
            annotations.append({
                "id": aid, "image_id": i, "category_id": int(rng.integers(1, 80)),
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
            })
            aid += 1
    ann_path = os.path.join(root, "ann.json")
    with open(ann_path, "w") as f:
        json.dump({
            "images": images, "annotations": annotations,
            "categories": [{"id": c, "name": str(c)} for c in range(1, 81)],
        }, f)
    return img_dir, ann_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-images", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--canvas", type=int, nargs=2, default=(800, 1344))
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--transform", default="detr")
    p.add_argument("--epochs", type=int, default=3,
                   help="measured epochs (first epoch warms the page cache)")
    args = p.parse_args()

    from salience_detr_tpu.data.coco import CocoDetection
    from salience_detr_tpu.data.loader import DetectionLoader
    from salience_detr_tpu.data.transforms import PRESETS

    with tempfile.TemporaryDirectory() as root:
        img_dir, ann = make_synthetic_coco(root, args.num_images)
        ds = CocoDetection(
            img_dir, ann, transforms=PRESETS[args.transform], train=True
        )
        loader = DetectionLoader(
            ds, args.batch_size, canvas_hw=tuple(args.canvas),
            max_gt=100, shuffle=True, num_workers=args.num_workers,
        )

        # warmup epoch: page cache + numpy buffers
        loader.set_epoch(0)
        n_warm = sum(b["images"].shape[0] for b in loader)

        t0 = time.perf_counter()
        n = 0
        for e in range(1, args.epochs + 1):
            loader.set_epoch(e)
            for b in loader:
                n += b["images"].shape[0]
        dt = time.perf_counter() - t0

    img_s = n / dt
    print(json.dumps({
        "metric": "loader_img_s",
        "value": round(img_s, 2),
        "unit": "img/s",
        "images": n,
        "seconds": round(dt, 2),
        "num_workers": args.num_workers,
        "transform": args.transform,
        "note": f"warmup epoch saw {n_warm} imgs; host cores="
                f"{os.cpu_count()}",
    }))


if __name__ == "__main__":
    main()
