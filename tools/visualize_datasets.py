"""Draw ground-truth boxes of a COCO dataset to disk
(/root/reference/tools/visualize_datasets.py:17-50 equivalent)."""

from __future__ import annotations

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--img-folder", required=True)
    p.add_argument("--ann-file", required=True)
    p.add_argument("--show-dir", default="dataset_visualization")
    p.add_argument("--limit", type=int, default=100)
    p.add_argument("--transform", default=None, help="optional preset to preview")
    return p.parse_args()


def main():
    args = parse_args()
    from salience_detr_tpu.data.coco import CocoDetection
    from salience_detr_tpu.data.transforms import PRESETS
    from salience_detr_tpu.utils.visualize import save_visualization

    transforms = PRESETS[args.transform] if args.transform else None
    ds = CocoDetection(args.img_folder, args.ann_file, transforms=transforms)
    names = {c["id"]: c["name"] for c in ds.coco.cats.values()}
    max_id = max(names) if names else 0
    class_names = [names.get(i, str(i)) for i in range(max_id + 1)]

    os.makedirs(args.show_dir, exist_ok=True)
    for i in range(min(len(ds), args.limit)):
        s = ds[i]
        out = os.path.join(args.show_dir, f"{s['image_id']}.jpg")
        save_visualization(
            s["image"],
            {"boxes": s["boxes"], "labels": s["labels"]},
            out,
            class_names=class_names,
        )
    print(f"wrote {min(len(ds), args.limit)} visualizations to {args.show_dir}")


if __name__ == "__main__":
    main()
