"""COCO-format detection dataset (self-contained JSON parsing, cv2 decode).

Behavioral spec: /root/reference/datasets/coco.py:14-161 (CocoDetection with
cv2 imdecode BGR->RGB, train-time filtering of annotation-less images,
ConvertCocoPolysToMask target prep at /root/reference/transforms/
convert_coco_polys_to_mask.py:7-80) — without the pycocotools dependency:
the annotation index is built directly from the JSON, and the same index
feeds the native evaluator (utils/coco_eval.py).
"""

from __future__ import annotations

import json
import os
import random
from typing import Callable, Dict, List, Optional

import numpy as np

try:
    import cv2

    cv2.setNumThreads(0)
    try:
        cv2.ocl.setUseOpenCL(False)
    except Exception:
        pass
except Exception:  # pragma: no cover
    cv2 = None


class CocoIndex:
    """Minimal in-memory COCO annotation index (replaces pycocotools.COCO).

    Accepts an annotation-file path or an already-built COCO-format dict
    (the latter is how ``convert_to_coco_api`` wraps non-COCO datasets,
    mirroring /root/reference/util/coco_utils.py:29-77)."""

    def __init__(self, ann_file):
        if isinstance(ann_file, dict):
            data = ann_file
        else:
            with open(ann_file) as f:
                data = json.load(f)
        self.dataset = data
        self.imgs = {img["id"]: img for img in data.get("images", [])}
        self.cats = {c["id"]: c for c in data.get("categories", [])}
        self.img_to_anns: Dict[int, List[dict]] = {i: [] for i in self.imgs}
        for ann in data.get("annotations", []):
            self.img_to_anns.setdefault(ann["image_id"], []).append(ann)
        self.img_ids = sorted(self.imgs)
        self.cat_ids = sorted(self.cats)

    def annotations(self, img_id: int) -> List[dict]:
        return self.img_to_anns.get(img_id, [])


def _rasterize_mask(img_h: int, img_w: int, segmentation) -> np.ndarray:
    """COCO polygon segmentation -> bool mask (ConvertCocoPolysToMask's mask
    path, /root/reference/transforms/convert_coco_polys_to_mask.py — polygon
    variant only; RLE is crowd-only and crowds are filtered)."""
    mask = np.zeros((img_h, img_w), np.uint8)
    if isinstance(segmentation, list):
        for poly in segmentation:
            pts = np.asarray(poly, np.float64).reshape(-1, 2)
            cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask.astype(bool)


def _prepare_target(
    img_h: int, img_w: int, anns: List[dict], return_masks: bool = False
) -> Dict[str, np.ndarray]:
    """COCO anns -> clamped xyxy boxes + labels, dropping degenerate boxes and
    crowd annotations (ConvertCocoPolysToMask semantics)."""
    anns = [a for a in anns if a.get("iscrowd", 0) == 0]
    boxes = np.asarray([a["bbox"] for a in anns], np.float32).reshape(-1, 4)
    # xywh -> xyxy, clamp to image
    boxes[:, 2:] += boxes[:, :2]
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, img_w)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, img_h)
    labels = np.asarray([a["category_id"] for a in anns], np.int64)
    area = np.asarray([a.get("area", 0.0) for a in anns], np.float32)
    keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    out = {
        "boxes": boxes[keep],
        "labels": labels[keep],
        "area": area[keep],
    }
    if return_masks:
        masks = np.stack(
            [_rasterize_mask(img_h, img_w, a.get("segmentation", [])) for a in anns]
        ) if anns else np.zeros((0, img_h, img_w), bool)
        out["masks"] = masks[keep]
    return out


class CocoDetection:
    """Map-style dataset yielding transform-ready sample dicts."""

    def __init__(
        self,
        img_folder: str,
        ann_file: str,
        transforms: Optional[Callable] = None,
        train: bool = False,
        return_masks: bool = False,
    ):
        self.img_folder = img_folder
        self.coco = CocoIndex(ann_file)
        self.transforms = transforms
        self.train = train
        self.return_masks = return_masks
        # let Mosaic/MixUp-style transforms fetch extra samples (the
        # reference's update_dataset hook, datasets/coco.py:31-40)
        self._wire_dataset(transforms)
        ids = list(self.coco.img_ids)
        if train:
            # filter images without (valid) annotations (datasets/coco.py:98-133)
            ids = [
                i
                for i in ids
                if len(_prepare_target(
                    self.coco.imgs[i].get("height", 1 << 30),
                    self.coco.imgs[i].get("width", 1 << 30),
                    self.coco.annotations(i),
                )["labels"]) > 0
            ]
        self.ids = ids

    def _wire_dataset(self, transform):
        if transform is None:
            return
        if hasattr(transform, "set_dataset"):
            transform.set_dataset(_PlainDataset(self))
        for child in getattr(transform, "transforms", []):
            self._wire_dataset(child)

    def __len__(self):
        return len(self.ids)

    def _load_image(self, file_name: str) -> np.ndarray:
        path = os.path.join(self.img_folder, file_name)
        with open(path, "rb") as f:
            buf = np.frombuffer(f.read(), np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)  # BGR
        return np.ascontiguousarray(img[:, :, ::-1])  # RGB

    def _image_file_name(self, info: dict) -> str:
        return info["file_name"]

    def get_raw(self, idx: int):
        """Sample without transforms (thread-safe; used by mix transforms)."""
        img_id = self.ids[idx]
        info = self.coco.imgs[img_id]
        image = self._load_image(self._image_file_name(info))
        h, w = image.shape[:2]
        target = _prepare_target(
            h, w, self.coco.annotations(img_id), return_masks=self.return_masks
        )
        sample = {
            "image": image,
            "boxes": target["boxes"],
            "labels": target["labels"],
            "area": target["area"],
            "image_id": img_id,
            "orig_size": np.asarray([h, w], np.int32),
        }
        if self.return_masks:
            sample["masks"] = target["masks"]
        return sample

    def get_with_rng(self, idx: int, rng: random.Random):
        """Deterministic variant: augmentation randomness comes from the
        caller (the loader derives it from (seed, epoch, index) — the
        reference's seed_worker/fixed_generator role, util/misc.py:157-166)."""
        sample = self.get_raw(idx)
        if self.transforms is not None:
            sample = self.transforms(sample, rng)
        return sample

    def __getitem__(self, idx: int):
        return self.get_with_rng(idx, random.Random(random.getrandbits(64)))


class _PlainDataset:
    """Dataset view WITHOUT transforms (mix transforms need raw samples)."""

    def __init__(self, ds: "CocoDetection"):
        self._ds = ds

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, idx):
        return self._ds.get_raw(idx)


class Object365Detection(CocoDetection):
    """Objects365 variant: path remapping + corrupt-image retry
    (/root/reference/datasets/coco.py:136-161)."""

    def _image_file_name(self, info: dict) -> str:
        # keep only the last two path components, then root under
        # images/{train,val} (reference datasets/coco.py:140-147)
        name = info["file_name"]
        parts = name.replace("\\", "/").split("/")
        name = "/".join(parts[-2:]) if len(parts) >= 2 else parts[-1]
        split = "images/train" if self.train else "images/val"
        return os.path.join(split, name)

    def __getitem__(self, idx: int):
        for attempt in range(16):
            try:
                return super().__getitem__((idx + attempt) % len(self))
            except Exception:
                continue
        raise RuntimeError(f"could not load any image near index {idx}")

    def get_with_rng(self, idx: int, rng: random.Random):
        # the loader path must also skip corrupt images (coco.py:153-158)
        for attempt in range(16):
            try:
                return super().get_with_rng((idx + attempt) % len(self), rng)
            except Exception:
                continue
        raise RuntimeError(f"could not load any image near index {idx}")


class InferenceDataset:
    """Folder-of-images dataset (/root/reference/inference.py:61-75)."""

    EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")

    def __init__(self, image_dir: str):
        self.paths = sorted(
            os.path.join(image_dir, f)
            for f in os.listdir(image_dir)
            if f.lower().endswith(self.EXTS)
        )

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int):
        with open(self.paths[idx], "rb") as f:
            buf = np.frombuffer(f.read(), np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)[:, :, ::-1]
        img = np.ascontiguousarray(img)
        h, w = img.shape[:2]
        return {
            "image": img,
            "boxes": np.zeros((0, 4), np.float32),
            "labels": np.zeros((0,), np.int64),
            "image_id": idx,
            "path": self.paths[idx],
            "orig_size": np.asarray([h, w], np.int32),
        }
