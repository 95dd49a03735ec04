"""Host-side train augmentations (numpy/cv2), replacing the reference's
vendored ~9.5k-LoC torchvision-v2 transform stack (/root/reference/
transforms/).  The device consumes fixed-canvas uint8 batches; normalization
happens on device fused into the compiled step, so host transforms only do
geometry/color in numpy.

Preset parity (/root/reference/transforms/presets.py):
* ``detr`` (default train preset, presets.py:60-74): hflip(0.5) +
  RandomChoice(multi-scale shortest-size resize | resize->RandomSizeCrop->
  resize) + box sanitization;
* ``hflip``, ``multiscale``, ``basic``, ``lsj`` likewise.

Sample dict contract: {"image": HxWx3 uint8 RGB, "boxes": (N, 4) float32
xyxy absolute, "labels": (N,) int64}.
"""

from __future__ import annotations

import random
from typing import Callable, Dict, List, Optional, Sequence

import cv2
import numpy as np

cv2.setNumThreads(0)

SCALES = [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800]

Sample = Dict[str, np.ndarray]


def hflip(sample: Sample) -> Sample:
    img = sample["image"][:, ::-1]
    boxes = sample["boxes"].copy()
    w = img.shape[1]
    boxes[:, [0, 2]] = w - sample["boxes"][:, [2, 0]]
    out = {**sample, "image": np.ascontiguousarray(img), "boxes": boxes}
    if "masks" in sample and len(sample["masks"]):
        out["masks"] = np.ascontiguousarray(sample["masks"][:, :, ::-1])
    return out


def vflip(sample: Sample) -> Sample:
    img = sample["image"][::-1]
    boxes = sample["boxes"].copy()
    h = img.shape[0]
    boxes[:, [1, 3]] = h - sample["boxes"][:, [3, 1]]
    out = {**sample, "image": np.ascontiguousarray(img), "boxes": boxes}
    if "masks" in sample and len(sample["masks"]):
        out["masks"] = np.ascontiguousarray(sample["masks"][:, ::-1])
    return out


def resize(sample: Sample, size_hw) -> Sample:
    h, w = sample["image"].shape[:2]
    nh, nw = size_hw
    img = cv2.resize(sample["image"], (nw, nh), interpolation=cv2.INTER_LINEAR)
    boxes = sample["boxes"] * np.array([nw / w, nh / h, nw / w, nh / h], np.float32)
    out = {**sample, "image": img, "boxes": boxes.astype(np.float32)}
    if "masks" in sample and len(sample["masks"]):
        m = sample["masks"].transpose(1, 2, 0).astype(np.uint8)
        m = cv2.resize(m, (nw, nh), interpolation=cv2.INTER_NEAREST)
        if m.ndim == 2:
            m = m[:, :, None]
        out["masks"] = m.transpose(2, 0, 1)
    return out


def shortest_size(sample: Sample, min_size: int, max_size: Optional[int] = None) -> Sample:
    """Reference resize geometry: r = min(min/min_dim, max/max_dim);
    new = int(dim * r) — TRUNCATED, exactly like both reference paths
    (torchvision RandomShortestSize `int(orig * r)`, /root/reference/
    transforms/v2/_geometry.py:1359-1360, and EvalResize's `.to(dtype)`
    cast, /root/reference/models/detectors/base_detector.py:44-49)."""
    h, w = sample["image"].shape[:2]
    r = min_size / min(h, w)
    if max_size is not None:
        r = min(r, max_size / max(h, w))
    return resize(sample, (int(h * r), int(w * r)))


def crop(sample: Sample, top: int, left: int, height: int, width: int) -> Sample:
    img = sample["image"][top : top + height, left : left + width]
    boxes = sample["boxes"].copy()
    boxes[:, [0, 2]] -= left
    boxes[:, [1, 3]] -= top
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, width)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, height)
    out = {**sample, "image": np.ascontiguousarray(img), "boxes": boxes}
    if "masks" in sample and len(sample["masks"]):
        out["masks"] = np.ascontiguousarray(
            sample["masks"][:, top : top + height, left : left + width]
        )
    return out


def sanitize(sample: Sample, min_size: float = 1.0) -> Sample:
    """Drop degenerate boxes (SanitizeBoundingBox, presets.py:73)."""
    b = sample["boxes"]
    keep = (b[:, 2] - b[:, 0] >= min_size) & (b[:, 3] - b[:, 1] >= min_size)
    out = {**sample, "boxes": b[keep], "labels": sample["labels"][keep]}
    for k in ("iscrowd", "area", "masks"):
        if k in sample and len(sample[k]) == len(b):
            out[k] = sample[k][keep]
        else:
            out.pop(k, None)
    return out


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, sample, rng: random.Random):
        return hflip(sample) if rng.random() < self.p else sample


class RandomShortestSize:
    def __init__(self, min_size, max_size: Optional[int] = None):
        self.min_sizes = [min_size] if isinstance(min_size, int) else list(min_size)
        self.max_size = max_size

    def __call__(self, sample, rng: random.Random):
        return shortest_size(sample, rng.choice(self.min_sizes), self.max_size)


class RandomSizeCrop:
    """/root/reference/transforms/crop.py:13-31."""

    def __init__(self, min_size: int, max_size: int):
        self.min_size = min_size
        self.max_size = max_size

    def __call__(self, sample, rng: random.Random):
        h, w = sample["image"].shape[:2]
        ch = rng.randint(self.min_size, max(min(h, self.max_size), self.min_size))
        cw = rng.randint(self.min_size, max(min(w, self.max_size), self.min_size))
        ch, cw = min(ch, h), min(cw, w)
        top = rng.randint(0, h - ch)
        left = rng.randint(0, w - cw)
        return crop(sample, top, left, ch, cw)


class RandomCropPad:
    """RandomCrop(pad_if_needed=True) used by the lsj preset."""

    def __init__(self, size_hw, fill=(123.0, 117.0, 104.0)):
        self.size = size_hw
        self.fill = np.asarray(fill, np.uint8)

    def __call__(self, sample, rng: random.Random):
        th, tw = self.size
        h, w = sample["image"].shape[:2]
        if h < th or w < tw:
            pad_img = np.empty((max(h, th), max(w, tw), 3), np.uint8)
            pad_img[:] = self.fill
            pad_img[:h, :w] = sample["image"]
            sample = {**sample, "image": pad_img}
            h, w = pad_img.shape[:2]
        top = rng.randint(0, h - th)
        left = rng.randint(0, w - tw)
        return crop(sample, top, left, th, tw)


class ScaleJitter:
    """torchvision ScaleJitter: scale in [0.1, 2.0] of target/current."""

    def __init__(self, target_size, scale_range=(0.1, 2.0)):
        self.target = target_size
        self.range = scale_range

    def __call__(self, sample, rng: random.Random):
        h, w = sample["image"].shape[:2]
        scale = self.range[0] + rng.random() * (self.range[1] - self.range[0])
        r = min(self.target[0] / h, self.target[1] / w) * scale
        return resize(sample, (max(int(h * r), 1), max(int(w * r), 1)))


class Compose:
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, sample, rng: random.Random):
        for t in self.transforms:
            sample = t(sample, rng)
        return sample


class RandomChoice:
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, sample, rng: random.Random):
        return rng.choice(self.transforms)(sample, rng)


class Sanitize:
    def __init__(self, min_size: float = 1.0):
        self.min_size = min_size

    def __call__(self, sample, rng: random.Random):
        return sanitize(sample, self.min_size)


def _identity(sample, rng):
    return sample


class Mosaic:
    """4-image mosaic on a 2x2 canvas (/root/reference/transforms/
    mix_transform.py:15+).  Needs dataset access for the extra samples, set
    via :meth:`set_dataset` (the reference's update_dataset hook,
    datasets/coco.py:31-40)."""

    def __init__(self, size=(640, 640), p: float = 1.0):
        self.size = size
        self.p = p
        self.dataset = None

    def set_dataset(self, dataset):
        self.dataset = dataset

    def __call__(self, sample, rng: random.Random):
        if self.dataset is None or rng.random() >= self.p:
            return sample
        th, tw = self.size
        canvas = np.full((th * 2, tw * 2, 3), 114, np.uint8)
        boxes_all, labels_all = [], []
        cx = rng.randint(tw // 2, tw + tw // 2)
        cy = rng.randint(th // 2, th + th // 2)
        samples = [sample] + [
            self.dataset[rng.randrange(len(self.dataset))] for _ in range(3)
        ]
        regions = [  # (x0, y0, x1, y1) on the canvas per quadrant
            (0, 0, cx, cy), (cx, 0, tw * 2, cy), (0, cy, cx, th * 2), (cx, cy, tw * 2, th * 2),
        ]
        for s, (x0, y0, x1, y1) in zip(samples, regions):
            rw, rh = x1 - x0, y1 - y0
            s = shortest_size(s, min(rh, rw))
            img = s["image"][:rh, :rw]
            h, w = img.shape[:2]
            canvas[y0 : y0 + h, x0 : x0 + w] = img
            b = s["boxes"].copy()
            b[:, [0, 2]] = b[:, [0, 2]].clip(0, w) + x0
            b[:, [1, 3]] = b[:, [1, 3]].clip(0, h) + y0
            boxes_all.append(b)
            labels_all.append(s["labels"])
        out = {
            **{k: v for k, v in sample.items() if k not in ("area", "iscrowd")},
            "image": canvas,
            "boxes": np.concatenate(boxes_all).astype(np.float32),
            "labels": np.concatenate(labels_all),
        }
        return sanitize(out)


class MixUp:
    """Blend two samples and union their boxes (mix_transform.py MixUp)."""

    def __init__(self, alpha: float = 32.0, p: float = 0.5):
        self.alpha = alpha
        self.p = p
        self.dataset = None

    def set_dataset(self, dataset):
        self.dataset = dataset

    def __call__(self, sample, rng: random.Random):
        if self.dataset is None or rng.random() >= self.p:
            return sample
        other = self.dataset[rng.randrange(len(self.dataset))]
        h = max(sample["image"].shape[0], other["image"].shape[0])
        w = max(sample["image"].shape[1], other["image"].shape[1])
        lam = np.random.default_rng(rng.getrandbits(32)).beta(self.alpha, self.alpha)
        canvas = np.zeros((h, w, 3), np.float32)
        canvas[: sample["image"].shape[0], : sample["image"].shape[1]] += (
            lam * sample["image"].astype(np.float32)
        )
        canvas[: other["image"].shape[0], : other["image"].shape[1]] += (
            (1 - lam) * other["image"].astype(np.float32)
        )
        return {
            **{k: v for k, v in sample.items() if k not in ("area", "iscrowd")},
            "image": canvas.clip(0, 255).astype(np.uint8),
            "boxes": np.concatenate([sample["boxes"], other["boxes"]]).astype(np.float32),
            "labels": np.concatenate([sample["labels"], other["labels"]]),
        }


class RandomPhotometricDistort:
    """Brightness/contrast/saturation/hue jitter (ssd preset ingredient)."""

    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, sample, rng: random.Random):
        img = sample["image"].astype(np.float32)
        if rng.random() < self.p:
            img = img * rng.uniform(0.875, 1.125)  # brightness
        if rng.random() < self.p:
            mean = img.mean()
            img = (img - mean) * rng.uniform(0.5, 1.5) + mean  # contrast
        if rng.random() < self.p:
            gray = img.mean(-1, keepdims=True)
            img = gray + (img - gray) * rng.uniform(0.5, 1.5)  # saturation
        return {**sample, "image": img.clip(0, 255).astype(np.uint8)}


class RandomZoomOut:
    """Place the image on a larger canvas (ssd preset ingredient)."""

    def __init__(self, fill=(123, 117, 104), side_range=(1.0, 4.0), p: float = 0.5):
        self.fill = np.asarray(fill, np.uint8)
        self.side_range = side_range
        self.p = p

    def __call__(self, sample, rng: random.Random):
        if rng.random() >= self.p:
            return sample
        h, w = sample["image"].shape[:2]
        r = rng.uniform(*self.side_range)
        nh, nw = int(h * r), int(w * r)
        top = rng.randint(0, nh - h)
        left = rng.randint(0, nw - w)
        canvas = np.empty((nh, nw, 3), np.uint8)
        canvas[:] = self.fill
        canvas[top : top + h, left : left + w] = sample["image"]
        boxes = sample["boxes"] + np.array([left, top, left, top], np.float32)
        return {**sample, "image": canvas, "boxes": boxes}


class RandomVerticalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, sample, rng: random.Random):
        return vflip(sample) if rng.random() < self.p else sample


class RandomIoUCrop:
    """torchvision v2 RandomIoUCrop (used by the ssd/ssdlite/rtdetr presets,
    /root/reference/transforms/presets.py:85,95,166): sample a min-IoU option,
    then up to ``trials`` random crops; accept when at least one box center is
    inside and the max box-vs-crop IoU clears the option; keep center-inside
    boxes, clamped."""

    OPTIONS = [0.0, 0.1, 0.3, 0.5, 0.7, 0.9, None]

    def __init__(self, min_scale=0.3, max_scale=1.0, min_aspect=0.5,
                 max_aspect=2.0, trials: int = 40):
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.min_aspect = min_aspect
        self.max_aspect = max_aspect
        self.trials = trials

    def __call__(self, sample, rng: random.Random):
        min_iou = rng.choice(self.OPTIONS)
        if min_iou is None or len(sample["boxes"]) == 0:
            return sample
        h, w = sample["image"].shape[:2]
        boxes = sample["boxes"]
        for _ in range(self.trials):
            cw = int(w * rng.uniform(self.min_scale, self.max_scale))
            ch = int(h * rng.uniform(self.min_scale, self.max_scale))
            if cw < 1 or ch < 1:
                continue
            aspect = cw / ch
            if not (self.min_aspect <= aspect <= self.max_aspect):
                continue
            left = rng.randint(0, w - cw)
            top = rng.randint(0, h - ch)
            cx = (boxes[:, 0] + boxes[:, 2]) / 2
            cy = (boxes[:, 1] + boxes[:, 3]) / 2
            inside = (cx > left) & (cx < left + cw) & (cy > top) & (cy < top + ch)
            if not inside.any():
                continue
            # IoU of candidate crop vs the inside boxes
            bx = boxes[inside]
            ix1 = np.maximum(bx[:, 0], left)
            iy1 = np.maximum(bx[:, 1], top)
            ix2 = np.minimum(bx[:, 2], left + cw)
            iy2 = np.minimum(bx[:, 3], top + ch)
            inter = (ix2 - ix1).clip(0) * (iy2 - iy1).clip(0)
            area_b = (bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1])
            iou = inter / (area_b + cw * ch - inter + 1e-9)
            if iou.max() < min_iou:
                continue
            kept = {
                **sample,
                "boxes": boxes[inside],
                "labels": sample["labels"][inside],
            }
            for k in ("iscrowd", "area", "masks"):
                if k in sample and len(sample[k]) == len(boxes):
                    kept[k] = sample[k][inside]
            return crop(kept, top, left, ch, cw)
        return sample


# ------------------------------------------------- albumentations-style ops
# numpy re-implementations of the ops the reference wires through its
# albumentations wrapper (/root/reference/transforms/album_transform.py:13-203,
# presets.py strong_album :98-161); image-only, box-preserving except Shift.


class RandomShift:
    """A.ShiftScaleRotate(shift_limit, scale_limit=0, rotate_limit=0) — pure
    translation with constant-0 border."""

    def __init__(self, shift_limit: float = 0.0625, p: float = 0.5):
        self.shift_limit = shift_limit
        self.p = p

    def __call__(self, sample, rng: random.Random):
        if rng.random() >= self.p:
            return sample
        h, w = sample["image"].shape[:2]
        tx = int(round(rng.uniform(-self.shift_limit, self.shift_limit) * w))
        ty = int(round(rng.uniform(-self.shift_limit, self.shift_limit) * h))
        img = np.zeros_like(sample["image"])
        src = sample["image"]
        x0s, x1s = max(0, -tx), min(w, w - tx)
        y0s, y1s = max(0, -ty), min(h, h - ty)
        img[y0s + ty : y1s + ty, x0s + tx : x1s + tx] = src[y0s:y1s, x0s:x1s]
        boxes = sample["boxes"] + np.asarray([tx, ty, tx, ty], np.float32)
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
        return {**sample, "image": img, "boxes": boxes}


class RandomBrightnessContrast:
    """A.RandomBrightnessContrast(brightness_limit=(0.1,0.3),
    contrast_limit=(0.1,0.3)) — img*alpha + beta*255."""

    def __init__(self, brightness_limit=(0.1, 0.3), contrast_limit=(0.1, 0.3),
                 p: float = 0.2):
        self.brightness = brightness_limit
        self.contrast = contrast_limit
        self.p = p

    def __call__(self, sample, rng: random.Random):
        if rng.random() >= self.p:
            return sample
        alpha = 1.0 + rng.uniform(*self.contrast)
        beta = rng.uniform(*self.brightness)
        img = sample["image"].astype(np.float32) * alpha + beta * 255.0
        return {**sample, "image": img.clip(0, 255).astype(np.uint8)}


class RandomRGBShift:
    def __init__(self, limit: int = 10, p: float = 1.0):
        self.limit = limit
        self.p = p

    def __call__(self, sample, rng: random.Random):
        if rng.random() >= self.p:
            return sample
        shift = np.asarray(
            [rng.uniform(-self.limit, self.limit) for _ in range(3)], np.float32
        )
        img = sample["image"].astype(np.float32) + shift
        return {**sample, "image": img.clip(0, 255).astype(np.uint8)}


class RandomHSV:
    """A.HueSaturationValue(20, 30, 20)."""

    def __init__(self, hue: int = 20, sat: int = 30, val: int = 20, p: float = 1.0):
        self.hue, self.sat, self.val = hue, sat, val
        self.p = p

    def __call__(self, sample, rng: random.Random):
        if rng.random() >= self.p:
            return sample
        hsv = cv2.cvtColor(sample["image"], cv2.COLOR_RGB2HSV).astype(np.int32)
        hsv[..., 0] = (hsv[..., 0] + int(rng.uniform(-self.hue, self.hue))) % 180
        hsv[..., 1] = (hsv[..., 1] + int(rng.uniform(-self.sat, self.sat))).clip(0, 255)
        hsv[..., 2] = (hsv[..., 2] + int(rng.uniform(-self.val, self.val))).clip(0, 255)
        img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
        return {**sample, "image": img}


class RandomJPEG:
    """A.ImageCompression(quality 85-95)."""

    def __init__(self, quality=(85, 95), p: float = 0.2):
        self.quality = quality
        self.p = p

    def __call__(self, sample, rng: random.Random):
        if rng.random() >= self.p:
            return sample
        q = rng.randint(*self.quality)
        ok, buf = cv2.imencode(
            ".jpg", sample["image"][:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, q]
        )
        if not ok:
            return sample
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)[:, :, ::-1]
        return {**sample, "image": np.ascontiguousarray(img)}


class RandomChannelShuffle:
    def __init__(self, p: float = 0.1):
        self.p = p

    def __call__(self, sample, rng: random.Random):
        if rng.random() >= self.p:
            return sample
        perm = [0, 1, 2]
        rng.shuffle(perm)
        return {**sample, "image": np.ascontiguousarray(sample["image"][:, :, perm])}


class RandomBlur:
    """A.OneOf([Blur(3), MedianBlur(3)])."""

    def __init__(self, p: float = 0.1):
        self.p = p

    def __call__(self, sample, rng: random.Random):
        if rng.random() >= self.p:
            return sample
        if rng.random() < 0.5:
            img = cv2.blur(sample["image"], (3, 3))
        else:
            img = cv2.medianBlur(sample["image"], 3)
        return {**sample, "image": img}


class OneOf:
    """Apply exactly one of the given transforms (albumentations A.OneOf)."""

    def __init__(self, transforms: Sequence[Callable], p: float = 1.0):
        self.transforms = list(transforms)
        self.p = p

    def __call__(self, sample, rng: random.Random):
        if rng.random() >= self.p:
            return sample
        return rng.choice(self.transforms)(sample, rng)


# ------------------------------------------------------------ copy-paste


def simple_copy_paste(samples: List[Sample], rng: random.Random) -> List[Sample]:
    """Batch-level SimpleCopyPaste (/root/reference/transforms/
    simple_copy_paste.py:8-170 + copypaste_collate_fn util/collate_fn.py:12):
    each image receives a random selection of the NEXT image's instances,
    masked by the union of their (blurred) masks.  Requires samples loaded
    with masks (CocoDetection(return_masks=True))."""
    rolled = samples[-1:] + samples[:-1]
    out = []
    for target, paste in zip(samples, rolled):
        out.append(_copy_paste_one(target, paste, rng))
    return out


def _copy_paste_one(sample: Sample, paste: Sample, rng: random.Random) -> Sample:
    if "masks" not in paste or len(paste["masks"]) == 0 or "masks" not in sample:
        return sample
    n = len(paste["masks"])
    sel = sorted(set(rng.randrange(n) for _ in range(n)))  # randint-with-dup + unique
    p_masks = paste["masks"][sel]
    p_boxes = paste["boxes"][sel]
    p_labels = paste["labels"][sel]

    h, w = sample["image"].shape[:2]
    ph, pw = paste["image"].shape[:2]
    p_img = paste["image"]
    if (ph, pw) != (h, w):
        p_img = cv2.resize(p_img, (w, h), interpolation=cv2.INTER_LINEAR)
        m = p_masks.transpose(1, 2, 0).astype(np.uint8)
        m = cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
        if m.ndim == 2:
            m = m[:, :, None]
        p_masks = m.transpose(2, 0, 1)
        ratios = np.asarray([w / pw, h / ph, w / pw, h / ph], np.float32)
        p_boxes = p_boxes * ratios

    alpha = (p_masks.sum(0) > 0).astype(np.float32)
    # blending: gaussian blur of the alpha mask (simple_copy_paste.py:56-62)
    alpha = cv2.GaussianBlur(alpha, (5, 5), 2.0)

    img = (
        sample["image"].astype(np.float32) * (1.0 - alpha[..., None])
        + p_img.astype(np.float32) * alpha[..., None]
    )

    masks = sample["masks"].astype(np.float32) * (1.0 - alpha[None])
    masks = masks > 0.5
    keep = masks.sum((-1, -2)) > 0
    masks = masks[keep]

    # recompute boxes of surviving target instances from their masks
    boxes = np.zeros((len(masks), 4), np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        boxes[i] = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)

    out = {
        **{k: v for k, v in sample.items() if k not in ("area", "iscrowd")},
        "image": img.clip(0, 255).astype(np.uint8),
        "masks": np.concatenate([masks, p_masks.astype(bool)]) if len(masks) or len(p_masks) else masks,
        "boxes": np.concatenate([boxes, p_boxes]).astype(np.float32),
        "labels": np.concatenate([sample["labels"][keep], p_labels]),
    }
    return sanitize(out)


# ------------------------------------------------------------------ presets

basic = Compose([])
hflip_preset = Compose([RandomHorizontalFlip(0.5)])
multiscale = Compose([
    RandomShortestSize(SCALES, 1333),
    RandomHorizontalFlip(0.5),
])
detr = Compose([
    RandomHorizontalFlip(0.5),
    RandomChoice([
        RandomShortestSize(SCALES, 1333),
        Compose([
            RandomShortestSize([400, 500, 600]),
            RandomSizeCrop(384, 600),
            RandomShortestSize(SCALES, 1333),
        ]),
    ]),
    Sanitize(),
])
lsj = Compose([
    ScaleJitter((1024, 1024)),
    RandomCropPad((1024, 1024)),
    RandomHorizontalFlip(0.5),
    Sanitize(),
])
# reference presets.py:40-48: same recipe at the 1536 canvas
lsj_1536 = Compose([
    ScaleJitter((1536, 1536)),
    RandomCropPad((1536, 1536)),
    RandomHorizontalFlip(0.5),
    Sanitize(),
])

ssd = Compose([
    RandomPhotometricDistort(),
    RandomZoomOut(),
    RandomIoUCrop(),
    RandomHorizontalFlip(0.5),
    Sanitize(),
])

ssdlite = Compose([
    RandomIoUCrop(),
    RandomHorizontalFlip(0.5),
    Sanitize(),
])

strong_album = Compose([
    RandomHorizontalFlip(0.5),
    RandomChoice([
        RandomShortestSize(SCALES, 1333),
        Compose([
            RandomShortestSize([400, 500, 600]),
            RandomSizeCrop(384, 600),
            RandomShortestSize(SCALES, 1333),
        ]),
    ]),
    # the reference's albumentations block (presets.py:98-161)
    RandomShift(0.0625, p=0.5),
    RandomBrightnessContrast(p=0.2),
    OneOf([RandomRGBShift(10), RandomHSV(20, 30, 20)], p=1.0),
    RandomJPEG((85, 95), p=0.2),
    RandomChannelShuffle(p=0.1),
    RandomBlur(p=0.1),
    RandomHorizontalFlip(0.5),
    RandomVerticalFlip(0.5),
    Sanitize(),
])


class _Resize:
    def __init__(self, size_hw):
        self.size = size_hw

    def __call__(self, sample, rng: random.Random):
        return resize(sample, self.size)


rtdetr = Compose([
    RandomPhotometricDistort(p=0.8),
    RandomZoomOut(fill=(0, 0, 0), p=0.5),
    RandomIoUCrop(),
    RandomHorizontalFlip(0.5),
    _Resize((640, 640)),
    Sanitize(),
])

mosaic = Compose([
    Mosaic((640, 640)),
    RandomShortestSize(SCALES, 1333),
    RandomHorizontalFlip(0.5),
    Sanitize(),
])

mixup_detr = Compose([
    MixUp(),
    RandomHorizontalFlip(0.5),
    RandomChoice([
        RandomShortestSize(SCALES, 1333),
        Compose([
            RandomShortestSize([400, 500, 600]),
            RandomSizeCrop(384, 600),
            RandomShortestSize(SCALES, 1333),
        ]),
    ]),
    Sanitize(),
])

PRESETS = {
    "basic": basic,
    "hflip": hflip_preset,
    "multiscale": multiscale,
    "detr": detr,
    "lsj": lsj,
    "lsj_1536": lsj_1536,
    "ssd": ssd,
    "ssdlite": ssdlite,
    "strong_album": strong_album,
    "rtdetr": rtdetr,
    "mosaic": mosaic,
    "mixup": mixup_detr,
}
