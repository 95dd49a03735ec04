"""Bucketed fixed-canvas batching and device prefetch.

Replaces the reference's dynamic-shape pipeline (aspect-ratio grouped
sampler /root/reference/util/group_by_aspect_ratio.py:14-192, per-batch max
padding /root/reference/util/misc.py:75-104, CUDA-stream DataPrefetcher
/root/reference/util/collate_fn.py:17-49) with the static-shape scheme XLA
needs (SURVEY.md §7.1):

* every image is assigned to an orientation bucket whose canvas is a
  compile-time constant (landscape HxW, portrait WxH by default) — two
  compiled programs total, no recompilation across batches;
* batches carry padded uint8 images + valid sizes + padded targets (boxes
  normalized cxcywh on the valid area, matching DETRDetector.prepare_targets
  /root/reference/models/detectors/base_detector.py:155-166);
* a worker pool decodes/augments asynchronously and a prefetch thread keeps
  the next batch in flight to the device.
"""

from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def pack_batch(
    samples: Sequence[dict],
    canvas_hw: Tuple[int, int],
    max_gt: int,
) -> Dict[str, np.ndarray]:
    """Pad samples onto a fixed canvas with fixed-size targets."""
    B = len(samples)
    H, W = canvas_hw
    images = np.zeros((B, H, W, 3), np.uint8)
    image_sizes = np.zeros((B, 2), np.int32)
    orig_sizes = np.zeros((B, 2), np.int32)
    boxes = np.zeros((B, max_gt, 4), np.float32)
    labels = np.zeros((B, max_gt), np.int32)
    valid = np.zeros((B, max_gt), bool)
    image_ids = np.zeros((B,), np.int64)

    for i, s in enumerate(samples):
        img = s["image"]
        h, w = img.shape[:2]
        assert h <= H and w <= W, f"image {h}x{w} exceeds canvas {H}x{W}"
        images[i, :h, :w] = img
        image_sizes[i] = (h, w)
        orig_sizes[i] = s.get("orig_size", (h, w))
        image_ids[i] = s.get("image_id", i)
        b = np.asarray(s["boxes"], np.float32)[:max_gt]
        n = len(b)
        if n:
            # degenerate-box runtime check (the reference asserts in-model,
            # base_detector.py:100-112; here the host loader is where a real
            # error with the offending box can be raised)
            degenerate = (b[:, 2:] <= b[:, :2]).any(axis=1)
            if degenerate.any():
                bad = b[int(np.argmax(degenerate))].tolist()
                raise ValueError(
                    "All bounding boxes should have positive height and "
                    f"width. Found invalid box {bad} for sample index {i} "
                    f"(image_id={s.get('image_id', i)})."
                )
            # xyxy absolute -> normalized cxcywh on the VALID image area
            cx = (b[:, 0] + b[:, 2]) / 2 / w
            cy = (b[:, 1] + b[:, 3]) / 2 / h
            bw = (b[:, 2] - b[:, 0]) / w
            bh = (b[:, 3] - b[:, 1]) / h
            boxes[i, :n] = np.stack([cx, cy, bw, bh], -1)
            labels[i, :n] = np.asarray(s["labels"], np.int64)[:max_gt]
            valid[i, :n] = True

    return {
        "images": images,
        "image_sizes": image_sizes,
        "orig_sizes": orig_sizes,
        "boxes": boxes,
        "labels": labels,
        "gt_valid": valid,
        "image_ids": image_ids,
    }


def fit_to_canvas(sample: dict, canvas_hw: Tuple[int, int]) -> dict:
    """Shortest-side eval resize into the canvas (EvalResize semantics,
    /root/reference/models/detectors/base_detector.py:20-53) — r never
    upscales beyond the canvas."""
    from salience_detr_tpu.data.transforms import resize

    h, w = sample["image"].shape[:2]
    H, W = canvas_hw
    r = min(H / h, W / w)
    nh, nw = int(h * r), int(w * r)
    return resize(sample, (max(nh, 1), max(nw, 1)))


class DetectionLoader:
    """Iterable over fixed-shape batches with orientation bucketing."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        canvas_hw: Tuple[int, int] = (800, 1344),
        max_gt: int = 100,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        drop_last: bool = True,
        eval_min_size: Optional[int] = None,
        eval_max_size: Optional[int] = None,
        batch_transform: Optional[callable] = None,
    ):
        """``batch_transform(samples, rng) -> samples`` runs on each pooled
        batch before packing — the reference's copypaste_collate_fn slot
        (/root/reference/util/collate_fn.py:12); pass
        ``transforms.simple_copy_paste`` to enable SimpleCopyPaste."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.canvas_land = (min(canvas_hw), max(canvas_hw))
        self.canvas_port = (max(canvas_hw), min(canvas_hw))
        self.max_gt = max_gt
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.eval_min_size = eval_min_size
        self.eval_max_size = eval_max_size
        self.batch_transform = batch_transform

    def _pack(self, pool, canvas, batch_idx: int):
        if self.batch_transform is not None:
            rng = random.Random(
                (self.seed * 7_368_787 + self.epoch) * 7_368_787 + batch_idx
            )
            pool = self.batch_transform(list(pool), rng)
        return pack_batch(pool, canvas, self.max_gt)

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _canvas_for(self, sample) -> Tuple[int, int]:
        h, w = sample["image"].shape[:2]
        return self.canvas_land if w >= h else self.canvas_port

    def _prepare(self, idx: int) -> dict:
        if hasattr(self.dataset, "get_with_rng"):
            rng = random.Random((self.seed * 1_000_003 + self.epoch) * 1_000_003 + idx)
            s = self.dataset.get_with_rng(idx, rng)
        else:
            s = self.dataset[idx]
        if self.eval_min_size is not None:
            # eval resize lives here on host (the reference keeps it inside
            # the model; the geometry is identical)
            from salience_detr_tpu.data.transforms import shortest_size

            s = shortest_size(s, self.eval_min_size, self.eval_max_size)
        canvas = self._canvas_for(s)
        h, w = s["image"].shape[:2]
        if h > canvas[0] or w > canvas[1]:
            s = fit_to_canvas(s, canvas)
        return s

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(order)

        pools: Dict[Tuple[int, int], List[dict]] = {
            self.canvas_land: [],
            self.canvas_port: [],
        }
        batch_idx = 0
        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            for s in ex.map(self._prepare, order):
                canvas = self._canvas_for(s)
                pool = pools[canvas]
                pool.append(s)
                if len(pool) == self.batch_size:
                    yield self._pack(pool, canvas, batch_idx)
                    batch_idx += 1
                    pool.clear()
        if not self.drop_last:
            for canvas, pool in pools.items():
                if pool:
                    # top up with duplicates to keep shapes static
                    while len(pool) < self.batch_size:
                        pool.append(pool[-1])
                    yield self._pack(pool, canvas, batch_idx)
                    batch_idx += 1


class DevicePrefetcher:
    """Background thread moving host batches to device (the reference's
    CUDA-stream prefetcher, util/collate_fn.py:17-49, minus the streams —
    jax device_put is already async)."""

    def __init__(self, loader, put_fn, depth: int = 2):
        self.loader = loader
        self.put_fn = put_fn
        self.depth = depth

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        END = object()

        def worker():
            try:
                for batch in self.loader:
                    q.put(self.put_fn(batch))
            finally:
                q.put(END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is END:
                break
            yield item
