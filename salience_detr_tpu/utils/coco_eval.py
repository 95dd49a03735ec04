"""Native COCO detection evaluation (numpy), replacing pycocotools.

Behavioral spec: the COCOeval bbox protocol as used by the reference
(/root/reference/util/coco_eval.py:14-144, util/engine.py:100-179): IoU
thresholds 0.50:0.05:0.95, 101 recall points, area ranges
all/small/medium/large, maxDets (1, 10, 100), crowd-aware greedy matching,
and the standard 12-metric summary.  Implemented from the published protocol
directly — this image has no pycocotools, so the evaluator is a first-class
framework component with its own unit tests.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = (1, 10, 100)

METRIC_NAMES = [
    "AP", "AP50", "AP75", "APs", "APm", "APl",
    "AR1", "AR10", "AR100", "ARs", "ARm", "ARl",
]


def _default_all_gather():
    """Multi-host object all-gather via jax multihost_utils, or None when
    single-process (the common case — no jax import cost on that path
    matters; jax is already loaded by the caller)."""
    try:
        import pickle

        import jax

        if jax.process_count() <= 1:
            return None
        from jax.experimental import multihost_utils
        import numpy as _np

        def gather(obj):
            payload = _np.frombuffer(pickle.dumps(obj), _np.uint8)
            # pad to the global max length so all_gather shapes agree
            n = _np.asarray([payload.size], _np.int32)
            sizes = multihost_utils.process_allgather(n).reshape(-1)
            maxn = int(sizes.max())
            padded = _np.zeros((maxn,), _np.uint8)
            padded[: payload.size] = payload
            gathered = multihost_utils.process_allgather(padded)
            return [
                pickle.loads(gathered[i, : int(sizes[i])].tobytes())
                for i in range(gathered.shape[0])
            ]

        return gather
    except Exception:
        return None


def box_iou_xywh(dt: np.ndarray, gt: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """IoU matrix between xywh detections (D,4) and gts (G,4); crowd gts use
    intersection-over-detection-area."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    dx0, dy0 = dt[:, 0], dt[:, 1]
    dx1, dy1 = dt[:, 0] + dt[:, 2], dt[:, 1] + dt[:, 3]
    gx0, gy0 = gt[:, 0], gt[:, 1]
    gx1, gy1 = gt[:, 0] + gt[:, 2], gt[:, 1] + gt[:, 3]
    ix = np.clip(
        np.minimum(dx1[:, None], gx1[None]) - np.maximum(dx0[:, None], gx0[None]), 0, None
    )
    iy = np.clip(
        np.minimum(dy1[:, None], gy1[None]) - np.maximum(dy0[:, None], gy0[None]), 0, None
    )
    inter = ix * iy
    darea = (dt[:, 2] * dt[:, 3])[:, None]
    garea = (gt[:, 2] * gt[:, 3])[None]
    union = np.where(iscrowd[None].astype(bool), darea, darea + garea - inter)
    return inter / np.maximum(union, 1e-12)


class CocoEvaluator:
    """Incremental evaluator: update() with per-image predictions, then
    accumulate()/summarize()."""

    def __init__(self, coco_index, iou_types: Sequence[str] = ("bbox",), use_native: bool = True):
        assert list(iou_types) == ["bbox"], "only bbox supported"
        self.coco = coco_index
        self.cat_ids = list(coco_index.cat_ids)
        self.predictions: Dict[int, dict] = {}
        self.img_ids: List[int] = []
        self._native = None
        if use_native:
            try:
                from salience_detr_tpu.native import cocoeval_lib

                self._native = cocoeval_lib()
            except Exception:
                self._native = None

    def update(self, predictions: Dict[int, dict]):
        """predictions: {image_id: {"boxes" (N,4 xyxy), "scores", "labels"}}."""
        for img_id, pred in predictions.items():
            self.img_ids.append(img_id)
            boxes = np.asarray(pred["boxes"], np.float64).reshape(-1, 4)
            xywh = boxes.copy()
            xywh[:, 2:] -= xywh[:, :2]
            self.predictions[img_id] = {
                "boxes": xywh,
                "scores": np.asarray(pred["scores"], np.float64),
                "labels": np.asarray(pred["labels"], np.int64),
            }

    def synchronize_between_processes(self, all_gather_fn=None):
        """Merge predictions across hosts (the reference pickles through NCCL,
        /root/reference/util/coco_eval.py:46-51).

        Default: when running multi-host (jax.process_count() > 1), gather via
        ``multihost_utils.process_allgather`` on the byte-serialized prediction
        dicts — the GSPMD-world equivalent of the reference's pickle
        all_gather.  A custom ``all_gather_fn(obj) -> list[obj]`` overrides
        (used by tests)."""
        if all_gather_fn is None:
            all_gather_fn = _default_all_gather()
            if all_gather_fn is None:
                return
        merged = all_gather_fn(self.predictions)
        out = {}
        for d in merged:
            out.update(d)
        self.predictions = out
        self.img_ids = list(out.keys())

    # ------------------------------------------------------------ evaluation

    def _gt_for(self, img_id: int, cat_id: int):
        anns = [a for a in self.coco.annotations(img_id) if a["category_id"] == cat_id]
        boxes = np.asarray([a["bbox"] for a in anns], np.float64).reshape(-1, 4)
        iscrowd = np.asarray([a.get("iscrowd", 0) for a in anns], np.int64)
        area = np.asarray([a.get("area", b[2] * b[3]) for a, b in zip(anns, boxes)], np.float64)
        return boxes, iscrowd, area

    def _evaluate_img(self, img_id, cat_id, area_rng, max_det):
        gt_boxes, gt_crowd, gt_area = self._gt_for(img_id, cat_id)
        pred = self.predictions.get(
            img_id, {"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "labels": np.zeros(0, np.int64)}
        )
        sel = pred["labels"] == cat_id
        dt_boxes = pred["boxes"][sel]
        dt_scores = pred["scores"][sel]
        if len(gt_boxes) == 0 and len(dt_boxes) == 0:
            return None

        gt_ignore = gt_crowd.astype(bool) | (gt_area < area_rng[0]) | (gt_area > area_rng[1])
        # sort gts: non-ignored first (stable)
        g_order = np.argsort(gt_ignore, kind="stable")
        gt_boxes = gt_boxes[g_order]
        gt_crowd_s = gt_crowd[g_order]
        gt_ignore = gt_ignore[g_order]

        d_order = np.argsort(-dt_scores, kind="stable")[:max_det]
        dt_boxes = dt_boxes[d_order]
        dt_scores = dt_scores[d_order]

        T = len(IOU_THRS)
        D = len(dt_boxes)
        G = len(gt_boxes)

        if self._native is not None and D > 0:
            import ctypes as ct

            dt_c = np.ascontiguousarray(dt_boxes, np.float64)
            gt_c = np.ascontiguousarray(gt_boxes, np.float64)
            crowd_c = np.ascontiguousarray(gt_crowd_s != 0, np.uint8)
            ign_c = np.ascontiguousarray(gt_ignore, np.uint8)
            thrs_c = np.ascontiguousarray(IOU_THRS, np.float64)
            matched = np.zeros((T, D), np.uint8)
            ignored = np.zeros((T, D), np.uint8)
            p64 = lambda a: a.ctypes.data_as(ct.POINTER(ct.c_double))
            p8 = lambda a: a.ctypes.data_as(ct.POINTER(ct.c_uint8))
            self._native.evaluate_img(
                p64(dt_c), D, p64(gt_c), G, p8(crowd_c), p8(ign_c),
                p64(thrs_c), T, float(area_rng[0]), float(area_rng[1]),
                p8(matched), p8(ignored),
            )
            return {
                "dt_scores": dt_scores,
                "dt_matched": matched.astype(bool),
                "dt_ignore": ignored.astype(bool),
                "num_gt": int((~gt_ignore).sum()),
            }

        ious = box_iou_xywh(dt_boxes, gt_boxes, gt_crowd_s)
        dt_match = np.zeros((T, D), np.int64) - 1
        gt_match = np.zeros((T, G), np.int64) - 1
        for t, thr in enumerate(IOU_THRS):
            for d in range(D):
                best = -1
                best_iou = min(thr, 1 - 1e-10)
                for g in range(G):
                    if gt_match[t, g] >= 0 and not gt_crowd_s[g]:
                        continue
                    # gts are sorted non-ignored first: once we have a match to
                    # a real gt, stop when reaching ignored ones
                    if best >= 0 and not gt_ignore[best] and gt_ignore[g]:
                        break
                    if ious[d, g] < best_iou:
                        continue
                    best_iou = ious[d, g]
                    best = g
                if best >= 0:
                    dt_match[t, d] = best
                    gt_match[t, best] = d

        dt_area = dt_boxes[:, 2] * dt_boxes[:, 3]
        dt_out_of_range = (dt_area < area_rng[0]) | (dt_area > area_rng[1])
        dt_ignore = np.zeros((T, D), bool)
        for t in range(T):
            matched = dt_match[t] >= 0
            ign_of_match = np.zeros(D, bool)
            ign_of_match[matched] = gt_ignore[dt_match[t][matched]]
            dt_ignore[t] = ign_of_match | (~matched & dt_out_of_range)

        return {
            "dt_scores": dt_scores,
            "dt_matched": dt_match >= 0,
            "dt_ignore": dt_ignore,
            "num_gt": int((~gt_ignore).sum()),
        }

    def accumulate(self):
        img_ids = sorted(set(self.img_ids) & set(self.coco.img_ids)) or sorted(
            set(self.coco.img_ids)
        )
        K = len(self.cat_ids)
        A = len(AREA_RANGES)
        M = len(MAX_DETS)
        T = len(IOU_THRS)
        R = len(REC_THRS)
        self.precision = -np.ones((T, R, K, A, M))
        self.recall = -np.ones((T, K, A, M))
        self.scores = -np.ones((T, R, K, A, M))

        for k, cat_id in enumerate(self.cat_ids):
            for a, area_rng in enumerate(AREA_RANGES.values()):
                per_img = [
                    self._evaluate_img(i, cat_id, area_rng, max(MAX_DETS)) for i in img_ids
                ]
                for m, max_det in enumerate(MAX_DETS):
                    results = []
                    num_gt = 0
                    for r in per_img:
                        if r is None:
                            continue
                        num_gt += r["num_gt"]
                        results.append(
                            (r["dt_scores"][:max_det], r["dt_matched"][:, :max_det],
                             r["dt_ignore"][:, :max_det])
                        )
                    if num_gt == 0:
                        continue
                    if results:
                        scores = np.concatenate([x[0] for x in results])
                        matched = np.concatenate([x[1] for x in results], axis=1)
                        ignored = np.concatenate([x[2] for x in results], axis=1)
                    else:
                        scores = np.zeros(0)
                        matched = np.zeros((T, 0), bool)
                        ignored = np.zeros((T, 0), bool)
                    order = np.argsort(-scores, kind="mergesort")
                    scores = scores[order]
                    matched = matched[:, order]
                    ignored = ignored[:, order]

                    tp = np.cumsum(matched & ~ignored, axis=1).astype(np.float64)
                    fp = np.cumsum(~matched & ~ignored, axis=1).astype(np.float64)
                    for t in range(T):
                        tp_t, fp_t = tp[t], fp[t]
                        rc = tp_t / num_gt
                        pr = tp_t / np.maximum(tp_t + fp_t, np.spacing(1))
                        self.recall[t, k, a, m] = rc[-1] if len(rc) else 0.0
                        # monotone precision envelope from the right
                        pr = pr.tolist()
                        for i in range(len(pr) - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        q = np.zeros(R)
                        s = np.zeros(R)
                        for ri, pi in enumerate(inds):
                            if pi < len(pr):
                                q[ri] = pr[pi]
                                s[ri] = scores[pi]
                        self.precision[t, :, k, a, m] = q
                        self.scores[t, :, k, a, m] = s

    # ------------------------------------------------------------- summaries

    def _summarize(self, ap: bool, iou_thr: Optional[float], area: str, max_det: int):
        a = list(AREA_RANGES).index(area)
        m = MAX_DETS.index(max_det)
        if ap:
            s = self.precision[:, :, :, a, m]
            if iou_thr is not None:
                s = s[[np.argmin(np.abs(IOU_THRS - iou_thr))]]
        else:
            s = self.recall[:, :, a, m]
            if iou_thr is not None:
                s = s[[np.argmin(np.abs(IOU_THRS - iou_thr))]]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else -1.0

    def summarize(self) -> Dict[str, float]:
        stats = {
            "AP": self._summarize(True, None, "all", 100),
            "AP50": self._summarize(True, 0.5, "all", 100),
            "AP75": self._summarize(True, 0.75, "all", 100),
            "APs": self._summarize(True, None, "small", 100),
            "APm": self._summarize(True, None, "medium", 100),
            "APl": self._summarize(True, None, "large", 100),
            "AR1": self._summarize(False, None, "all", 1),
            "AR10": self._summarize(False, None, "all", 10),
            "AR100": self._summarize(False, None, "all", 100),
            "ARs": self._summarize(False, None, "small", 100),
            "ARm": self._summarize(False, None, "medium", 100),
            "ARl": self._summarize(False, None, "large", 100),
        }
        return stats

    def per_category_table(self) -> str:
        """Per-category AP/AR100 table (the reference prints an AsciiTable,
        /root/reference/util/engine.py:146-174)."""
        rows = []
        for k, cat_id in enumerate(self.cat_ids):
            p = self.precision[:, :, k, 0, MAX_DETS.index(100)]
            r = self.recall[:, k, 0, MAX_DETS.index(100)]
            ap = float(np.mean(p[p > -1])) if (p > -1).any() else float("nan")
            ar = float(np.mean(r[r > -1])) if (r > -1).any() else float("nan")
            name = self.coco.cats.get(cat_id, {}).get("name", str(cat_id))
            rows.append((name, ap, ar))
        width = max((len(r[0]) for r in rows), default=8)
        lines = [f"{'category':<{width}}  {'AP':>7}  {'AR100':>7}"]
        for name, ap, ar in rows:
            lines.append(f"{name:<{width}}  {ap:7.3f}  {ar:7.3f}")
        return "\n".join(lines)
