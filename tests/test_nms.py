"""Grid NMS and generic NMS vs a naive sequential greedy reference."""

import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.ops.nms import grid_nms_topk, nms_keep_mask

SHAPES = [(10, 14), (5, 7), (3, 4)]
STARTS = np.concatenate([[0], np.cumsum([h * w for h, w in SHAPES])])
TOTAL = int(STARTS[-1])


def naive_greedy_grid_nms(topk_index, iou_threshold=0.3):
    """Sequential greedy NMS on the 2x2 boxes of the reference
    (/root/reference/models/bricks/salience_transformer.py:249-295)."""
    boxes, levels = [], []
    for t in topk_index:
        lvl = int(np.searchsorted(STARTS[1:], t, side="right"))
        h, w = SHAPES[lvl]
        sp = t - STARTS[lvl]
        x, y = sp % w, sp // w
        boxes.append((x - 1.0, y - 1.0, x + 1.0, y + 1.0))
        levels.append(lvl)
    kept = []
    for i in range(len(topk_index)):
        ok = True
        for j in kept:
            if levels[i] != levels[j]:
                continue
            bi, bj = boxes[i], boxes[j]
            x0, y0 = max(bi[0], bj[0]), max(bi[1], bj[1])
            x1, y1 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(0, x1 - x0) * max(0, y1 - y0)
            iou = inter / (8.0 - inter)
            if iou > iou_threshold:
                ok = False
                break
        if ok:
            kept.append(i)
    return [topk_index[i] for i in kept]


def naive_greedy_nms(boxes, iou_threshold):
    kept = []
    for i in range(len(boxes)):
        ok = True
        for j in kept:
            x0 = max(boxes[i][0], boxes[j][0]); y0 = max(boxes[i][1], boxes[j][1])
            x1 = min(boxes[i][2], boxes[j][2]); y1 = min(boxes[i][3], boxes[j][3])
            inter = max(0, x1 - x0) * max(0, y1 - y0)
            a1 = (boxes[i][2] - boxes[i][0]) * (boxes[i][3] - boxes[i][1])
            a2 = (boxes[j][2] - boxes[j][0]) * (boxes[j][3] - boxes[j][1])
            if inter / (a1 + a2 - inter) > iou_threshold:
                ok = False
                break
        if ok:
            kept.append(i)
    return kept


class TestGridNMS:
    def test_matches_naive(self):
        rng = np.random.default_rng(0)
        for trial in range(5):
            K = 60
            topk = rng.choice(TOTAL, size=K, replace=False).astype(np.int32)
            want = naive_greedy_grid_nms(topk)
            num_out = min(len(want), 40)
            got = np.asarray(grid_nms_topk(jnp.asarray(topk), SHAPES, num_out))
            np.testing.assert_array_equal(got, want[:num_out])

    def test_fill_when_too_few_survivors(self):
        # dense clump on level 0 -> many suppressed; ask for more than survive
        topk = np.arange(40, dtype=np.int32)  # contiguous tokens, row 0-2 of level 0
        want = naive_greedy_grid_nms(topk)
        got = np.asarray(grid_nms_topk(jnp.asarray(topk), SHAPES, 30))
        assert len(want) < 30
        np.testing.assert_array_equal(got[: len(want)], want)
        # remaining filled with best-rank suppressed candidates
        suppressed = [t for t in topk if t not in want]
        np.testing.assert_array_equal(got[len(want) :], suppressed[: 30 - len(want)])


class TestGenericNMS:
    def test_matches_naive(self):
        rng = np.random.default_rng(1)
        n = 50
        xy = rng.uniform(0, 10, (n, 2))
        wh = rng.uniform(1, 4, (n, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        keep = np.asarray(nms_keep_mask(jnp.asarray(boxes), 0.5))
        want = naive_greedy_nms(boxes, 0.5)
        np.testing.assert_array_equal(np.nonzero(keep)[0], want)
