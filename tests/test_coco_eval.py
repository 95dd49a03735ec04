"""Unit tests for the native COCO evaluator against hand-computable cases."""

import json

import numpy as np
import pytest

from salience_detr_tpu.data.coco import CocoIndex
from salience_detr_tpu.utils.coco_eval import CocoEvaluator


def make_index(tmp_path, images, annotations, categories):
    p = tmp_path / "ann.json"
    p.write_text(json.dumps({
        "images": images, "annotations": annotations, "categories": categories,
    }))
    return CocoIndex(str(p))


def ann(aid, img, cat, x, y, w, h, iscrowd=0):
    return {
        "id": aid, "image_id": img, "category_id": cat,
        "bbox": [x, y, w, h], "area": w * h, "iscrowd": iscrowd,
    }


class TestCocoEval:
    def test_perfect_predictions(self, tmp_path):
        idx = make_index(
            tmp_path,
            [{"id": 1, "width": 100, "height": 100, "file_name": "a.jpg"}],
            [ann(1, 1, 1, 10, 10, 40, 40), ann(2, 1, 2, 50, 50, 20, 20)],
            [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}],
        )
        ev = CocoEvaluator(idx)
        ev.update({
            1: {
                "boxes": np.array([[10, 10, 50, 50], [50, 50, 70, 70]], float),
                "scores": np.array([0.9, 0.8]),
                "labels": np.array([1, 2]),
            }
        })
        ev.accumulate()
        s = ev.summarize()
        assert s["AP"] == pytest.approx(1.0)
        assert s["AP50"] == pytest.approx(1.0)
        assert s["AR100"] == pytest.approx(1.0)

    def test_no_predictions(self, tmp_path):
        idx = make_index(
            tmp_path,
            [{"id": 1, "width": 100, "height": 100, "file_name": "a.jpg"}],
            [ann(1, 1, 1, 10, 10, 40, 40)],
            [{"id": 1, "name": "cat"}],
        )
        ev = CocoEvaluator(idx)
        ev.update({1: {"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "labels": np.zeros(0, int)}})
        ev.accumulate()
        assert ev.summarize()["AP"] == pytest.approx(0.0)

    def test_half_iou_prediction(self, tmp_path):
        # dt overlaps gt with IoU ~0.68: TP for thr<=0.65, FP for thr>=0.70
        idx = make_index(
            tmp_path,
            [{"id": 1, "width": 200, "height": 200, "file_name": "a.jpg"}],
            [ann(1, 1, 1, 0, 0, 100, 100)],
            [{"id": 1, "name": "cat"}],
        )
        ev = CocoEvaluator(idx)
        # dt box [0,0,100,82] vs gt [0,0,100,100]: inter 8200, union 10000 -> 0.82
        ev.update({
            1: {"boxes": np.array([[0, 0, 100, 82]], float),
                "scores": np.array([0.9]), "labels": np.array([1])}
        })
        ev.accumulate()
        s = ev.summarize()
        # IoU 0.82 passes thresholds 0.50..0.80 (7 of 10)
        assert s["AP"] == pytest.approx(0.7, abs=1e-6)
        assert s["AP50"] == pytest.approx(1.0)
        assert s["AP75"] == pytest.approx(1.0)

    def test_false_positive_lowers_precision(self, tmp_path):
        idx = make_index(
            tmp_path,
            [{"id": 1, "width": 200, "height": 200, "file_name": "a.jpg"}],
            [ann(1, 1, 1, 0, 0, 50, 50)],
            [{"id": 1, "name": "cat"}],
        )
        ev = CocoEvaluator(idx)
        # high-scoring FP first, then perfect TP
        ev.update({
            1: {"boxes": np.array([[100, 100, 150, 150], [0, 0, 50, 50]], float),
                "scores": np.array([0.95, 0.9]), "labels": np.array([1, 1])}
        })
        ev.accumulate()
        s = ev.summarize()
        # precision at the single recall point is 1/2
        assert s["AP"] == pytest.approx(0.5, abs=1e-6)
        assert s["AR100"] == pytest.approx(1.0)

    def test_crowd_gt_ignored(self, tmp_path):
        idx = make_index(
            tmp_path,
            [{"id": 1, "width": 200, "height": 200, "file_name": "a.jpg"}],
            [ann(1, 1, 1, 0, 0, 50, 50), ann(2, 1, 1, 100, 100, 80, 80, iscrowd=1)],
            [{"id": 1, "name": "cat"}],
        )
        ev = CocoEvaluator(idx)
        # detection inside the crowd region is matched-to-crowd -> ignored,
        # not a false positive
        ev.update({
            1: {"boxes": np.array([[0, 0, 50, 50], [110, 110, 170, 170]], float),
                "scores": np.array([0.9, 0.85]), "labels": np.array([1, 1])}
        })
        ev.accumulate()
        s = ev.summarize()
        assert s["AP"] == pytest.approx(1.0)

    def test_area_ranges(self, tmp_path):
        # one small (20x20=400) and one large (120x120=14400) gt
        idx = make_index(
            tmp_path,
            [{"id": 1, "width": 500, "height": 500, "file_name": "a.jpg"}],
            [ann(1, 1, 1, 0, 0, 20, 20), ann(2, 1, 1, 200, 200, 120, 120)],
            [{"id": 1, "name": "cat"}],
        )
        ev = CocoEvaluator(idx)
        # only the small gt is detected
        ev.update({
            1: {"boxes": np.array([[0, 0, 20, 20]], float),
                "scores": np.array([0.9]), "labels": np.array([1])}
        })
        ev.accumulate()
        s = ev.summarize()
        assert s["APs"] == pytest.approx(1.0)
        assert s["APl"] == pytest.approx(0.0)
        assert s["AP"] == pytest.approx(0.5, abs=0.01)

    def test_per_category_table(self, tmp_path):
        idx = make_index(
            tmp_path,
            [{"id": 1, "width": 100, "height": 100, "file_name": "a.jpg"}],
            [ann(1, 1, 1, 10, 10, 40, 40)],
            [{"id": 1, "name": "cat"}],
        )
        ev = CocoEvaluator(idx)
        ev.update({
            1: {"boxes": np.array([[10, 10, 50, 50]], float),
                "scores": np.array([0.9]), "labels": np.array([1])}
        })
        ev.accumulate()
        table = ev.per_category_table()
        assert "cat" in table and "1.000" in table


class TestMultiHostMerge:
    def test_fake_two_process_gather(self, tmp_path):
        """synchronize_between_processes must union predictions from all
        hosts (reference pickle all_gather, util/coco_eval.py:46-51,152-171)."""
        idx = make_index(
            tmp_path,
            [{"id": i, "width": 100, "height": 100, "file_name": f"{i}.jpg"}
             for i in (1, 2)],
            [ann(1, 1, 1, 10, 10, 40, 40), ann(2, 2, 1, 50, 50, 20, 20)],
            [{"id": 1, "name": "cat"}],
        )
        pred1 = {1: {"boxes": np.array([[10, 10, 50, 50]], float),
                     "scores": np.array([0.9]), "labels": np.array([1])}}
        pred2 = {2: {"boxes": np.array([[50, 50, 70, 70]], float),
                     "scores": np.array([0.8]), "labels": np.array([1])}}

        # rank-0 evaluator only saw image 1; the fake gather adds rank 1's
        ev = CocoEvaluator(idx)
        ev.update(pred1)
        other = CocoEvaluator(idx)
        other.update(pred2)

        def fake_gather(obj):
            return [obj, other.predictions]

        ev.synchronize_between_processes(all_gather_fn=fake_gather)
        assert set(ev.predictions) == {1, 2}
        ev.accumulate()
        s = ev.summarize()
        assert s["AP"] == pytest.approx(1.0)

    def test_single_process_default_is_noop(self, tmp_path):
        idx = make_index(
            tmp_path,
            [{"id": 1, "width": 100, "height": 100, "file_name": "a.jpg"}],
            [ann(1, 1, 1, 10, 10, 40, 40)],
            [{"id": 1, "name": "cat"}],
        )
        ev = CocoEvaluator(idx)
        ev.update({1: {"boxes": np.array([[10, 10, 50, 50]], float),
                       "scores": np.array([0.9]), "labels": np.array([1])}})
        ev.synchronize_between_processes()  # jax.process_count()==1 -> no-op
        assert set(ev.predictions) == {1}
