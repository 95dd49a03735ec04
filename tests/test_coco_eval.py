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


class TestRLE:
    def test_roundtrip_random_masks(self):
        from salience_detr_tpu.utils.coco_eval import rle_area, rle_decode, rle_encode

        rng = np.random.default_rng(0)
        for _ in range(10):
            h, w = rng.integers(1, 40, 2)
            mask = rng.random((h, w)) > 0.6
            rle = rle_encode(mask)
            assert rle["counts"][0] >= 0 and sum(rle["counts"]) == h * w
            np.testing.assert_array_equal(rle_decode(rle), mask)
            assert rle_area(rle) == int(mask.sum())

    def test_column_major_layout(self):
        from salience_detr_tpu.utils.coco_eval import rle_encode

        # COCO RLE runs go down columns: a full first COLUMN of a 3x2 mask is
        # the first 3 elements of the flattening
        mask = np.zeros((3, 2), bool)
        mask[:, 0] = True
        assert rle_encode(mask)["counts"] == [0, 3, 3]

    def test_string_codec_hand_case(self):
        from salience_detr_tpu.utils.coco_eval import (
            rle_string_decode, rle_string_encode,
        )

        # counts [1, 3]: single base-32 chunks, chars offset by 48
        assert rle_string_encode([1, 3]) == "13"
        assert rle_string_decode("13") == [1, 3]

    def test_string_codec_roundtrip_with_deltas(self):
        from salience_detr_tpu.utils.coco_eval import (
            rle_string_decode, rle_string_encode,
        )

        rng = np.random.default_rng(1)
        for _ in range(20):
            counts = [int(c) for c in rng.integers(0, 10_000, rng.integers(1, 30))]
            assert rle_string_decode(rle_string_encode(counts)) == counts

    def test_decode_accepts_compressed_string_counts(self):
        from salience_detr_tpu.utils.coco_eval import (
            rle_decode, rle_encode, rle_string_encode,
        )

        rng = np.random.default_rng(2)
        mask = rng.random((17, 23)) > 0.5
        raw = rle_encode(mask)
        compressed = {"size": raw["size"], "counts": rle_string_encode(raw["counts"])}
        np.testing.assert_array_equal(rle_decode(compressed), mask)


class TestMaskIoU:
    def test_basic_and_crowd(self):
        from salience_detr_tpu.utils.coco_eval import mask_iou

        dt = np.zeros((1, 10, 10), bool)
        dt[0, :5] = True  # 50 px
        gt = np.zeros((2, 10, 10), bool)
        gt[0, :5] = True  # identical
        gt[1, 2:8] = True  # 60 px, overlap rows 2-4 = 30 px
        ious = mask_iou(dt, gt, np.array([0, 0]))
        assert ious[0, 0] == pytest.approx(1.0)
        assert ious[0, 1] == pytest.approx(30 / 80)
        # crowd: intersection over dt area
        ious_crowd = mask_iou(dt, gt, np.array([0, 1]))
        assert ious_crowd[0, 1] == pytest.approx(30 / 50)


class TestSegmEval:
    def test_perfect_segm_and_namespacing(self, tmp_path):
        from salience_detr_tpu.utils.coco_eval import _gt_mask

        # polygon exactly covering a square; dt mask = its own rasterization
        a = ann(1, 1, 1, 10, 10, 40, 40)
        a["segmentation"] = [[10, 10, 50, 10, 50, 50, 10, 50]]
        idx = make_index(
            tmp_path,
            [{"id": 1, "width": 100, "height": 100, "file_name": "a.jpg"}],
            [a],
            [{"id": 1, "name": "cat"}],
        )
        ev = CocoEvaluator(idx, iou_types=("bbox", "segm"))
        dt_mask = _gt_mask(a, 100, 100)
        ev.update({
            1: {"boxes": np.array([[10, 10, 50, 50]], float),
                "scores": np.array([0.9]), "labels": np.array([1]),
                "masks": dt_mask[None]},
        })
        ev.accumulate()
        s = ev.summarize()
        assert s["AP"] == pytest.approx(1.0)  # primary (bbox), flat names
        assert s["segm_AP"] == pytest.approx(1.0)
        assert s["segm_AR100"] == pytest.approx(1.0)

    def test_segm_diverges_from_bbox(self, tmp_path):
        # dt box matches gt box exactly, but the dt MASK misses half the gt
        # mask: bbox AP stays 1.0 while segm AP drops
        a = ann(1, 1, 1, 0, 0, 40, 40)
        a["segmentation"] = [[0, 0, 39, 0, 39, 39, 0, 39]]
        idx = make_index(
            tmp_path,
            [{"id": 1, "width": 100, "height": 100, "file_name": "a.jpg"}],
            [a],
            [{"id": 1, "name": "cat"}],
        )
        ev = CocoEvaluator(idx, iou_types=("bbox", "segm"))
        half = np.zeros((100, 100), bool)
        half[0:20, 0:40] = True  # top half of the gt square
        ev.update({
            1: {"boxes": np.array([[0, 0, 40, 40]], float),
                "scores": np.array([0.9]), "labels": np.array([1]),
                "masks": half[None]},
        })
        ev.accumulate()
        s = ev.summarize()
        assert s["AP"] == pytest.approx(1.0)
        # mask IoU is exactly 0.5: passes only the 0.50 threshold -> AP 1/10
        assert s["segm_AP"] == pytest.approx(0.1, abs=1e-6)

    def test_soft_mask_threshold(self, tmp_path):
        # (N, 1, h, w) float masks are thresholded at 0.5 like the
        # reference's prepare_for_coco_segmentation
        a = ann(1, 1, 1, 0, 0, 10, 10)
        a["segmentation"] = [[0, 0, 9, 0, 9, 9, 0, 9]]
        idx = make_index(
            tmp_path,
            [{"id": 1, "width": 20, "height": 20, "file_name": "a.jpg"}],
            [a],
            [{"id": 1, "name": "cat"}],
        )
        from salience_detr_tpu.utils.coco_eval import _gt_mask

        soft = _gt_mask(a, 20, 20).astype(float) * 0.9  # 0.9 fg / 0.0 bg
        ev = CocoEvaluator(idx, iou_types=("segm",))
        ev.update({
            1: {"boxes": np.array([[0, 0, 10, 10]], float),
                "scores": np.array([0.9]), "labels": np.array([1]),
                "masks": soft[None, None]},
        })
        ev.accumulate()
        s = ev.summarize()
        assert s["AP"] == pytest.approx(1.0)  # segm primary -> flat names


class TestKeypointEval:
    def _kp_index(self, tmp_path, gt_kps, area=40 * 40):
        a = ann(1, 1, 1, 10, 10, 40, 40)
        a["keypoints"] = [float(v) for v in np.asarray(gt_kps).reshape(-1)]
        a["num_keypoints"] = int((np.asarray(gt_kps).reshape(-1, 3)[:, 2] > 0).sum())
        a["area"] = area
        return make_index(
            tmp_path,
            [{"id": 1, "width": 100, "height": 100, "file_name": "a.jpg"}],
            [a],
            [{"id": 1, "name": "person"}],
        )

    def test_exact_keypoints_ap1(self, tmp_path):
        rng = np.random.default_rng(0)
        gt = np.concatenate(
            [rng.uniform(15, 45, (17, 2)), np.full((17, 1), 2.0)], -1
        )
        idx = self._kp_index(tmp_path, gt)
        ev = CocoEvaluator(idx, iou_types=("keypoints",))
        ev.update({
            1: {"boxes": np.array([[10, 10, 50, 50]], float),
                "scores": np.array([0.9]), "labels": np.array([1]),
                "keypoints": gt[None]},
        })
        ev.accumulate()
        s = ev.summarize()
        assert s["AP"] == pytest.approx(1.0)
        assert s["AR"] == pytest.approx(1.0)
        assert "APm" in s and "APs" not in s  # keypoint metric layout

    def test_far_keypoints_ap0(self, tmp_path):
        gt = np.concatenate(
            [np.full((17, 2), 20.0), np.full((17, 1), 2.0)], -1
        )
        idx = self._kp_index(tmp_path, gt)
        dt = gt.copy()
        dt[:, :2] += 500.0  # hopelessly far
        ev = CocoEvaluator(idx, iou_types=("keypoints",))
        ev.update({
            1: {"boxes": np.array([[10, 10, 50, 50]], float),
                "scores": np.array([0.9]), "labels": np.array([1]),
                "keypoints": dt[None]},
        })
        ev.accumulate()
        assert ev.summarize()["AP"] == pytest.approx(0.0)

    def test_oks_hand_value(self):
        from salience_detr_tpu.utils.coco_eval import KPT_OKS_SIGMAS, oks_matrix

        # one visible keypoint (the nose, sigma 0.026), dt offset by d=4 px,
        # gt area 1600: e = d^2 / (2*sigma)^2 / (area + eps) / 2
        gt = np.zeros((1, 17, 3))
        gt[0, 0] = [30, 30, 2]
        dt = np.zeros((1, 17, 3))
        dt[0, 0] = [34, 30, 1]
        got = oks_matrix(dt, gt, np.array([1600.0]), np.array([[10, 10, 40, 40]]))
        e = 4.0**2 / (2 * KPT_OKS_SIGMAS[0]) ** 2 / (1600 + np.spacing(1)) / 2
        assert got[0, 0] == pytest.approx(np.exp(-e))

    def test_unlabeled_gt_ignored(self, tmp_path):
        # a gt with zero visible keypoints must be ignored, so an unmatched
        # detection near it is ignored-by-match rather than a false positive
        # only if it matches; with no visible kps OKS falls back to the
        # doubled-box test, so a dt inside the box is ignored
        gt = np.zeros((17, 3))
        idx = self._kp_index(tmp_path, gt)
        dt = np.zeros((1, 17, 3))
        dt[0, :, 0] = 30.0
        dt[0, :, 1] = 30.0
        dt[0, :, 2] = 1.0
        ev = CocoEvaluator(idx, iou_types=("keypoints",))
        ev.update({
            1: {"boxes": np.array([[10, 10, 50, 50]], float),
                "scores": np.array([0.9]), "labels": np.array([1]),
                "keypoints": dt},
        })
        ev.accumulate()
        # no usable gt at all -> AP stays undefined (-1, pycocotools
        # convention when num_gt == 0)
        assert ev.summarize()["AP"] == pytest.approx(-1.0)


class TestConvertToCocoApi:
    """convert_to_coco_api / get_coco_index_from_dataset (reference
    util/coco_utils.py:29-88): arbitrary datasets become evaluable."""

    class _ToyDataset:
        """Non-COCO dataset emitting the framework sample contract."""

        def __init__(self):
            self.samples = [
                {
                    "image": np.zeros((100, 120, 3), np.uint8),
                    "boxes": np.array([[10, 10, 50, 50], [60, 20, 100, 80]], np.float32),
                    "labels": np.array([3, 7]),
                    "image_id": 11,
                },
                {
                    "image": np.zeros((80, 80, 3), np.uint8),
                    "boxes": np.array([[0, 0, 40, 40]], np.float32),
                    "labels": np.array([3]),
                    "iscrowd": np.array([1]),
                    "image_id": 12,
                },
            ]

        def __len__(self):
            return len(self.samples)

        def get_raw(self, i):
            return self.samples[i]

    def test_index_structure(self):
        from salience_detr_tpu.utils.coco_utils import convert_to_coco_api

        idx = convert_to_coco_api(self._ToyDataset())
        assert idx.img_ids == [11, 12]
        assert idx.cat_ids == [3, 7]
        assert idx.imgs[11]["height"] == 100 and idx.imgs[11]["width"] == 120
        anns = idx.annotations(11)
        assert [a["bbox"] for a in anns] == [[10, 10, 40, 40], [60, 20, 40, 60]]
        assert [a["area"] for a in anns] == [1600, 2400]
        assert idx.annotations(12)[0]["iscrowd"] == 1
        # unique, 1-based annotation ids across images
        ids = [a["id"] for i in idx.img_ids for a in idx.annotations(i)]
        assert ids == [1, 2, 3]

    def test_perfect_predictions_score_ap1(self):
        from salience_detr_tpu.utils.coco_utils import convert_to_coco_api

        ds = self._ToyDataset()
        ev = CocoEvaluator(convert_to_coco_api(ds))
        ev.update({
            11: {
                "boxes": np.array([[10, 10, 50, 50], [60, 20, 100, 80]], float),
                "scores": np.array([0.9, 0.8]),
                "labels": np.array([3, 7]),
            },
            12: {
                "boxes": np.zeros((0, 4)),
                "scores": np.zeros((0,)),
                "labels": np.zeros((0,), int),
            },
        })
        ev.accumulate()
        assert ev.summarize()["AP"] == pytest.approx(1.0)

    def test_get_index_unwraps_and_shortcuts(self, tmp_path):
        from salience_detr_tpu.utils.coco_utils import get_coco_index_from_dataset

        idx = make_index(
            tmp_path,
            [{"id": 1, "width": 10, "height": 10, "file_name": "a.jpg"}],
            [ann(1, 1, 1, 1, 1, 5, 5)],
            [{"id": 1, "name": "c"}],
        )

        class Holder:
            coco = idx

        class Wrapper:  # Subset-style nesting
            dataset = Holder()

        assert get_coco_index_from_dataset(Wrapper()) is idx
        assert get_coco_index_from_dataset(self._ToyDataset()).img_ids == [11, 12]

    def test_mask_annotations_roundtrip(self):
        from salience_detr_tpu.utils.coco_eval import rle_decode
        from salience_detr_tpu.utils.coco_utils import convert_to_coco_api

        ds = self._ToyDataset()
        m = np.zeros((2, 100, 120), bool)
        m[0, 10:50, 10:50] = True
        m[1, 20:80, 60:100] = True
        ds.samples[0]["masks"] = m
        idx = convert_to_coco_api(ds)
        got = rle_decode(idx.annotations(11)[0]["segmentation"])
        np.testing.assert_array_equal(got, m[0])
