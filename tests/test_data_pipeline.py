"""Host data pipeline tests: transforms geometry, COCO parsing, bucketed
fixed-canvas batching (pure numpy — fast)."""

import json
import os
import random

import numpy as np
import pytest

from salience_detr_tpu.data import transforms as T
from salience_detr_tpu.data.coco import CocoDetection
from salience_detr_tpu.data.loader import DetectionLoader, pack_batch


def sample(h=100, w=160, n=3, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    xy = rng.uniform(0, [w * 0.6, h * 0.6], (n, 2))
    wh = rng.uniform(8, [w * 0.3, h * 0.3], (n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    labels = rng.integers(0, 5, n).astype(np.int64)
    return {"image": img, "boxes": boxes, "labels": labels}


class TestTransforms:
    def test_hflip_involution(self):
        s = sample()
        out = T.hflip(T.hflip(s))
        np.testing.assert_array_equal(out["image"], s["image"])
        np.testing.assert_allclose(out["boxes"], s["boxes"], atol=1e-5)

    def test_shortest_size_geometry(self):
        s = sample(h=100, w=160)
        out = T.shortest_size(s, 50, max_size=70)
        h, w = out["image"].shape[:2]
        # r = min(50/100, 70/160) = 0.4375; reference TRUNCATES: int(43.75)=43
        assert (h, w) == (43, 70)
        scale = np.array([70 / 160, 43 / 100, 70 / 160, 43 / 100])
        np.testing.assert_allclose(out["boxes"], s["boxes"] * scale, rtol=1e-5)

    def test_shortest_size_matches_reference_geometry_golden(self):
        """Golden sweep vs the reference formulas: EvalResize truncates via
        the int-dtype cast (base_detector.py:44-49) and RandomShortestSize
        via int() (transforms/v2/_geometry.py:1354-1360) — new = int(dim*r),
        never round().  A one-pixel disagreement shifts COCO boxes."""
        cases = [
            (480, 640), (640, 480), (427, 640), (500, 375), (1333, 800),
            (123, 4567), (800, 800), (799, 1333), (96, 128),
        ]
        for h, w in cases:
            s = sample(h=h, w=w)
            out = T.shortest_size(s, 800, max_size=1333)
            r = min(800 / min(h, w), 1333 / max(h, w))
            assert out["image"].shape[:2] == (int(h * r), int(w * r)), (h, w)

    def test_crop_clamps_boxes(self):
        s = sample()
        out = T.crop(s, 10, 20, 50, 60)
        assert out["image"].shape[:2] == (50, 60)
        assert (out["boxes"][:, [0, 2]] <= 60).all()
        assert (out["boxes"][:, [1, 3]] <= 50).all()
        assert (out["boxes"] >= 0).all()

    def test_sanitize_drops_degenerate(self):
        s = sample()
        s["boxes"][0] = [10, 10, 10.2, 50]  # degenerate width
        out = T.sanitize(s)
        assert len(out["boxes"]) == len(s["boxes"]) - 1
        assert len(out["labels"]) == len(out["boxes"])

    def test_detr_preset_runs(self):
        rng = random.Random(0)
        for seed in range(5):
            out = T.detr(sample(seed=seed, h=300, w=400), rng)
            assert out["image"].ndim == 3
            assert len(out["boxes"]) == len(out["labels"])


class TestMixTransforms:
    class _FakeDataset:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return sample(h=90 + 10 * i, w=120, n=2, seed=i)

    def test_mosaic(self):
        t = T.Mosaic((64, 64))
        t.set_dataset(self._FakeDataset())
        rng = random.Random(0)
        out = t(sample(h=100, w=140, n=3), rng)
        assert out["image"].shape == (128, 128, 3)
        assert len(out["boxes"]) == len(out["labels"])

    def test_mixup(self):
        t = T.MixUp(p=1.0)
        t.set_dataset(self._FakeDataset())
        rng = random.Random(0)
        s = sample(h=100, w=140, n=3)
        out = t(s, rng)
        assert len(out["boxes"]) > len(s["boxes"])
        assert out["image"].dtype == np.uint8

    def test_photometric_and_zoomout(self):
        rng = random.Random(0)
        s = sample()
        out = T.RandomPhotometricDistort(p=1.0)(s, rng)
        assert out["image"].shape == s["image"].shape
        out = T.RandomZoomOut(p=1.0)(s, rng)
        assert out["image"].shape[0] >= s["image"].shape[0]
        # boxes stay inside the new canvas
        assert (out["boxes"][:, 2] <= out["image"].shape[1]).all()

    def test_preset_wiring_via_dataset(self, tmp_path):
        # CocoDetection wires set_dataset through nested Compose
        import cv2, json

        img_dir = tmp_path / "im"
        img_dir.mkdir()
        cv2.imwrite(str(img_dir / "0.jpg"), np.zeros((64, 64, 3), np.uint8))
        ann = {
            "images": [{"id": 0, "file_name": "0.jpg", "height": 64, "width": 64}],
            "annotations": [{"id": 0, "image_id": 0, "category_id": 1,
                             "bbox": [5, 5, 20, 20], "area": 400, "iscrowd": 0}],
            "categories": [{"id": 1, "name": "x"}],
        }
        (tmp_path / "a.json").write_text(json.dumps(ann))
        ds = CocoDetection(str(img_dir), str(tmp_path / "a.json"), transforms=T.PRESETS["mosaic"])
        mosaic_t = ds.transforms.transforms[0]
        assert mosaic_t.dataset is not None
        s = ds[0]
        assert s["image"].ndim == 3


class TestPackBatch:
    def test_padding_and_normalization(self):
        s1 = sample(h=80, w=120, n=2)
        s2 = sample(h=60, w=100, n=5, seed=1)
        batch = pack_batch([s1, s2], canvas_hw=(96, 128), max_gt=4)
        assert batch["images"].shape == (2, 96, 128, 3)
        np.testing.assert_array_equal(batch["image_sizes"], [[80, 120], [60, 100]])
        # padding region is zero
        assert batch["images"][0, 80:].sum() == 0
        # boxes normalized cxcywh on the valid area
        assert batch["gt_valid"][0].sum() == 2
        assert batch["gt_valid"][1].sum() == 4  # truncated to max_gt
        b = batch["boxes"][0, 0]
        x0, y0, x1, y1 = s1["boxes"][0]
        np.testing.assert_allclose(
            b, [(x0 + x1) / 2 / 120, (y0 + y1) / 2 / 80, (x1 - x0) / 120, (y1 - y0) / 80],
            rtol=1e-5,
        )

    def test_degenerate_box_raises(self):
        """Reference's in-model degenerate-box assert (base_detector.py:
        100-112) lives in the host loader here, where a real error can name
        the offending box."""
        s = sample(h=80, w=120, n=2)
        s["boxes"][1] = [50.0, 40.0, 50.0, 60.0]  # zero width
        with pytest.raises(ValueError, match="positive height and width"):
            pack_batch([s], canvas_hw=(96, 128), max_gt=4)


class TestCocoDataset:
    @pytest.fixture
    def dataset_dir(self, tmp_path):
        import cv2

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        images, annotations = [], []
        rng = np.random.default_rng(0)
        for i in range(4):
            h, w = int(rng.integers(60, 100)), int(rng.integers(80, 140))
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
            images.append({"id": i, "file_name": f"{i}.jpg", "height": h, "width": w})
            if i != 2:  # image 2 has no annotations
                annotations.append({
                    "id": i * 10, "image_id": i, "category_id": 1,
                    "bbox": [5, 5, 20, 20], "area": 400, "iscrowd": 0,
                })
        ann = {"images": images, "annotations": annotations,
               "categories": [{"id": 1, "name": "thing"}]}
        ann_file = tmp_path / "ann.json"
        ann_file.write_text(json.dumps(ann))
        return str(img_dir), str(ann_file)

    def test_train_filters_empty(self, dataset_dir):
        img_dir, ann_file = dataset_dir
        ds_all = CocoDetection(img_dir, ann_file, train=False)
        ds_train = CocoDetection(img_dir, ann_file, train=True)
        assert len(ds_all) == 4
        assert len(ds_train) == 3

    def test_getitem_contract(self, dataset_dir):
        img_dir, ann_file = dataset_dir
        ds = CocoDetection(img_dir, ann_file)
        s = ds[0]
        assert s["image"].dtype == np.uint8
        assert s["boxes"].shape == (1, 4)
        assert s["labels"].tolist() == [1]

    def test_crowd_annotations_filtered(self, tmp_path):
        """Crowd anns never reach training samples, and a crowd-only image is
        dropped by the train filter (ConvertCocoPolysToMask semantics,
        /root/reference/transforms/convert_coco_polys_to_mask.py +
        datasets/coco.py:98-133); the evaluator side (crowd gt = ignore) is
        covered in test_coco_eval.py."""
        import cv2

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rng = np.random.default_rng(3)
        images, annotations = [], []
        for i in range(2):
            h, w = 70, 90
            cv2.imwrite(str(img_dir / f"{i}.jpg"),
                        rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
            images.append({"id": i, "file_name": f"{i}.jpg", "height": h, "width": w})
        # image 0: one normal + one crowd ann; image 1: crowd-only
        annotations = [
            {"id": 1, "image_id": 0, "category_id": 1, "bbox": [5, 5, 20, 20],
             "area": 400, "iscrowd": 0},
            {"id": 2, "image_id": 0, "category_id": 1, "bbox": [30, 30, 40, 30],
             "area": 1200, "iscrowd": 1},
            {"id": 3, "image_id": 1, "category_id": 1, "bbox": [10, 10, 30, 30],
             "area": 900, "iscrowd": 1},
        ]
        ann = {"images": images, "annotations": annotations,
               "categories": [{"id": 1, "name": "thing"}]}
        ann_file = tmp_path / "ann.json"
        ann_file.write_text(json.dumps(ann))

        ds_train = CocoDetection(str(img_dir), str(ann_file), train=True)
        assert len(ds_train) == 1  # crowd-only image dropped
        s = ds_train[0]
        assert s["boxes"].shape == (1, 4)  # crowd ann dropped from image 0
        np.testing.assert_allclose(s["boxes"][0], [5, 5, 25, 25])
        # eval keeps both images (crowd handling is the evaluator's job)
        assert len(CocoDetection(str(img_dir), str(ann_file), train=False)) == 2

    def test_loader_deterministic(self, dataset_dir):
        from salience_detr_tpu.data.transforms import PRESETS

        img_dir, ann_file = dataset_dir
        def batches(seed, epoch):
            ds = CocoDetection(img_dir, ann_file, transforms=PRESETS["detr"])
            loader = DetectionLoader(ds, 2, canvas_hw=(1344, 1344), max_gt=8,
                                     shuffle=True, seed=seed, num_workers=2,
                                     drop_last=False)
            loader.set_epoch(epoch)
            return list(loader)

        a, b = batches(0, 0), batches(0, 0)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["images"], y["images"])
            np.testing.assert_array_equal(x["boxes"], y["boxes"])
        c = batches(0, 1)
        assert any(
            not np.array_equal(x["images"], y["images"]) for x, y in zip(a, c)
        )

    def test_loader_buckets_and_static_shapes(self, dataset_dir):
        img_dir, ann_file = dataset_dir
        ds = CocoDetection(img_dir, ann_file)
        loader = DetectionLoader(
            ds, batch_size=2, canvas_hw=(96, 144), max_gt=8, shuffle=False,
            drop_last=False, num_workers=2,
        )
        batches = list(loader)
        assert len(batches) >= 2
        for b in batches:
            assert b["images"].shape[0] == 2
            assert b["images"].shape[1:] in ((96, 144, 3), (144, 96, 3))
            assert b["boxes"].shape[1] == 8


def sample_with_masks(h=100, w=160, n=3, seed=0):
    s = sample(h, w, n, seed)
    masks = np.zeros((n, h, w), bool)
    for i, b in enumerate(s["boxes"]):
        x0, y0, x1, y1 = (int(round(v)) for v in b)
        masks[i, y0:y1, x0:x1] = True
    s["masks"] = masks
    return s


class TestNewTransforms:
    def test_vflip_involution(self):
        s = sample_with_masks()
        out = T.vflip(T.vflip(s))
        np.testing.assert_array_equal(out["image"], s["image"])
        np.testing.assert_allclose(out["boxes"], s["boxes"], atol=1e-5)
        np.testing.assert_array_equal(out["masks"], s["masks"])

    def test_vflip_boxes(self):
        s = sample(h=100)
        out = T.vflip(s)
        np.testing.assert_allclose(out["boxes"][:, 1], 100 - s["boxes"][:, 3])
        np.testing.assert_allclose(out["boxes"][:, 3], 100 - s["boxes"][:, 1])

    def test_masks_follow_geometry(self):
        s = sample_with_masks()
        out = T.resize(s, (50, 80))
        assert out["masks"].shape == (3, 50, 80)
        out = T.crop(s, 10, 20, 50, 60)
        assert out["masks"].shape == (3, 50, 60)
        out = T.hflip(s)
        np.testing.assert_array_equal(out["masks"], s["masks"][:, :, ::-1])

    def test_random_iou_crop_invariants(self):
        rng = random.Random(3)
        for seed in range(8):
            s = sample(h=200, w=300, seed=seed)
            out = T.RandomIoUCrop()(s, rng)
            h, w = out["image"].shape[:2]
            assert len(out["boxes"]) == len(out["labels"])
            assert len(out["boxes"]) >= 1  # at least one center inside
            assert (out["boxes"][:, [0, 2]] <= w).all()
            assert (out["boxes"][:, [1, 3]] <= h).all()
            assert (out["boxes"] >= 0).all()

    def test_random_shift_boxes(self):
        rng = random.Random(0)
        s = sample(h=100, w=160)
        out = T.RandomShift(0.25, p=1.0)(s, rng)
        assert out["image"].shape == s["image"].shape
        # box widths can only shrink at borders
        w0 = s["boxes"][:, 2] - s["boxes"][:, 0]
        w1 = out["boxes"][:, 2] - out["boxes"][:, 0]
        assert (w1 <= w0 + 1e-4).all()

    def test_photometric_album_ops_preserve_shape(self):
        rng = random.Random(0)
        s = sample()
        for op in (
            T.RandomBrightnessContrast(p=1.0),
            T.RandomRGBShift(p=1.0),
            T.RandomHSV(p=1.0),
            T.RandomJPEG(p=1.0),
            T.RandomChannelShuffle(p=1.0),
            T.RandomBlur(p=1.0),
        ):
            out = op(s, rng)
            assert out["image"].shape == s["image"].shape
            assert out["image"].dtype == np.uint8
            np.testing.assert_array_equal(out["boxes"], s["boxes"])

    def test_new_presets_run(self):
        rng = random.Random(0)
        for name in ("ssdlite", "strong_album", "rtdetr", "lsj_1536"):
            for seed in range(3):
                out = T.PRESETS[name](sample(seed=seed, h=240, w=320), rng)
                assert len(out["boxes"]) == len(out["labels"])
                h, w = out["image"].shape[:2]
                assert (out["boxes"][:, [0, 2]] <= w + 1e-3).all()
                assert (out["boxes"][:, [1, 3]] <= h + 1e-3).all()


    def test_lsj_1536_canvas(self):
        rng = random.Random(0)
        out = T.PRESETS["lsj_1536"](sample(h=240, w=320), rng)
        assert out["image"].shape[:2] == (1536, 1536)

    def test_rtdetr_resizes_to_640(self):
        rng = random.Random(0)
        out = T.PRESETS["rtdetr"](sample(h=240, w=320), rng)
        assert out["image"].shape[:2] == (640, 640)


class TestSimpleCopyPaste:
    def test_pastes_instances(self):
        rng = random.Random(0)
        a = sample_with_masks(seed=1)
        b = sample_with_masks(seed=2)
        out = T.simple_copy_paste([a, b], rng)
        assert len(out) == 2
        # each output must contain at least its pasted partner's instances
        for o, paste in ((out[0], b), (out[1], a)):
            assert len(o["boxes"]) >= 1
            assert len(o["boxes"]) == len(o["labels"]) == len(o["masks"])
            # pasted pixels come from the partner image
            alpha = o["masks"][len(o["masks"]) - 1]
            assert alpha.shape == o["image"].shape[:2]

    def test_pasted_region_pixels_change(self):
        rng = random.Random(0)
        a = sample_with_masks(seed=1)
        b = sample_with_masks(seed=2)
        out = T.simple_copy_paste([a, b], rng)
        # somewhere inside b's mask union, out[0] should differ from a
        union = b["masks"].sum(0) > 0
        diff = (out[0]["image"].astype(int) - a["image"].astype(int))[union]
        assert np.abs(diff).sum() > 0

    def test_no_masks_passthrough(self):
        rng = random.Random(0)
        a, b = sample(seed=1), sample(seed=2)
        out = T.simple_copy_paste([a, b], rng)
        np.testing.assert_array_equal(out[0]["image"], a["image"])


class TestMaskLoadingAndO365:
    @pytest.fixture
    def mask_dataset(self, tmp_path):
        import cv2

        img_dir = tmp_path / "images" / "train" / "b"
        img_dir.mkdir(parents=True)
        (tmp_path / "flat").mkdir()
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / "x.jpg"), img)
        cv2.imwrite(str(tmp_path / "flat" / "x.jpg"), img)
        ann = {
            "images": [{"id": 1, "file_name": "a/b/x.jpg", "height": 64, "width": 80}],
            "annotations": [{
                "id": 1, "image_id": 1, "category_id": 1,
                "bbox": [10, 10, 20, 20], "area": 400.0, "iscrowd": 0,
                "segmentation": [[10, 10, 30, 10, 30, 30, 10, 30]],
            }],
            "categories": [{"id": 1, "name": "c"}],
        }
        (tmp_path / "ann.json").write_text(json.dumps(ann))
        return tmp_path

    def test_return_masks_rasterizes_polygons(self, mask_dataset):
        ds = CocoDetection(
            str(mask_dataset / "images" / "train" / "b"), str(mask_dataset / "ann.json"),
            return_masks=True,
        )
        # remap the nested file name to the flat copy for plain CocoDetection
        ds.coco.imgs[1]["file_name"] = "x.jpg"
        s = ds.get_raw(0)
        m = s["masks"]
        assert m.shape == (1, 64, 80)
        assert m[0, 20, 20]  # inside the square polygon
        assert not m[0, 50, 50]
        # mask area approximates the polygon (inclusive rasterization)
        assert 380 <= m[0].sum() <= 480

    def test_object365_path_remap(self, mask_dataset):
        from salience_detr_tpu.data.coco import Object365Detection

        ds = Object365Detection(
            str(mask_dataset), str(mask_dataset / "ann.json"), train=True,
        )
        s = ds.get_raw(0)  # file_name a/b/x.jpg -> images/train/b/x.jpg
        assert s["image"].shape == (64, 80, 3)
