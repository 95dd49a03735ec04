"""Pretrained/reference weight loading through the real CLI paths.

Builds synthetic torch state dicts (shapes derived by inverting the converter
rules against the actual flax parameter tree), saves them with torch.save,
and round-trips them through:

* ``load_pretrained_backbone`` (the ``train.py --pretrained-backbone`` path,
  mirroring the reference's in-factory ImageNet load, reference
  resnet.py:398-426);
* ``train.py --pretrained-backbone`` end to end (slow lane);
* ``test.py --torch-checkpoint`` end to end (the reference's released-.pth
  evaluation, reference test.py:107-112; slow lane).
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salience_detr_tpu.models.bricks.criterion import Targets
from salience_detr_tpu.models.factory import SalienceDETRConfig, build_salience_detr
from salience_detr_tpu.utils.weight_converter import (
    backbone_rules,
    flatten_variables,
    load_pretrained_backbone,
    salience_detr_rules,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_MODEL_SRC = (
    "import jax.numpy as jnp\n"
    "from salience_detr_tpu.models.factory import SalienceDETRConfig\n"
    "model_config = SalienceDETRConfig(\n"
    "    backbone='resnet18', embed_dim=32, num_classes=5, num_queries=24,\n"
    "    num_encoder_layers=2, num_decoder_layers=2, num_heads=4,\n"
    "    dim_feedforward=64, topk_sa=12, layer_filter_ratio=(1.0, 0.5),\n"
    "    denoising_nums=4, dn_max_gt=2, max_num_embedding=16,\n"
    "    shared_sampling_locations=True, min_size=96, max_size=128,\n"
    "    select_box_nums_for_evaluation=20,\n"
    ")\n"
)

TINY_CFG = dict(
    backbone="resnet18", embed_dim=32, num_classes=5, num_queries=24,
    num_encoder_layers=2, num_decoder_layers=2, num_heads=4,
    dim_feedforward=64, topk_sa=12, layer_filter_ratio=(1.0, 0.5),
    denoising_nums=4, dn_max_gt=2, max_num_embedding=16,
    shared_sampling_locations=True, min_size=96, max_size=128,
    select_box_nums_for_evaluation=20,
)


def _variable_shapes(cfg: SalienceDETRConfig):
    model, _, _, _ = build_salience_detr(cfg)
    B, H, W, M = 1, 64, 64, 4
    targets = Targets(
        jnp.zeros((B, M), jnp.int32), jnp.full((B, M, 4), 0.5),
        jnp.ones((B, M), bool),
    )
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "denoising": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            jnp.zeros((B, H, W, 3)), jnp.full((B, 2), 32, jnp.int32),
            targets, train=True,
        )
    )
    return jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)


def _invert(kind: str, flax_value: np.ndarray) -> np.ndarray:
    """flax array -> the torch-layout array that converts back to it."""
    if kind == "copy":
        return flax_value
    if kind == "flatten":
        return flax_value.reshape(flax_value.shape[0], 1, 1)
    if kind == "conv":
        return np.transpose(flax_value, (3, 2, 0, 1))
    if kind == "linear":
        return np.transpose(flax_value, (1, 0))
    if kind == "dcn_kernel":
        kk, cin, f = flax_value.shape
        k = int(round(kk ** 0.5))
        return np.transpose(flax_value.reshape(k, k, cin, f), (3, 2, 0, 1))
    raise ValueError(kind)


def _sane_random(dst: str, shape, rng) -> np.ndarray:
    """Random values that keep a forward pass numerically healthy: positive
    BN variances, ~1 scales, fan-in-scaled kernels (raw N(0,1) weights
    explode through a deep net and trip the NaN abort)."""
    leaf = dst.rsplit("/", 1)[-1]
    if leaf == "var":
        return rng.uniform(0.5, 1.5, size=shape).astype(np.float32)
    if leaf == "scale":
        return rng.uniform(0.8, 1.2, size=shape).astype(np.float32)
    if leaf in ("mean", "bias"):
        return (0.01 * rng.normal(size=shape)).astype(np.float32)
    fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else int(shape[0])
    std = 1.0 / np.sqrt(max(fan_in, 1))
    return (std * rng.normal(size=shape)).astype(np.float32)


def synthesize_torch_state(rules, flat_vars, rng) -> dict:
    """Build a torch-layout state dict whose conversion exactly reproduces
    randomized flax values (returned via mutated flat_vars)."""
    state = {}
    by_src = {}
    for src, dst, kind in rules:
        by_src.setdefault(src, []).append((dst, kind))
    for src, entries in by_src.items():
        if entries[0][1].startswith("inproj"):
            parts = []
            for dst, kind in sorted(entries, key=lambda e: e[1]):
                flat_vars[dst] = _sane_random(dst, flat_vars[dst].shape, rng)
                if kind.startswith("inproj_w"):
                    parts.append(np.transpose(flat_vars[dst], (1, 0)))
                else:
                    parts.append(flat_vars[dst])
            state[src] = np.concatenate(parts, axis=0)
        else:
            (dst, kind), = entries
            flat_vars[dst] = _sane_random(dst, flat_vars[dst].shape, rng)
            state[src] = _invert(kind, flat_vars[dst])
    return state


def _save_pth(state, path):
    import torch

    torch.save({k: torch.from_numpy(v) for k, v in state.items()}, path)


def test_load_pretrained_backbone_roundtrip(tmp_path):
    """Bare ImageNet-style names -> backbone params AND frozen BN stats."""
    cfg = SalienceDETRConfig(**TINY_CFG)
    variables = _variable_shapes(cfg)
    flat = flatten_variables(variables)

    rules = [
        (src[len("backbone."):], dst, kind)
        for src, dst, kind in backbone_rules("resnet18")
    ]
    rng = np.random.default_rng(0)
    torch_state = synthesize_torch_state(rules, flat, rng)
    # typical ImageNet file extras the tolerant load must skip
    torch_state["fc.weight"] = rng.normal(size=(1000, 512)).astype(np.float32)
    torch_state["fc.bias"] = np.zeros((1000,), np.float32)
    pth = tmp_path / "r18_imagenet.pth"
    _save_pth(torch_state, str(pth))

    updated = load_pretrained_backbone(variables, str(pth), backbone="resnet18")
    flat_updated = flatten_variables(updated)
    for _, dst, _ in rules:
        np.testing.assert_allclose(
            flat_updated[dst], flat[dst], rtol=0, atol=0,
            err_msg=dst,
        )
    # frozen BN statistics must land in the frozen collection
    assert any(dst.startswith("frozen/") for _, dst, _ in rules)
    # non-backbone params untouched
    head_keys = [k for k in flat_updated if "/transformer/" in k]
    assert head_keys
    for k in head_keys[:5]:
        np.testing.assert_array_equal(flat_updated[k], 0.0)


def test_load_pretrained_backbone_rejects_garbage(tmp_path):
    cfg = SalienceDETRConfig(**TINY_CFG)
    variables = _variable_shapes(cfg)
    _save_pth({"not_a_real_key": np.zeros((3, 3), np.float32)},
              str(tmp_path / "junk.pth"))
    with pytest.raises(ValueError, match="applied 0"):
        load_pretrained_backbone(
            variables, str(tmp_path / "junk.pth"), backbone="resnet18"
        )


@pytest.fixture
def synthetic_coco(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        img_dir = tmp_path / split
        img_dir.mkdir()
        images, annotations = [], []
        aid = 0
        for i in range(4):
            h, w = 96, 128
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
            images.append(
                {"id": i, "file_name": f"{i}.jpg", "height": h, "width": w}
            )
            for _ in range(3):
                x, y = rng.uniform(5, 60, 2)
                bw, bh = rng.uniform(10, 30, 2)
                annotations.append({
                    "id": aid, "image_id": i,
                    "category_id": int(rng.integers(1, 4)),
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "area": float(bw * bh), "iscrowd": 0,
                })
                aid += 1
        ann = {"images": images, "annotations": annotations,
               "categories": [{"id": c, "name": f"c{c}"} for c in (1, 2, 3)]}
        (tmp_path / f"{split}.json").write_text(json.dumps(ann))
    return tmp_path


def _cpu_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    return env


@pytest.mark.slow
def test_train_cli_pretrained_backbone(synthetic_coco, tmp_path):
    cfg = SalienceDETRConfig(**TINY_CFG)
    variables = _variable_shapes(cfg)
    flat = flatten_variables(variables)
    rules = [
        (src[len("backbone."):], dst, kind)
        for src, dst, kind in backbone_rules("resnet18")
    ]
    torch_state = synthesize_torch_state(rules, flat, np.random.default_rng(1))
    pth = tmp_path / "r18_imagenet.pth"
    _save_pth(torch_state, str(pth))

    model_cfg = tmp_path / "tiny_model.py"
    model_cfg.write_text(TINY_MODEL_SRC)
    train_cfg = tmp_path / "tiny_train.py"
    train_cfg.write_text(
        f"num_epochs = 1\nbatch_size = 2\nnum_workers = 2\nprint_freq = 1\n"
        f"max_norm = 0.1\noutput_dir = r'{tmp_path / 'out'}'\n"
        f"train_transform = 'hflip'\n"
        f"train_img_folder = r'{synthetic_coco / 'train'}'\n"
        f"train_ann_file = r'{synthetic_coco / 'train.json'}'\n"
        f"test_img_folder = r'{synthetic_coco / 'val'}'\n"
        f"test_ann_file = r'{synthetic_coco / 'val.json'}'\n"
        f"model_path = r'{model_cfg}'\nresume_from_checkpoint = None\n"
        f"learning_rate = 1e-4\ntrain_canvas = (96, 128)\nmax_gt = 8\n"
    )
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config-file", str(train_cfg), "--seed", "0",
         "--mixed-precision", "no", "--dry-run-steps", "1",
         "--pretrained-backbone", str(pth)],
        capture_output=True, text=True, timeout=3000, env=_cpu_env(), cwd=REPO,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    log_text = (tmp_path / "out" / "log.rank0.txt").read_text()
    assert "Loaded pretrained backbone" in log_text, log_text[-2000:]
    assert "applied=" in log_text


@pytest.mark.slow
def test_eval_cli_torch_checkpoint(synthetic_coco, tmp_path):
    """Full-model reference-style .pth -> test.py --torch-checkpoint.

    The synthesized checkpoint carries the reference's per-head (exact)
    sampling-offset heads, while the model config requests the TPU hybrid
    fast path — test.py must force checkpoint-exact sampling so every key
    merges (no silently-skipped offsets head)."""
    cfg = SalienceDETRConfig(**{**TINY_CFG, "shared_sampling_locations": False})
    variables = _variable_shapes(cfg)
    flat = flatten_variables(variables)
    rules = salience_detr_rules(
        backbone="resnet18",
        num_encoder_layers=cfg.num_encoder_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        num_levels=cfg.num_feature_levels,
        num_channel_mapper_convs=cfg.num_feature_levels,
    )
    torch_state = synthesize_torch_state(rules, flat, np.random.default_rng(2))
    pth = tmp_path / "salience_detr_tiny.pth"
    _save_pth(torch_state, str(pth))

    model_cfg = tmp_path / "tiny_model.py"
    model_cfg.write_text(TINY_MODEL_SRC)
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "test.py"),
         "--coco-img", str(synthetic_coco / "val"),
         "--coco-ann", str(synthetic_coco / "val.json"),
         "--model-config", str(model_cfg),
         "--torch-checkpoint", str(pth),
         "--batch-size", "2", "--canvas", "96", "128"],
        capture_output=True, text=True, timeout=3000, env=_cpu_env(), cwd=REPO,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    out = result.stdout + result.stderr
    assert "Converted torch checkpoint" in out
    assert "forcing checkpoint-exact" in out
