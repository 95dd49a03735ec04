"""StableHLO export CLI: random-init export + export-from-checkpoint
(the reference exports a TRAINED model, tools/pytorch2onnx.py:83-143 —
the --checkpoint path restores orbax weights before export and the
built-in numerical verification must pass)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast lane

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


def _cpu_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    return env


def _make_tiny_checkpoint(tmp_path):
    from salience_detr_tpu.models.bricks.criterion import Targets
    from salience_detr_tpu.models.factory import SalienceDETRConfig, build_salience_detr
    from salience_detr_tpu.parallel.train_step import TrainState
    from salience_detr_tpu.utils.checkpoint import CheckpointManager

    cfg = SalienceDETRConfig(
        backbone="resnet18", embed_dim=32, num_classes=5, num_queries=24,
        num_encoder_layers=2, num_decoder_layers=2, num_heads=4,
        dim_feedforward=64, topk_sa=12, layer_filter_ratio=(1.0, 0.5),
        denoising_nums=4, dn_max_gt=2, max_num_embedding=16,
        shared_sampling_locations=True, min_size=96, max_size=128,
        select_box_nums_for_evaluation=20,
    )
    model, _, _, _ = build_salience_detr(cfg)
    B, H, W, M = 1, 96, 128, 4
    targets = Targets(
        jnp.zeros((B, M), jnp.int32), jnp.full((B, M, 4), 0.5),
        jnp.ones((B, M), bool),
    )
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(3),
             "denoising": jax.random.PRNGKey(4),
             "dropout": jax.random.PRNGKey(5)},
            jnp.zeros((B, H, W, 3)), jnp.full((B, 2), 32, jnp.int32),
            targets, train=True,
        )
    )()
    state = TrainState(
        step=jnp.asarray(9, jnp.int32), params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}), opt_state=None,
    )
    ckpt_dir = tmp_path / "ckpt"
    CheckpointManager(str(ckpt_dir)).save(0, jax.device_get(state))
    return cfg, model, variables, ckpt_dir


def test_export_from_checkpoint(tmp_path):
    _, _, _, ckpt_dir = _make_tiny_checkpoint(tmp_path)

    model_cfg = tmp_path / "tiny_model.py"
    model_cfg.write_text(TINY_MODEL_SRC)
    out_path = tmp_path / "model.stablehlo"
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export.py"),
         "--model-config", str(model_cfg), "--checkpoint", str(ckpt_dir),
         "--height", "96", "--width", "128", "--batch", "1",
         "--output", str(out_path)],
        capture_output=True, text=True, timeout=3000, env=_cpu_env(), cwd=REPO,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert out_path.exists() and out_path.stat().st_size > 0
    assert "restored checkpoint" in result.stdout
    assert "verification passed" in result.stdout


def test_exported_detector_matches_live_pipeline(tmp_path):
    """--with-postprocess + ExportedDetector reproduce the live inference
    pipeline (preprocess -> forward -> PostProcess -> score filter) on a
    non-canvas-sized image — the deployment path the reference covers with
    ONNXDetector (tools/pytorch2onnx.py:18-53)."""
    from salience_detr_tpu.data.loader import pack_batch
    from salience_detr_tpu.data.transforms import shortest_size
    from salience_detr_tpu.models.detectors.salience_detr import normalize_images
    from salience_detr_tpu.models.factory import build_salience_detr

    cfg, model, variables, ckpt_dir = _make_tiny_checkpoint(tmp_path)

    model_cfg = tmp_path / "tiny_model.py"
    model_cfg.write_text(TINY_MODEL_SRC)
    out_path = tmp_path / "model_post.stablehlo"
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export.py"),
         "--model-config", str(model_cfg), "--checkpoint", str(ckpt_dir),
         "--height", "96", "--width", "128", "--batch", "1",
         "--output", str(out_path), "--with-postprocess"],
        capture_output=True, text=True, timeout=3000, env=_cpu_env(), cwd=REPO,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    assert "verification passed" in result.stdout

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from export import ExportedDetector
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(11)
    image = rng.integers(0, 255, (73, 111, 3), dtype=np.uint8)
    det = ExportedDetector(
        str(out_path), min_size=cfg.min_size, max_size=cfg.max_size,
        score_threshold=0.05,
    )
    assert det.batch == 1 and det.canvas == (96, 128)
    got = det(image)

    # live pipeline on the same image
    _, _, _, postprocess = build_salience_detr(cfg)
    s = {"image": image, "boxes": np.zeros((0, 4), np.float32),
         "labels": np.zeros((0,), np.int64), "orig_size": image.shape[:2]}
    s = shortest_size(s, cfg.min_size, cfg.max_size)
    batch = pack_batch([s], (96, 128), max_gt=1)
    out = model.apply(
        {k: v for k, v in variables.items() if k in ("params", "frozen", "batch_stats")},
        normalize_images(jnp.asarray(batch["images"], jnp.float32) / 255.0),
        jnp.asarray(batch["image_sizes"]), train=False,
    )
    want = jax.device_get(
        postprocess(out["pred_class"][-1], out["pred_coord"][-1], jnp.asarray(batch["orig_sizes"]))
    )
    keep = want["valid"][0].astype(bool) & (want["scores"][0] > 0.05)
    np.testing.assert_allclose(got["boxes"], want["boxes"][0][keep], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got["scores"], want["scores"][0][keep], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got["labels"], want["labels"][0][keep])
