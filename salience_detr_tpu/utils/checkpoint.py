"""Orbax checkpointing: full train state + best-metric snapshots + weight
conversion from reference PyTorch checkpoints.

Behavioral spec: /root/reference/main.py:64-92,149-154,186 (save_state every
epoch with total_limit=5, resume from newest checkpoint_N),
util/utils.py:250-269 (HighestCheckpoint best-ap snapshots), :370-423
(weights-only load with tolerant shape filtering).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except Exception:  # pragma: no cover
    ocp = None


class CheckpointManager:
    """Epoch checkpoints with retention + named best snapshots."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        assert ocp is not None, "orbax-checkpoint unavailable"
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, force: bool = False, metadata: Optional[Dict] = None):
        self.manager.save(step, args=ocp.args.StandardSave(state), force=force)
        self.manager.wait_until_finished()
        if metadata is not None:
            self.write_metadata(metadata)

    def write_metadata(self, metadata: Dict):
        """Run metadata (class vocabulary etc.) riding with the checkpoints —
        the reference stores int-encoded class names inside the .pth
        (main.py:139-141, util/misc.py:190-223); here a JSON sidecar makes the
        checkpoint directory self-describing."""
        with open(os.path.join(self.directory, "metadata.json"), "w") as f:
            json.dump(metadata, f)

    def read_metadata(self) -> Optional[Dict]:
        path = os.path.join(self.directory, "metadata.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def restore_weights(self, step: Optional[int] = None) -> Optional[Dict]:
        """Weights-only restore for eval/export: returns
        ``{step, params, frozen, batch_stats}`` as host numpy trees, without
        needing an optimizer-state template (a train checkpoint stores the
        full AdamW state; an eval process has no matching template — the
        reference's eval load is likewise weights-only, test.py:107-112)."""
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        restored = self.manager.restore(step, args=ocp.args.StandardRestore())
        get = (lambda k: restored.get(k)) if isinstance(restored, dict) else (
            lambda k: getattr(restored, k, None)
        )
        return {
            "step": get("step"),
            "params": get("params") or {},
            "frozen": get("frozen") or {},
            "batch_stats": get("batch_stats") or {},
        }

    def save_named(self, name: str, state: Any):
        """Best-metric snapshot (best_ap / best_ap50)."""
        path = os.path.join(self.directory, name)
        ckpt = ocp.StandardCheckpointer()
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        ckpt.save(path, state)
        ckpt.wait_until_finished()

    def restore_named(self, name: str, state_template: Any) -> Any:
        path = os.path.join(self.directory, name)
        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(path, state_template)


class HighestCheckpoint:
    """Track best AP / AP50 and snapshot on improvement
    (/root/reference/util/utils.py:250-269)."""

    def __init__(self, manager: CheckpointManager):
        self.manager = manager
        self.best_ap = -1.0
        self.best_ap50 = -1.0

    def update(self, state: Any, ap: float, ap50: float):
        if ap > self.best_ap:
            self.best_ap = ap
            self.manager.save_named("best_ap", state)
        if ap50 > self.best_ap50:
            self.best_ap50 = ap50
            self.manager.save_named("best_ap50", state)


def load_torch_weights(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth state dict into numpy arrays (for conversion)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for wrapper in ("model", "state_dict"):
        if isinstance(ckpt, dict) and wrapper in ckpt and isinstance(ckpt[wrapper], dict):
            ckpt = ckpt[wrapper]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in ckpt.items()}


def tolerant_update(params: Dict, updates: Dict[str, Any], logger=None):
    """Shape-checked parameter update: mismatched keys are skipped with a
    report (the reference prints an AsciiTable, util/utils.py:385-423)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    mismatches, applied = [], 0
    flat_params = dict(
        ("/".join(str(getattr(k, "key", k)) for k in path), leaf)
        for path, leaf in flat[0]
    )
    out = dict(flat_params)
    for name, value in updates.items():
        if name not in flat_params:
            mismatches.append((name, "missing", value.shape))
            continue
        if tuple(flat_params[name].shape) != tuple(value.shape):
            mismatches.append((name, tuple(flat_params[name].shape), tuple(value.shape)))
            continue
        out[name] = value
        applied += 1
    if logger and mismatches:
        for name, expected, got in mismatches[:50]:
            logger.warning(f"skip weight {name}: expected {expected}, got {got}")
    leaves = [out[k] for k, _ in flat_params.items()]
    return jax.tree_util.tree_unflatten(flat[1], leaves), applied, mismatches
