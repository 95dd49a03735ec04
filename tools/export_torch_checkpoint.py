"""Export a trained orbax checkpoint as a reference-layout torch .pth.

The inverse of `test.py --torch-checkpoint`: weights trained in THIS
framework become a state dict the reference implementation
(/root/reference/test.py:107-112, util/utils.py:370-423) can load directly —
and that our own converter round-trips bit-exactly
(tests/test_weight_converter.py::test_export_torch_state_dict_roundtrips).

The model config must use checkpoint-exact sampling (per-head, the default
`exact` mode): the TPU hybrid's re-shaped encoder sampling-offset head has no
reference-layout counterpart and would be reported as skipped.

Usage:
    python tools/export_torch_checkpoint.py \
        --model-config configs/salience_detr/salience_detr_resnet50_800_1333.py \
        --checkpoint /path/to/output/checkpoints --out weights.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-config", required=True)
    p.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    p.add_argument("--out", required=True, help=".pth destination")
    args = p.parse_args()

    import numpy as np
    import torch

    from salience_detr_tpu.models.factory import build_salience_detr
    from salience_detr_tpu.utils.checkpoint import CheckpointManager
    from salience_detr_tpu.utils.config import Config
    from salience_detr_tpu.utils.logging_utils import setup_logger
    from salience_detr_tpu.utils.weight_converter import (
        export_torch_state_dict,
        salience_detr_rules,
    )

    logger = setup_logger("export_torch")
    model_cfg = Config(args.model_config).model_config
    build_salience_detr(model_cfg)  # validates the config composes

    restored = CheckpointManager(args.checkpoint).restore_weights()
    if restored is None:
        raise SystemExit(f"no checkpoint found under {args.checkpoint}")
    variables = {
        "params": restored["params"],
        "frozen": restored["frozen"],
        "batch_stats": restored["batch_stats"] or {},
    }
    rules = salience_detr_rules(
        model_cfg.backbone, tuple(model_cfg.stage_with_dcn),
        num_encoder_layers=model_cfg.num_encoder_layers,
        num_decoder_layers=model_cfg.num_decoder_layers,
        num_levels=model_cfg.num_feature_levels,
        num_channel_mapper_convs=model_cfg.num_feature_levels,
    )
    state, skipped = export_torch_state_dict(variables, rules)
    if skipped:
        logger.warning(
            f"{len(skipped)} params had no reference-layout slot "
            f"(non-exact sampling config?): {skipped[:5]}"
        )
    torch.save(
        {"model": {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}},
        args.out,
    )
    logger.info(f"wrote {len(state)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
