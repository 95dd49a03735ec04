"""One-command mAP-parity runbook rehearsal (VERDICT r4 #6).

The north-star acceptance gate is COCO val2017 mAP parity with a released
reference checkpoint (/root/reference/test.py:74-140, README.md:65: R50
50.0).  Real weights and COCO data cannot exist in this environment, so this
tool rehearses the COMPLETE pipeline — reference-layout .pth -> converter ->
checkpoint-exact per-head eval at the real 800x1344 canvas on the TPU — so
that real-weight parity is push-button the moment weights/data exist:

    # the single command, once you have the real artifacts:
    python test.py \
        --model-config configs/salience_detr/salience_detr_resnet50_800_1333.py \
        --torch-checkpoint salience_detr_resnet50_800_1333_coco_1x.pth \
        --coco-img data/coco/val2017 \
        --coco-ann data/coco/annotations/instances_val2017.json
    # acceptance: AP=0.500 AP50=0.677 AP75=0.542 (reference README.md:65)

What this rehearsal does instead of real weights/data:
1. builds the real R50 model (full dims), jit-initializes it, and exports a
   COMPLETE reference-layout .pth via the inverse converter
   (export_torch_state_dict) — healthy-init values, every tensor present at
   the real shapes;
2. generates a small synthetic val set at the real canvas;
3. runs the EXACT command above (test.py --torch-checkpoint) as a
   subprocess, which forces checkpoint-exact per-head sampling, converts and
   merges every tensor, and evaluates end-to-end;
4. records conversion coverage and the measured exact-mode eval throughput.

Writes docs/parity_runbook_r5.json.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/parity_runbook")
    p.add_argument("--n-images", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--timeout", type=int, default=3600)
    p.add_argument("--out", default="docs/parity_runbook_r5.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from tools.quality_campaign_r5 import make_rich_dataset
    from salience_detr_tpu.models.bricks.criterion import Targets
    from salience_detr_tpu.models.factory import SalienceDETRConfig, build_salience_detr
    from salience_detr_tpu.utils.weight_converter import (
        export_torch_state_dict,
        salience_detr_rules,
    )

    os.makedirs(args.workdir, exist_ok=True)

    # 1. full-dims reference-layout checkpoint from a real healthy init
    cfg = SalienceDETRConfig()  # checkpoint-exact default geometry, 91 classes
    model, _, _, _ = build_salience_detr(cfg)
    B, H, W, M = 1, 64, 64, 4
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "denoising": jax.random.PRNGKey(1)},
            jnp.zeros((B, H, W, 3)), jnp.full((B, 2), 32, jnp.int32),
            Targets(jnp.zeros((B, M), jnp.int32), jnp.full((B, M, 4), 0.5),
                    jnp.ones((B, M), bool)),
            train=True,
        )
    )()
    variables = jax.device_get(variables)
    variables.pop("denoising", None)
    state, skipped = export_torch_state_dict(variables, salience_detr_rules("resnet50"))
    assert not skipped, skipped[:5]
    pth = os.path.join(args.workdir, "synthesized_r50_full_dims.pth")
    torch.save(
        {"model": {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}},
        pth,
    )
    print(f"synthesized {len(state)} tensors -> {pth}", file=sys.stderr)

    # 2. synthetic val set at the real canvas (category ids within 1..90)
    img_dir, ann_file = make_rich_dataset(
        os.path.join(args.workdir, "val"), args.n_images, seed=0,
        canvas=(800, 1344),
    )

    # 3. the runbook command, verbatim but pointed at the rehearsal artifacts
    cmd = [
        sys.executable, "test.py",
        "--model-config", "configs/salience_detr/salience_detr_resnet50_800_1333.py",
        "--torch-checkpoint", pth,
        "--coco-img", img_dir,
        "--coco-ann", ann_file,
        "--batch-size", str(args.batch_size),
    ]
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=args.timeout)
    wall_s = time.perf_counter() - t0
    log = proc.stdout + proc.stderr
    sys.stderr.write(log[-3000:])
    assert proc.returncode == 0, f"test.py rc={proc.returncode}"

    conv = re.search(
        r"applied=(\d+) missing_src=(\d+) unused_src=(\d+) mismatched=(\d+)", log)
    ap50 = re.findall(r"AP50=([01]\.\d+)", log)
    # MetricLogger's "Test: Total time: H:MM:SS" covers the eval loop
    # (including the one-off program compile on a cold cache)
    loop = re.search(r"Total time: (\d+):(\d+):(\d+)", log)
    loop_s = (
        int(loop.group(1)) * 3600 + int(loop.group(2)) * 60 + int(loop.group(3))
        if loop else None
    )

    result = {
        "command": " ".join(cmd[1:]),
        "tensors_exported": len(state),
        "conversion": (
            dict(zip(("applied", "missing", "unused", "mismatched"),
                     map(int, conv.groups()))) if conv else None
        ),
        "n_images": args.n_images,
        "wall_s": round(wall_s, 1),
        "eval_loop_s": loop_s,
        "exact_mode_img_s": (
            round(args.n_images / loop_s, 3) if loop_s else None
        ),
        "ap50_random_init": float(ap50[-1]) if ap50 else None,
        "platform": jax.devices()[0].platform,
        "passed": bool(conv and int(conv.group(4)) == 0 and int(conv.group(2)) == 0),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
