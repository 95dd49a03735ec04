"""Focused MSDA variant timing: current core vs the two leading candidates
(quad-row gather + mult-sum; pair gather + two-stage reduce) at the hot-layer
scale.  Subset of tools/bench_msda2.py sized to finish within one compile
window on the 1-core host."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.utils.timing import device_time
import tools.bench_msda2 as m2
from salience_detr_tpu.ops.deform_attn import ms_deform_attn_core_shared

SHAPES = m2.SHAPES
H = m2.H


def main():
    which = os.environ.get("VARIANTS", "cur,quad,two_stage_pair").split(",")
    fns = {
        "cur": lambda v, l, w: ms_deform_attn_core_shared(v, SHAPES, l, w, H),
        "quad": m2.quad,
        "gq": m2.gq,
        "mulsum": m2.mulsum,
        "quad_pl": m2.quad_pl,
        "flat_pl": m2.flat_pl,
        "two_stage": m2.two_stage,
        "two_stage_quad": m2.two_stage_quad,
        "two_stage_pair": m2.two_stage_pair,
        "two_stage_pair2": m2.two_stage_pair2,
        "mulsum_pair": m2.mulsum_pair,
        "fused16": m2.fused16,
        "fused16_2": m2.fused16_2,
        "two_stage_slices": m2.two_stage_slices,
        "two_stage_slices2": m2.two_stage_slices2,
        "int8_rows": m2.int8_rows,
        "four_gather": m2.four_gather,
        "blk128": m2.blk128,
        "blk128_bf16": m2.blk128_bf16,
        "pl_blk": m2.pl_blk,
        "pl_blk_bf16": m2.pl_blk_bf16,
        "pl_nat": m2.pl_nat,
        "pl_nat_bf16": m2.pl_nat_bf16,
    }
    if os.environ.get("CHECK", "0") == "1":
        for name in which:
            if name == "cur":
                continue
            try:
                m2.check(fns[name])
                print(f"{name}: numerics OK", flush=True)
            except Exception as e:
                print(f"{name}: CHECK FAILED {type(e).__name__} {str(e)[:300]}", flush=True)
    Q = int(os.environ.get("Q", "11403"))
    value, locs, w = m2.make_inputs(Q)
    for name in which:
        try:
            t = device_time(lambda l: fns[name](value, l, w), (locs,), iters=5)
            print(f"{name}: {t * 1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
