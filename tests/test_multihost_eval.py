"""REAL two-process multihost evaluator merge (VERDICT r3 weak #3 tail).

tests/test_coco_eval.py::TestMultiHostMerge covers the merge logic with a
FAKE gather; this test runs the actual jax.distributed machinery: two OS
processes, each a single-device CPU "host", joined via
``jax.distributed.initialize`` with gloo CPU collectives — the same
``multihost_utils.process_allgather`` path a real multi-host TPU job takes
(the reference's pickle-over-NCCL equivalent,
/root/reference/util/coco_eval.py:46-51).  Each process evaluates HALF of
the images; the merged metrics must equal a single-process evaluation of
everything.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ANN = {
    "images": [
        {"id": 1, "width": 100, "height": 100, "file_name": "a.jpg"},
        {"id": 2, "width": 100, "height": 100, "file_name": "b.jpg"},
    ],
    "annotations": [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 40, 40],
         "area": 1600, "iscrowd": 0},
        {"id": 2, "image_id": 2, "category_id": 2, "bbox": [50, 50, 20, 20],
         "area": 400, "iscrowd": 0},
    ],
    "categories": [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}],
}

# predictions: image 1 perfect, image 2 deliberately at IoU 0.5 so the merged
# metrics are non-trivial (AP != 1) and any lost half would change them
PREDS = {
    1: {"boxes": [[10, 10, 50, 50]], "scores": [0.9], "labels": [1]},
    2: {"boxes": [[50, 57.2, 70, 77.2]], "scores": [0.8], "labels": [2]},
}

WORKER_SRC = r"""
import json, os, sys
import numpy as np

pid = int(sys.argv[1])
coordinator = sys.argv[2]
workdir = sys.argv[3]

import jax
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()

from salience_detr_tpu.data.coco import CocoIndex
from salience_detr_tpu.utils.coco_eval import CocoEvaluator

with open(os.path.join(workdir, "ann.json")) as f:
    index = CocoIndex(json.load(f))
with open(os.path.join(workdir, "preds.json")) as f:
    preds = {int(k): v for k, v in json.load(f).items()}

ev = CocoEvaluator(index)
# each process scores ITS half of the images
mine = {k: {kk: np.asarray(vv, float) for kk, vv in v.items()}
        for k, v in preds.items() if k % 2 == pid}
ev.update(mine)
ev.synchronize_between_processes()
assert sorted(ev.img_ids) == [1, 2], ev.img_ids
ev.accumulate()
if pid == 0:
    with open(os.path.join(workdir, "merged_metrics.json"), "w") as f:
        json.dump(ev.summarize(), f)
print(f"worker {pid}: ok")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_allgather_merge(tmp_path):
    (tmp_path / "ann.json").write_text(json.dumps(ANN))
    (tmp_path / "preds.json").write_text(json.dumps(PREDS))
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER_SRC)

    env = {
        k: v for k, v in os.environ.items()
        if not (k.startswith(("PALLAS_AXON", "AXON", "TPU", "LIBTPU")))
    }
    pythonpath = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + pythonpath)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_multihost_test_cache"

    coordinator = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), coordinator, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"

    with open(tmp_path / "merged_metrics.json") as f:
        merged = json.load(f)

    # single-process ground truth over ALL predictions
    from salience_detr_tpu.data.coco import CocoIndex
    from salience_detr_tpu.utils.coco_eval import CocoEvaluator

    ev = CocoEvaluator(CocoIndex(ANN))
    ev.update({k: {kk: np.asarray(vv, float) for kk, vv in v.items()}
               for k, v in PREDS.items()})
    ev.accumulate()
    want = ev.summarize()
    assert 0 < want["AP"] < 1  # non-trivial: both halves contribute
    for k, v in want.items():
        assert merged[k] == pytest.approx(v, abs=1e-9), (k, merged[k], v)
