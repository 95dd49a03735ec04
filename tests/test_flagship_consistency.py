"""The 'flagship' sampling mode is declared in three places that must agree:
bench.py's BENCH_SAMPLING default (what the driver benches), __graft_entry__
(what the driver compile-checks and dry-runs), and the shipped R50 config
(what a user trains).  ROADMAP.md's quality campaign picked the hybrid
shared-encoder / exact-decoder mode; this test pins all three to it so a
future edit can't silently de-sync the benched model from the shipped one.
"""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the flagship mode chosen by the paired quality campaign (ROADMAP.md):
# encoder head-shared (1 location group), decoder exact per-head
FLAGSHIP = dict(
    shared_sampling_locations=True,
    sampling_groups_in=(0, 1),  # 0 = legacy alias of shared, 1 = explicit
    decoder_sampling_groups=0,
)


def _assert_flagship(cfg, where):
    assert cfg.shared_sampling_locations == FLAGSHIP["shared_sampling_locations"], where
    assert cfg.sampling_groups in FLAGSHIP["sampling_groups_in"], where
    assert cfg.decoder_sampling_groups == FLAGSHIP["decoder_sampling_groups"], where


def test_bench_default_is_flagship():
    src = open(os.path.join(REPO, "bench.py")).read()
    m = re.search(r"BENCH_SAMPLING\",\s*\"([a-z0-9_]+)\"", src)
    assert m, "bench.py BENCH_SAMPLING default not found"
    assert m.group(1) == "shared_dec0", m.group(1)


def test_r50_config_is_flagship():
    from salience_detr_tpu.utils.config import Config

    cfg = Config(
        os.path.join(REPO, "configs/salience_detr/salience_detr_resnet50_800_1333.py")
    ).model_config
    _assert_flagship(cfg, "configs/salience_detr/salience_detr_resnet50_800_1333.py")


def test_graft_entry_is_flagship():
    src = open(os.path.join(REPO, "__graft_entry__.py")).read()
    # both the single-chip flagship and the tier-2 dryrun construct the config
    # with the hybrid fields; cheap source-level check (importing the module
    # would pull jax into the fast lane for no reason)
    assert src.count("decoder_sampling_groups=0") >= 3, (
        "__graft_entry__ flagship configs must set decoder_sampling_groups=0 "
        "(entry + tier-1 + tier-2 dryrun)"
    )
    assert "shared_sampling_locations=True" in src
