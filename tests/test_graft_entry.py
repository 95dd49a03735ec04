"""Driver-contract launcher tests for __graft_entry__.dryrun_multichip.

The actual multichip dry run is exercised by the driver (and is far too
compile-heavy for the fast lane); these tests pin the launcher's recovery
behavior around it: a poisoned XLA:CPU compile cache (foreign-host or
corrupted AOT entries — observed once as a hard futex deadlock of the
flagship-shaped tier) must be wiped before the retry, for both the hang
(TimeoutExpired) and the crash (nonzero rc) shapes.
"""

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_cpu_local_cache_dir_is_fingerprinted_and_stable():
    d1 = graft._cpu_local_cache_dir()
    d2 = graft._cpu_local_cache_dir()
    assert d1 == d2
    assert d1.startswith("/tmp/jax_dryrun_cpu_cache_")
    fp = d1.rsplit("_", 1)[1]
    assert len(fp) == 12 and all(c in "0123456789abcdef" for c in fp)


class _Proc:
    def __init__(self, rc):
        self.returncode = rc
        self.stdout = ""
        self.stderr = "boom"


def _run_with_fake_subprocess(monkeypatch, tmp_path, outcomes):
    """Run dryrun_multichip with subprocess.run faked to pop `outcomes`
    ("timeout" | int rc) and with the cache dir pointed into tmp_path.
    Returns (cache_dir, observations) where observations record whether the
    cache dir existed at the start of each attempt."""
    cache_dir = str(tmp_path / "cache")
    monkeypatch.setattr(graft, "_cpu_local_cache_dir", lambda: cache_dir)

    seen = []
    calls = iter(outcomes)

    def fake_run(cmd, **kw):
        os.makedirs(cache_dir, exist_ok=True)  # a real run writes entries
        seen.append(True)
        outcome = next(calls)
        if outcome == "timeout":
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout"), stderr="hung")
        return _Proc(outcome)

    # the launcher does `import subprocess` locally; patch the module itself
    monkeypatch.setattr(subprocess, "run", fake_run)
    return cache_dir, seen


def test_timeout_wipes_cache_and_retries(monkeypatch, tmp_path):
    cache_dir, seen = _run_with_fake_subprocess(
        monkeypatch, tmp_path, ["timeout", 0])
    graft.dryrun_multichip(2)
    assert len(seen) == 2  # retried after the hang
    # the retry succeeded with rc=0, so the cache written by attempt 2 stays
    assert os.path.isdir(cache_dir)


def test_timeout_twice_raises_and_wipes(monkeypatch, tmp_path):
    cache_dir, seen = _run_with_fake_subprocess(
        monkeypatch, tmp_path, ["timeout", "timeout"])
    with pytest.raises(RuntimeError, match="timed out"):
        graft.dryrun_multichip(2)
    assert len(seen) == 2
    assert not os.path.isdir(cache_dir)  # wiped after the final attempt


def test_failure_wipes_cache_before_retry(monkeypatch, tmp_path):
    cache_dir, seen = _run_with_fake_subprocess(
        monkeypatch, tmp_path, [1, 1])
    with pytest.raises(RuntimeError, match="rc=1"):
        graft.dryrun_multichip(2)
    assert len(seen) == 2
    assert not os.path.isdir(cache_dir)
