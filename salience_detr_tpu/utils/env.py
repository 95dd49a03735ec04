"""Environment reporting and determinism helpers.

Behavioral spec: /root/reference/util/collect_env.py:46 (startup env dump)
and the reference's seeding facilities (util/misc.py:148-166,
main.py:111-115).  JAX programs are deterministic by construction given a
PRNGKey; host-side RNGs (numpy/python, used by the data pipeline) are seeded
here."""

from __future__ import annotations

import os
import platform
import random
import sys
from typing import Optional

import numpy as np


def collect_env_info() -> str:
    import jax

    lines = [
        f"python:    {sys.version.split()[0]} ({platform.platform()})",
        f"jax:       {jax.__version__}",
    ]
    try:
        import flax, optax

        lines.append(f"flax:      {flax.__version__}   optax: {optax.__version__}")
    except Exception:
        pass
    try:
        devs = jax.devices()
        lines.append(f"devices:   {len(devs)} x {devs[0].device_kind} ({devs[0].platform})")
        lines.append(f"process:   {jax.process_index()}/{jax.process_count()}")
    except Exception as e:
        lines.append(f"devices:   unavailable ({e})")
    for var in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_COMPILATION_CACHE_DIR"):
        if os.environ.get(var):
            lines.append(f"{var}={os.environ[var]}")
    return "\n".join(lines)


def seed_everything(seed: Optional[int] = None) -> int:
    """Seed host RNGs; returns the seed (pid/urandom-derived when None,
    mirroring util/misc.py:148-154)."""
    if seed is None:
        seed = (os.getpid() + int.from_bytes(os.urandom(2), "big")) % (2**31)
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return seed


class GracefulShutdown:
    """Preemption-aware stop flag: installs SIGTERM/SIGINT handlers that set
    a flag instead of killing the process, so the training loop can finish
    the in-flight step, write a checkpoint, and exit cleanly.

    The reference has no preemption story (recovery is manual re-launch,
    SURVEY.md §5.3); on TPU pods — which are routinely preempted — a
    checkpoint-on-SIGTERM turns preemption into an ordinary resume.

    Usage::

        with GracefulShutdown() as stop:
            for epoch in ...:
                state, step = train_one_epoch(..., stop_requested=stop)
                if stop.requested:
                    ckpt.save(epoch, state, force=True)
                    break
    """

    def __init__(self, signals=None, logger=None):
        import signal as _signal

        self._signal = _signal
        self.signals = tuple(signals) if signals else (_signal.SIGTERM, _signal.SIGINT)
        self.logger = logger
        self.requested = False
        self._previous = {}

    def __call__(self) -> bool:
        return self.requested

    def _handler(self, signum, frame):
        self.requested = True
        msg = f"received signal {signum}: finishing step, then checkpoint + exit"
        if self.logger is not None:
            self.logger.warning(msg)
        else:
            print(msg, file=sys.stderr, flush=True)

    def __enter__(self):
        for sig in self.signals:
            self._previous[sig] = self._signal.signal(sig, self._handler)
        return self

    def __exit__(self, *exc):
        for sig, prev in self._previous.items():
            self._signal.signal(sig, prev)
        self._previous.clear()
        return False
