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
