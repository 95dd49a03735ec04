"""Gather-locality A/B for the head-shared encoder MSDA core (round 5).

The encoder processes its per-layer query prefix in SALIENCE-SCORE order —
a spatially random permutation — so consecutive queries gather corner rows
from unrelated parts of the value tensor.  bench_quadshared measured the
real model ~3.5x faster than fully random indices at equal volume, i.e. the
gather path is strongly locality-sensitive.  This bench isolates the order
effect at the encoder's real layer-0 geometry: the SAME clustered sampling
pattern (each query samples L*P points near its own pyramid position, the
model's actual distribution), issued in

  a) random (score-like) query order
  b) spatially sorted query order (ascending flat index)

plus the same A/B for the query gather + scatter-back pair that brackets
each encoder layer.  If (b) wins, the transformer gets a sort_prefix knob.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.utils.timing import device_time

B, C, H = 4, 256, 8
SHAPES = [(100, 168), (50, 84), (25, 42), (13, 21)]
S = sum(h * w for h, w in SHAPES)
L, P = 4, 4
Q = 17649


def make_indices(rng, order):
    """(B, Q, L*P*4) corner indices with the model's locality: each query is
    a random pyramid position; its P points per level sample within +-8
    pixels of the corresponding position at that level."""
    starts = np.concatenate([[0], np.cumsum([h * w for h, w in SHAPES])])
    out = np.zeros((B, Q, L * P * 4), np.int64)
    for b in range(B):
        # queries live on level 0 mostly (level_filter_ratio weights)
        qy = rng.integers(0, SHAPES[0][0], Q)
        qx = rng.integers(0, SHAPES[0][1], Q)
        if order == "sorted":
            flat0 = qy * SHAPES[0][1] + qx
            o = np.argsort(flat0)
            qy, qx = qy[o], qx[o]
        k = 0
        for lvl, (h, w) in enumerate(SHAPES):
            sy = (qy * h) // SHAPES[0][0]
            sx = (qx * w) // SHAPES[0][1]
            for p in range(P):
                dy = rng.integers(-8, 9, Q)
                dx = rng.integers(-8, 9, Q)
                py = np.clip(sy + dy, 0, h - 2)
                px = np.clip(sx + dx, 0, w - 2)
                base = starts[lvl] + py * w + px
                for c, off in enumerate((0, 1, w, w + 1)):
                    out[b, :, k + c] = base + off
                k += 4
    return jnp.asarray(out.astype(np.int32))


def main():
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.normal(size=(B, S, C)).astype(np.float32), jnp.bfloat16)
    cw = jnp.asarray(rng.uniform(0, 1, (B, Q, L * P * 4)).astype(np.float32), jnp.bfloat16)
    aw = jnp.asarray(rng.uniform(0, 1, (B, Q, H, L * P)).astype(np.float32), jnp.bfloat16)
    bflat = (jnp.arange(B, dtype=jnp.int32) * S)[:, None, None]

    def msda(value, idx):
        vf = value.reshape(B * S, C)
        g = vf.at[(idx + bflat).reshape(-1)].get(mode="promise_in_bounds")
        g = g.reshape(B, Q, L * P, 4, C)
        sampled = jnp.einsum(
            "bqis,bqisc->bqic", cw.reshape(B, Q, L * P, 4), g,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        s = sampled.reshape(B, Q, L * P, H, C // H)
        return jnp.einsum(
            "bqhi,bqihd->bqhd", aw, s, preferred_element_type=jnp.float32
        ).reshape(B, Q, C).astype(jnp.bfloat16)

    for order in ("random", "sorted"):
        idx = make_indices(np.random.default_rng(1), order)
        t = device_time(msda, (value, idx), iters=5)
        print(f"msda corner gather, {order:>6} order: {t*1e3:8.2f} ms", flush=True)

    # query gather + scatter-back pair (brackets every encoder layer)
    for order in ("random", "sorted"):
        r = np.random.default_rng(2)
        qi = np.stack([r.permutation(S)[:Q] for _ in range(B)])
        if order == "sorted":
            qi = np.sort(qi, axis=1)
        qi = jnp.asarray(qi.astype(np.int32))

        def gs(output, qi):
            q = jnp.take_along_axis(output, qi[..., None], axis=1,
                                    mode="promise_in_bounds")
            q = q * 1.0001
            return output.at[jnp.arange(B)[:, None], qi].set(
                q, mode="promise_in_bounds")

        t = device_time(gs, (value, qi), iters=5)
        print(f"query gather+scatter,  {order:>6} order: {t*1e3:8.2f} ms", flush=True)

    # on-device argsort cost at the layer prefix size (what the fix adds)
    qi = jnp.asarray(np.stack([np.random.default_rng(3).permutation(S)[:Q]
                               for _ in range(B)]).astype(np.int32))

    def srt(qi):
        perm = jnp.argsort(qi, axis=1)
        return jnp.take_along_axis(qi, perm, axis=1), perm

    t = device_time(srt, (qi,), iters=5)
    print(f"argsort (B, {Q}) int32:            {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
