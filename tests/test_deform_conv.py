"""DCNv2 brick: zero-offset init must equal a plain 3x3 conv (x0.5 from the
sigmoid mask at zero logits)."""

import jax
import jax.numpy as jnp
import numpy as np

from salience_detr_tpu.models.bricks.deform_conv import DeformConv2dPack


def test_zero_offsets_match_plain_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 12, 6)).astype(np.float32))
    mod = DeformConv2dPack(features=8)
    v = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(v, x)
    assert out.shape == (2, 10, 12, 8)

    # with zero offset conv, sampling grid == plain 3x3 taps; mask = 0.5
    w = np.asarray(v["params"]["kernel"])  # (9, Cin, F)
    b = np.asarray(v["params"]["bias"])
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = np.zeros((2, 10, 12, 8), np.float32)
    k = 0
    for ky in range(3):
        for kx in range(3):
            patch = xp[:, ky : ky + 10, kx : kx + 12]
            want += 0.5 * patch @ w[k]
            k += 1
    want += b
    # XLA:CPU's oneDNN matmuls use reduced-precision accumulation paths
    # (bf16-capable hosts), so tolerances are looser than pure fp32
    np.testing.assert_allclose(np.asarray(out), want, rtol=5e-3, atol=5e-3)


def test_stride_two_shape():
    x = jnp.zeros((1, 8, 8, 4))
    mod = DeformConv2dPack(features=4, stride=2)
    v = mod.init(jax.random.PRNGKey(0), x)
    assert mod.apply(v, x).shape == (1, 4, 4, 4)
