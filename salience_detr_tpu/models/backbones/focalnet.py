"""FocalNet backbone family (NHWC flax), re-design of
/root/reference/models/backbones/focalnet.py (FocalModulation :47-141,
FocalModulationBlock :142-205, arch registry :381-547).  Extracted stage
features get a per-level LayerNorm (PostProcess, focalnet.py:361-376)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ARCH_SETTINGS: Dict[str, Dict] = {
    "focalnet_tiny_srf": dict(embed_dim=96, depths=(2, 2, 6, 2), focal_levels=(2,) * 4,
                              focal_windows=(3,) * 4, conv_embed=False, postln=False,
                              layerscale=False, norm_mod=False, sd=0.2),
    "focalnet_tiny_lrf": dict(embed_dim=96, depths=(2, 2, 18, 2), focal_levels=(3,) * 4,
                              focal_windows=(3,) * 4, conv_embed=False, postln=False,
                              layerscale=False, norm_mod=False, sd=0.2),
    "focalnet_base_lrf": dict(embed_dim=128, depths=(2, 2, 18, 2), focal_levels=(3,) * 4,
                              focal_windows=(3,) * 4, conv_embed=False, postln=False,
                              layerscale=False, norm_mod=False, sd=0.5),
    "focalnet_large_lrf": dict(embed_dim=192, depths=(2, 2, 18, 2), focal_levels=(3,) * 4,
                               focal_windows=(5,) * 4, conv_embed=True, postln=True,
                               layerscale=True, norm_mod=False, sd=0.5),
    "focalnet_large_lrf_fl4": dict(embed_dim=192, depths=(2, 2, 18, 2), focal_levels=(4,) * 4,
                                   focal_windows=(3,) * 4, conv_embed=True, postln=True,
                                   layerscale=True, norm_mod=True, sd=0.5),
    "focalnet_xlarge_lrf_fl4": dict(embed_dim=256, depths=(2, 2, 18, 2), focal_levels=(4,) * 4,
                                    focal_windows=(3,) * 4, conv_embed=True, postln=True,
                                    layerscale=True, norm_mod=True, sd=0.5),
    "focalnet_huge_fl4": dict(embed_dim=352, depths=(2, 2, 18, 2), focal_levels=(4,) * 4,
                              focal_windows=(3,) * 4, conv_embed=True, postln=True,
                              layerscale=True, norm_mod=False, postln_in_mod=True, sd=0.5),
}


class FocalModulation(nn.Module):
    dim: int
    focal_window: int
    focal_level: int
    focal_factor: int = 2
    normalize_modulator: bool = False
    use_postln_in_modulation: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = self.dim
        f = nn.Dense(2 * C + self.focal_level + 1, dtype=self.dtype, name="f")(x)
        q = f[..., :C]
        ctx = f[..., C : 2 * C]
        gates = f[..., 2 * C :]

        ctx_all = jnp.zeros_like(ctx)
        for l in range(self.focal_level):
            k = self.focal_factor * l + self.focal_window
            ctx = nn.Conv(
                C, (k, k), padding=[(k // 2, k // 2)] * 2, feature_group_count=C,
                use_bias=False, dtype=self.dtype, name=f"focal_layers_{l}",
            )(ctx)
            ctx = jax.nn.gelu(ctx, approximate=False)
            ctx_all = ctx_all + ctx * gates[..., l : l + 1]
        ctx_global = jax.nn.gelu(
            jnp.mean(ctx, axis=(1, 2), keepdims=True), approximate=False
        )
        ctx_all = ctx_all + ctx_global * gates[..., self.focal_level :]
        if self.normalize_modulator:
            ctx_all = ctx_all / (self.focal_level + 1)

        modulator = nn.Conv(C, (1, 1), dtype=self.dtype, name="h")(ctx_all)
        out = q * modulator
        if self.use_postln_in_modulation:
            out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(out)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class FocalModulationBlock(nn.Module):
    dim: int
    focal_level: int
    focal_window: int
    mlp_ratio: float = 4.0
    use_postln: bool = False
    use_postln_in_modulation: bool = False
    normalize_modulator: bool = False
    use_layerscale: bool = False
    stochastic_depth_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def drop_path(y):
            if train and self.stochastic_depth_prob > 0:
                keep = 1.0 - self.stochastic_depth_prob
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1))
                return y * mask.astype(y.dtype) / keep
            return y

        if self.use_layerscale:
            g1 = self.param("gamma_1", nn.initializers.constant(1e-4), (self.dim,))
            g2 = self.param("gamma_2", nn.initializers.constant(1e-4), (self.dim,))
        else:
            g1 = g2 = 1.0

        mod = FocalModulation(
            self.dim, self.focal_window, self.focal_level,
            normalize_modulator=self.normalize_modulator,
            use_postln_in_modulation=self.use_postln_in_modulation,
            dtype=self.dtype, name="modulation",
        )
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")

        def mlp(y):
            y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
            y = jax.nn.gelu(y, approximate=False)
            return nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)

        if self.use_postln:
            x = x + drop_path(g1 * norm1(mod(x)))
            x = x + drop_path(g2 * norm2(mlp(x)))
        else:
            x = x + drop_path(g1 * mod(norm1(x)))
            x = x + drop_path(g2 * mlp(norm2(x)))
        return x


class PatchEmbed(nn.Module):
    out_dim: int
    is_stem: bool = False
    use_conv_embed: bool = False
    patch: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv_embed:
            if self.is_stem:
                x = nn.Conv(
                    self.out_dim, (7, 7), strides=(4, 4), padding=[(2, 2), (2, 2)],
                    dtype=self.dtype, name="proj",
                )(x)
            else:
                x = nn.Conv(
                    self.out_dim, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="proj",
                )(x)
        else:
            p = self.patch if self.is_stem else 2
            x = nn.Conv(
                self.out_dim, (p, p), strides=(p, p), dtype=self.dtype, name="proj"
            )(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class FocalNetBackbone(nn.Module):
    arch: str = "focalnet_large_lrf_fl4"
    return_indices: Tuple[int, ...] = (1, 2, 3)
    # None -> the reference arch registry's value (focalnet.py:381-547)
    stochastic_depth_prob: Any = None
    dtype: Any = jnp.float32

    @property
    def num_channels(self):
        e = ARCH_SETTINGS[self.arch]["embed_dim"]
        return [e * 2**i for i in self.return_indices]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[int, jnp.ndarray]:
        cfg = ARCH_SETTINGS[self.arch]
        e, depths = cfg["embed_dim"], cfg["depths"]
        sd_prob = (
            cfg.get("sd", 0.0) if self.stochastic_depth_prob is None
            else self.stochastic_depth_prob
        )
        total_blocks = sum(depths)
        block_id = 0

        x = PatchEmbed(
            e, is_stem=True, use_conv_embed=cfg["conv_embed"], dtype=self.dtype,
            name="patch_embed",
        )(x)

        outputs = {}
        dim = e
        for stage in range(4):
            for b in range(depths[stage]):
                sd = sd_prob * block_id / max(total_blocks - 1, 1)
                x = FocalModulationBlock(
                    dim,
                    focal_level=cfg["focal_levels"][stage],
                    focal_window=cfg["focal_windows"][stage],
                    use_postln=cfg["postln"],
                    use_postln_in_modulation=cfg.get("postln_in_mod", False),
                    normalize_modulator=cfg["norm_mod"],
                    use_layerscale=cfg["layerscale"],
                    stochastic_depth_prob=sd,
                    dtype=self.dtype,
                    name=f"stage{stage}_block{b}",
                )(x, train=train)
                block_id += 1
            if stage in self.return_indices:
                # per-level LayerNorm (PostProcess, focalnet.py:361-376)
                outputs[stage] = nn.LayerNorm(
                    epsilon=1e-5, dtype=self.dtype, name=f"out_norm{stage}"
                )(x)
            if stage < 3:
                x = PatchEmbed(
                    dim * 2, use_conv_embed=cfg["conv_embed"], dtype=self.dtype,
                    name=f"downsample{stage}",
                )(x)
                dim *= 2
        return outputs
