"""FULL-MODEL numerical parity vs the reference, in pure torch (CPU).

Extends the block-level differential tests (test_torch_parity.py) to the
complete eval forward: backbone -> ChannelMapper -> sine position embedding
-> SalienceTransformer (salience cascade, per-layer encoder prefixes,
scatter-back, background embedding, RepVGG-PluX neck re-fusion, two-stage
NMS proposal selection, decoder with look-forward-twice).  This covers the
integration seams the block tests cannot: selection-index plumbing,
scatter-back, the NMS ordering contract, and the decoder input wiring.

Method: the ENTIRE reference forward is restated here in torch (with the
source lines cited per block), randomly initialized with numerically sane
weights, mapped through the full converter rule set
(``salience_detr_rules``), and the flax model must reproduce the reference's
outputs at the reference's own cross-backend tolerances (rtol 1e-3,
/root/reference/tools/pytorch2onnx.py:136-138; atol loosened to 1e-3 for the
~10-layer accumulation depth).

Reference sources restated below:
  ResNet-18 + FrozenBN      models/backbones/resnet.py + bricks/misc.py:9-60
  ChannelMapper             models/necks/channel_mapper.py:8-80
  PositionEmbeddingSine     models/bricks/position_encoding.py:9-65
  RepVGGPluXNetwork         models/necks/repnet.py:12-245
  SqueezeAndExcitation      models/bricks/basic.py:29-54
  SalienceTransformer       models/bricks/salience_transformer.py:50-674
  batched grid NMS          salience_transformer.py:249-295 (torchvision
                            batched_nms restated as exact greedy NMS)
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from salience_detr_tpu.models.bricks.criterion import Targets
from salience_detr_tpu.models.factory import SalienceDETRConfig, build_salience_detr
from salience_detr_tpu.utils.weight_converter import (
    convert_state_dict,
    flat_to_nested,
    salience_detr_rules,
)
from tests.test_torch_parity import (
    TorchDecoderLayer,
    TorchEncoderLayer,
    TorchMaskPredictor,
)

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast lane

RTOL, ATOL = 1e-3, 1e-3

# tiny-but-complete config (mirrors the CLI tests' tiny model)
C = 32          # embed_dim
NH = 4          # heads
NCLS = 5
NQ = 24         # two_stage_num_proposals
NL = 4          # feature levels
NP = 4          # msda points
TOPK_SA = 12
D_FFN = 64
ENC_LAYERS = DEC_LAYERS = 2
LEVEL_RATIO = (0.4, 0.8, 1.0, 1.0)
LAYER_RATIO = (1.0, 0.5)
MAX_EMB = 16    # background embedding table
B, H, W = 2, 96, 128


# ==========================================================================
# reference restatements (pure torch)
# ==========================================================================


class TorchFrozenBN(nn.Module):
    """bricks/misc.py:9-60."""

    def __init__(self, n, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.register_buffer("weight", torch.ones(n))
        self.register_buffer("bias", torch.zeros(n))
        self.register_buffer("running_mean", torch.zeros(n))
        self.register_buffer("running_var", torch.ones(n))

    def forward(self, x):
        scale = self.weight * (self.running_var + self.eps).rsqrt()
        bias = self.bias - self.running_mean * scale
        return x * scale[None, :, None, None] + bias[None, :, None, None]


class TorchBasicBlock(nn.Module):
    """backbones/resnet.py BasicBlock (vendored torchvision)."""

    def __init__(self, inp, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, planes, 3, stride, 1, bias=False)
        self.bn1 = TorchFrozenBN(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = TorchFrozenBN(planes)
        self.downsample = (
            nn.Sequential(
                nn.Conv2d(inp, planes, 1, stride, bias=False), TorchFrozenBN(planes)
            )
            if downsample
            else None
        )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + identity)


class TorchResNet18(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = TorchFrozenBN(64)
        layers = (2, 2, 2, 2)
        inp = 64
        for s in range(4):
            planes = 64 * 2**s
            blocks = []
            for b in range(layers[s]):
                stride = 2 if (s > 0 and b == 0) else 1
                blocks.append(
                    TorchBasicBlock(inp, planes, stride, downsample=(b == 0 and s > 0))
                )
                inp = planes
            setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        outs = []
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            if s in (1, 2, 3):
                outs.append(x)
        return outs


class TorchChannelMapper(nn.Module):
    """necks/channel_mapper.py:8-80 (1x1 conv + GN32, extra 3x3/s2 levels)."""

    def __init__(self, in_channels, out_channels, num_outs):
        super().__init__()
        self.n_in = len(in_channels)
        convs = []
        for ic in in_channels:
            convs.append(
                nn.Sequential(
                    nn.Conv2d(ic, out_channels, 1, bias=False),
                    nn.GroupNorm(32, out_channels),
                )
            )
        ic = in_channels[-1]
        for _ in range(num_outs - len(in_channels)):
            convs.append(
                nn.Sequential(
                    nn.Conv2d(ic, out_channels, 3, 2, 1, bias=False),
                    nn.GroupNorm(32, out_channels),
                )
            )
            ic = out_channels
        self.convs = nn.ModuleList(convs)

    def forward(self, feats):
        outs = [self.convs[i](feats[i]) for i in range(self.n_in)]
        x = feats[-1]
        for i in range(self.n_in, len(self.convs)):
            x = self.convs[i](x)
            outs.append(x)
        return outs


def torch_sine_position_embedding(mask, num_pos_feats, offset=-0.5):
    """position_encoding.py PositionEmbeddingSine (normalize=True)."""
    not_mask = 1 - mask.int()
    y = not_mask.cumsum(1, dtype=torch.float32)
    x = not_mask.cumsum(2, dtype=torch.float32)
    scale = 2 * math.pi
    y = (y + offset) / (y[:, -1:, :] + 1e-6) * scale
    x = (x + offset) / (x[:, :, -1:] + 1e-6) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    pos_x = x[:, :, :, None] / dim_t
    pos_y = y[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=4).flatten(3)
    return torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)


def torch_get_sine_pos_embed(pos, num_pos_feats):
    """position_encoding.py:105-132 (exchange_xy=True)."""
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    pos_res = pos.unsqueeze(-1) * (2 * math.pi) / dim_t
    pos_res = torch.stack(
        (pos_res[..., 0::2].sin(), pos_res[..., 1::2].cos()), dim=-1
    ).flatten(-2)
    index = [1, 0] + list(range(2, pos_res.shape[-2]))
    pos_res = pos_res[..., index, :]
    return pos_res.reshape(*pos.shape[:-1], -1)


def torch_inverse_sigmoid(x, eps=1e-3):
    """util/misc.py:31-35 (asymmetric clamping)."""
    x = x.clamp(0, 1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


class TorchMLP(nn.Module):
    """bricks/basic.py MLP."""

    def __init__(self, input_dim, hidden_dim, output_dim, num_layers):
        super().__init__()
        self.num_layers = num_layers
        h = [hidden_dim] * (num_layers - 1)
        self.layers = nn.ModuleList(
            nn.Linear(n, k) for n, k in zip([input_dim] + h, h + [output_dim])
        )

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = F.relu(layer(x)) if i < self.num_layers - 1 else layer(x)
        return x


class TorchSE(nn.Module):
    """bricks/basic.py:29-54 SqueezeAndExcitation (GC-style context pool)."""

    def __init__(self, channels, reduction=16):
        super().__init__()
        self.conv_mask = nn.Conv2d(channels, 1, 1)
        self.se_module = nn.Sequential(
            nn.Conv2d(channels, max(channels // reduction, 1), 1, bias=False),
            nn.ReLU(),
            nn.Conv2d(max(channels // reduction, 1), channels, 1, bias=False),
            nn.Sigmoid(),
        )

    def forward(self, x):
        b, c, h, w = x.shape
        input_x = x.view(b, c, h * w).unsqueeze(1)
        ctx = self.conv_mask(x).view(b, 1, h * w)
        ctx = ctx.softmax(dim=2).unsqueeze(-1)
        ctx = torch.matmul(input_x, ctx).view(b, c, 1, 1)
        return self.se_module(ctx) * x


def _cna(ic, oc, k=1, s=1, groups=1, act="silu"):
    """misc.py Conv2dNormActivation with BatchNorm (bias=False)."""
    layers = [nn.Conv2d(ic, oc, k, s, (k - 1) // 2, groups=groups, bias=False),
              nn.BatchNorm2d(oc)]
    if act == "silu":
        layers.append(nn.SiLU())
    return nn.Sequential(*layers)


class TorchRepVggBlock(nn.Module):
    """necks/repnet.py:12-63 (alpha=False, in==out -> Identity)."""

    def __init__(self, channels, groups=4):
        super().__init__()
        self.conv1 = _cna(channels, channels, 3, 1, groups, act=None)
        self.conv2 = _cna(channels, channels, 1, 1, groups, act=None)
        self.se_module = TorchSE(channels)

    def forward(self, x):
        y = self.conv1(x) + self.conv2(x)
        y = self.se_module(F.silu(y))
        return y + x


class TorchCSPLayer(nn.Module):
    """necks/repnet.py:67-124 (expansion=1 -> conv3 Identity)."""

    def __init__(self, ic, oc, num_blocks=3, groups=4):
        super().__init__()
        self.conv1 = _cna(ic, oc, 1)
        self.conv2 = _cna(ic, oc, 1)
        self.bottlenecks = nn.Sequential(
            *[TorchRepVggBlock(oc, groups) for _ in range(num_blocks)]
        )

    def forward(self, x):
        return self.bottlenecks(self.conv1(x)) + self.conv2(x)


class TorchRepNet(nn.Module):
    """necks/repnet.py:125-245 (PAN)."""

    def __init__(self, channels_list, groups=4):
        super().__init__()
        n = len(channels_list)
        self.lateral_convs = nn.ModuleList(
            [_cna(channels_list[i], channels_list[i - 1], 1) for i in range(1, n)]
        )
        self.layer_blocks = nn.ModuleList(
            [TorchCSPLayer(channels_list[i - 1] * 2, channels_list[i - 1], groups=groups)
             for i in range(1, n)]
        )
        self.downsample_blocks = nn.ModuleList(
            [_cna(channels_list[i], channels_list[i + 1], 3, 2) for i in range(n - 1)]
        )
        self.pan_blocks = nn.ModuleList(
            [TorchCSPLayer(channels_list[i + 1] * 2, channels_list[i + 1], groups=groups)
             for i in range(n - 1)]
        )

    def forward(self, x: dict):
        keys = list(x.keys())
        x = list(x.values())
        inner_outs = [x[-1]]
        for idx in range(len(x) - 1, 0, -1):
            feat_high = self.lateral_convs[idx - 1](inner_outs[0])
            inner_outs[0] = feat_high
            up = F.interpolate(feat_high, size=x[idx - 1].shape[-2:], mode="nearest")
            inner_outs.insert(
                0, self.layer_blocks[idx - 1](torch.cat([up, x[idx - 1]], dim=1))
            )
        results = [inner_outs[0]]
        for idx in range(len(inner_outs) - 1):
            down = self.downsample_blocks[idx](results[-1])
            results.append(
                self.pan_blocks[idx](torch.cat([down, inner_outs[idx + 1]], dim=1))
            )
        return {k: v for k, v in zip(keys, results)}


class TorchBackgroundEmbedding(nn.Module):
    """position_encoding.py:68-96 PositionEmbeddingLearned."""

    def __init__(self, num_embeddings, num_pos_feats):
        super().__init__()
        self.row_embed = nn.Embedding(num_embeddings, num_pos_feats)
        self.col_embed = nn.Embedding(num_embeddings, num_pos_feats)

    def forward(self, mask):
        h, w = mask.shape[-2:]
        x_emb = self.col_embed(torch.arange(w))
        y_emb = self.row_embed(torch.arange(h))
        pos = torch.cat(
            [x_emb.unsqueeze(0).repeat(h, 1, 1), y_emb.unsqueeze(1).repeat(1, w, 1)],
            dim=-1,
        ).permute(2, 0, 1)
        return pos.unsqueeze(0).repeat(mask.shape[0], 1, 1, 1)


def greedy_nms(boxes, scores, iou_threshold):
    """Exact sequential greedy NMS -> kept indices in descending score order
    (restates torchvision.ops.nms, unavailable in this image)."""
    order = torch.argsort(scores, descending=True)
    boxes = boxes[order].numpy()
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x1 - x0) * (y1 - y0)
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in range(len(boxes)):
        if not alive[i]:
            continue
        keep.append(i)
        xx0 = np.maximum(x0[i], x0)
        yy0 = np.maximum(y0[i], y0)
        xx1 = np.minimum(x1[i], x1)
        yy1 = np.minimum(y1[i], y1)
        inter = np.clip(xx1 - xx0, 0, None) * np.clip(yy1 - yy0, 0, None)
        iou = inter / (areas[i] + areas - inter)
        alive &= ~((iou > iou_threshold) & alive)
        alive[i] = True  # self-iou is 1
        alive[: i + 1] = False  # processed
        alive[i] = False
    return order[torch.as_tensor(keep, dtype=torch.long)]


def torch_batched_nms(boxes, scores, idxs, iou_threshold):
    """torchvision.ops.batched_nms via the coordinate-offset trick."""
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.long)
    max_coord = boxes.max()
    offsets = idxs.to(boxes) * (max_coord + 8)
    return greedy_nms(boxes + offsets[:, None], scores, iou_threshold)


class TorchSalienceTransformer(nn.Module):
    """salience_transformer.py:50-246 with the decoder (:592-674) and encoder
    orchestration (:399-497) inlined; dropout=0 (the shipped configs)."""

    def __init__(self):
        super().__init__()
        self.level_embeds = nn.Parameter(torch.zeros(NL, C))
        self.alpha = nn.Parameter(torch.zeros(3))
        self.tgt_embed = nn.Embedding(NQ, C)
        self.enc_output = nn.Linear(C, C)
        self.enc_output_norm = nn.LayerNorm(C)
        self.encoder_class_head = nn.Linear(C, NCLS)
        self.encoder_bbox_head = TorchMLP(C, C, 4, 3)
        self.enc_mask_predictor = TorchMaskPredictor(C, C)

        class _Encoder(nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = nn.ModuleList(
                    [TorchEncoderLayer(C, D_FFN, NH, TOPK_SA) for _ in range(ENC_LAYERS)]
                )
                self.background_embedding = TorchBackgroundEmbedding(MAX_EMB, C // 2)

        class _Decoder(nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = nn.ModuleList(
                    [TorchDecoderLayer(C, D_FFN, NH) for _ in range(DEC_LAYERS)]
                )
                self.ref_point_head = TorchMLP(2 * C, C, C, 2)
                self.class_head = nn.ModuleList(
                    [nn.Linear(C, NCLS) for _ in range(DEC_LAYERS)]
                )
                self.bbox_head = nn.ModuleList(
                    [TorchMLP(C, C, 4, 3) for _ in range(DEC_LAYERS)]
                )
                self.norm = nn.LayerNorm(C)

        self.encoder = _Encoder()
        self.neck = TorchRepNet([C] * NL)
        self.decoder = _Decoder()

    # ---------------- TwostageTransformer helpers (base_transformer.py)

    def gen_encoder_output_proposals(self, memory, mask_flatten, shapes):
        n, s, _ = memory.shape
        proposals, cur = [], 0
        for lvl, (h, w) in enumerate(shapes):
            m = mask_flatten[:, cur:cur + h * w].view(n, h, w, 1)
            valid_h = torch.sum(~m[:, :, 0, 0], 1)
            valid_w = torch.sum(~m[:, 0, :, 0], 1)
            gy, gx = torch.meshgrid(
                torch.linspace(0, h - 1, h), torch.linspace(0, w - 1, w), indexing="ij"
            )
            grid = torch.stack([gx, gy], -1)
            scale = torch.stack([valid_w, valid_h], -1).view(n, 1, 1, 2).float()
            grid = (grid.expand(n, -1, -1, -1) + 0.5) / scale
            wh = torch.ones_like(grid) * 0.05 * 2.0**lvl
            proposals.append(torch.cat([grid, wh], -1).view(n, -1, 4))
            cur += h * w
        output_proposals = torch.cat(proposals, 1)
        valid = ((output_proposals > 0.01) & (output_proposals < 0.99)).all(-1, keepdim=True)
        output_proposals = torch.log(output_proposals / (1 - output_proposals))
        output_proposals.masked_fill_(
            mask_flatten.unsqueeze(-1) | ~valid, float("inf")
        )
        output_memory = memory * (~mask_flatten.unsqueeze(-1)) * valid
        output_memory = self.enc_output_norm(self.enc_output(output_memory))
        return output_memory, output_proposals

    @staticmethod
    def get_reference_points(shapes, valid_ratios):
        ref_list = []
        for lvl, (h, w) in enumerate(shapes):
            ry, rx = torch.meshgrid(
                torch.linspace(0.5, h - 0.5, h), torch.linspace(0.5, w - 0.5, w),
                indexing="ij",
            )
            ry = ry.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * h)
            rx = rx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * w)
            ref_list.append(torch.stack((rx, ry), -1))
        ref = torch.cat(ref_list, 1)
        return ref[:, :, None] * valid_ratios[:, None]

    def nms_on_topk_index(self, topk_scores, topk_index, shapes, starts):
        """salience_transformer.py:249-295."""
        bsz, num_topk = topk_scores.shape
        num_pixels = [h * w for h, w in shapes]
        ts, ti = topk_scores.reshape(-1), topk_index.reshape(-1)
        width_per_tok = torch.cat(
            [torch.full((p,), w, dtype=torch.long) for (h, w), p in zip(shapes, num_pixels)]
        )
        start_per_tok = torch.cat(
            [torch.full((p,), s, dtype=torch.long) for s, p in zip(starts, num_pixels)]
        )
        lvl_per_tok = torch.cat(
            [torch.full((p,), l, dtype=torch.long) for l, p in enumerate(num_pixels)]
        )
        fw, st, lv = width_per_tok[ti], start_per_tok[ti], lvl_per_tok[ti]
        spatial = ti - st
        x = (spatial % fw).float()
        y = torch.div(spatial, fw, rounding_mode="trunc").float()
        coords = torch.stack([x - 1.0, y - 1.0, x + 1.0, y + 1.0], -1)
        image_idx = torch.arange(bsz).repeat_interleave(num_topk, 0)
        idxs = lv + len(shapes) * image_idx
        indices = torch_batched_nms(coords, ts, idxs, iou_threshold=0.3)
        results, min_num = [], NQ
        for i in range(bsz):
            per_img = ti[indices[image_idx[indices] == i]]
            min_num = min(per_img.shape[0], min_num)
            results.append(per_img)
        return torch.stack([r[:min_num] for r in results])

    def forward(self, feats, masks, pos_embeds):
        shapes = [f.shape[-2:] for f in feats]
        sizes = [h * w for h, w in shapes]
        starts = np.concatenate([[0], np.cumsum(sizes)]).tolist()
        bsz = feats[0].shape[0]

        flat = lambda xs: torch.cat([e.flatten(2).transpose(1, 2) for e in xs], 1)
        feat_flatten = flat(feats)
        mask_flatten = torch.cat([m.flatten(1) for m in masks], 1)
        lvl_pos = flat([p + l.view(1, -1, 1, 1)
                        for p, l in zip(pos_embeds, self.level_embeds)])
        valid_ratios = torch.stack(
            [torch.stack(
                [torch.sum(~m[:, 0, :], 1).float() / m.shape[2],
                 torch.sum(~m[:, :, 0], 1).float() / m.shape[1]], -1)
             for m in masks], 1,
        )  # (B, L, 2) as (w, h)

        backbone_output_memory = self.gen_encoder_output_proposals(
            feat_flatten + lvl_pos, mask_flatten, shapes
        )[0]

        # salience cascade (:117-165)
        valid_token_nums = torch.stack(
            [(~m).sum((1, 2)) for m in masks], -1
        )
        focus_token_nums = (
            valid_token_nums * torch.as_tensor(LEVEL_RATIO)
        ).int()
        level_token_nums = focus_token_nums.max(0)[0]
        focus_token_nums = focus_token_nums.sum(-1)

        selected_score, selected_inds, salience_score = [], [], []
        score = None
        for level_idx in range(len(shapes) - 1, -1, -1):
            s0, s1 = starts[level_idx], starts[level_idx + 1]
            level_memory = backbone_output_memory[:, s0:s1, :]
            mask = mask_flatten[:, s0:s1]
            if level_idx != len(shapes) - 1:
                up = F.interpolate(
                    score, size=shapes[level_idx], mode="bilinear", align_corners=True
                )
                up = up.view(bsz, -1, sizes[level_idx]).transpose(1, 2)
                level_memory = level_memory + level_memory * up * self.alpha[level_idx]
            score = self.enc_mask_predictor(level_memory)
            valid_score = score.squeeze(-1).masked_fill(mask, score.min())
            score = score.transpose(1, 2).view(bsz, -1, *shapes[level_idx])
            level_score, level_inds = valid_score.topk(
                int(level_token_nums[level_idx]), dim=1
            )
            selected_inds.append(level_inds + s0)
            selected_score.append(level_score)
            salience_score.append(score)

        selected_score = torch.cat(selected_score[::-1], 1)
        index = torch.sort(selected_score, dim=1, descending=True)[1]
        selected_inds = torch.cat(selected_inds[::-1], 1).gather(1, index)
        num_inds = selected_inds.shape[1]
        layer_inds = [
            selected_inds[:, : int(num_inds * r)] for r in LAYER_RATIO
        ]
        salience_score = salience_score[::-1]
        foreground_score = flat([s.unsqueeze(1) if s.ndim == 3 else s
                                 for s in salience_score]).squeeze(-1)
        foreground_score = foreground_score.masked_fill(
            mask_flatten, foreground_score.min()
        )

        # encoder (:434-497)
        reference_points = self.get_reference_points(shapes, valid_ratios)
        b, n, s, p = reference_points.shape
        value = output = feat_flatten
        for layer_id, layer in enumerate(self.encoder.layers):
            inds = layer_inds[layer_id]
            inds_q = inds.unsqueeze(-1).expand(-1, -1, C)
            query = torch.gather(output, 1, inds_q)
            query_pos = torch.gather(lvl_pos, 1, inds_q)
            fg_pre = torch.gather(foreground_score, 1, inds)
            ref = torch.gather(
                reference_points.view(b, n, -1), 1,
                inds.unsqueeze(-1).repeat(1, 1, s * p),
            ).view(b, -1, s, p)
            score_tgt = self.encoder_class_head(query)
            query = layer(
                query, query_pos, value, ref, shapes, mask_flatten, score_tgt, fg_pre
            )
            outs = []
            for i in range(bsz):
                no_pad = inds[i][: focus_token_nums[i]]
                outs.append(
                    output[i].scatter(
                        0, no_pad.unsqueeze(-1).repeat(1, C),
                        query[i][: focus_token_nums[i]],
                    )
                )
            output = torch.stack(outs)

        bg = torch.cat(
            [self.encoder.background_embedding(m).flatten(2).transpose(1, 2)
             for m in masks], 1,
        )
        bg = bg.scatter(1, layer_inds[-1].unsqueeze(-1).expand(-1, -1, C), 0)
        bg = bg * (~mask_flatten).unsqueeze(-1)
        memory = output + bg

        # neck re-fusion (:185-192)
        feat_unflat = {
            i: memory[:, starts[i]:starts[i + 1]].transpose(1, 2).reshape(
                bsz, C, *shapes[i]
            )
            for i in range(len(shapes))
        }
        memory = torch.cat(
            [f.flatten(2).transpose(1, 2) for f in self.neck(feat_unflat).values()], 1
        )

        # two-stage selection (:195-212)
        output_memory, output_proposals = self.gen_encoder_output_proposals(
            memory, mask_flatten, shapes
        )
        enc_class_full = self.encoder_class_head(output_memory)
        enc_coord_full = (self.encoder_bbox_head(output_memory) + output_proposals).sigmoid()
        topk = min(NQ * 4, enc_class_full.shape[1])
        topk_scores, topk_index = torch.topk(enc_class_full.max(-1)[0], topk, dim=1)
        topk_index = self.nms_on_topk_index(
            topk_scores, topk_index, shapes, starts[:-1]
        ).unsqueeze(-1)
        enc_class = enc_class_full.gather(1, topk_index.expand(-1, -1, NCLS))
        enc_coord = enc_coord_full.gather(1, topk_index.expand(-1, -1, 4))

        # decoder (:215-243, :626-674)
        reference_points = enc_coord.detach()
        query = self.tgt_embed.weight[: enc_coord.shape[1]].expand(bsz, -1, -1)
        outputs_classes, outputs_coords = [], []
        vr_scale = torch.cat([valid_ratios, valid_ratios], -1)[:, None]
        for li, layer in enumerate(self.decoder.layers):
            ref_in = reference_points.detach()[:, :, None] * vr_scale
            query_sine = torch_get_sine_pos_embed(ref_in[:, :, 0, :], C // 2)
            query_pos = self.decoder.ref_point_head(query_sine)
            query = layer(
                query, query_pos, ref_in, memory, shapes, mask_flatten, None
            )
            normed = self.decoder.norm(query)
            out_class = self.decoder.class_head[li](normed)
            out_coord = (
                self.decoder.bbox_head[li](normed)
                + torch_inverse_sigmoid(reference_points)
            ).sigmoid()
            outputs_classes.append(out_class)
            outputs_coords.append(out_coord)
            if li == DEC_LAYERS - 1:
                break
            reference_points = (
                self.decoder.bbox_head[li](query)
                + torch_inverse_sigmoid(reference_points.detach())
            ).sigmoid()

        return (
            torch.stack(outputs_classes), torch.stack(outputs_coords),
            enc_class, enc_coord, salience_score,
        )


class TorchSalienceDETR(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchResNet18()
        self.neck = TorchChannelMapper([128, 256, 512], C, NL)
        self.transformer = TorchSalienceTransformer()

        class _DN(nn.Module):
            def __init__(self):
                super().__init__()
                self.label_encoder = nn.Embedding(NCLS, C)

        self.denoising_generator = _DN()

    def forward(self, images):
        feats = self.neck(self.backbone(images))
        masks = [torch.zeros(images.shape[0], *f.shape[-2:], dtype=torch.bool)
                 for f in feats]
        pos = [torch_sine_position_embedding(m, C // 2, offset=-0.5) for m in masks]
        return self.transformer(feats, masks, pos)


# ==========================================================================
# weight randomization + conversion
# ==========================================================================


def _randomize_state(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, t in model.state_dict().items():
            if name.endswith("running_var"):
                t.copy_(torch.rand(t.shape, generator=g) + 0.5)
            elif name.endswith("running_mean"):
                t.copy_(0.01 * torch.randn(t.shape, generator=g))
            elif t.ndim <= 1:
                if name.endswith("weight"):  # norm scales
                    t.copy_(0.8 + 0.4 * torch.rand(t.shape, generator=g))
                else:  # biases, alpha
                    t.copy_(0.02 * torch.randn(t.shape, generator=g))
            else:
                fan_in = int(np.prod(t.shape[1:]))
                t.copy_(torch.randn(t.shape, generator=g) / math.sqrt(max(fan_in, 1)))
    return model


def _build_flax():
    cfg = SalienceDETRConfig(
        backbone="resnet18", embed_dim=C, num_classes=NCLS, num_queries=NQ,
        num_encoder_layers=ENC_LAYERS, num_decoder_layers=DEC_LAYERS,
        num_heads=NH, dim_feedforward=D_FFN, topk_sa=TOPK_SA,
        level_filter_ratio=LEVEL_RATIO, layer_filter_ratio=LAYER_RATIO,
        max_num_embedding=MAX_EMB, denoising_nums=4,
        shared_sampling_locations=False, min_size=H, max_size=W,
        select_box_nums_for_evaluation=20,
    )
    model, _, _, _ = build_salience_detr(cfg)
    return cfg, model


def test_full_model_parity():
    tm = _randomize_state(TorchSalienceDETR(), seed=0).eval()
    rules = salience_detr_rules(
        backbone="resnet18",
        num_encoder_layers=ENC_LAYERS, num_decoder_layers=DEC_LAYERS,
        num_levels=NL, num_channel_mapper_convs=NL,
    )
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    flat, missing, unused = convert_state_dict(state, rules)
    assert not missing, f"rules reference missing torch keys: {missing[:10]}"
    assert not unused, f"torch keys not covered by rules: {unused[:10]}"
    variables = flat_to_nested(flat)

    rng = np.random.default_rng(42)
    images = rng.normal(size=(B, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        t_cls, t_coord, t_enc_cls, t_enc_coord, t_sal = tm(
            torch.from_numpy(images).permute(0, 3, 1, 2).contiguous()
        )

    _, model = _build_flax()
    out = model.apply(
        variables, jnp.asarray(images),
        jnp.asarray([[H, W]] * B, jnp.int32), train=False,
    )

    # salience maps (cascade order low->high level)
    for lvl, t_s in enumerate(t_sal):
        np.testing.assert_allclose(
            np.asarray(out["salience"][lvl])[..., 0],
            t_s.squeeze(1).numpy(), rtol=RTOL, atol=1e-4,
            err_msg=f"salience level {lvl}",
        )

    # two-stage NMS-selected proposals: exact same selection required
    np.testing.assert_allclose(
        np.asarray(out["enc_class"]), t_enc_cls.numpy(), rtol=RTOL, atol=ATOL,
        err_msg="enc_class (NMS selection)",
    )
    np.testing.assert_allclose(
        np.asarray(out["enc_coord"]), t_enc_coord.numpy(), rtol=RTOL, atol=ATOL,
        err_msg="enc_coord",
    )

    # decoder outputs, every layer
    np.testing.assert_allclose(
        np.asarray(out["pred_class"]), t_cls.numpy(), rtol=RTOL, atol=ATOL,
        err_msg="pred_class",
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_coord"]), t_coord.numpy(), rtol=RTOL, atol=ATOL,
        err_msg="pred_coord",
    )
