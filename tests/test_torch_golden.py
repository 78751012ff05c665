"""Module-level torch golden tests (SURVEY.md §4 strategy 3; VERDICT r1 #6).

Independent PyTorch mini-implementations of the riskiest SAM2 modules —
written here from the official architecture semantics (the sam2 package
the reference imports at saber/adapters/sam2/predictor.py:24-34), NOT
copied — load the SAME synthetic official-layout state dict that
models/weights.py converts for the Flax stack. Activation deltas between
the torch and JAX forwards catch any transpose/ordering/layout regression
in the converter or the modules:

- Hiera MultiScaleBlock: q-pooling, stage-transition projection, window
  partition with padding, global attention
- MaskDecoder: two-way transformer, ConvTranspose upscaler with high-res
  skips, hypernetwork mask synthesis, IoU/object heads, dynamic
  multimask-via-stability selection
- Memory attention layer: complex-RoPE (torch) vs real-valued axial RoPE
  (JAX), multi-frame key repeat, object-pointer tokens excluded from
  rotation, additive key bias
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from saber_tpu.models.hiera import MultiScaleBlock
from saber_tpu.models.mask_decoder import MaskDecoder
from saber_tpu.models.memory import MemoryAttentionLayer
from saber_tpu.models.sam2 import SAM2, get_config
from saber_tpu.models.weights import (convert_torch_state_dict,
                                      expected_state_dict_shapes)

TOL = 2e-4  # fp32 activation budget per module forward
# mask logits reach |x|~20 after the hypernetwork einsum over 512 tokens;
# budget relative error there (measured agreement ~1e-5 relative)
REL_TOL = 5e-5


@pytest.fixture(scope="module")
def synth():
    """One synthetic official-shape checkpoint, converted once."""
    model = SAM2(get_config("tiny", image_size=64))
    shapes = expected_state_dict_shapes(model)
    rng = np.random.default_rng(0)
    sd = {}
    for k, shp in shapes.items():
        if k.endswith(".weight") and len(shp) == 1:  # LayerNorm scales ≈ 1
            sd[k] = (1.0 + 0.1 * rng.standard_normal(shp)).astype(np.float32)
        else:
            sd[k] = (0.08 * rng.standard_normal(shp)).astype(np.float32)
    params = convert_torch_state_dict(sd, model)
    tsd = {k: torch.from_numpy(v) for k, v in sd.items()}
    return sd, tsd, params


def _sub_sd(tsd, prefix):
    return {k[len(prefix):]: v for k, v in tsd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# torch reference modules (official semantics, independent implementation)
# ---------------------------------------------------------------------------


def _do_pool(x, pool):
    """(B, H, W, C) → pooled, via NCHW maxpool (official Hiera do_pool)."""
    x = x.permute(0, 3, 1, 2)
    x = pool(x)
    return x.permute(0, 2, 3, 1)


def _window_partition_t(x, window):
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    hp, wp = h + pad_h, w + pad_w
    x = x.view(b, hp // window, window, wp // window, window, c)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def _window_unpartition_t(x, window, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // window) * (wp // window))
    x = x.view(b, hp // window, wp // window, window, window, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class TorchMSAttention(tnn.Module):
    def __init__(self, dim, dim_out, num_heads, q_pool=None):
        super().__init__()
        self.dim_out, self.num_heads, self.q_pool = dim_out, num_heads, q_pool
        self.qkv = tnn.Linear(dim, dim_out * 3)
        self.proj = tnn.Linear(dim_out, dim_out)

    def forward(self, x):
        b, h, w, _ = x.shape
        qkv = self.qkv(x.reshape(b, h * w, -1))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, -1)
        q, k, v = torch.unbind(qkv, 2)
        if self.q_pool is not None:
            q = _do_pool(q.reshape(b, h, w, -1), self.q_pool)
            h, w = q.shape[1], q.shape[2]
            q = q.reshape(b, h * w, self.num_heads, -1)
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        out = out.transpose(1, 2).reshape(b, h, w, -1)
        return self.proj(out)


class TorchMultiScaleBlock(tnn.Module):
    """Official Hiera block semantics (norm→(proj+pool shortcut)→windowed
    attention with q-pool→residual→MLP)."""

    def __init__(self, dim, dim_out, num_heads, window_size, q_stride=None):
        super().__init__()
        self.dim, self.dim_out = dim, dim_out
        self.window_size = window_size
        self.q_stride = q_stride
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.norm2 = tnn.LayerNorm(dim_out, eps=1e-6)
        self.pool = (tnn.MaxPool2d(q_stride, q_stride, ceil_mode=False)
                     if q_stride else None)
        self.attn = TorchMSAttention(dim, dim_out, num_heads, self.pool)
        mlp_hidden = int(dim_out * 4)
        self.mlp = tnn.ModuleDict({
            "layers": tnn.ModuleList([tnn.Linear(dim_out, mlp_hidden),
                                      tnn.Linear(mlp_hidden, dim_out)])})
        if dim != dim_out:
            self.proj = tnn.Linear(dim, dim_out)

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.dim != self.dim_out:
            shortcut = _do_pool(self.proj(x), self.pool) \
                if self.pool else self.proj(x)
        window = self.window_size
        hw = (x.shape[1], x.shape[2])
        pad_hw = hw
        if window > 0:
            x, pad_hw = _window_partition_t(x, window)
        x = self.attn(x)
        if self.q_stride:
            window = self.window_size // self.q_stride[0]
            hw = (shortcut.shape[1], shortcut.shape[2])
            pad_hw = (pad_hw[0] // self.q_stride[0],
                      pad_hw[1] // self.q_stride[1])
        if self.window_size > 0:
            x = _window_unpartition_t(x, window, pad_hw, hw)
        x = shortcut + x
        y = self.norm2(x)
        y = self.mlp["layers"][1](F.gelu(self.mlp["layers"][0](y)))
        return x + y


class TorchAttentionDS(tnn.Module):
    """SAM Attention with internal downsampling."""

    def __init__(self, dim, num_heads, downsample_rate=1, kv_in_dim=None):
        super().__init__()
        internal = dim // downsample_rate
        kv_in = kv_in_dim or dim
        self.num_heads = num_heads
        self.q_proj = tnn.Linear(dim, internal)
        self.k_proj = tnn.Linear(kv_in, internal)
        self.v_proj = tnn.Linear(kv_in, internal)
        self.out_proj = tnn.Linear(internal, dim)

    def _heads(self, x):
        b, t, c = x.shape
        return x.reshape(b, t, self.num_heads, c // self.num_heads).transpose(1, 2)

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        q, k, v = self._heads(q), self._heads(k), self._heads(v)
        out = F.scaled_dot_product_attention(q, k, v)
        b, h, t, d = out.shape
        return self.out_proj(out.transpose(1, 2).reshape(b, t, h * d))


class TorchTwoWayBlock(tnn.Module):
    def __init__(self, dim=256, heads=8, mlp_dim=2048, skip_first_pe=False):
        super().__init__()
        self.skip_first_pe = skip_first_pe
        self.self_attn = TorchAttentionDS(dim, heads)
        self.cross_attn_token_to_image = TorchAttentionDS(dim, heads, 2)
        self.cross_attn_image_to_token = TorchAttentionDS(dim, heads, 2)
        self.norm1, self.norm2 = tnn.LayerNorm(dim), tnn.LayerNorm(dim)
        self.norm3, self.norm4 = tnn.LayerNorm(dim), tnn.LayerNorm(dim)
        self.mlp = tnn.ModuleDict({"layers": tnn.ModuleList(
            [tnn.Linear(dim, mlp_dim), tnn.Linear(mlp_dim, dim)])})

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + self.cross_attn_token_to_image(q, k, keys)
        queries = self.norm2(queries)
        m = self.mlp["layers"][1](F.relu(self.mlp["layers"][0](queries)))
        queries = self.norm3(queries + m)
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + self.cross_attn_image_to_token(k, q, queries)
        keys = self.norm4(keys)
        return queries, keys


class TorchMaskDecoder(tnn.Module):
    """Official MaskDecoder semantics over NCHW tensors."""

    def __init__(self, dim=256):
        super().__init__()
        self.transformer = tnn.ModuleDict({
            "layers": tnn.ModuleList([TorchTwoWayBlock(dim, skip_first_pe=(i == 0))
                                      for i in range(2)]),
            "final_attn_token_to_image": TorchAttentionDS(dim, 8, 2),
            "norm_final_attn": tnn.LayerNorm(dim),
        })
        self.iou_token = tnn.Embedding(1, dim)
        self.mask_tokens = tnn.Embedding(4, dim)
        self.obj_score_token = tnn.Embedding(1, dim)
        self.output_upscaling = tnn.ModuleList([
            tnn.ConvTranspose2d(dim, dim // 4, 2, 2),
            tnn.LayerNorm(dim // 4),  # LayerNorm2d semantics applied manually
            tnn.Identity(),
            tnn.ConvTranspose2d(dim // 4, dim // 8, 2, 2),
        ])
        self.conv_s0 = tnn.Conv2d(dim, dim // 8, 1)
        self.conv_s1 = tnn.Conv2d(dim, dim // 4, 1)

        def mlp3(i, o):
            return tnn.ModuleDict({"layers": tnn.ModuleList(
                [tnn.Linear(i, i), tnn.Linear(i, i), tnn.Linear(i, o)])})

        self.output_hypernetworks_mlps = tnn.ModuleList(
            [mlp3(dim, dim // 8) for _ in range(4)])
        self.iou_prediction_head = mlp3(dim, 4)
        self.pred_obj_score_head = mlp3(dim, 1)

    @staticmethod
    def _mlp(mod, x, sigmoid=False):
        ls = mod["layers"]
        x = F.relu(ls[0](x))
        x = F.relu(ls[1](x))
        x = ls[2](x)
        return torch.sigmoid(x) if sigmoid else x

    def forward(self, image_embeddings, image_pe, sparse, dense,
                high_res_features, multimask_output, dynamic=True):
        b = sparse.shape[0]
        out_tokens = torch.cat([self.obj_score_token.weight,
                                self.iou_token.weight,
                                self.mask_tokens.weight], 0)
        tokens = torch.cat(
            [out_tokens.unsqueeze(0).expand(b, -1, -1), sparse], 1)

        src = image_embeddings + dense                       # (B, C, H, W)
        bq, c, h, w = src.shape
        keys = src.flatten(2).permute(0, 2, 1)
        key_pe = image_pe.flatten(2).permute(0, 2, 1).expand(b, -1, -1)
        queries = tokens
        for layer in self.transformer["layers"]:
            queries, keys = layer(queries, keys, tokens, key_pe)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + self.transformer["final_attn_token_to_image"](
            q, k, keys)
        hs = self.transformer["norm_final_attn"](queries)

        iou_token_out = hs[:, 1]
        mask_tokens_out = hs[:, 2:6]
        self.last_tokens = mask_tokens_out  # for obj-ptr composition tests

        src_img = keys.permute(0, 2, 1).reshape(b, c, h, w)
        feat_s0, feat_s1 = high_res_features
        up = self.output_upscaling[0](src_img) + self.conv_s1(feat_s1)
        up = self.output_upscaling[1](
            up.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)  # LayerNorm2d
        up = F.gelu(up)
        up = self.output_upscaling[3](up) + self.conv_s0(feat_s0)
        up = F.gelu(up)

        hyper = torch.stack(
            [self._mlp(self.output_hypernetworks_mlps[i], mask_tokens_out[:, i])
             for i in range(4)], 1)                           # (B, 4, c/8)
        masks = torch.einsum("bkc,bchw->bkhw", hyper, up)
        iou_pred = self._mlp(self.iou_prediction_head, iou_token_out,
                             sigmoid=True)
        obj = self._mlp(self.pred_obj_score_head, hs[:, 0])

        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:], obj
        if dynamic:
            delta = 0.05
            ai = (masks[:, 0:1] > delta).sum((-2, -1)).float()
            au = (masks[:, 0:1] > -delta).sum((-2, -1)).float()
            stab = torch.where(au > 0, ai / au, torch.ones_like(au))
            stable = stab >= 0.98
            best = torch.argmax(iou_pred[:, 1:], -1)
            bidx = torch.arange(b)
            best_mask = masks[:, 1:][bidx, best].unsqueeze(1)
            best_iou = iou_pred[:, 1:][bidx, best].unsqueeze(1)
            out_mask = torch.where(stable[..., None, None], masks[:, 0:1],
                                   best_mask)
            out_iou = torch.where(stable, iou_pred[:, 0:1], best_iou)
            return out_mask, out_iou, obj
        return masks[:, 0:1], iou_pred[:, 0:1], obj


# --- complex-RoPE memory attention (official formulation) ------------------


def _axial_cis_t(dim, end_x, end_y, theta=10000.0):
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 4)[: dim // 4].float() / dim))
    t = torch.arange(end_x * end_y).float()
    fx = torch.outer(t % end_x, freqs)
    fy = torch.outer(t // end_x, freqs)
    return torch.cat([torch.polar(torch.ones_like(fx), fx),
                      torch.polar(torch.ones_like(fy), fy)], -1)  # (N, D/2)


def _apply_rope_t(xq, xk, freqs_cis, repeat_freqs_k, num_k_exclude_rope):
    """xq/xk: (B, H, T, D) head-major (official RoPEAttention layout)."""
    def rot(x, fc):
        xc = torch.view_as_complex(x.float().reshape(*x.shape[:-1], -1, 2))
        return torch.view_as_real(xc * fc[None, None]).flatten(3)

    xq_out = rot(xq, freqs_cis)
    num_k_rope = xk.shape[-2] - num_k_exclude_rope
    fk = freqs_cis
    if repeat_freqs_k and num_k_rope != freqs_cis.shape[0]:
        r = num_k_rope // freqs_cis.shape[0]
        fk = freqs_cis.repeat(r, 1)
    xk_rot = rot(xk[:, :, :num_k_rope], fk)
    if num_k_exclude_rope > 0:
        xk_rot = torch.cat([xk_rot, xk[:, :, num_k_rope:].float()], -2)
    return xq_out, xk_rot


class TorchRoPEAttention(tnn.Module):
    def __init__(self, dim=256, heads=1, kv_in_dim=None, rope_k_repeat=False):
        super().__init__()
        self.heads, self.rope_k_repeat = heads, rope_k_repeat
        kv_in = kv_in_dim or dim
        self.q_proj = tnn.Linear(dim, dim)
        self.k_proj = tnn.Linear(kv_in, dim)
        self.v_proj = tnn.Linear(kv_in, dim)
        self.out_proj = tnn.Linear(dim, dim)

    def forward(self, q, k, v, num_k_exclude_rope=0, key_bias=None):
        b, tq = q.shape[:2]
        tk = k.shape[1]
        hd = self.q_proj.out_features // self.heads
        qh = self.q_proj(q).reshape(b, tq, self.heads, hd).transpose(1, 2)
        kh = self.k_proj(k).reshape(b, tk, self.heads, hd).transpose(1, 2)
        vh = self.v_proj(v).reshape(b, tk, self.heads, hd).transpose(1, 2)
        side = int(round(math.sqrt(tq)))
        fc = _axial_cis_t(hd, side, side)
        qh, kh = _apply_rope_t(qh, kh, fc, self.rope_k_repeat,
                               num_k_exclude_rope)
        mask = None
        if key_bias is not None:
            mask = key_bias[:, None, None, :]
        out = F.scaled_dot_product_attention(qh, kh.to(vh.dtype),
                                             vh, attn_mask=mask)
        return self.out_proj(out.transpose(1, 2).reshape(b, tq, -1))


class TorchMemoryAttentionLayer(tnn.Module):
    """Official MemoryAttentionLayer defaults (pos_enc_at_attn=False,
    pos_enc_at_cross_attn_keys=True, queries=False)."""

    def __init__(self, d=256, mem_dim=64, ff=2048):
        super().__init__()
        self.self_attn = TorchRoPEAttention(d, 1)
        self.cross_attn_image = TorchRoPEAttention(d, 1, kv_in_dim=mem_dim,
                                                   rope_k_repeat=True)
        self.norm1 = tnn.LayerNorm(d, eps=1e-5)
        self.norm2 = tnn.LayerNorm(d, eps=1e-5)
        self.norm3 = tnn.LayerNorm(d, eps=1e-5)
        self.linear1 = tnn.Linear(d, ff)
        self.linear2 = tnn.Linear(ff, d)

    def forward(self, tgt, memory, pos, num_k_exclude_rope, key_bias=None):
        t2 = self.norm1(tgt)
        tgt = tgt + self.self_attn(t2, t2, t2)
        t2 = self.norm2(tgt)
        tgt = tgt + self.cross_attn_image(
            t2, memory + pos, memory,
            num_k_exclude_rope=num_k_exclude_rope, key_bias=key_bias)
        t2 = self.norm3(tgt)
        return tgt + self.linear2(F.relu(self.linear1(t2)))


# ---------------------------------------------------------------------------
# the golden tests
# ---------------------------------------------------------------------------


def _delta(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.max(np.abs(a - b)))


@pytest.mark.parametrize("block_idx,shape", [
    (0, (1, 16, 16, 96)),     # windowed (window 8), same-dim
    (1, (1, 16, 16, 96)),     # q-pool stage transition 96→192, window 4
    (5, (2, 4, 4, 384)),      # global attention block (window 0)
    (2, (1, 14, 14, 192)),    # window 4 with 14%4≠0 → padding path
    # the base/small/tiny window-14/7 geometries (the stages the TPU
    # PARTITIONED kernel covers — flax-vs-torch here + partitioned-vs-
    # flax in test_fused_block closes the chain to the TPU path):
    (4, (1, 16, 16, 384)),    # window 14 same-dim, 16%14≠0 → padding
    (10, (1, 14, 14, 384)),   # stage-4 transition, window 14 + q-pool
    (11, (1, 8, 8, 768)),     # window 7 same-dim, 8%7≠0 → padding
])
def test_hiera_block_golden(synth, block_idx, shape):
    sd, tsd, params = synth
    cfg = get_config("tiny", image_size=64)
    # reproduce the builder's per-block dims (models/hiera.py __call__)
    stage_ends = [sum(cfg.stages[:i]) - 1 for i in range(1, len(cfg.stages) + 1)]
    q_pool_blocks = [e + 1 for e in stage_ends[:3]]
    dim, heads, cur_stage = cfg.embed_dim, cfg.num_heads, 1
    for i in range(block_idx + 1):
        dim_out = dim
        window = cfg.window_spec[cur_stage - 1]
        if i in cfg.global_att_blocks:
            window = 0
        if i - 1 in stage_ends:
            dim_out, heads, cur_stage = dim * 2, heads * 2, cur_stage + 1
        q_stride = (2, 2) if i in q_pool_blocks else None
        if i < block_idx:
            dim = dim_out
    assert shape[-1] == dim

    tblock = TorchMultiScaleBlock(dim, dim_out, heads, window, q_stride)
    tblock.load_state_dict(_sub_sd(tsd, f"image_encoder.trunk.blocks.{block_idx}."))
    x = np.random.default_rng(block_idx).standard_normal(shape).astype(np.float32)
    with torch.no_grad():
        ref = tblock(torch.from_numpy(x)).numpy()

    fblock = MultiScaleBlock(dim=dim, dim_out=dim_out, num_heads=heads,
                             window_size=window, q_stride=q_stride)
    out = fblock.apply({"params": params["trunk"][f"blocks_{block_idx}"]},
                       jnp.asarray(x))
    assert _delta(ref, out) < TOL, (block_idx, _delta(ref, out))


@pytest.mark.parametrize("multimask,dynamic", [(True, False), (False, True),
                                               (False, False)])
def test_mask_decoder_golden(synth, multimask, dynamic):
    sd, tsd, params = synth
    d, h = 256, 8
    tdec = TorchMaskDecoder(d)
    tdec.load_state_dict(_sub_sd(tsd, "sam_mask_decoder."))
    rng = np.random.default_rng(1)
    embed = rng.standard_normal((2, d, h, h)).astype(np.float32)
    pe = rng.standard_normal((1, d, h, h)).astype(np.float32)
    sparse = rng.standard_normal((2, 3, d)).astype(np.float32)
    dense = rng.standard_normal((2, d, h, h)).astype(np.float32)
    s0 = rng.standard_normal((2, d, 4 * h, 4 * h)).astype(np.float32)
    s1 = rng.standard_normal((2, d, 2 * h, 2 * h)).astype(np.float32)

    with torch.no_grad():
        t_masks, t_iou, t_obj = tdec(
            torch.from_numpy(embed), torch.from_numpy(pe),
            torch.from_numpy(sparse), torch.from_numpy(dense),
            (torch.from_numpy(s0), torch.from_numpy(s1)),
            multimask_output=multimask, dynamic=dynamic)

    fdec = MaskDecoder(transformer_dim=d)
    nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    f_masks, f_iou, _, f_obj = fdec.apply(
        {"params": params["sam_mask_decoder"]},
        nhwc(embed), nhwc(pe)[0], jnp.asarray(sparse), nhwc(dense),
        high_res_features=[nhwc(s0), nhwc(s1)],
        multimask_output=multimask, dynamic_multimask=dynamic)

    scale = float(np.abs(t_masks.numpy()).max()) + 1.0
    assert _delta(t_masks.numpy(), f_masks) / scale < REL_TOL
    assert _delta(t_iou.numpy(), f_iou) < TOL
    assert _delta(t_obj.numpy(), f_obj) < TOL


def test_memory_attention_layer_golden(synth):
    """Complex-RoPE torch layer vs the real-valued JAX layer, with
    2-frame key repeat, 4 excluded pointer tokens, and a key bias."""
    sd, tsd, params = synth
    d, md, side = 256, 64, 8
    t = side * side
    layer = TorchMemoryAttentionLayer(d, md)
    layer.load_state_dict(_sub_sd(tsd, "memory_attention.layers.0."))

    rng = np.random.default_rng(2)
    tgt = rng.standard_normal((1, t, d)).astype(np.float32)
    memory = rng.standard_normal((1, 2 * t + 4, md)).astype(np.float32)
    pos = rng.standard_normal((1, 2 * t + 4, md)).astype(np.float32)
    bias = np.zeros((1, 2 * t + 4), np.float32)
    bias[0, t: 2 * t] = -1e9       # second memory frame masked out

    with torch.no_grad():
        ref = layer(torch.from_numpy(tgt), torch.from_numpy(memory),
                    torch.from_numpy(pos), num_k_exclude_rope=4,
                    key_bias=torch.from_numpy(bias)).numpy()

    flayer = MemoryAttentionLayer(d_model=d)
    out = flayer.apply({"params": params["memory_attention"]["layers_0"]},
                       jnp.asarray(tgt), jnp.asarray(memory),
                       pos=jnp.asarray(pos), num_k_exclude_rope=4,
                       attn_bias=jnp.asarray(bias)[:, None, None, :])
    assert _delta(ref, out) < TOL, _delta(ref, out)


def test_upscaler_conv_transpose_golden(synth):
    """The ConvTranspose layout rule in isolation (weights.py _convT)."""
    sd, tsd, params = synth
    w = tsd["sam_mask_decoder.output_upscaling.0.weight"]   # (256, 64, 2, 2)
    b = tsd["sam_mask_decoder.output_upscaling.0.bias"]
    x = np.random.default_rng(3).standard_normal((1, 256, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = F.conv_transpose2d(torch.from_numpy(x), w, b, stride=2).numpy()

    from flax import linen as fnn
    conv = fnn.ConvTranspose(64, (2, 2), strides=(2, 2), transpose_kernel=True)
    fparams = params["sam_mask_decoder"]["upscale_conv1"]
    out = conv.apply({"params": fparams},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert _delta(ref.transpose(0, 2, 3, 1), out) < TOL


# ---------------------------------------------------------------------------
# full image-pipeline golden: Hiera trunk + FPN neck + prompt encoder +
# decoder composed, vs SAM2.encode_image → SAM2.decode
# ---------------------------------------------------------------------------


def test_bicubic_matches_torch_interpolate():
    """bake_pos_embed's host bicubic == F.interpolate(mode='bicubic')."""
    from saber_tpu.models.sam2 import bicubic_resize_torch
    rng = np.random.default_rng(0)
    img = rng.standard_normal((7, 7, 5)).astype(np.float32)
    with torch.no_grad():
        ref = F.interpolate(torch.from_numpy(img.transpose(2, 0, 1))[None],
                            size=(16, 16), mode="bicubic",
                            align_corners=False)[0].numpy().transpose(1, 2, 0)
    out = bicubic_resize_torch(img, 16, 16)
    assert _delta(ref, out) < 1e-5


class TorchPromptEncoder(tnn.Module):
    """Official PromptEncoder semantics (points + dense mask paths)."""

    def __init__(self, dim=256, image_size=64, feat=4):
        super().__init__()
        self.dim, self.image_size, self.feat = dim, image_size, feat
        self.pe = tnn.Parameter(torch.zeros(2, dim // 2))
        self.point_embeddings = tnn.ModuleList(
            [tnn.Embedding(1, dim) for _ in range(4)])
        self.not_a_point_embed = tnn.Embedding(1, dim)
        self.no_mask_embed = tnn.Embedding(1, dim)
        self.mask_downscaling = tnn.Sequential(
            tnn.Conv2d(1, 4, 2, 2), tnn.LayerNorm(4, eps=1e-6), tnn.GELU(),
            tnn.Conv2d(4, 16, 2, 2), tnn.LayerNorm(16, eps=1e-6), tnn.GELU(),
            tnn.Conv2d(16, dim, 1))

    def load_from(self, tsd):
        self.pe.data = tsd[
            "sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
        for i in range(4):
            self.point_embeddings[i].weight.data = tsd[
                f"sam_prompt_encoder.point_embeddings.{i}.weight"]
        self.not_a_point_embed.weight.data = tsd[
            "sam_prompt_encoder.not_a_point_embed.weight"]
        self.no_mask_embed.weight.data = tsd[
            "sam_prompt_encoder.no_mask_embed.weight"]
        for dst, src in ((0, 0), (3, 3), (6, 6)):
            self.mask_downscaling[dst].weight.data = tsd[
                f"sam_prompt_encoder.mask_downscaling.{src}.weight"]
            self.mask_downscaling[dst].bias.data = tsd[
                f"sam_prompt_encoder.mask_downscaling.{src}.bias"]
        for dst in (1, 4):
            self.mask_downscaling[dst].weight.data = tsd[
                f"sam_prompt_encoder.mask_downscaling.{dst}.weight"]
            self.mask_downscaling[dst].bias.data = tsd[
                f"sam_prompt_encoder.mask_downscaling.{dst}.bias"]

    def _pe_encode(self, coords):
        coords = 2 * coords - 1
        coords = coords @ self.pe
        coords = 2 * np.pi * coords
        return torch.cat([torch.sin(coords), torch.cos(coords)], -1)

    def embed_points(self, points, labels):
        coords = (points + 0.5) / torch.tensor(
            [self.image_size, self.image_size], dtype=torch.float32)
        pe = self._pe_encode(coords)
        out = torch.where(labels[..., None] == -1,
                          self.not_a_point_embed.weight[0], pe)
        for i in range(4):
            out = out + torch.where(labels[..., None] == i,
                                    self.point_embeddings[i].weight[0],
                                    torch.zeros(()))
        return out

    def dense_pe(self):
        ys = (torch.arange(self.feat).float() + 0.5) / self.feat
        xs = (torch.arange(self.feat).float() + 0.5) / self.feat
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        grid = torch.stack([gx, gy], -1)
        return self._pe_encode(grid)                 # (H, W, C)

    def embed_mask(self, mask):  # (B, 1, 4H, 4W)
        x = mask
        for m in self.mask_downscaling:
            if isinstance(m, tnn.LayerNorm):
                x = m(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            else:
                x = m(x)
        return x


def test_prompt_encoder_golden(synth):
    sd, tsd, params = synth
    from saber_tpu.models.prompt_encoder import PromptEncoder
    tpe = TorchPromptEncoder(256, 64, 4)
    tpe.load_from(tsd)
    fpe = PromptEncoder(image_embedding_size=(4, 4),
                        input_image_size=(64, 64))
    rng = np.random.default_rng(4)
    pts = (rng.random((2, 3, 2)) * 64).astype(np.float32)
    lbl = np.asarray([[1, 0, -1], [2, 3, 1]], np.int32)
    with torch.no_grad():
        t_sparse = tpe.embed_points(torch.from_numpy(pts),
                                    torch.from_numpy(lbl))
        t_pe = tpe.dense_pe()
        mask = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
        t_dense = tpe.embed_mask(torch.from_numpy(mask))
    f_sparse, f_dense = fpe.apply(
        {"params": params["sam_prompt_encoder"]}, jnp.asarray(pts),
        jnp.asarray(lbl), jnp.asarray(mask.transpose(0, 2, 3, 1)))
    f_pe = fpe.apply({"params": params["sam_prompt_encoder"]},
                     method=PromptEncoder.get_dense_pe)
    assert _delta(t_sparse.numpy(), f_sparse) < TOL
    assert _delta(t_pe.numpy(), f_pe) < TOL
    assert _delta(t_dense.numpy().transpose(0, 2, 3, 1), f_dense) < TOL


class TorchMemoryEncoder(tnn.Module):
    """Official MemoryEncoder (skip_mask_sigmoid=True path)."""

    def __init__(self, dim=256, out_dim=64):
        super().__init__()
        enc = []
        ch = 1
        for _ in range(4):
            enc += [tnn.Conv2d(ch, ch * 4, 3, 2, 1), tnn.LayerNorm(ch * 4),
                    tnn.GELU()]
            ch *= 4
        enc.append(tnn.Conv2d(ch, dim, 1))
        self.encoder = tnn.Sequential(*enc)
        self.pix_feat_proj = tnn.Conv2d(dim, dim, 1)
        self.fusers = tnn.ModuleList()
        for _ in range(2):
            blk = tnn.ModuleDict({
                "dwconv": tnn.Conv2d(dim, dim, 7, padding=3, groups=dim),
                "norm": tnn.LayerNorm(dim, eps=1e-6),
                "pwconv1": tnn.Linear(dim, 4 * dim),
                "pwconv2": tnn.Linear(4 * dim, dim)})
            blk.gamma = tnn.Parameter(torch.ones(dim) * 1e-6)
            self.fusers.append(blk)
        self.out_proj = tnn.Conv2d(dim, out_dim, 1)

    def load_from(self, tsd):
        for li, seq in enumerate((0, 3, 6, 9)):
            self.encoder[seq].weight.data = tsd[
                f"memory_encoder.mask_downsampler.encoder.{seq}.weight"]
            self.encoder[seq].bias.data = tsd[
                f"memory_encoder.mask_downsampler.encoder.{seq}.bias"]
            self.encoder[seq + 1].weight.data = tsd[
                f"memory_encoder.mask_downsampler.encoder.{seq + 1}.weight"]
            self.encoder[seq + 1].bias.data = tsd[
                f"memory_encoder.mask_downsampler.encoder.{seq + 1}.bias"]
        self.encoder[12].weight.data = tsd[
            "memory_encoder.mask_downsampler.encoder.12.weight"]
        self.encoder[12].bias.data = tsd[
            "memory_encoder.mask_downsampler.encoder.12.bias"]
        self.pix_feat_proj.weight.data = tsd["memory_encoder.pix_feat_proj.weight"]
        self.pix_feat_proj.bias.data = tsd["memory_encoder.pix_feat_proj.bias"]
        for i, blk in enumerate(self.fusers):
            fb = f"memory_encoder.fuser.layers.{i}"
            blk["dwconv"].weight.data = tsd[f"{fb}.dwconv.weight"]
            blk["dwconv"].bias.data = tsd[f"{fb}.dwconv.bias"]
            blk["norm"].weight.data = tsd[f"{fb}.norm.weight"]
            blk["norm"].bias.data = tsd[f"{fb}.norm.bias"]
            blk["pwconv1"].weight.data = tsd[f"{fb}.pwconv1.weight"]
            blk["pwconv1"].bias.data = tsd[f"{fb}.pwconv1.bias"]
            blk["pwconv2"].weight.data = tsd[f"{fb}.pwconv2.weight"]
            blk["pwconv2"].bias.data = tsd[f"{fb}.pwconv2.bias"]
            blk.gamma.data = tsd[f"{fb}.gamma"]
        self.out_proj.weight.data = tsd["memory_encoder.out_proj.weight"]
        self.out_proj.bias.data = tsd["memory_encoder.out_proj.bias"]

    def forward(self, pix_feat, masks):  # NCHW, masks pre-scaled
        x = masks
        for m in self.encoder:
            if isinstance(m, tnn.LayerNorm):
                x = m(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            else:
                x = m(x)
        x = self.pix_feat_proj(pix_feat) + x
        for blk in self.fusers:
            inp = x
            x = blk["dwconv"](x).permute(0, 2, 3, 1)
            x = blk["norm"](x)
            x = blk["pwconv1"](x)
            x = F.gelu(x)
            x = blk["pwconv2"](x)
            x = inp + (blk.gamma * x).permute(0, 3, 1, 2)
        return self.out_proj(x)


def test_memory_encoder_golden(synth):
    sd, tsd, params = synth
    from saber_tpu.models.memory import MemoryEncoder
    tme = TorchMemoryEncoder()
    tme.load_from(tsd)
    rng = np.random.default_rng(5)
    pix = rng.standard_normal((1, 256, 4, 4)).astype(np.float32)
    masks = (rng.standard_normal((1, 1, 64, 64)) * 10).astype(np.float32)
    with torch.no_grad():
        ref = tme(torch.from_numpy(pix), torch.from_numpy(masks)).numpy()
    fme = MemoryEncoder()
    out = fme.apply({"params": params["memory_encoder"]},
                    jnp.asarray(pix.transpose(0, 2, 3, 1)),
                    jnp.asarray(masks.transpose(0, 2, 3, 1)))
    assert _delta(ref.transpose(0, 2, 3, 1), out) < TOL


class TorchHieraNeck(tnn.Module):
    """Official Hiera trunk + FpnNeck (tiny config, image 64)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        e = cfg.embed_dim
        self.patch = tnn.Conv2d(3, e, 7, 4, 3)
        stage_ends = [sum(cfg.stages[:i]) - 1
                      for i in range(1, len(cfg.stages) + 1)]
        q_pool_blocks = [x + 1 for x in stage_ends[:3]]
        self.stage_ends = stage_ends
        blocks = []
        dim, heads, cur = e, cfg.num_heads, 1
        for i in range(sum(cfg.stages)):
            dim_out = dim
            window = cfg.window_spec[cur - 1]
            if i in cfg.global_att_blocks:
                window = 0
            if i - 1 in stage_ends:
                dim_out, heads, cur = dim * 2, heads * 2, cur + 1
            blocks.append(TorchMultiScaleBlock(
                dim, dim_out, heads, window,
                (2, 2) if i in q_pool_blocks else None))
            dim = dim_out
        self.blocks = tnn.ModuleList(blocks)
        self.neck_convs = tnn.ModuleList(
            [tnn.Conv2d(c, 256, 1)
             for c in list(cfg.backbone_channel_list)[::-1]])

    def load_from(self, tsd):
        self.patch.weight.data = tsd["image_encoder.trunk.patch_embed.proj.weight"]
        self.patch.bias.data = tsd["image_encoder.trunk.patch_embed.proj.bias"]
        self.pos_embed = tsd["image_encoder.trunk.pos_embed"]
        self.pos_embed_window = tsd["image_encoder.trunk.pos_embed_window"]
        for i, blk in enumerate(self.blocks):
            blk.load_state_dict(_sub_sd(tsd, f"image_encoder.trunk.blocks.{i}."))
        for j, conv in enumerate(self.neck_convs):
            conv.weight.data = tsd[f"image_encoder.neck.convs.{j}.conv.weight"]
            conv.bias.data = tsd[f"image_encoder.neck.convs.{j}.conv.bias"]

    def forward(self, x):  # (B, H, W, 3) NHWC like the flax trunk
        x = self.patch(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        h, w = x.shape[1], x.shape[2]
        pos = F.interpolate(self.pos_embed, size=(h, w), mode="bicubic",
                            align_corners=False)
        win = self.pos_embed_window
        pos = pos + win.tile([a // b for a, b in zip(pos.shape, win.shape)])
        x = x + pos.permute(0, 2, 3, 1)
        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in self.stage_ends:
                outs.append(x)
        # FPN neck, top-down (official FpnNeck semantics)
        n = len(outs)
        feats = [None] * n
        prev = None
        for i in range(n - 1, -1, -1):
            lateral = self.neck_convs[n - 1 - i](
                outs[i].permute(0, 3, 1, 2))
            if i in (2, 3) and prev is not None:
                prev = lateral + F.interpolate(prev.float(), scale_factor=2.0,
                                               mode="nearest")
            else:
                prev = lateral
            feats[i] = prev
        return [f.permute(0, 2, 3, 1) for f in feats[:-1]]   # scalp=1


def test_full_image_pipeline_golden(synth):
    """encode_image → decode vs the composed torch modules: the BASELINE
    IoU≥0.99 gate at integration level (synthetic weights, image 64²)."""
    sd, tsd, params = synth
    from saber_tpu.models.sam2 import bake_pos_embed
    cfg = get_config("tiny", image_size=64)
    model = SAM2(cfg)
    params = bake_pos_embed(params, cfg)

    tnet = TorchHieraNeck(cfg)
    tnet.load_from(tsd)
    tdec = TorchMaskDecoder(256)
    tdec.load_state_dict(_sub_sd(tsd, "sam_mask_decoder."))
    tpe = TorchPromptEncoder(256, 64, cfg.feat_size)
    tpe.load_from(tsd)

    rng = np.random.default_rng(6)
    img = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    pts = np.asarray([[[32.0, 30.0], [0.0, 0.0]]], np.float32)
    lbl = np.asarray([[1, -1]], np.int32)

    with torch.no_grad():
        feats = tnet(torch.from_numpy(img))
        embed = feats[-1] + torch.from_numpy(np.asarray(
            params["no_mem_embed"]))[0].reshape(1, 1, 1, -1)
        sparse = tpe.embed_points(torch.from_numpy(pts),
                                  torch.from_numpy(lbl))
        dense = tpe.no_mask_embed.weight[0].reshape(1, 1, 1, -1).expand(
            1, cfg.feat_size, cfg.feat_size, 256)
        pe = tpe.dense_pe().permute(2, 0, 1)[None]
        nchw = lambda t: t.permute(0, 3, 1, 2).contiguous()
        t_masks, t_iou, t_obj = tdec(
            nchw(embed), pe, sparse, nchw(dense),
            (nchw(feats[0]), nchw(feats[1])),
            multimask_output=True, dynamic=False)

    backbone = model.apply({"params": params}, jnp.asarray(img),
                           method=SAM2.encode_image)
    f_masks, f_iou, _, f_obj = model.apply(
        {"params": params}, backbone, jnp.asarray(pts), jnp.asarray(lbl),
        method=SAM2.decode)

    scale = float(np.abs(t_masks.numpy()).max()) + 1.0
    assert _delta(t_masks.numpy(), f_masks) / scale < REL_TOL * 4
    assert _delta(t_iou.numpy(), f_iou) < 1e-3
    assert _delta(t_obj.numpy(), f_obj) < 1e-3
    # the gate itself: identical binarized masks → IoU 1.0 ≥ 0.99
    tm = t_masks.numpy() > 0
    fm = np.asarray(f_masks) > 0
    inter = (tm & fm).sum()
    union = (tm | fm).sum()
    assert union == 0 or inter / union >= 0.99
