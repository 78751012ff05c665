"""SAM3: text-promptable segmentation, JAX/Flax, TPU-native.

Replaces the external ``sam3`` PyTorch package the reference wraps
(call sites: saber/adapters/sam3/predictor.py:98-113 ``build_sam3_image_model``
+ ``Sam3Processor``, :145-164 ``build_sam3_video_model`` with the tracker
grafted onto the detector backbone, and classifier/models/SAM3.py:47-60).

Architecture (SAM3 = "Segment Anything with Concepts" family):

- **VL vision backbone**: a windowed ViT trunk (Perception-Encoder-style,
  stride-16 patches, a few global-attention blocks) + a ViTDet-style simple
  FPN neck producing the *SAM2-compatible backbone output* — the same
  ``{vision_features, backbone_fpn[/4,/8,/16], vision_pos_enc}`` dict the
  Hiera encoder yields — which is exactly the "sam2_backbone_out
  compatibility layer" the reference's classifier reads
  (classifier/models/SAM3.py:139-151). At the default 1008 px input the
  embedding is 63×63×256, matching the reference's documented shape
  (SAM3.py:23-26).
- **Text encoder**: CLIP-style causal transformer over BPE tokens
  (saber_tpu/models/text/tokenizer.py).
- **Detector**: DETR-style — a fusion encoder where image tokens attend to
  the text prompt, learned object queries + one presence token, and
  per-query mask / score / box heads. Recognition is decoupled from
  localization: final score = sigmoid(query logit) · sigmoid(presence
  logit), the semantics behind the reference's
  ``presence = sigmoid(obj_scores)`` per-frame gating
  (adapters/sam3/predictor.py:408-438).
- **Tracker**: SAM2's prompt/mask/memory heads (models/sam2.py
  ``_setup_sam_heads``) driven by models/video.py's scan — the functional
  analog of ``predictor = sam3_model.tracker;
  predictor.backbone = sam3_model.detector.backbone`` (predictor.py:162-164).

TPU-first choices mirror the Hiera encoder: NHWC, windows folded into the
batch axis, bf16 matmuls with fp32 norms, fixed-capacity (num_queries)
detection output filtered only at the numpy boundary.
"""

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from saber_tpu.models.attention import scaled_dot_product_attention
from saber_tpu.models.hiera import window_partition, window_unpartition
from saber_tpu.models.mask_decoder import MLP
from saber_tpu.models.norms import LayerNormFast
from saber_tpu.models.position_encoding import position_embedding_sine
from saber_tpu.models.sam2 import SAM2


@dataclasses.dataclass(frozen=True)
class SAM3Config:
    """Architecture hyperparameters. Field names shared with SAM2Config
    where models/video.py's VideoCore reads them (feat_size, image_size,
    d_model, mem_dim, num_maskmem, max_obj_ptrs_in_encoder, dtype)."""
    name: str = "large"
    image_size: int = 1008
    patch_size: int = 16
    # ViT trunk
    vit_width: int = 1024
    vit_depth: int = 24
    vit_heads: int = 16
    window_size: int = 9                 # 63 = 7·9 → no window padding
    global_att_blocks: Tuple[int, ...] = (5, 11, 17, 23)
    # text tower
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 768
    text_depth: int = 12
    text_heads: int = 12
    # detector
    num_queries: int = 200
    fusion_layers: int = 2
    decoder_layers: int = 6
    # shared with the SAM2 tracker heads
    d_model: int = 256
    mem_dim: int = 64
    num_maskmem: int = 7
    max_obj_ptrs_in_encoder: int = 16
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    dtype: Any = jnp.float32

    @property
    def feat_size(self):
        return self.image_size // self.patch_size


PRESETS: Dict[str, Dict[str, Any]] = {
    # full-size model (PE-L-scale trunk)
    "large": dict(vit_width=1024, vit_depth=24, vit_heads=16,
                  text_width=768, text_depth=12, text_heads=12,
                  num_queries=200, fusion_layers=2, decoder_layers=6),
    "base": dict(vit_width=768, vit_depth=12, vit_heads=12,
                 text_width=512, text_depth=6, text_heads=8,
                 num_queries=100, fusion_layers=2, decoder_layers=4),
    # CI/CPU-sized preset for contract and shape tests
    "test": dict(vit_width=64, vit_depth=2, vit_heads=2,
                 window_size=0, global_att_blocks=(),
                 text_width=64, text_depth=2, text_heads=2,
                 num_queries=8, fusion_layers=1, decoder_layers=1),
}


def get_config(name: str, image_size: Optional[int] = None,
               dtype=jnp.float32, num_maskmem: int = 7) -> SAM3Config:
    if name not in PRESETS:
        raise ValueError(f"unknown SAM3 config '{name}', want one of {list(PRESETS)}")
    kw = dict(PRESETS[name])
    if image_size is None:
        image_size = 1008 if name != "test" else 64
    return SAM3Config(name=name, image_size=image_size, dtype=dtype,
                      num_maskmem=num_maskmem, **kw)


# ---------------------------------------------------------------------------
# vision trunk + neck
# ---------------------------------------------------------------------------


class ViTBlock(nn.Module):
    """Pre-LN transformer block with optional window attention."""
    width: int
    heads: int
    window_size: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        shortcut = x
        x = LayerNormFast(name="norm1")(x)
        window = self.window_size
        if window > 0 and window < min(h, w):
            x, pad_hw = window_partition(x, window)
        else:
            window = 0
        bb, hh, ww, _ = x.shape
        xt = x.reshape(bb, hh * ww, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(xt)
        head_dim = c // self.heads
        q = qkv[..., :c].reshape(bb, hh * ww, self.heads, head_dim)
        k = qkv[..., c:2 * c].reshape(bb, hh * ww, self.heads, head_dim)
        v = qkv[..., 2 * c:].reshape(bb, hh * ww, self.heads, head_dim)
        out = scaled_dot_product_attention(q, k, v).reshape(bb, hh, ww, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(
            out.reshape(bb, hh * ww, c)).reshape(bb, hh, ww, c)
        if window > 0:
            out = window_unpartition(out, window, pad_hw, (h, w))
        x = shortcut + out

        y = LayerNormFast(name="norm2")(x)
        yt = y.reshape(b, h * w, c)
        yt = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(yt)
        yt = nn.gelu(yt, approximate=False)
        yt = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(yt)
        return x + yt.reshape(b, h, w, c)


class SAM3ImageEncoder(nn.Module):
    """Windowed ViT trunk + ViTDet simple-FPN neck.

    Output contract identical to models/fpn.py ImageEncoder so the SAM2
    tracker heads and VideoCore consume it unchanged.
    """
    cfg: SAM3Config

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3)
        cfg = self.cfg
        dt = cfg.dtype
        p = cfg.patch_size
        x = nn.Conv(cfg.vit_width, (p, p), strides=(p, p), dtype=dt,
                    name="patch_embed")(x.astype(dt))
        b, h, w, c = x.shape
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, h, w, c))
        x = x + pos.astype(x.dtype)
        for i in range(cfg.vit_depth):
            win = 0 if i in cfg.global_att_blocks else cfg.window_size
            x = ViTBlock(width=c, heads=cfg.vit_heads, window_size=win,
                         dtype=dt, name=f"blocks_{i}")(x)
        x = LayerNormFast(name="norm")(x)

        d = cfg.d_model

        def head(y, name):
            y = nn.Conv(d, (1, 1), use_bias=False, dtype=dt,
                        name=f"{name}_lateral")(y)
            y = LayerNormFast(name=f"{name}_ln1")(y)
            y = nn.Conv(d, (3, 3), padding=1, use_bias=False, dtype=dt,
                        name=f"{name}_out")(y)
            return LayerNormFast(name=f"{name}_ln2")(y)

        # /16 (the SAM image embedding), /8 and /4 via transposed convs
        p16 = head(x, "p16")
        # transpose_kernel=True so torch ConvTranspose2d weights convert
        # with the same verified _convT rule as the SAM2 decoder upscaler
        u8 = nn.ConvTranspose(c // 2, (2, 2), strides=(2, 2), dtype=dt,
                              transpose_kernel=True, name="up8")(x)
        p8 = head(u8, "p8")
        u4 = nn.gelu(u8, approximate=False)
        u4 = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2), dtype=dt,
                              transpose_kernel=True, name="up4")(u4)
        p4 = head(u4, "p4")

        outs = [p4, p8, p16]
        poss = [position_embedding_sine(o.shape[1], o.shape[2], d).astype(o.dtype)
                for o in outs]
        return {
            "vision_features": p16,     # (B, 63, 63, 256) at 1008 input
            "vision_pos_enc": poss,
            "backbone_fpn": outs,       # [/4, /8, /16]
        }


# ---------------------------------------------------------------------------
# text tower
# ---------------------------------------------------------------------------


class TextBlock(nn.Module):
    """Causal pre-LN transformer block over (B, L, C) tokens."""
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal_bias):
        c = self.width
        y = LayerNormFast(name="norm1")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        hd = c // self.heads
        b, l, _ = x.shape
        q = qkv[..., :c].reshape(b, l, self.heads, hd)
        k = qkv[..., c:2 * c].reshape(b, l, self.heads, hd)
        v = qkv[..., 2 * c:].reshape(b, l, self.heads, hd)
        logits = jnp.einsum("bthd,bshd->bhts", q, k) * (hd ** -0.5)
        probs = jax.nn.softmax(logits.astype(jnp.float32) + causal_bias,
                               axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, l, c)
        x = x + nn.Dense(c, dtype=self.dtype, name="proj")(out)
        y = LayerNormFast(name="norm2")(x)
        y = nn.Dense(4 * c, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        return x + nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)


class TextEncoderModule(nn.Module):
    """CLIP-style text transformer → per-token features in d_model."""
    cfg: SAM3Config

    @nn.compact
    def __call__(self, tokens):  # (B, L) int32
        cfg = self.cfg
        emb = nn.Embed(cfg.vocab_size, cfg.text_width,
                       embedding_init=nn.initializers.normal(0.02),
                       name="token_embedding")(tokens)
        pos = self.param("pos_embed", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.text_width))
        x = emb + pos[None, : tokens.shape[1]].astype(emb.dtype)
        l = tokens.shape[1]
        causal = jnp.where(
            jnp.tril(jnp.ones((l, l), bool)), 0.0, -1e9)[None, None]
        for i in range(cfg.text_depth):
            x = TextBlock(width=cfg.text_width, heads=cfg.text_heads,
                          dtype=cfg.dtype, name=f"blocks_{i}")(x, causal)
        x = LayerNormFast(name="final_norm")(x)
        seq = nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype,
                       name="text_proj")(x)                     # (B, L, d)
        # pooled embedding at the EOT token (highest id in CLIP vocab)
        eot = jnp.argmax(tokens, axis=-1)                        # (B,)
        pooled = jnp.take_along_axis(seq, eot[:, None, None], axis=1)[:, 0]
        valid = (tokens != 0)                                    # (B, L)
        return {"seq": seq, "pooled": pooled, "valid": valid}


# ---------------------------------------------------------------------------
# detector (fusion encoder + query decoder + heads)
# ---------------------------------------------------------------------------


def _cross_attention(q_in, kv_in, heads, key_bias, dtype, name_prefix):
    """Pre-projected multi-head cross attention (small token counts)."""
    d = q_in.shape[-1]
    hd = d // heads
    b, tq, _ = q_in.shape
    tk = kv_in.shape[1]
    q = nn.Dense(d, dtype=dtype, name=f"{name_prefix}_q")(q_in)
    k = nn.Dense(d, dtype=dtype, name=f"{name_prefix}_k")(kv_in)
    v = nn.Dense(d, dtype=dtype, name=f"{name_prefix}_v")(kv_in)
    q = q.reshape(b, tq, heads, hd)
    k = k.reshape(b, tk, heads, hd)
    v = v.reshape(b, tk, heads, hd)
    logits = jnp.einsum("bthd,bshd->bhts", q, k) * (hd ** -0.5)
    if key_bias is not None:
        logits = logits + key_bias[:, None, None, :]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q_in.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, tq, d)
    return nn.Dense(d, dtype=dtype, name=f"{name_prefix}_o")(out)


class FusionLayer(nn.Module):
    """Image tokens: self-attention + cross-attention into the prompt."""
    heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, img_pos, text_seq, text_bias):
        d = img.shape[-1]
        y = LayerNormFast(name="norm1")(img) + img_pos
        b, t, _ = y.shape
        hd = d // self.heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(y)
        q = qkv[..., :d].reshape(b, t, self.heads, hd)
        k = qkv[..., d:2 * d].reshape(b, t, self.heads, hd)
        v = qkv[..., 2 * d:].reshape(b, t, self.heads, hd)
        out = scaled_dot_product_attention(q, k, v).reshape(b, t, d)
        img = img + nn.Dense(d, dtype=self.dtype, name="proj")(out)
        y = LayerNormFast(name="norm2")(img)
        img = img + _cross_attention(y, text_seq, self.heads, text_bias,
                                     self.dtype, "text_cross")
        y = LayerNormFast(name="norm3")(img)
        y = nn.Dense(4 * d, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        return img + nn.Dense(d, dtype=self.dtype, name="mlp_fc2")(y)


class DecoderLayer(nn.Module):
    """Object queries: self-attention + cross-attention into fused image."""
    heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, img, img_pos):
        d = queries.shape[-1]
        b, nq, _ = queries.shape
        hd = d // self.heads
        y = LayerNormFast(name="norm1")(queries)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(y)
        q = qkv[..., :d].reshape(b, nq, self.heads, hd)
        k = qkv[..., d:2 * d].reshape(b, nq, self.heads, hd)
        v = qkv[..., 2 * d:].reshape(b, nq, self.heads, hd)
        out = scaled_dot_product_attention(q, k, v).reshape(b, nq, d)
        queries = queries + nn.Dense(d, dtype=self.dtype, name="proj")(out)
        y = LayerNormFast(name="norm2")(queries)
        queries = queries + _cross_attention(
            y, img + img_pos, self.heads, None, self.dtype, "img_cross")
        y = LayerNormFast(name="norm3")(queries)
        y = nn.Dense(4 * d, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        return queries + nn.Dense(d, dtype=self.dtype, name="mlp_fc2")(y)


class Detector(nn.Module):
    """Text-conditioned open-vocabulary detector over backbone features."""
    cfg: SAM3Config

    @nn.compact
    def __call__(self, backbone, text):
        cfg = self.cfg
        d = cfg.d_model
        dt = cfg.dtype
        feats = backbone["vision_features"]                # (B, fs, fs, d)
        b, fh, fw, _ = feats.shape
        img = feats.reshape(b, fh * fw, d)
        img_pos = position_embedding_sine(fh, fw, d).reshape(
            1, fh * fw, d).astype(img.dtype)
        img_pos = jnp.broadcast_to(img_pos, img.shape)

        text_seq = text["seq"].astype(img.dtype)
        text_bias = jnp.where(text["valid"], 0.0, -1e9).astype(jnp.float32)

        # prompt-conditioned fusion encoder
        for i in range(cfg.fusion_layers):
            img = FusionLayer(dtype=dt, name=f"fusion_{i}")(
                img, img_pos, text_seq, text_bias)

        # learned object queries + presence token, seeded with the pooled
        # prompt embedding so recognition is text-conditioned from step 0
        q_embed = self.param("query_embed", nn.initializers.normal(0.02),
                             (cfg.num_queries + 1, d))
        queries = (q_embed[None].astype(img.dtype)
                   + text["pooled"][:, None].astype(img.dtype))
        for i in range(cfg.decoder_layers):
            queries = DecoderLayer(dtype=dt, name=f"decoder_{i}")(
                queries, img, img_pos)
        queries = LayerNormFast(name="decoder_norm")(queries)
        obj_q, presence_q = queries[:, :-1], queries[:, -1]

        # heads. Recognition decoupled from localization: the per-query
        # logit scores "is this instance the concept", the presence token
        # scores "does the concept appear at all".
        score_logits = nn.Dense(1, dtype=jnp.float32, name="score_head")(
            obj_q.astype(jnp.float32))[..., 0]             # (B, Q)
        presence_logit = nn.Dense(1, dtype=jnp.float32, name="presence_head")(
            presence_q.astype(jnp.float32))                # (B, 1)
        boxes = jax.nn.sigmoid(
            MLP(d, 4, 3, dtype=jnp.float32, name="box_head")(
                obj_q.astype(jnp.float32)))                # (B, Q, 4) cxcywh

        # mask head: queries dot a pixel-embedding of the /4 FPN level
        pix = backbone["backbone_fpn"][0]                  # (B, 4fs, 4fs, d)
        pix = nn.Conv(d, (3, 3), padding=1, dtype=dt, name="pixel_conv1")(pix)
        pix = LayerNormFast(name="pixel_ln")(pix)
        pix = nn.gelu(pix, approximate=False)
        pix = nn.Conv(d, (3, 3), padding=1, dtype=dt, name="pixel_conv2")(pix)
        mask_embed = MLP(d, d, 3, dtype=dt, name="mask_embed")(obj_q)
        mask_logits = jnp.einsum("bqc,bhwc->bqhw",
                                 mask_embed.astype(jnp.float32),
                                 pix.astype(jnp.float32))  # (B, Q, 4fs, 4fs)
        return {
            "mask_logits": mask_logits,
            "score_logits": score_logits,
            "presence_logit": presence_logit,
            "boxes": boxes,
        }


# ---------------------------------------------------------------------------
# assembled model
# ---------------------------------------------------------------------------


class SAM3(SAM2):
    """SAM3 = VL backbone + text detector + SAM2 tracker heads.

    Subclasses SAM2 so the tracker surface (decode / encode_memory /
    condition_features / …) is literally the same code over the grafted
    backbone, as in the reference (adapters/sam3/predictor.py:162-164).
    """
    config: SAM3Config

    def setup(self):
        cfg = self.config
        self.image_encoder = SAM3ImageEncoder(cfg, name="vl_backbone")
        self._setup_sam_heads()
        self.text_encoder = TextEncoderModule(cfg, name="text")
        self.detector = Detector(cfg, name="detector")

    def encode_text(self, tokens: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """(B, L) int32 BPE tokens → {seq, pooled, valid}."""
        return self.text_encoder(tokens)

    def detect(self, backbone, text) -> Dict[str, jnp.ndarray]:
        """Text-prompted detection over encoded image features.

        Returns mask_logits (B, Q, H/4, W/4), score_logits (B, Q),
        presence_logit (B, 1), boxes (B, Q, 4) normalized cxcywh.
        """
        return self.detector(backbone, text)

    def __call__(self, images, tokens, points=None, labels=None):
        """Init-time forward touching every submodule."""
        backbone = self.encode_image(images)
        text = self.encode_text(tokens)
        det = self.detect(backbone, text)
        if points is None:
            points = jnp.zeros((images.shape[0], 1, 2), jnp.float32)
            labels = -jnp.ones((images.shape[0], 1), jnp.int32)
        masks, iou, obj_logits = SAM2.__call__(self, images, points, labels)
        return det, (masks, iou, obj_logits)


def build_sam3(cfg_name: str = "large", image_size: Optional[int] = None,
               dtype=jnp.float32, num_maskmem: int = 7,
               checkpoint: Optional[str] = None, seed: int = 0):
    """Build a SAM3 model + params (build_sam3_video_model analog,
    reference adapters/sam3/predictor.py:145-164). The returned model
    serves image detection, volume tracking, and classifier feature
    extraction; random init when no checkpoint is available (the official
    weights are HF-gated, reference pretrained_weights.py:68-101)."""
    config = get_config(cfg_name, image_size=image_size, dtype=dtype,
                        num_maskmem=num_maskmem)
    model = SAM3(config)
    if checkpoint is not None:
        from saber_tpu.models.weights import load_checkpoint
        params = load_checkpoint(checkpoint, model)
    else:
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, config.image_size, config.image_size, 3),
                          jnp.float32)
        toks = jnp.zeros((1, config.context_length), jnp.int32)
        toks = toks.at[0, 0].set(1)
        # jitted init: one compiled program instead of op-by-op dispatch
        # (material on remote-TPU links; see build_sam2)
        params = jax.jit(model.init)(rng, dummy, toks)["params"]
    return model, params


class SAM3Processor:
    """Functional analog of the sam3 package's Sam3Processor
    (reference adapters/sam3/predictor.py:99-126).

    ``set_image`` encodes once; ``set_text_prompt`` runs the detector and
    returns the full fixed-capacity candidate set (masks at original
    resolution, scores already presence-modulated); thresholding happens at
    the adapter boundary like the reference (:119-123).
    """

    def __init__(self, model: SAM3, params, tokenizer=None):
        self.model = model
        self.params = params
        if tokenizer is None:
            from saber_tpu.models.text.tokenizer import get_tokenizer
            tokenizer = get_tokenizer()
        self.tokenizer = tokenizer
        self._encode = jax.jit(
            lambda p, img: model.apply({"params": p}, img,
                                       method=SAM3.encode_image))
        def _detect(p, backbone, tokens):
            text = model.apply({"params": p}, tokens, method=SAM3.encode_text)
            return model.apply({"params": p}, backbone, text,
                               method=SAM3.detect)
        self._detect = jax.jit(_detect)

    def set_image(self, image: np.ndarray) -> Dict[str, Any]:
        """image: (H, W) or (H, W, 3) float in [0, 1] (prep.prepare output).
        Returns a state dict with cached backbone features."""
        from saber_tpu.ops import preprocessing as prep
        img = jnp.asarray(image, jnp.float32)
        orig_hw = img.shape[:2]
        if img.ndim == 2:
            img = prep.prepare(img, to_rgb=True)
        size = self.model.config.image_size
        if img.shape[:2] != (size, size):
            img = jax.image.resize(img, (size, size, 3), method="bilinear")
        img = img * 2.0 - 1.0           # [-1, 1], reference preprocessing.py:59
        backbone = self._encode(self.params, img[None])
        return {"backbone": backbone, "orig_hw": orig_hw}

    def set_text_prompt(self, state: Dict[str, Any], prompt: str
                        ) -> Dict[str, np.ndarray]:
        tokens = jnp.asarray(self.tokenizer([prompt]), jnp.int32)
        det = self._detect(self.params, state["backbone"], tokens)
        h, w = state["orig_hw"]
        logits = det["mask_logits"][0]                     # (Q, h4, w4)
        q = logits.shape[0]
        logits = jax.image.resize(logits, (q, h, w), method="bilinear")
        scores = (jax.nn.sigmoid(det["score_logits"][0])
                  * jax.nn.sigmoid(det["presence_logit"][0, 0]))
        order = jnp.argsort(-scores)
        logits = np.asarray(jnp.take(logits, order, axis=0))[:, None]  # (Q,1,H,W)
        scores = np.asarray(jnp.take(scores, order))
        boxes = np.asarray(jnp.take(det["boxes"][0], order, axis=0))
        return {
            "masks": logits > 0.0,
            "masks_logits": logits,
            "scores": scores,
            "boxes": boxes,
        }
