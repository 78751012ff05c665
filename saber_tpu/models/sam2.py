"""SAM2 model assembly: encoder, prompt/mask heads, memory modules.

Replaces ``build_sam2`` / ``build_sam2_video_predictor`` from the external
sam2 package (reference call sites saber/adapters/sam2/automask.py:49-86,
adapters/sam2/predictor.py:24-34). The torch package's stateful predictor
(inference_state dicts, forward hooks) becomes a functional core:

- ``SAM2.encode_image``: batched NHWC encoder over z-slices — the
  embarrassingly parallel part that saturates the MXU.
- ``SAM2.decode``: prompt encoder + mask decoder; object-score logits are
  returned, not hooked (SURVEY.md §7.4).
- ``SAM2.encode_memory`` / ``SAM2.condition_features``: memory encoder and
  memory attention used by the propagation scan in models/video.py.

Presets mirror the four checkpoints the reference downloads
(saber/pretrained_weights.py:20-65): tiny/small/base/large.
"""

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from saber_tpu.models.fpn import FpnNeck, ImageEncoder
from saber_tpu.models.hiera import Hiera
from saber_tpu.models.mask_decoder import MLP, MaskDecoder
from saber_tpu.models.memory import MemoryAttention, MemoryEncoder
from saber_tpu.models.position_encoding import position_embedding_sine
from saber_tpu.models.prompt_encoder import PromptEncoder


@dataclasses.dataclass(frozen=True)
class SAM2Config:
    """Architecture hyperparameters for one model size."""
    name: str = "tiny"
    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (1, 2, 7, 2)
    global_att_blocks: Tuple[int, ...] = (5, 7, 9)
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (7, 7)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    image_size: int = 1024
    d_model: int = 256
    mem_dim: int = 64
    num_maskmem: int = 7            # 1 conditioning + 6 recent
    max_obj_ptrs_in_encoder: int = 16
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    dtype: Any = jnp.float32
    fused_encoder: bool = False  # fused Pallas MultiScaleBlock kernels

    @property
    def backbone_channel_list(self):
        return tuple(int(self.embed_dim * 2**i) for i in range(len(self.stages)))

    @property
    def feat_size(self):
        return self.image_size // 16


PRESETS: Dict[str, Dict[str, Any]] = {
    "tiny": dict(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
                 global_att_blocks=(5, 7, 9),
                 window_pos_embed_bkg_spatial_size=(7, 7),
                 window_spec=(8, 4, 14, 7)),
    "small": dict(embed_dim=96, num_heads=1, stages=(1, 2, 11, 2),
                  global_att_blocks=(7, 10, 13),
                  window_pos_embed_bkg_spatial_size=(7, 7),
                  window_spec=(8, 4, 14, 7)),
    "base": dict(embed_dim=112, num_heads=2, stages=(2, 3, 16, 3),
                 global_att_blocks=(12, 16, 20),
                 window_pos_embed_bkg_spatial_size=(14, 14),
                 window_spec=(8, 4, 14, 7)),
    "large": dict(embed_dim=144, num_heads=2, stages=(2, 6, 36, 4),
                  global_att_blocks=(23, 33, 43),
                  window_pos_embed_bkg_spatial_size=(7, 7),
                  window_spec=(8, 4, 16, 8)),
}


def get_config(name: str, image_size: int = 1024, dtype=jnp.float32,
               num_maskmem: int = 7,
               fused_encoder: Optional[bool] = None) -> SAM2Config:
    if name not in PRESETS:
        raise ValueError(f"unknown SAM2 config '{name}', want one of {list(PRESETS)}")
    if fused_encoder is None:
        # Default ON for TPU: measured 1.8x encoder speedup on a real
        # v5e chip (39.1 vs 21.7 slices/s, hiera-L 1024^2 batch 8 —
        # tools/bench_encoder.py). On CPU the kernels only exist in
        # interpret mode (slow emulation; the XLA path is equivalence-
        # tested in tests/test_fused_block.py), so default OFF there.
        # SABER_FUSED_BLOCK=0/1 forces either way.
        import os
        env = os.environ.get("SABER_FUSED_BLOCK")
        if env is not None:
            fused_encoder = env == "1"
        else:
            import jax
            fused_encoder = jax.default_backend() == "tpu"
    return SAM2Config(name=name, image_size=image_size, dtype=dtype,
                      num_maskmem=num_maskmem, fused_encoder=fused_encoder,
                      **PRESETS[name])


class SAM2(nn.Module):
    """The assembled model. Methods are separately applyable heads."""
    config: SAM2Config

    def setup(self):
        cfg = self.config
        self.image_encoder = ImageEncoder(
            trunk=Hiera(
                embed_dim=cfg.embed_dim, num_heads=cfg.num_heads,
                stages=cfg.stages, global_att_blocks=cfg.global_att_blocks,
                window_pos_embed_bkg_spatial_size=cfg.window_pos_embed_bkg_spatial_size,
                window_spec=cfg.window_spec, dtype=cfg.dtype,
                fused=cfg.fused_encoder, name="trunk"),
            neck=FpnNeck(d_model=cfg.d_model,
                         backbone_channel_list=cfg.backbone_channel_list,
                         dtype=cfg.dtype, name="neck"),
            scalp=1)
        self._setup_sam_heads()

    def _setup_sam_heads(self):
        """Prompt/mask/memory heads + video-mode params.

        Shared with SAM3 (models/sam3.py), whose tracker is SAM2's heads
        grafted onto the SAM3 VL backbone — mirroring the reference's
        ``predictor.backbone = sam3_model.detector.backbone``
        (saber/adapters/sam3/predictor.py:162-164).
        """
        cfg = self.config
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=cfg.d_model,
            image_embedding_size=(cfg.feat_size, cfg.feat_size),
            input_image_size=(cfg.image_size, cfg.image_size),
            dtype=cfg.dtype)
        self.sam_mask_decoder = MaskDecoder(
            transformer_dim=cfg.d_model, dtype=cfg.dtype)
        self.memory_attention = MemoryAttention(d_model=cfg.d_model, dtype=cfg.dtype)
        self.memory_encoder = MemoryEncoder(out_dim=cfg.mem_dim, in_dim=cfg.d_model,
                                            dtype=cfg.dtype)
        # video-mode parameters (SAM2Base)
        self.no_mem_embed = self.param(
            "no_mem_embed", nn.initializers.zeros, (1, 1, cfg.d_model))
        self.no_mem_pos_enc = self.param(
            "no_mem_pos_enc", nn.initializers.zeros, (1, 1, cfg.d_model))
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", nn.initializers.zeros,
            (cfg.num_maskmem, 1, 1, cfg.mem_dim))
        self.no_obj_embed_spatial = self.param(
            "no_obj_embed_spatial", nn.initializers.zeros, (1, cfg.mem_dim))
        self.obj_ptr_proj = MLP(cfg.d_model, cfg.d_model, 3, dtype=cfg.dtype,
                                name="obj_ptr_proj")
        self.obj_ptr_tpos_proj = nn.Dense(cfg.mem_dim, name="obj_ptr_tpos_proj")

    # ------------------------------------------------------------------
    # Heads (each usable via nn.apply(..., method=...))
    # ------------------------------------------------------------------

    def encode_image(self, images: jnp.ndarray) -> Dict[str, Any]:
        """images: (B, H, W, 3) normalized. Returns backbone features."""
        out = self.image_encoder(images.astype(self.config.dtype))
        return out

    def project_high_res(self, backbone: Dict[str, Any]) -> Dict[str, Any]:
        """Apply the decoder's high-res skip projections (conv_s0/s1) to
        backbone_fpn[0:2] ONCE per frame — torch SAM2Base._forward_image
        parity: torch projects right after the image encoder, not per
        decode. Shrinks the per-frame /4 skip 8× (256→32 ch) and /8 skip
        4×, so the video scan's per-frame gathers, the per-object
        broadcasts in models/video.step, and the AMG sweep stop paying
        for 256-channel maps (a (256,4,256,256) bf16 broadcast per slice
        — 134 MB — in the round-3 device trace). ``decode`` detects
        projected features by channel count, so both raw and projected
        backbones stay valid inputs everywhere."""
        fpn = list(backbone["backbone_fpn"])
        f0, f1 = self.sam_mask_decoder(
            None, None, None, None, high_res_features=[fpn[0], fpn[1]],
            project_high_res_only=True)
        out = dict(backbone)
        out["backbone_fpn"] = [f0, f1] + fpn[2:]
        return out

    def encode_video_frames(self, images: jnp.ndarray) -> Dict[str, Any]:
        """encode_image + project_high_res: the per-frame feature set the
        video propagation scan consumes."""
        return self.project_high_res(self.encode_image(images))

    def decode(self, backbone: Dict[str, Any],
               points: Optional[jnp.ndarray] = None,
               labels: Optional[jnp.ndarray] = None,
               mask_inputs: Optional[jnp.ndarray] = None,
               multimask_output: bool = True,
               conditioned_embed: Optional[jnp.ndarray] = None,
               dynamic_multimask: bool = True):
        """Prompt-conditioned mask prediction.

        backbone: output of encode_image (batch must match prompts).
        conditioned_embed: optional memory-conditioned /16 embedding that
        overrides backbone['vision_features'] (video mode).
        Returns (low_res_masks (B,K,256,256), iou (B,K), sam_tokens, obj_logits).
        """
        embed = (conditioned_embed if conditioned_embed is not None
                 else backbone["vision_features"])
        if conditioned_embed is None:
            # single-image mode: SAM2 adds no_mem_embed to the /16 feature
            c = embed.shape[-1]
            embed = embed + self.no_mem_embed[0].reshape(1, 1, 1, c).astype(embed.dtype)
        high_res = [backbone["backbone_fpn"][0], backbone["backbone_fpn"][1]]
        # prompt batch comes from the prompts; image features may ride a
        # batch-1 axis and broadcast lazily inside the decoder (the AMG
        # sweeps hundreds of prompts against ONE crop's features —
        # materializing (P, 256, 256, 256) fpn broadcasts cost ~25 GB at
        # 1024 px before this)
        batch = (points.shape[0] if points is not None
                 else mask_inputs.shape[0] if mask_inputs is not None
                 else embed.shape[0])
        sparse, dense = self.sam_prompt_encoder(
            points=points, labels=labels, masks=mask_inputs, batch=batch)
        image_pe = self.sam_prompt_encoder.get_dense_pe()
        return self.sam_mask_decoder(
            embed, image_pe, sparse, dense, high_res_features=high_res,
            multimask_output=multimask_output, dynamic_multimask=dynamic_multimask)

    def encode_memory(self, vision_features: jnp.ndarray, mask_logits: jnp.ndarray,
                      object_score_logits: Optional[jnp.ndarray] = None):
        """Encode a frame's predicted mask into memory features.

        vision_features: (B, H, W, 256); mask_logits: (B, 16H, 16W, 1) raw.
        Returns (B, H*W, mem_dim) tokens.
        """
        cfg = self.config
        m = jax.nn.sigmoid(mask_logits)
        m = m * cfg.sigmoid_scale_for_mem_enc + cfg.sigmoid_bias_for_mem_enc
        feats = self.memory_encoder(vision_features, m)
        b, h, w, c = feats.shape
        feats = feats.reshape(b, h * w, c)
        if object_score_logits is not None:
            # sam2.1 occlusion handling: blend in no-object embedding
            is_obj = jax.nn.sigmoid(object_score_logits)  # (B, 1)
            feats = feats + (1.0 - is_obj[..., None]) * self.no_obj_embed_spatial[None]
        return feats

    def memory_pos_enc(self) -> jnp.ndarray:
        """(H*W, mem_dim) sine positional encoding for memory tokens."""
        cfg = self.config
        pe = position_embedding_sine(cfg.feat_size, cfg.feat_size, cfg.mem_dim)
        return pe.reshape(-1, cfg.mem_dim)

    def condition_features(self, vision_tokens: jnp.ndarray,
                           vision_pos: jnp.ndarray,
                           memory: jnp.ndarray, memory_pos: jnp.ndarray,
                           num_obj_ptr_tokens: int,
                           attn_bias: Optional[jnp.ndarray] = None):
        """Memory-attention conditioning of current-frame tokens.

        vision_tokens: (B, T, 256); memory: (B, S, 64) (+ptr tokens at end).
        """
        return self.memory_attention(
            vision_tokens, memory, curr_pos=vision_pos, memory_pos=memory_pos,
            num_obj_ptr_tokens=num_obj_ptr_tokens, attn_bias=attn_bias)

    def project_obj_ptr(self, sam_token: jnp.ndarray) -> jnp.ndarray:
        """SAM output token (B, 256) → object pointer (B, 256)."""
        return self.obj_ptr_proj(sam_token)

    def obj_ptr_tpos(self, t_diff: jnp.ndarray) -> jnp.ndarray:
        """Signed temporal distance → (…, mem_dim) encoding (sam2.1).

        Matches upstream ``get_1d_sine_pe(pos / (max_obj_ptrs - 1), d_model)``
        followed by ``obj_ptr_tpos_proj``: paired frequency exponents
        ``10000**(2*(i//2)/pe_dim)`` and no 2*pi factor, so the learned
        projection sees the encodings it was trained on.
        """
        cfg = self.config
        t = t_diff.astype(jnp.float32) / float(cfg.max_obj_ptrs_in_encoder - 1)
        half = cfg.d_model // 2
        idx = jnp.arange(half, dtype=jnp.float32)
        dim_t = 10000.0 ** (2.0 * jnp.floor(idx / 2.0) / half)
        ang = t[..., None] / dim_t
        enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        return self.obj_ptr_tpos_proj(enc)

    def __call__(self, images, points=None, labels=None):
        """Convenience forward (init + single-image prompt decode)."""
        backbone = self.encode_image(images)
        masks, iou, sam_tokens, obj_logits = self.decode(
            backbone, points=points, labels=labels)
        # touch all prompt/video-mode modules so init creates their params
        fs = self.config.feat_size
        _ = self.sam_prompt_encoder(
            masks=jnp.zeros((images.shape[0], 4 * fs, 4 * fs, 1)))
        _ = self.project_obj_ptr(sam_tokens[:, 0])
        full = jax.image.resize(
            masks[:, :1].transpose(0, 2, 3, 1),
            (masks.shape[0], self.config.image_size, self.config.image_size, 1),
            method="bilinear")
        mem = self.encode_memory(backbone["vision_features"], full, obj_logits)
        b, t, c = mem.shape
        pos = jnp.broadcast_to(self.memory_pos_enc()[None], (b, t, c))
        vis_pos = backbone["vision_pos_enc"][-1].reshape(1, -1, self.config.d_model)
        vis_pos = jnp.broadcast_to(vis_pos, (b, t, self.config.d_model))
        feats = backbone["vision_features"].reshape(b, -1, self.config.d_model)
        _ = self.condition_features(
            feats, vis_pos,
            mem + self.maskmem_tpos_enc[0].reshape(1, 1, -1),
            pos, num_obj_ptr_tokens=0)
        _ = self.obj_ptr_tpos(jnp.zeros((b,)))
        return masks, iou, obj_logits


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic-convolution kernel with torch's A=-0.75 (F.interpolate
    bicubic). jax.image.resize uses Keys a=-0.5, which diverges from the
    official SAM2 pos-embed interpolation enough to matter for parity."""
    ax = np.abs(x)
    return np.where(
        ax <= 1, ((a + 2) * ax - (a + 3)) * ax * ax + 1,
        np.where(ax < 2, (((ax - 5) * ax + 8) * ax - 4) * a, 0.0))


def bicubic_resize_torch(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W, C) → (out_h, out_w, C), matching torch F.interpolate
    (mode='bicubic', align_corners=False): half-pixel centers, A=-0.75,
    clamped borders."""
    def resize_axis(arr, out_len, axis):
        in_len = arr.shape[axis]
        if in_len == out_len:
            return arr
        scale = in_len / out_len
        coords = (np.arange(out_len) + 0.5) * scale - 0.5
        base = np.floor(coords).astype(np.int64)
        taps = base[:, None] + np.arange(-1, 3)[None]          # (out, 4)
        w = _cubic_kernel(taps - coords[:, None])              # (out, 4)
        taps = np.clip(taps, 0, in_len - 1)
        moved = np.moveaxis(np.asarray(arr, np.float64), axis, 0)
        out = np.einsum("of,of...->o...", w, moved[taps])
        return np.moveaxis(out, 0, axis)

    return resize_axis(resize_axis(img, out_h, 0), out_w, 1).astype(
        np.asarray(img).dtype)


def bake_pos_embed(params, config: SAM2Config):
    """Pre-interpolate the Hiera background pos embedding to the /4 grid.

    The resize otherwise re-runs inside every encoder call, and the baked
    (host numpy) path reproduces torch's bicubic exactly — the official
    Hiera interpolates with F.interpolate(mode='bicubic') at every
    forward. The baked params remain correct for this image_size only;
    Hiera skips the resize when shapes already match.
    """
    trunk = dict(params["trunk"])
    bkg = np.asarray(trunk["pos_embed"])
    side = config.image_size // 4
    if bkg.shape[1:3] != (side, side):
        trunk["pos_embed"] = jnp.asarray(
            bicubic_resize_torch(bkg[0], side, side)[None])
    out = dict(params)
    out["trunk"] = trunk
    return out


def build_sam2(cfg_name: str = "tiny", image_size: int = 1024,
               dtype=jnp.float32, num_maskmem: int = 7,
               checkpoint: Optional[str] = None, seed: int = 0,
               fused_encoder: Optional[bool] = None):
    """Build a SAM2 model + params.

    Analog of the sam2 package's build_sam2 (reference automask.py:56-62).
    With ``checkpoint`` set, loads converted weights
    (saber_tpu/models/weights.py); otherwise random init.
    Returns (model, params).
    """
    config = get_config(cfg_name, image_size=image_size, dtype=dtype,
                        num_maskmem=num_maskmem, fused_encoder=fused_encoder)
    model = SAM2(config)
    if checkpoint is not None:
        from saber_tpu.models.weights import load_checkpoint
        params = load_checkpoint(checkpoint, model)
    else:
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        pts = jnp.zeros((1, 1, 2), jnp.float32)
        lbl = jnp.ones((1, 1), jnp.int32)
        # jit the init: eager flax init runs the whole forward op-by-op —
        # thousands of separate dispatches on a remote-TPU link (~6 min of
        # pure RPC issue for hiera-large). One compiled program instead,
        # persistently cached across processes.
        params = jax.jit(model.init)(rng, dummy, pts, lbl)["params"]
    params = bake_pos_embed(params, config)
    return model, params
