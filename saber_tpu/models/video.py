"""Video/volume propagation as a functional scan.

TPU-native redesign of the torch SAM2 video predictor the reference wraps
(saber/adapters/sam2/predictor.py:182-348). The torch implementation keeps
a Python ``inference_state`` dict of per-frame tensors and iterates frames
in a Python generator; here the whole propagation is:

1. ``encode_batch``: the encoder runs over a *slab* of z-slices at once —
   the embarrassingly parallel half (SURVEY.md §5 "long-context").
2. ``propagate_slab``: a single ``lax.scan`` over the slab's frames. The
   carried ``PropagationState`` is a fixed-capacity pytree: a ring buffer
   of the ``num_maskmem-1`` most recent memory features, the conditioning
   (seed) frame's memory, and an object-pointer ring — torch's dicts of
   variable length become static slots masked with an additive attention
   bias.
3. Object-score logits come back as scan outputs (the reference needs a
   forward hook to see them, predictor.py:277-284).

All objects propagate together as the batch axis (B = num objects).
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from saber_tpu.models.sam2 import SAM2


def _M(model):
    """The model's class, used to select unbound methods for nn.apply.

    VideoCore drives any module exposing the SAM2 tracker surface
    (encode_image / decode / encode_memory / memory_pos_enc /
    condition_features / project_obj_ptr / obj_ptr_tpos) — SAM2 itself or
    SAM3, whose tracker is the same heads on the VL backbone (the
    reference grafts them the same way, adapters/sam3/predictor.py:162-164).
    """
    return type(model)


@struct.dataclass
class PropagationState:
    """Fixed-capacity memory bank carried through the propagation scan.

    All frame bookkeeping is PER OBJECT so that objects seeded at
    *different* frames can share one scan (multi-seed batching — the
    reference re-runs its whole propagation loop per seed slice,
    saber/segmenters/propagation.py:92-118; here every seed's objects
    ride the same ``lax.scan`` and activate when the scan reaches their
    conditioning frame)."""
    # ring of recent non-conditioning memories, slot 0 = newest
    mem_feats: jnp.ndarray    # (R, B, T, mem_dim)
    mem_frames: jnp.ndarray   # (R, B) int32 frame index, -1 = empty
    # conditioning (seed) frame
    cond_feats: jnp.ndarray   # (B, T, mem_dim)
    cond_frame: jnp.ndarray   # (B,) int32
    cond_ptr: jnp.ndarray     # (B, d_model)
    # object-pointer ring (most recent first)
    ptr: jnp.ndarray          # (P, B, d_model)
    ptr_frames: jnp.ndarray   # (P, B) int32, -1 = empty
    # object-slot validity (False = padding slot, never tracks)
    obj_valid: jnp.ndarray    # (B,) bool


def init_state(num_objects: int, cfg) -> PropagationState:
    r = max(cfg.num_maskmem - 1, 0)
    t = cfg.feat_size * cfg.feat_size
    p = cfg.max_obj_ptrs_in_encoder - 1
    b = num_objects
    return PropagationState(
        mem_feats=jnp.zeros((r, b, t, cfg.mem_dim), jnp.float32),
        mem_frames=-jnp.ones((r, b), jnp.int32),
        cond_feats=jnp.zeros((b, t, cfg.mem_dim), jnp.float32),
        cond_frame=-jnp.ones((b,), jnp.int32),
        cond_ptr=jnp.zeros((b, cfg.d_model), jnp.float32),
        ptr=jnp.zeros((p, b, cfg.d_model), jnp.float32),
        ptr_frames=-jnp.ones((p, b), jnp.int32),
        obj_valid=jnp.ones((b,), bool),
    )


class VideoCore:
    """Jit-compiled propagation primitives over a SAM2 model."""

    def __init__(self, model: SAM2):
        self.model = model
        self.cfg = model.config

    # -- encoder ---------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def encode_batch(self, params, images: jnp.ndarray):
        """images: (F, S, S, 3) → backbone pytree (batched over frames).

        High-res skips come back PROJECTED (conv_s0/s1 applied once per
        frame — SAM2.project_high_res): fpn0 is C/8 and fpn1 C/4 channels,
        which the decoder consumes as-is."""
        return self.model.apply({"params": params}, images,
                                method=_M(self.model).encode_video_frames)

    # -- seeding ---------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def seed(self, params, backbone_frame, masks: jnp.ndarray,
             frame_idx: jnp.ndarray, state: PropagationState,
             valid: Optional[jnp.ndarray] = None
             ) -> Tuple[PropagationState, jnp.ndarray]:
        """Seed B object masks (torch add_new_mask analog).

        backbone_frame: backbone with leading batch 1 (one shared seed
        frame, broadcast) or B (per-object seed frames — multi-seed
        batching); masks: (B, S, S) float/bool at model resolution;
        frame_idx: scalar or (B,) per-object conditioning frame; valid:
        optional (B,) bool marking real (vs padding) object slots.
        Returns (state, low_res_logits).
        """
        cfg = self.cfg
        b = masks.shape[0]
        size = cfg.image_size
        low = size // 4
        m = (masks > 0.5).astype(jnp.float32)
        high_logits = m[..., None] * 20.0 - 10.0           # (B, S, S, 1)
        low_logits = jax.image.resize(high_logits, (b, low, low, 1),
                                      method="bilinear")[..., 0]

        backbone_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (b, *x.shape[1:])) if x.ndim == 4 else x,
            backbone_frame)
        # obj pointer via SAM heads with the mask as dense prompt
        pts = jnp.zeros((b, 1, 2), jnp.float32)
        lbl = -jnp.ones((b, 1), jnp.int32)
        _, _, sam_tokens, obj_logits = self.model.apply(
            {"params": params}, backbone_b, pts, lbl, low_logits[..., None],
            multimask_output=False, dynamic_multimask=False, method=_M(self.model).decode)
        obj_ptr = self.model.apply({"params": params}, sam_tokens[:, 0],
                                   method=_M(self.model).project_obj_ptr)

        vision = backbone_b["vision_features"]
        mem = self.model.apply({"params": params}, vision, high_logits,
                               jnp.full((b, 1), 10.0), method=_M(self.model).encode_memory)
        state = state.replace(
            cond_feats=mem.astype(jnp.float32),
            cond_frame=jnp.broadcast_to(
                jnp.asarray(frame_idx, jnp.int32), (b,)),
            cond_ptr=obj_ptr.astype(jnp.float32),
            obj_valid=(jnp.ones((b,), bool) if valid is None
                       else valid.astype(bool)))
        return state, low_logits

    # -- one tracking step ----------------------------------------------

    def _assemble_memory(self, params, state: PropagationState,
                         frame_idx, tpos_sign):
        """Concatenate cond + ring memories + pointer tokens with biases."""
        cfg = self.cfg
        model = self.model
        n = cfg.num_maskmem
        r = state.mem_feats.shape[0]
        b, t, md = state.cond_feats.shape

        tpos = params["maskmem_tpos_enc"].reshape(n, 1, 1, md)
        spatial_pos = model.apply({"params": params}, method=_M(self.model).memory_pos_enc)
        spatial_pos = spatial_pos[None]                     # (1, T, md)

        feats = [state.cond_feats]
        pos = [jnp.broadcast_to(spatial_pos + tpos[n - 1], (b, t, md))]
        bias = [jnp.zeros((b, 1, 1, t), jnp.float32)]
        for j in range(r):  # slot j has recency j+1 (slot 0 = newest)
            feats.append(state.mem_feats[j])
            # upstream indexes maskmem_tpos_enc[num_maskmem - t_pos - 1]:
            # most-recent frame (t_rel=1) -> index 0, cond frame -> n-1,
            # so ring slot j (recency j+1) takes tpos[j].
            pos.append(jnp.broadcast_to(spatial_pos + tpos[j], (b, t, md)))
            invalid = state.mem_frames[j] < 0                   # (B,)
            bias.append(jnp.broadcast_to(
                jnp.where(invalid, -1e9, 0.0)[:, None, None, None],
                (b, 1, 1, t)).astype(jnp.float32))

        # object pointers: cond pointer + ring, each split into 256/64 tokens
        split = cfg.d_model // md
        ptr_all = jnp.concatenate([state.cond_ptr[None], state.ptr], axis=0)  # (P+1,B,256)
        ptr_frames = jnp.concatenate(
            [state.cond_frame[None], state.ptr_frames], axis=0)  # (P+1, B)
        p1 = ptr_all.shape[0]
        tdiff = (frame_idx - ptr_frames).astype(jnp.float32) * tpos_sign
        ptr_pos = model.apply({"params": params}, tdiff,
                              method=_M(self.model).obj_ptr_tpos)     # (P+1, B, md)
        ptr_tokens = ptr_all.transpose(1, 0, 2).reshape(b, p1 * split, md)
        ptr_pos_tokens = jnp.repeat(ptr_pos.transpose(1, 0, 2), split,
                                    axis=1)                   # (B, P1*split, md)
        ptr_invalid = ptr_frames < 0                            # (P+1, B)
        ptr_bias = jnp.where(jnp.repeat(ptr_invalid.T, split, axis=1),
                             -1e9, 0.0)                         # (B, P1*split)
        ptr_bias = ptr_bias[:, None, None, :]

        memory = jnp.concatenate(feats + [ptr_tokens], axis=1)
        memory_pos = jnp.concatenate(pos + [ptr_pos_tokens], axis=1)
        attn_bias = jnp.concatenate(bias + [ptr_bias], axis=3)
        n_exclude = p1 * split

        # Pad the bank ONCE here to the flash kernel's preferred k-block
        # multiple (8256 → 8448 at the 1024-px defaults) so the four
        # per-layer cross-attention calls see an aligned S and skip their
        # (B, S, 256)-sized pad copies of the projected k/v. The pad rides
        # the rope-exclude count and the additive bias, i.e. it behaves
        # exactly like extra invalid pointer tokens.
        if jax.default_backend() == "tpu" and t >= 1024:
            from saber_tpu.ops.flash_attention import preferred_kv_blocking
            s0 = memory.shape[1]
            pad = preferred_kv_blocking(s0)[0] - s0
            if pad > 0:
                memory = jnp.pad(memory, ((0, 0), (0, pad), (0, 0)))
                memory_pos = jnp.pad(memory_pos, ((0, 0), (0, pad), (0, 0)))
                attn_bias = jnp.concatenate(
                    [attn_bias, jnp.full((b, 1, 1, pad), -1e9, jnp.float32)],
                    axis=3)
                n_exclude += pad
        return memory, memory_pos, attn_bias, n_exclude

    @staticmethod
    def slab_frames(backbone_slab):
        """Backbone pytree → minimal per-frame feature dict for the scan."""
        return {
            "vision": backbone_slab["vision_features"],      # (F, fs, fs, 256)
            "fpn0": backbone_slab["backbone_fpn"][0],   # (F, 4fs, 4fs, C/8)
            "fpn1": backbone_slab["backbone_fpn"][1],   # (F, 2fs, 2fs, C/4)
        }

    @partial(jax.jit, static_argnums=0)
    def step(self, params, state: PropagationState, frame, frame_idx,
             tpos_sign, span=None, frame_valid=None):
        """Track all objects through one frame.

        frame: dict(vision (fs,fs,256), fpn0, fpn1) for ONE frame (no batch
        axis). Returns (new_state, (low_res_logits (B,low,low),
        obj_score_logits (B,1))).

        An object is ACTIVE at this frame when it is a valid slot and the
        frame lies strictly beyond its conditioning frame in the scan
        direction (and within ``span`` frames of it, if given). Inactive
        objects neither write memory nor emit masks — this is what lets
        objects seeded at different frames share one scan.

        frame_valid: optional traced bool — False marks a padding frame
        (chunk-aligned scans over a whole direction); it deactivates every
        object so padding never pollutes the memory ring.
        """
        from saber_tpu.models.position_encoding import position_embedding_sine

        cfg = self.cfg
        b = state.cond_feats.shape[0]
        fs = cfg.feat_size
        t = fs * fs

        # batch-1 image features: frame features are object-independent,
        # so the decoder's skip adds and the memory encoder's pix-feat
        # projection broadcast them lazily against the B-object tensors
        # inside their fusions instead of materializing per-object copies
        # (the (256, B, 256, 256) fpn broadcast was 134 MB/slice in the
        # round-3 device trace; the AMG sweep uses the same trick)
        vision1 = frame["vision"][None]                      # (1, fs, fs, 256)
        backbone_b = {
            "vision_features": vision1,
            "backbone_fpn": [frame["fpn0"][None], frame["fpn1"][None]],
        }
        vis_tokens = jnp.broadcast_to(
            vision1.reshape(1, t, cfg.d_model), (b, t, cfg.d_model))
        vis_pos = position_embedding_sine(fs, fs, cfg.d_model).reshape(1, t, cfg.d_model)
        vis_pos = jnp.broadcast_to(vis_pos, (b, t, cfg.d_model)).astype(vis_tokens.dtype)

        memory, memory_pos, attn_bias, n_ptr_tokens = self._assemble_memory(
            params, state, frame_idx, tpos_sign)
        conditioned = self.model.apply(
            {"params": params}, vis_tokens, vis_pos, memory, memory_pos,
            n_ptr_tokens, attn_bias, method=_M(self.model).condition_features)
        conditioned = conditioned.reshape(b, fs, fs, cfg.d_model)

        # track with an empty prompt (single padding point, torch convention)
        pts = jnp.zeros((b, 1, 2), jnp.float32)
        lbl = -jnp.ones((b, 1), jnp.int32)
        masks, iou, sam_tokens, obj_logits = self.model.apply(
            {"params": params}, backbone_b, pts, lbl,
            multimask_output=False, conditioned_embed=conditioned,
            method=_M(self.model).decode)
        low_logits = masks[:, 0]                             # (B, low, low)

        obj_ptr = self.model.apply({"params": params}, sam_tokens[:, 0],
                                   method=_M(self.model).project_obj_ptr)

        # encode new memory from the predicted mask at full resolution.
        # Resize in the model compute dtype: the (B, S, S, 1) canvases are
        # pure HBM traffic into the (bf16) mask downsampler — fp32 here
        # doubled the bytes for no accuracy the conv stack can use.
        size = cfg.image_size
        high = jax.image.resize(low_logits[..., None].astype(cfg.dtype),
                                (b, size, size, 1), method="bilinear")
        mem = self.model.apply({"params": params}, vision1, high, obj_logits,
                               method=_M(self.model).encode_memory)

        # per-object activation: strictly beyond the cond frame in scan
        # direction, within span, and a real (non-padding) slot
        rel = (frame_idx - state.cond_frame).astype(jnp.float32) * tpos_sign
        active = state.obj_valid & (rel >= 1.0)                 # (B,)
        if span is not None:
            active = active & (rel <= jnp.asarray(span, jnp.float32))
        if frame_valid is not None:
            active = active & frame_valid

        def gate(shifted, old):
            """Ring-shift only for active objects (axis 1 = B)."""
            amask = active.reshape((1, b) + (1,) * (shifted.ndim - 2))
            return jnp.where(amask, shifted, old)

        fidx_b = jnp.broadcast_to(frame_idx.astype(jnp.int32), (1, b))
        new_mem = gate(jnp.concatenate([mem[None].astype(jnp.float32),
                                        state.mem_feats[:-1]], axis=0),
                       state.mem_feats) \
            if state.mem_feats.shape[0] > 0 else state.mem_feats
        new_mem_frames = gate(
            jnp.concatenate([fidx_b, state.mem_frames[:-1]]),
            state.mem_frames) \
            if state.mem_frames.shape[0] > 0 else state.mem_frames
        new_ptr = gate(jnp.concatenate([obj_ptr[None].astype(jnp.float32),
                                        state.ptr[:-1]], axis=0),
                       state.ptr) \
            if state.ptr.shape[0] > 0 else state.ptr
        new_ptr_frames = gate(
            jnp.concatenate([fidx_b, state.ptr_frames[:-1]]),
            state.ptr_frames) \
            if state.ptr_frames.shape[0] > 0 else state.ptr_frames

        low_logits = jnp.where(active[:, None, None], low_logits, -10.0)
        obj_logits = jnp.where(active[:, None], obj_logits, -20.0)

        state = state.replace(mem_feats=new_mem, mem_frames=new_mem_frames,
                              ptr=new_ptr, ptr_frames=new_ptr_frames)
        return state, (low_logits, obj_logits)

    # -- slab scan -------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def propagate_slab(self, params, state: PropagationState, frames,
                       frame_indices: jnp.ndarray, tpos_sign, span=None,
                       frame_valid=None):
        """Scan ``step`` over a slab of precomputed frame features.

        frames: ``slab_frames`` dict with leading frame axis F.
        frame_indices: (F,) absolute frame indices in scan order.
        span: optional max tracking distance from each object's cond frame.
        frame_valid: optional (F,) bool; False = padding frame (ignored).
        Returns (state, (low_logits (F,B,low,low), obj_scores (F,B,1))).
        """
        if frame_valid is None:
            def body(st, inp):
                frame, fidx = inp
                return self.step(params, st, frame, fidx, tpos_sign, span)

            return jax.lax.scan(body, state, (frames, frame_indices))

        def body(st, inp):
            frame, fidx, fv = inp
            return self.step(params, st, frame, fidx, tpos_sign, span, fv)

        return jax.lax.scan(body, state, (frames, frame_indices, frame_valid))
