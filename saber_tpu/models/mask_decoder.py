"""Two-way-attention mask decoder with IoU and object-score heads.

Native replacement for the sam2 package's MaskDecoder/TwoWayTransformer.
Key contract difference vs the reference: the object-score logits the
reference captures with a forward hook on ``sam_mask_decoder``
(saber/adapters/sam2/predictor.py:277-284) are a plain **return value**
here — the decoder returns (masks, iou_pred, sam_tokens, obj_score_logits)
so the propagation scan can thread them functionally (SURVEY.md §7.4).

The decoder is vmap-friendly over prompts: the AMG runs it with a batch of
point prompts against one set of (broadcast) image embeddings.

NOTE (round-4 measured negative result): reformulating the two k=2/s=2
ConvTranspose upscale stages as space-to-depth dense matmuls (exact — no
cross-block taps) measured **5.44 s/image vs 3.51 s** on the hiera-L AMG
sweep and was reverted. Two failure modes at the 16-crop/1024-prompt
scale: without an optimization barrier XLA fused the un/re-block
transposes into the LayerNorm and rematerialized 7-D fp32 temps at 2-64×
tile padding (8 GB single allocations, OOM); with the barrier it ran but
forced the multi-GB per-candidate pyramid to materialize, losing to the
direct lowering's remat schedule. The device trace's visible layout
copies around these convs are part of a globally better plan — per-op
copy time does not convert to recoverable wall time (same lesson as the
blocked mask downsampler in models/memory.py, which measured neutral).
"""

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from saber_tpu.models.attention import scaled_dot_product_attention
from saber_tpu.models.norms import LayerNormFast


class AttentionDS(nn.Module):
    """Multi-head attention with optional internal downsampling (SAM-style)."""
    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embedding_dim // self.downsample_rate
        head_dim = internal // self.num_heads
        qp = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)
        b, tq = qp.shape[:2]
        tk = kp.shape[1]
        qp = qp.reshape(b, tq, self.num_heads, head_dim)
        kp = kp.reshape(b, tk, self.num_heads, head_dim)
        vp = vp.reshape(b, tk, self.num_heads, head_dim)
        out = scaled_dot_product_attention(qp, kp, vp)
        out = out.reshape(b, tq, internal)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        # token self-attention
        if self.skip_first_layer_pe:
            queries = AttentionDS(self.embedding_dim, self.num_heads,
                                  dtype=self.dtype, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            attn_out = AttentionDS(self.embedding_dim, self.num_heads,
                                   dtype=self.dtype, name="self_attn")(q, q, queries)
            queries = queries + attn_out
        queries = LayerNormFast(name="norm1")(queries)

        # token → image cross-attention
        q = queries + query_pe
        k = keys + key_pe
        attn_out = AttentionDS(self.embedding_dim, self.num_heads,
                               self.attention_downsample_rate, dtype=self.dtype,
                               name="cross_attn_token_to_image")(q, k, keys)
        queries = queries + attn_out
        queries = LayerNormFast(name="norm2")(queries)

        # MLP on tokens
        mlp = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_lin1")(queries)
        mlp = nn.relu(mlp)
        mlp = nn.Dense(self.embedding_dim, dtype=self.dtype, name="mlp_lin2")(mlp)
        queries = queries + mlp
        queries = LayerNormFast(name="norm3")(queries)

        # image → token cross-attention
        q = queries + query_pe
        k = keys + key_pe
        attn_out = AttentionDS(self.embedding_dim, self.num_heads,
                               self.attention_downsample_rate, dtype=self.dtype,
                               name="cross_attn_image_to_token")(k, q, queries)
        keys = keys + attn_out
        keys = LayerNormFast(name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: (B, H, W, C); point_embedding: (B, N, C)."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(b, h * w, c) if image_pe.ndim == 4 else image_pe

        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim, num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layers_{i}")(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        attn_out = AttentionDS(self.embedding_dim, self.num_heads,
                               self.attention_downsample_rate, dtype=self.dtype,
                               name="final_attn_token_to_image")(q, k, keys)
        queries = queries + attn_out
        queries = LayerNormFast(name="norm_final_attn")(queries)
        return queries, keys


class MLP(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name=f"layers_{i}")(x))
        x = nn.Dense(self.output_dim, dtype=self.dtype,
                     name=f"layers_{self.num_layers - 1}")(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class MaskDecoder(nn.Module):
    """Predicts 4 candidate masks (+IoU, +object score) from prompts."""
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    use_high_res_features: bool = True
    pred_obj_scores: bool = True
    dynamic_multimask_via_stability: bool = True
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98
    dtype: jnp.dtype = jnp.float32

    @property
    def num_mask_tokens(self):
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 high_res_features: Optional[Sequence[jnp.ndarray]] = None,
                 multimask_output: bool = True,
                 dynamic_multimask: bool = True,
                 project_high_res_only: bool = False):
        """
        Args:
            image_embeddings: (B, H, W, C) /16 features.
            image_pe: (H, W, C) dense positional encoding.
            sparse_prompt: (B, N, C); dense_prompt: (B, H, W, C).
            high_res_features: [(B, 4H, 4W, C0'), (B, 2H, 2W, C1')] /4 and
                /8 skips — either raw 256-channel FPN maps (projected here
                through conv_s0/s1) or ALREADY-projected C/8- and
                C/4-channel maps (detected by channel count and used
                as-is). Projecting once per frame at encode time is the
                torch layout (SAM2Base._forward_image applies
                sam_mask_decoder.conv_s0/s1 right after the trunk); doing
                it per decode re-ran the convs on a per-object/per-prompt
                broadcast of the 256-channel maps every tracking step and
                every AMG sweep chunk.
            project_high_res_only: return just the projected
                (feat_s0, feat_s1) pair — the encode-time entry point
                (SAM2.project_high_res). Uses the same conv_s0/s1 params.
        Returns:
            masks (B, K, 4H*4, 4W*4), iou_pred (B, K), sam_tokens (B, K, C),
            object_score_logits (B, 1).
        """
        c = self.transformer_dim
        if project_high_res_only:
            feat_s0, feat_s1 = high_res_features
            return (nn.Conv(c // 8, (1, 1), dtype=self.dtype,
                            name="conv_s0")(feat_s0),
                    nn.Conv(c // 4, (1, 1), dtype=self.dtype,
                            name="conv_s1")(feat_s1))

        b = sparse_prompt.shape[0]

        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, c))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (self.num_mask_tokens, c))
        if self.pred_obj_scores:
            obj_token = self.param("obj_score_token", nn.initializers.normal(1.0), (1, c))
            output_tokens = jnp.concatenate([obj_token, iou_token, mask_tokens], 0)
            s = 1
        else:
            output_tokens = jnp.concatenate([iou_token, mask_tokens], 0)
            s = 0
        tokens = jnp.concatenate(
            [jnp.broadcast_to(output_tokens[None], (b, *output_tokens.shape)),
             sparse_prompt.astype(jnp.float32)], axis=1).astype(self.dtype)

        src = image_embeddings + dense_prompt
        pos = jnp.broadcast_to(image_pe[None], src.shape).astype(src.dtype)

        hs, src_out = TwoWayTransformer(dtype=self.dtype, name="transformer")(
            src, pos, tokens)
        iou_token_out = hs[:, s]
        mask_tokens_out = hs[:, s + 1: s + 1 + self.num_mask_tokens]

        h, w = image_embeddings.shape[1:3]
        src_img = src_out.reshape(b, h, w, c)

        # upscale ×4 with high-res skips
        up = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
                              transpose_kernel=True, name="upscale_conv1")(src_img)
        if self.use_high_res_features and high_res_features is not None:
            feat_s0, feat_s1 = high_res_features
            if feat_s1.shape[-1] != c // 4:     # raw 256-ch FPN: project
                feat_s1 = nn.Conv(c // 4, (1, 1), dtype=self.dtype,
                                  name="conv_s1")(feat_s1)
            up = up + feat_s1
        up = LayerNormFast(name="upscale_ln")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2), dtype=self.dtype,
                              transpose_kernel=True, name="upscale_conv2")(up)
        if self.use_high_res_features and high_res_features is not None:
            if feat_s0.shape[-1] != c // 8:     # raw 256-ch FPN: project
                feat_s0 = nn.Conv(c // 8, (1, 1), dtype=self.dtype,
                                  name="conv_s0")(feat_s0)
            up = up + feat_s0
        up = nn.gelu(up, approximate=False)  # (B, 4h, 4w, c/8)

        hyper = jnp.stack(
            [MLP(c, c // 8, 3, dtype=self.dtype, name=f"hyper_mlps_{i}")(
                mask_tokens_out[:, i]) for i in range(self.num_mask_tokens)],
            axis=1)  # (B, K, c/8)
        uh, uw = up.shape[1], up.shape[2]
        masks = jnp.einsum("bkc,bhwc->bkhw",
                           hyper.astype(jnp.float32), up.astype(jnp.float32))

        iou_pred = MLP(self.iou_head_hidden_dim, self.num_mask_tokens,
                       self.iou_head_depth, sigmoid_output=True, dtype=self.dtype,
                       name="iou_prediction_head")(iou_token_out).astype(jnp.float32)
        if self.pred_obj_scores:
            obj_logits = MLP(c, 1, 3, dtype=self.dtype,
                             name="pred_obj_score_head")(hs[:, 0]).astype(jnp.float32)
        else:
            obj_logits = 10.0 * jnp.ones((b, 1), jnp.float32)

        if multimask_output:
            out_masks = masks[:, 1:]
            out_iou = iou_pred[:, 1:]
            sam_tokens = mask_tokens_out[:, 1:]
        else:
            if dynamic_multimask and self.dynamic_multimask_via_stability:
                out_masks, out_iou = self._dynamic_single(masks, iou_pred)
            else:
                out_masks = masks[:, 0:1]
                out_iou = iou_pred[:, 0:1]
            sam_tokens = mask_tokens_out[:, 0:1]

        return out_masks, out_iou, sam_tokens, obj_logits

    def _dynamic_single(self, masks, iou_pred):
        """When the single-mask token is unstable, fall back to the best
        multimask candidate (SAM2's dynamic_multimask_via_stability)."""
        delta = self.dynamic_multimask_stability_delta
        area_i = jnp.sum(masks[:, 0:1] > delta, axis=(-2, -1)).astype(jnp.float32)
        area_u = jnp.sum(masks[:, 0:1] > -delta, axis=(-2, -1)).astype(jnp.float32)
        stability = jnp.where(area_u > 0, area_i / area_u, 1.0)  # (B, 1)
        stable = stability >= self.dynamic_multimask_stability_thresh

        multi = masks[:, 1:]
        multi_iou = iou_pred[:, 1:]
        best = jnp.argmax(multi_iou, axis=-1)  # (B,)
        bidx = jnp.arange(masks.shape[0])
        best_mask = multi[bidx, best][:, None]
        best_iou = multi_iou[bidx, best][:, None]

        out_mask = jnp.where(stable[..., None, None], masks[:, 0:1], best_mask)
        out_iou = jnp.where(stable, iou_pred[:, 0:1], best_iou)
        return out_mask, out_iou
