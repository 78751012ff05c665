"""Memory encoder and memory attention for video/volume propagation.

Native replacement for the sam2 package's MemoryEncoder/MemoryAttention
(reference drives them via propagate_in_video,
saber/adapters/sam2/predictor.py:196-202, 289-318). The memory bank that
torch keeps as a dict of per-frame tensors becomes a fixed-capacity ring
buffer pytree (saber_tpu/models/video.py) so the z-axis propagation runs
as one ``lax.scan``; invalid slots are excluded with an additive attention
bias instead of dynamic shapes.

- MemoryEncoder: predicted mask (sigmoid-scaled) → 16× mask downsampler →
  fuse with projected /16 vision features (ConvNeXt-style blocks) →
  project to mem_dim=64.
- MemoryAttention: 4 pre-norm layers; self-attention with axial RoPE over
  the 64×64 feature grid; cross-attention into the concatenated memory
  tokens (RoPE repeated per memory frame, object-pointer tokens excluded
  from rotation).
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from saber_tpu.models.norms import LayerNormFast, LnParams, ln_grouped
from saber_tpu.models.position_encoding import apply_rotary_enc, compute_axial_cis


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over NHWC feature maps (fp32)."""
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32)(x)


class _ConvParams(nn.Module):
    """Param holder matching nn.Conv's tree ({kernel, bias}) so both the
    direct and the blocked mask-downsampler paths share one checkpoint
    layout (models/weights.py maps torch Sequential indices here)."""
    cin: int
    cout: int
    k: int = 3

    @nn.compact
    def __call__(self):
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (self.k, self.k, self.cin, self.cout))
        bias = self.param("bias", nn.initializers.zeros, (self.cout,))
        return kern, bias


_LnParams = LnParams  # shared param holder lives in models/norms.py


_ln_grouped = ln_grouped  # shared impl lives in models/norms.py


def _block_shift(b: int) -> np.ndarray:
    """(2, 3, b, b/2) 0/1 tensor A[d, k, p, P] = 1 iff a stride-2 k=3 conv
    output at intra-block row P reads input intra row p of block d−1
    relative (d=0: the block above/left; d=1: the same block). The input
    row 2P+k−1 never exceeds b−1, so the below/right neighbour is never
    touched — the blocked conv is 2×2 in block space."""
    bo = b // 2
    a = np.zeros((2, 3, b, bo), np.float32)
    for pp in range(bo):
        for k in range(3):
            t = 2 * pp + k - 1
            d = 0 if t < 0 else 1
            a[d, k, t + (b if t < 0 else 0), pp] = 1.0
    return a


def _blocked_conv_kernel(w, b: int):
    """Scatter a (3, 3, Cin, Cout) stride-2 conv kernel into the
    (2, 2, b²·Cin, (b/2)²·Cout) kernel of the equivalent stride-1 conv on
    a b×b space-to-depth packed layout (lane = (p·b + q)·C + c). Each
    output element receives exactly one W tap (the placement tensors are
    disjoint), so the rearrangement is exact — no accumulation happens."""
    cin, cout = w.shape[2], w.shape[3]
    bo = b // 2
    ay = jnp.asarray(_block_shift(b), w.dtype)
    kb = jnp.einsum("dkpP,elqQ,klcC->depqcPQC", ay, ay, w)
    return kb.reshape(2, 2, b * b * cin, bo * bo * cout)


# Blocked (space-to-depth) mask downsampler: the direct path's 1/4/16/64-
# channel conv pyramid is pathological on TPU lanes (round-4 direction
# trace: ~1.1 ms/slice of layout copies + pad fusions around the tiny-C
# convs). SABER_BLOCKED_MDS=0 reverts to the direct convs.
_BLOCKED_MDS = os.environ.get("SABER_BLOCKED_MDS", "1") != "0"


class MaskDownSampler(nn.Module):
    """Downsample a full-res mask 16× into embed_dim channels.

    Two equivalent compute paths over one param tree (torch layout,
    sam2 MaskDownSampler — reference drives it via propagate_in_video,
    saber/adapters/sam2/predictor.py:196-202):

    - direct: four stride-2 3×3 convs 1→4→16→64→256 with LN+GELU between
      (exact torch Sequential semantics).
    - blocked (default): the input is 16×16 space-to-depth packed once,
      so every layer becomes a 2×2 stride-1 conv at 256 lanes in and out
      (kernels rearranged at trace time, ``_blocked_conv_kernel``); LN
      runs grouped over the true channels. Exact to fp32-accumulation
      reordering. Keeps all intermediates lane-dense — the direct path's
      (512², 4)/(256², 16) layouts cost more in relayout copies than
      their convs do in FLOPs.

    NOTE (round-3 negative result): per-tap channel einsums (the Gaussian
    z-smooth trick) measured 27.4 → 16.9 slices/s on the direction probe
    — tap einsums lower WORSE than XLA's conv for these shapes."""
    embed_dim: int = 256
    kernel_size: int = 3
    stride: int = 2
    total_stride: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 1)
        import math
        num_layers = int(math.log2(self.total_stride) // math.log2(self.stride))
        dt = self.dtype
        chans = [self.stride ** (2 * i) for i in range(num_layers + 1)]
        convs = [_ConvParams(chans[i], chans[i + 1], self.kernel_size,
                             name=f"encoder_{i}_conv")()
                 for i in range(num_layers)]
        lns = [_LnParams(chans[i + 1], name=f"encoder_{i}_ln")()
               for i in range(num_layers)]

        blocked = (_BLOCKED_MDS and self.kernel_size == 3 and self.stride == 2
                   and x.shape[1] % self.total_stride == 0
                   and x.shape[2] % self.total_stride == 0)
        if blocked:
            b0, hb, wb = (self.total_stride,
                          x.shape[1] // self.total_stride,
                          x.shape[2] // self.total_stride)
            xb = x.reshape(x.shape[0], hb, b0, wb, b0)
            xb = xb.transpose(0, 1, 3, 2, 4).reshape(x.shape[0], hb, wb, -1)
            xb = xb.astype(dt)
            b = b0
            for i in range(num_layers):
                kern, bias = convs[i]
                kb = _blocked_conv_kernel(kern, b).astype(dt)
                bias_b = jnp.tile(bias, (b // 2) ** 2).astype(dt)
                xb = jax.lax.conv_general_dilated(
                    xb, kb, window_strides=(1, 1),
                    padding=((1, 0), (1, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias_b
                b //= 2
                xb = _ln_grouped(xb, lns[i][0], lns[i][1], groups=b * b)
                xb = nn.gelu(xb, approximate=False)
            x = xb  # b == 1: lanes are the true channels
        else:
            for i in range(num_layers):
                kern, bias = convs[i]
                pad = self.kernel_size // 2
                x = jax.lax.conv_general_dilated(
                    x.astype(dt), kern.astype(dt),
                    window_strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")
                ) + bias.astype(dt)
                x = _ln_grouped(x, lns[i][0], lns[i][1], groups=1)
                x = nn.gelu(x, approximate=False)
        return nn.Conv(self.embed_dim, (1, 1), dtype=dt, name="final_conv")(x)


class CXBlock(nn.Module):
    """ConvNeXt block: depthwise 7×7 → LN → MLP(4×) → layer-scale residual."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        x = LayerNormFast(name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return inp + gamma * x


class MemoryEncoder(nn.Module):
    """(vision_features, mask) → mem_dim memory features."""
    out_dim: int = 64
    in_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pix_feat, masks):
        """pix_feat: (B, H, W, 256) /16 features; masks: (B, 16H, 16W, 1)
        already sigmoid-scaled. Returns (B, H, W, out_dim)."""
        m = MaskDownSampler(embed_dim=self.in_dim, dtype=self.dtype,
                            name="mask_downsampler")(masks.astype(self.dtype))
        x = nn.Conv(self.in_dim, (1, 1), dtype=self.dtype, name="pix_feat_proj")(
            pix_feat.astype(self.dtype))
        x = x + m
        x = CXBlock(self.in_dim, dtype=self.dtype, name="fuser_0")(x)
        x = CXBlock(self.in_dim, dtype=self.dtype, name="fuser_1")(x)
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="out_proj")(x)


class RoPEAttention(nn.Module):
    """Attention with axial rotary embeddings on a 2D token grid."""
    embedding_dim: int = 256
    num_heads: int = 1
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None
    rope_theta: float = 10000.0
    rope_k_repeat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, num_k_exclude_rope: int = 0,
                 attn_bias: Optional[jnp.ndarray] = None):
        import os

        import jax
        import numpy as np

        internal = self.embedding_dim // self.downsample_rate
        head_dim = internal // self.num_heads
        b, tq = q.shape[:2]
        tk = k.shape[1]
        use_flash = (tq >= 1024 and jax.default_backend() == "tpu"
                     and 32 <= head_dim <= 256 and head_dim % 8 == 0)
        fused_rope = (os.environ.get("SABER_FUSED_ROPE", "1") != "0"
                      and use_flash and head_dim % 256 == 0)

        if fused_rope:
            # fused-RoPE q/k projections with the de-interleave permutation
            # FOLDED INTO THE WEIGHTS: rotation happens inside the flash
            # kernel on half-split channels (ops/flash_attention.py module
            # doc), and the static channel shuffle (pair (2i, 2i+1) →
            # columns (i, D/2+i)) lands on the (in, internal) kernel/bias —
            # a per-token gather on the (B, T, internal) activations cost
            # ~0.7 ms/slice in the round-3 device trace. Same "q_proj"/
            # "k_proj" param tree as the nn.Dense branch (hiera's
            # _DenseParams declares identical names/inits).
            from saber_tpu.models.hiera import _DenseParams
            perm = np.concatenate([np.arange(0, head_dim, 2),
                                   np.arange(1, head_dim, 2)])
            dt = self.dtype

            def folded_proj(x, name):
                kern, bias = _DenseParams(x.shape[-1], internal, name=name)()
                kf = kern.reshape(kern.shape[0], self.num_heads,
                                  head_dim)[..., perm]
                bf = bias.reshape(self.num_heads, head_dim)[..., perm]
                return (x.astype(dt) @ kf.reshape(kern.shape[0],
                                                  internal).astype(dt)
                        + bf.reshape(internal).astype(dt))

            qp = folded_proj(q, "q_proj")
            kp = folded_proj(k, "k_proj")
        else:
            qp = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q)
            kp = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)
        qp = qp.reshape(b, tq, self.num_heads, head_dim)
        kp = kp.reshape(b, tk, self.num_heads, head_dim)
        vp = vp.reshape(b, tk, self.num_heads, head_dim)

        side = int(round(tq**0.5))
        freqs = compute_axial_cis(head_dim, side, side, self.rope_theta)

        if fused_rope:
            from saber_tpu.ops.flash_attention import flash_attention
            half = head_dim // 2
            cos, sin = freqs                                  # (tq, D/2)
            n_rope = tk - num_k_exclude_rope
            r = n_rope // cos.shape[0] if self.rope_k_repeat else 1
            ck = jnp.concatenate(
                [jnp.tile(cos, (r, 1)),
                 jnp.ones((tk - r * cos.shape[0], half), jnp.float32)])
            sk = jnp.concatenate(
                [jnp.tile(sin, (r, 1)),
                 jnp.zeros((tk - r * cos.shape[0], half), jnp.float32)])
            bias_vec = (attn_bias.reshape(b, tk) if attn_bias is not None
                        else None)
            # Fewer, larger k-blocks win (each extra block is an
            # online-softmax rescale pass): self-attention (S = T = 4096)
            # takes ONE k-block — 512/4096 measured 1.376 ms vs 1.584 at
            # 256/2048 standalone (tools/bench_memself_kernel.py, +13%;
            # in-program 0.48 → 0.43 ms/call). The cross shape (S=8256)
            # sweeps best at 2 blocks of 4224 (8448 pad, 2.3%): 1.92 ms
            # vs 2.20 at the old 1024 blocks / 9216 pad
            # (tools/bench_memcross_kernel.py, −13%). preferred_kv_blocking
            # encodes the rule; SABER_MEMSELF_BLOCKS ("bq,bk") and
            # SABER_MEMCROSS_BLOCK_K override.
            from saber_tpu.ops.flash_attention import preferred_kv_blocking
            # role, not shape, picks the blocking: self-attention is the
            # rope_k_repeat=False call site (q = k = v over the frame
            # grid); a small memory bank that happens to be <=4096 tokens
            # must still take the cross blocking + its env override
            is_self = not self.rope_k_repeat
            if is_self and tk <= 4096 and tk % 512 == 0:
                bq, bk = (map(int, os.environ.get(
                    "SABER_MEMSELF_BLOCKS", "512,%d" % tk).split(",")))
            else:
                bq = 256
                bk = int(os.environ.get(
                    "SABER_MEMCROSS_BLOCK_K",
                    str(preferred_kv_blocking(tk)[1])))
            out = flash_attention(qp, kp, vp, bias=bias_vec,
                                  block_q=int(bq), block_k=int(bk),
                                  rope_q=freqs, rope_k=(ck, sk))
            out = out.reshape(b, tq, internal)
            return nn.Dense(self.embedding_dim, dtype=self.dtype,
                            name="out_proj")(out)

        qp, kp = apply_rotary_enc(qp, kp, freqs, repeat_freqs_k=self.rope_k_repeat,
                                  num_k_exclude_rope=num_k_exclude_rope)
        if use_flash:
            # flash path: avoids materializing the (B, T, S) score matrix.
            # Block sizes tuned on v5e for the memory-cross shape
            # (T=4096, S~8.7k, D=64): 256/2048 measured 6.59 ms vs
            # 7.19 ms at the 256/512 defaults.
            from saber_tpu.ops.flash_attention import flash_attention
            bias_vec = (attn_bias.reshape(b, tk) if attn_bias is not None
                        else None)
            out = flash_attention(qp, kp, vp, bias=bias_vec, block_k=2048)
            out = out.reshape(b, tq, internal)
        else:
            scale = head_dim**-0.5
            logits = jnp.einsum("bthd,bshd->bhts", qp, kp) * scale
            if attn_bias is not None:
                logits = logits + attn_bias  # (B, 1, 1, S) or broadcastable
            probs = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(qp.dtype)
            out = jnp.einsum("bhts,bshd->bthd", probs, vp).reshape(b, tq, internal)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class MemoryAttentionLayer(nn.Module):
    d_model: int = 256
    dim_feedforward: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos=None, query_pos=None,
                 num_k_exclude_rope: int = 0, attn_bias=None):
        # self-attention (RoPE, pre-norm)
        tgt2 = LayerNormFast(epsilon=1e-5, name="norm1")(tgt)
        tgt2 = RoPEAttention(self.d_model, num_heads=1, dtype=self.dtype,
                             name="self_attn")(tgt2, tgt2, tgt2)
        tgt = tgt + tgt2

        # cross-attention into memory (kv_in_dim=64, k positions rotated
        # per memory frame, obj-ptr tokens excluded)
        tgt2 = LayerNormFast(epsilon=1e-5, name="norm2")(tgt)
        k = memory + pos if pos is not None else memory
        tgt2 = RoPEAttention(self.d_model, num_heads=1, kv_in_dim=64,
                             rope_k_repeat=True, dtype=self.dtype,
                             name="cross_attn_image")(
            tgt2, k, memory, num_k_exclude_rope=num_k_exclude_rope,
            attn_bias=attn_bias)
        tgt = tgt + tgt2

        # FFN — on TPU the LN→fc1→relu→fc2→residual chain runs as the
        # fused Pallas MLP kernel (ops/fused_block.fused_mlp with
        # activation="relu", eps=1e-5): keeps the (B·T, 2048) hidden in
        # VMEM and absorbs the norm3 LayerNorm, whose standalone XLA
        # fusion ran at ~10% of HBM bandwidth in the round-4 direction
        # trace. Param tree is identical to the flax branch
        # (_LNParams/_DenseParams declare the same names), so checkpoints
        # load either way. SABER_FUSED_MEMFFN=0 reverts.
        import os

        import jax
        env = os.environ.get("SABER_FUSED_MEMFFN")
        use_fused = (jax.default_backend() == "tpu" if env is None
                     else env == "1")  # =1 forces interpret mode on CPU
        use_fused = use_fused and tgt.shape[0] * tgt.shape[1] % 128 == 0
        if use_fused:
            from saber_tpu.models.hiera import _DenseParams, _LNParams
            from saber_tpu.ops.fused_block import fused_mlp
            ln_s, ln_b = _LNParams(self.d_model, name="norm3")()
            k1, b1 = _DenseParams(self.d_model, self.dim_feedforward,
                                  name="linear1")()
            k2, b2 = _DenseParams(self.dim_feedforward, self.d_model,
                                  name="linear2")()
            return fused_mlp(tgt, ln_s, ln_b, k1.astype(self.dtype), b1,
                             k2.astype(self.dtype), b2,
                             activation="relu", eps=1e-5)
        tgt2 = LayerNormFast(epsilon=1e-5, name="norm3")(tgt)
        tgt2 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt2)
        tgt2 = nn.relu(tgt2)
        tgt2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(tgt2)
        return tgt + tgt2


class MemoryAttention(nn.Module):
    d_model: int = 256
    num_layers: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, curr, memory, curr_pos=None, memory_pos=None,
                 num_obj_ptr_tokens: int = 0, attn_bias=None):
        """curr: (B, T, 256) current-frame tokens; memory: (B, S, 64)."""
        x = curr
        if curr_pos is not None:
            x = x + 0.1 * curr_pos
        for i in range(self.num_layers):
            x = MemoryAttentionLayer(self.d_model, dtype=self.dtype,
                                     name=f"layers_{i}")(
                x, memory, pos=memory_pos,
                num_k_exclude_rope=num_obj_ptr_tokens, attn_bias=attn_bias)
        return LayerNormFast(epsilon=1e-5, name="norm")(x)
