"""Positional encodings: 2D sine (FPN/memory) and random-Fourier (prompts),
plus axial RoPE used by the memory attention.

These are functional (no params except the prompt Gaussian matrix, which
lives in the prompt encoder) and cached by shape under jit.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def position_embedding_sine(h: int, w: int, num_pos_feats: int = 256,
                            temperature: int = 10000) -> jnp.ndarray:
    """SAM2-style normalized 2D sine embedding → (H, W, C)."""
    scale = 2 * math.pi
    y = np.arange(1, h + 1, dtype=np.float32)[:, None].repeat(w, 1)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :].repeat(h, 0)
    eps = 1e-6
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale

    half = num_pos_feats // 2
    dim_t = np.arange(half, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)

    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3
                     ).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3
                     ).reshape(h, w, -1)
    return jnp.asarray(np.concatenate([pos_y, pos_x], axis=2))  # (H, W, C)


def random_pe_encode(coords: jnp.ndarray, gaussian_matrix: jnp.ndarray) -> jnp.ndarray:
    """Encode [0,1]-normalized points with a random Fourier matrix.

    coords: (..., 2) in [0,1]; gaussian_matrix: (2, C/2) → (..., C).
    Matches SAM's PositionEmbeddingRandom._pe_encoding.
    """
    coords = 2.0 * coords - 1.0
    proj = coords @ gaussian_matrix
    proj = 2 * math.pi * proj
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def random_pe_grid(h: int, w: int, gaussian_matrix: jnp.ndarray) -> jnp.ndarray:
    """Dense PE over a (h, w) grid → (h, w, C). Cell-center convention."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h, w, 2) xy
    return random_pe_encode(grid, gaussian_matrix)


# ---------------------------------------------------------------------------
# Axial 2D rotary embeddings (memory attention)
# ---------------------------------------------------------------------------

def compute_axial_cis(dim: int, end_x: int, end_y: int, theta: float = 10000.0):
    """Axial RoPE angles for a (end_y, end_x) grid → (cos, sin) each (N, dim/2).

    Half the rotary channels rotate with x-position, half with y-position
    (SAM2's compute_axial_cis). Real-valued: some TPU runtimes lack
    complex64, and pairwise real rotation maps better onto the VPU anyway.
    """
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[: dim // 4].astype(np.float32) / dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    t_x = t % end_x
    t_y = t // end_x
    ang = np.concatenate([np.outer(t_x, freqs), np.outer(t_y, freqs)], axis=-1)
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


def apply_rotary_enc(xq: jnp.ndarray, xk: jnp.ndarray, freqs_cis,
                     repeat_freqs_k: bool = False, num_k_exclude_rope: int = 0):
    """Rotate (B, T, H, D) queries/keys by axial rotary angles.

    freqs_cis: (cos (T, D/2), sin (T, D/2)). If repeat_freqs_k, keys may be
    r×T long (memory from several frames) and angles tile along time. The
    last ``num_k_exclude_rope`` key tokens (object pointers) stay unrotated.
    Equivalent to the complex formulation: channel pairs (2i, 2i+1) rotate
    as (a·cos−b·sin, a·sin+b·cos).
    """
    cos, sin = freqs_cis

    def rotate(x, c, s):
        xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
        a, b = xf[..., 0], xf[..., 1]
        c = c[None, :, None, :]
        s = s[None, :, None, :]
        out = jnp.stack([a * c - b * s, a * s + b * c], axis=-1)
        return out.reshape(x.shape).astype(x.dtype)

    xq_out = rotate(xq, cos, sin)
    num_k_rope = xk.shape[1] - num_k_exclude_rope
    xk_rope = xk[:, :num_k_rope]
    if repeat_freqs_k and xk_rope.shape[1] != cos.shape[0]:
        r = xk_rope.shape[1] // cos.shape[0]
        ck, sk = jnp.tile(cos, (r, 1)), jnp.tile(sin, (r, 1))
    else:
        ck, sk = cos, sin
    xk_out = rotate(xk_rope, ck, sk)
    if num_k_exclude_rope > 0:
        xk_out = jnp.concatenate([xk_out, xk[:, num_k_rope:]], axis=1)
    return xq_out, xk_out
