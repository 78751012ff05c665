"""PyTorch SAM2 checkpoint → JAX params conversion.

The reference consumes facebookresearch/sam2 checkpoints directly through
torch (saber/pretrained_weights.py:174-202); this module maps the official
``sam2.1_hiera_{t,s,b+,l}.pt`` state dicts onto the Flax module tree in
saber_tpu/models so the same weights drive the TPU stack.

Layout rules (validated against torch ops in tests/test_weights.py):
- Linear:        torch (out, in)        → flax kernel (in, out)
- Conv2d:        torch (O, I, kh, kw)   → flax NHWC kernel (kh, kw, I, O)
- Depthwise:     torch (C, 1, kh, kw)   → flax (kh, kw, 1, C)
- ConvTranspose: torch (I, O, kh, kw)   → flax (kh, kw, O, I) with
                 transpose_kernel=True semantics — we instead store
                 (kh, kw, I, O) and rely on flax ConvTranspose's
                 fractional-stride convolution, verified numerically.
- LayerNorm / LayerNorm2d: weight→scale, bias→bias (2d versions operate on
  NCHW channels = our NHWC trailing axis).
- Parameters like pos_embed (1, C, H, W) → (1, H, W, C).
"""

from typing import Any, Dict, List, Tuple

import numpy as np


def _t(x):
    return np.asarray(x)


def _linear(sd, prefix):
    return {"kernel": _t(sd[prefix + ".weight"]).T,
            "bias": _t(sd[prefix + ".bias"])}


def _conv(sd, prefix):
    w = _t(sd[prefix + ".weight"])  # (O, I, kh, kw)
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _dwconv(sd, prefix):
    w = _t(sd[prefix + ".weight"])  # (C, 1, kh, kw)
    return {"kernel": w.transpose(2, 3, 1, 0),
            "bias": _t(sd[prefix + ".bias"])}


def _convT(sd, prefix):
    # torch (I, O, kh, kw) → flax ConvTranspose(transpose_kernel=True)
    # kernel (kh, kw, O, I); verified exact in tests/test_weights.py
    w = _t(sd[prefix + ".weight"])
    return {"kernel": w.transpose(2, 3, 1, 0),
            "bias": _t(sd[prefix + ".bias"])}


def _ln(sd, prefix):
    return {"scale": _t(sd[prefix + ".weight"]),
            "bias": _t(sd[prefix + ".bias"])}


def _mlp(sd, prefix, n_layers):
    return {f"layers_{i}": _linear(sd, f"{prefix}.layers.{i}")
            for i in range(n_layers)}


def _attn_ds(sd, prefix):
    return {name: _linear(sd, f"{prefix}.{name}")
            for name in ("q_proj", "k_proj", "v_proj", "out_proj")}


def _convert_tracker_heads(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Prompt encoder + mask decoder + memory attention/encoder + video
    params — the SAM tracker heads shared verbatim between the SAM2 and
    SAM3 model trees (models/sam2.py ``_setup_sam_heads``)."""
    p: Dict[str, Any] = {}

    # ----------------------------------------------------- prompt encoder
    pe = {
        "pe_gaussian": _t(
            sd["sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]),
        "point_embeddings": np.concatenate(
            [_t(sd[f"sam_prompt_encoder.point_embeddings.{i}.weight"])
             for i in range(4)], axis=0),
        "not_a_point_embed": _t(sd["sam_prompt_encoder.not_a_point_embed.weight"]),
        "no_mask_embed": _t(sd["sam_prompt_encoder.no_mask_embed.weight"]),
        "mask_conv1": _conv(sd, "sam_prompt_encoder.mask_downscaling.0"),
        "mask_ln1": _ln(sd, "sam_prompt_encoder.mask_downscaling.1"),
        "mask_conv2": _conv(sd, "sam_prompt_encoder.mask_downscaling.3"),
        "mask_ln2": _ln(sd, "sam_prompt_encoder.mask_downscaling.4"),
        "mask_conv3": _conv(sd, "sam_prompt_encoder.mask_downscaling.6"),
    }
    p["sam_prompt_encoder"] = pe

    # ------------------------------------------------------- mask decoder
    tw: Dict[str, Any] = {}
    for i in range(2):
        lb = f"sam_mask_decoder.transformer.layers.{i}"
        tw[f"layers_{i}"] = {
            "self_attn": _attn_ds(sd, f"{lb}.self_attn"),
            "cross_attn_token_to_image": _attn_ds(
                sd, f"{lb}.cross_attn_token_to_image"),
            "cross_attn_image_to_token": _attn_ds(
                sd, f"{lb}.cross_attn_image_to_token"),
            "norm1": _ln(sd, f"{lb}.norm1"),
            "norm2": _ln(sd, f"{lb}.norm2"),
            "norm3": _ln(sd, f"{lb}.norm3"),
            "norm4": _ln(sd, f"{lb}.norm4"),
            "mlp_lin1": _linear(sd, f"{lb}.mlp.layers.0"),
            "mlp_lin2": _linear(sd, f"{lb}.mlp.layers.1"),
        }
    tw["final_attn_token_to_image"] = _attn_ds(
        sd, "sam_mask_decoder.transformer.final_attn_token_to_image")
    tw["norm_final_attn"] = _ln(sd, "sam_mask_decoder.transformer.norm_final_attn")

    dec: Dict[str, Any] = {"transformer": tw}
    dec["iou_token"] = _t(sd["sam_mask_decoder.iou_token.weight"])
    dec["mask_tokens"] = _t(sd["sam_mask_decoder.mask_tokens.weight"])
    dec["obj_score_token"] = _t(sd["sam_mask_decoder.obj_score_token.weight"])
    dec["upscale_conv1"] = _convT(sd, "sam_mask_decoder.output_upscaling.0")
    dec["upscale_ln"] = _ln(sd, "sam_mask_decoder.output_upscaling.1")
    dec["upscale_conv2"] = _convT(sd, "sam_mask_decoder.output_upscaling.3")
    dec["conv_s0"] = _conv(sd, "sam_mask_decoder.conv_s0")
    dec["conv_s1"] = _conv(sd, "sam_mask_decoder.conv_s1")
    for i in range(4):
        dec[f"hyper_mlps_{i}"] = _mlp(
            sd, f"sam_mask_decoder.output_hypernetworks_mlps.{i}", 3)
    dec["iou_prediction_head"] = _mlp(sd, "sam_mask_decoder.iou_prediction_head", 3)
    dec["pred_obj_score_head"] = _mlp(sd, "sam_mask_decoder.pred_obj_score_head", 3)
    p["sam_mask_decoder"] = dec

    # --------------------------------------------------- memory attention
    ma: Dict[str, Any] = {}
    for i in range(4):
        lb = f"memory_attention.layers.{i}"
        ma[f"layers_{i}"] = {
            "self_attn": _attn_ds(sd, f"{lb}.self_attn"),
            "cross_attn_image": _attn_ds(sd, f"{lb}.cross_attn_image"),
            "norm1": _ln(sd, f"{lb}.norm1"),
            "norm2": _ln(sd, f"{lb}.norm2"),
            "norm3": _ln(sd, f"{lb}.norm3"),
            "linear1": _linear(sd, f"{lb}.linear1"),
            "linear2": _linear(sd, f"{lb}.linear2"),
        }
    ma["norm"] = _ln(sd, "memory_attention.norm")
    p["memory_attention"] = ma

    # ----------------------------------------------------- memory encoder
    md: Dict[str, Any] = {}
    # mask downsampler: Sequential indices 0,3,6,9 convs / 1,4,7,10 LNs / 12 final
    for li, seq in enumerate((0, 3, 6, 9)):
        md[f"encoder_{li}_conv"] = _conv(
            sd, f"memory_encoder.mask_downsampler.encoder.{seq}")
        md[f"encoder_{li}_ln"] = _ln(
            sd, f"memory_encoder.mask_downsampler.encoder.{seq + 1}")
    md["final_conv"] = _conv(sd, "memory_encoder.mask_downsampler.encoder.12")
    me: Dict[str, Any] = {"mask_downsampler": md}
    me["pix_feat_proj"] = _conv(sd, "memory_encoder.pix_feat_proj")
    for i in range(2):
        fb = f"memory_encoder.fuser.layers.{i}"
        me[f"fuser_{i}"] = {
            "dwconv": _dwconv(sd, f"{fb}.dwconv"),
            "norm": _ln(sd, f"{fb}.norm"),
            "pwconv1": _linear(sd, f"{fb}.pwconv1"),
            "pwconv2": _linear(sd, f"{fb}.pwconv2"),
            "gamma": _t(sd[f"{fb}.gamma"]),
        }
    me["out_proj"] = _conv(sd, "memory_encoder.out_proj")
    p["memory_encoder"] = me

    # ------------------------------------------------------- video params
    p["no_mem_embed"] = _t(sd["no_mem_embed"])
    p["no_mem_pos_enc"] = _t(sd["no_mem_pos_enc"])
    mm = _t(sd["maskmem_tpos_enc"])
    p["maskmem_tpos_enc"] = mm[: cfg.num_maskmem]  # truncation semantics
    if "no_obj_embed_spatial" in sd:
        p["no_obj_embed_spatial"] = _t(sd["no_obj_embed_spatial"])
    else:
        p["no_obj_embed_spatial"] = np.zeros((1, cfg.mem_dim), np.float32)
    p["obj_ptr_proj"] = _mlp(sd, "obj_ptr_proj", 3)
    p["obj_ptr_tpos_proj"] = _linear(sd, "obj_ptr_tpos_proj")
    return p


def convert_torch_state_dict(sd: Dict[str, Any], model) -> Dict[str, Any]:
    """Map an official SAM2.1 state dict onto the SAM2 Flax param tree."""
    cfg = model.config
    p: Dict[str, Any] = {}

    # ------------------------------------------------------------- trunk
    trunk: Dict[str, Any] = {}
    trunk["patch_embed"] = {"proj": _conv(sd, "image_encoder.trunk.patch_embed.proj")}
    trunk["pos_embed"] = _t(sd["image_encoder.trunk.pos_embed"]).transpose(0, 2, 3, 1)
    trunk["pos_embed_window"] = _t(
        sd["image_encoder.trunk.pos_embed_window"]).transpose(0, 2, 3, 1)

    depth = sum(cfg.stages)
    for i in range(depth):
        tb = f"image_encoder.trunk.blocks.{i}"
        blk = {
            "norm1": _ln(sd, f"{tb}.norm1"),
            "norm2": _ln(sd, f"{tb}.norm2"),
            "attn": {"qkv": _linear(sd, f"{tb}.attn.qkv"),
                     "proj": _linear(sd, f"{tb}.attn.proj")},
            "mlp_fc1": _linear(sd, f"{tb}.mlp.layers.0"),
            "mlp_fc2": _linear(sd, f"{tb}.mlp.layers.1"),
        }
        if f"{tb}.proj.weight" in sd:  # stage transition shortcut projection
            blk["proj"] = _linear(sd, f"{tb}.proj")
        trunk[f"blocks_{i}"] = blk

    # -------------------------------------------------------------- neck
    # torch convs[j] maps to backbone level n-1-j (top-down construction)
    neck: Dict[str, Any] = {}
    n_levels = len(cfg.stages)
    for j in range(n_levels):
        neck[f"convs_{n_levels - 1 - j}"] = _conv(
            sd, f"image_encoder.neck.convs.{j}.conv")

    # trunk/neck are constructed in SAM2.setup, so they are direct children
    # of the SAM2 scope (flax linen naming), not nested under image_encoder
    p["trunk"] = trunk
    p["neck"] = neck

    p.update(_convert_tracker_heads(sd, cfg))
    return p


def expected_state_dict_shapes(model) -> Dict[str, Tuple[int, ...]]:
    """Key → shape of the torch state dict this converter consumes
    (documentation + synthetic-checkpoint tests)."""
    cfg = model.config
    sd: Dict[str, Tuple[int, ...]] = {}
    e = cfg.embed_dim
    sd["image_encoder.trunk.patch_embed.proj.weight"] = (e, 3, 7, 7)
    sd["image_encoder.trunk.patch_embed.proj.bias"] = (e,)
    bs = cfg.window_pos_embed_bkg_spatial_size
    sd["image_encoder.trunk.pos_embed"] = (1, e, bs[0], bs[1])
    sd["image_encoder.trunk.pos_embed_window"] = (
        1, e, cfg.window_spec[0], cfg.window_spec[0])

    stage_ends = [sum(cfg.stages[:i]) - 1 for i in range(1, len(cfg.stages) + 1)]
    dim = e
    for i in range(sum(cfg.stages)):
        dim_out = dim
        if i - 1 in stage_ends:
            dim_out = dim * 2
        tb = f"image_encoder.trunk.blocks.{i}"
        sd[f"{tb}.norm1.weight"] = (dim,)
        sd[f"{tb}.norm1.bias"] = (dim,)
        sd[f"{tb}.attn.qkv.weight"] = (3 * dim_out, dim)
        sd[f"{tb}.attn.qkv.bias"] = (3 * dim_out,)
        sd[f"{tb}.attn.proj.weight"] = (dim_out, dim_out)
        sd[f"{tb}.attn.proj.bias"] = (dim_out,)
        sd[f"{tb}.norm2.weight"] = (dim_out,)
        sd[f"{tb}.norm2.bias"] = (dim_out,)
        sd[f"{tb}.mlp.layers.0.weight"] = (4 * dim_out, dim_out)
        sd[f"{tb}.mlp.layers.0.bias"] = (4 * dim_out,)
        sd[f"{tb}.mlp.layers.1.weight"] = (dim_out, 4 * dim_out)
        sd[f"{tb}.mlp.layers.1.bias"] = (dim_out,)
        if dim_out != dim:
            sd[f"{tb}.proj.weight"] = (dim_out, dim)
            sd[f"{tb}.proj.bias"] = (dim_out,)
        dim = dim_out

    chans = list(cfg.backbone_channel_list)[::-1]  # top-down for torch convs
    for j, c in enumerate(chans):
        sd[f"image_encoder.neck.convs.{j}.conv.weight"] = (cfg.d_model, c, 1, 1)
        sd[f"image_encoder.neck.convs.{j}.conv.bias"] = (cfg.d_model,)

    sd.update(_tracker_head_shapes(cfg))
    return sd


def _tracker_head_shapes(cfg) -> Dict[str, Tuple[int, ...]]:
    """Expected shapes for the shared SAM tracker heads (see
    ``_convert_tracker_heads``)."""
    sd: Dict[str, Tuple[int, ...]] = {}
    d = cfg.d_model
    sd["sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = (2, d // 2)
    for i in range(4):
        sd[f"sam_prompt_encoder.point_embeddings.{i}.weight"] = (1, d)
    sd["sam_prompt_encoder.not_a_point_embed.weight"] = (1, d)
    sd["sam_prompt_encoder.no_mask_embed.weight"] = (1, d)
    sd["sam_prompt_encoder.mask_downscaling.0.weight"] = (4, 1, 2, 2)
    sd["sam_prompt_encoder.mask_downscaling.0.bias"] = (4,)
    sd["sam_prompt_encoder.mask_downscaling.1.weight"] = (4,)
    sd["sam_prompt_encoder.mask_downscaling.1.bias"] = (4,)
    sd["sam_prompt_encoder.mask_downscaling.3.weight"] = (16, 4, 2, 2)
    sd["sam_prompt_encoder.mask_downscaling.3.bias"] = (16,)
    sd["sam_prompt_encoder.mask_downscaling.4.weight"] = (16,)
    sd["sam_prompt_encoder.mask_downscaling.4.bias"] = (16,)
    sd["sam_prompt_encoder.mask_downscaling.6.weight"] = (d, 16, 1, 1)
    sd["sam_prompt_encoder.mask_downscaling.6.bias"] = (d,)

    def attn(prefix, internal, kv_in=None):
        kv_in = kv_in or d
        sd[f"{prefix}.q_proj.weight"] = (internal, d)
        sd[f"{prefix}.q_proj.bias"] = (internal,)
        sd[f"{prefix}.k_proj.weight"] = (internal, kv_in)
        sd[f"{prefix}.k_proj.bias"] = (internal,)
        sd[f"{prefix}.v_proj.weight"] = (internal, kv_in)
        sd[f"{prefix}.v_proj.bias"] = (internal,)
        sd[f"{prefix}.out_proj.weight"] = (d, internal)
        sd[f"{prefix}.out_proj.bias"] = (d,)

    for i in range(2):
        lb = f"sam_mask_decoder.transformer.layers.{i}"
        attn(f"{lb}.self_attn", d)
        attn(f"{lb}.cross_attn_token_to_image", d // 2)
        attn(f"{lb}.cross_attn_image_to_token", d // 2)
        for nrm in ("norm1", "norm2", "norm3", "norm4"):
            sd[f"{lb}.{nrm}.weight"] = (d,)
            sd[f"{lb}.{nrm}.bias"] = (d,)
        sd[f"{lb}.mlp.layers.0.weight"] = (2048, d)
        sd[f"{lb}.mlp.layers.0.bias"] = (2048,)
        sd[f"{lb}.mlp.layers.1.weight"] = (d, 2048)
        sd[f"{lb}.mlp.layers.1.bias"] = (d,)
    attn("sam_mask_decoder.transformer.final_attn_token_to_image", d // 2)
    sd["sam_mask_decoder.transformer.norm_final_attn.weight"] = (d,)
    sd["sam_mask_decoder.transformer.norm_final_attn.bias"] = (d,)

    sd["sam_mask_decoder.iou_token.weight"] = (1, d)
    sd["sam_mask_decoder.mask_tokens.weight"] = (4, d)
    sd["sam_mask_decoder.obj_score_token.weight"] = (1, d)
    sd["sam_mask_decoder.output_upscaling.0.weight"] = (d, d // 4, 2, 2)
    sd["sam_mask_decoder.output_upscaling.0.bias"] = (d // 4,)
    sd["sam_mask_decoder.output_upscaling.1.weight"] = (d // 4,)
    sd["sam_mask_decoder.output_upscaling.1.bias"] = (d // 4,)
    sd["sam_mask_decoder.output_upscaling.3.weight"] = (d // 4, d // 8, 2, 2)
    sd["sam_mask_decoder.output_upscaling.3.bias"] = (d // 8,)
    sd["sam_mask_decoder.conv_s0.weight"] = (d // 8, d, 1, 1)
    sd["sam_mask_decoder.conv_s0.bias"] = (d // 8,)
    sd["sam_mask_decoder.conv_s1.weight"] = (d // 4, d, 1, 1)
    sd["sam_mask_decoder.conv_s1.bias"] = (d // 4,)
    for i in range(4):
        hb = f"sam_mask_decoder.output_hypernetworks_mlps.{i}"
        sd[f"{hb}.layers.0.weight"] = (d, d)
        sd[f"{hb}.layers.0.bias"] = (d,)
        sd[f"{hb}.layers.1.weight"] = (d, d)
        sd[f"{hb}.layers.1.bias"] = (d,)
        sd[f"{hb}.layers.2.weight"] = (d // 8, d)
        sd[f"{hb}.layers.2.bias"] = (d // 8,)
    for head, od in (("iou_prediction_head", 4), ("pred_obj_score_head", 1)):
        sd[f"sam_mask_decoder.{head}.layers.0.weight"] = (d, d)
        sd[f"sam_mask_decoder.{head}.layers.0.bias"] = (d,)
        sd[f"sam_mask_decoder.{head}.layers.1.weight"] = (d, d)
        sd[f"sam_mask_decoder.{head}.layers.1.bias"] = (d,)
        sd[f"sam_mask_decoder.{head}.layers.2.weight"] = (od, d)
        sd[f"sam_mask_decoder.{head}.layers.2.bias"] = (od,)

    for i in range(4):
        lb = f"memory_attention.layers.{i}"
        attn(f"{lb}.self_attn", d)
        attn(f"{lb}.cross_attn_image", d, kv_in=cfg.mem_dim)
        for nrm in ("norm1", "norm2", "norm3"):
            sd[f"{lb}.{nrm}.weight"] = (d,)
            sd[f"{lb}.{nrm}.bias"] = (d,)
        sd[f"{lb}.linear1.weight"] = (2048, d)
        sd[f"{lb}.linear1.bias"] = (2048,)
        sd[f"{lb}.linear2.weight"] = (d, 2048)
        sd[f"{lb}.linear2.bias"] = (d,)
    sd["memory_attention.norm.weight"] = (d,)
    sd["memory_attention.norm.bias"] = (d,)

    ch = 1
    for li, seq in enumerate((0, 3, 6, 9)):
        co = ch * 4
        sd[f"memory_encoder.mask_downsampler.encoder.{seq}.weight"] = (co, ch, 3, 3)
        sd[f"memory_encoder.mask_downsampler.encoder.{seq}.bias"] = (co,)
        sd[f"memory_encoder.mask_downsampler.encoder.{seq + 1}.weight"] = (co,)
        sd[f"memory_encoder.mask_downsampler.encoder.{seq + 1}.bias"] = (co,)
        ch = co
    sd["memory_encoder.mask_downsampler.encoder.12.weight"] = (d, ch, 1, 1)
    sd["memory_encoder.mask_downsampler.encoder.12.bias"] = (d,)
    sd["memory_encoder.pix_feat_proj.weight"] = (d, d, 1, 1)
    sd["memory_encoder.pix_feat_proj.bias"] = (d,)
    for i in range(2):
        fb = f"memory_encoder.fuser.layers.{i}"
        sd[f"{fb}.dwconv.weight"] = (d, 1, 7, 7)
        sd[f"{fb}.dwconv.bias"] = (d,)
        sd[f"{fb}.norm.weight"] = (d,)
        sd[f"{fb}.norm.bias"] = (d,)
        sd[f"{fb}.pwconv1.weight"] = (4 * d, d)
        sd[f"{fb}.pwconv1.bias"] = (4 * d,)
        sd[f"{fb}.pwconv2.weight"] = (d, 4 * d)
        sd[f"{fb}.pwconv2.bias"] = (d,)
        sd[f"{fb}.gamma"] = (d,)
    sd["memory_encoder.out_proj.weight"] = (cfg.mem_dim, d, 1, 1)
    sd["memory_encoder.out_proj.bias"] = (cfg.mem_dim,)

    sd["no_mem_embed"] = (1, 1, d)
    sd["no_mem_pos_enc"] = (1, 1, d)
    sd["maskmem_tpos_enc"] = (7, 1, 1, cfg.mem_dim)
    sd["no_obj_embed_spatial"] = (1, cfg.mem_dim)
    for i in range(3):
        sd[f"obj_ptr_proj.layers.{i}.weight"] = (d, d)
        sd[f"obj_ptr_proj.layers.{i}.bias"] = (d,)
    sd["obj_ptr_tpos_proj.weight"] = (cfg.mem_dim, d)
    sd["obj_ptr_tpos_proj.bias"] = (cfg.mem_dim,)
    return sd


def load_checkpoint(path: str, model):
    """Load a .pt/.pth SAM2 checkpoint (torch pickle) or .msgpack params."""
    if path.endswith(".msgpack"):
        import jax
        from flax import serialization
        import jax.numpy as jnp
        from saber_tpu.models.sam3 import SAM3
        dummy = jnp.zeros((1, model.config.image_size, model.config.image_size, 3))
        if isinstance(model, SAM3):
            toks = jnp.zeros((1, model.config.context_length), jnp.int32)
            toks = toks.at[0, 0].set(1)
            template = model.init(jax.random.PRNGKey(0), dummy, toks)["params"]
        else:
            pts = jnp.zeros((1, 1, 2))
            lbl = jnp.ones((1, 1), jnp.int32)
            template = model.init(jax.random.PRNGKey(0), dummy, pts, lbl)["params"]
        with open(path, "rb") as f:
            return serialization.from_bytes(template, f.read())
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    from saber_tpu.models.sam3 import SAM3
    if isinstance(model, SAM3):
        from saber_tpu.models.weights_sam3 import convert_sam3_state_dict
        return convert_sam3_state_dict(sd, model)
    return convert_torch_state_dict(sd, model)
