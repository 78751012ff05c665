"""PyTorch SAM3 checkpoint → JAX params conversion.

The reference acquires the (HF-gated) official SAM3 checkpoint in
saber/pretrained_weights.py:68-101 and loads it through the external
``sam3`` torch package (saber/adapters/sam3/predictor.py:98-113 image
model, :145-164 video model with the tracker grafted onto the detector
backbone). This module maps that checkpoint's state dict onto the SAM3
Flax tree in saber_tpu/models/sam3.py.

Checkpoint layout
-----------------
``SAM3_COMPONENT_PREFIXES`` documents the four top-level component
prefixes. Official releases have shipped the tracker heads both at the
top level and under a ``tracker.`` prefix; ``normalize_sam3_keys``
accepts either (plus an optional leading ``model.``), so the converter is
insensitive to that packaging difference. Unknown keys are reported, not
silently dropped.

Per-tensor layout rules are the ones validated in tests/test_weights.py
(Linear transpose, Conv NCHW→NHWC, ConvTranspose, LayerNorm); activation
parity of the converted detector/text/vision modules against independent
torch implementations is established in tests/test_sam3_golden.py the
same way the SAM2 modules are golden-tested.
"""

from typing import Any, Dict, List, Tuple

import numpy as np

from saber_tpu.models.weights import (
    _attn_ds,
    _conv,
    _convT,
    _convert_tracker_heads,
    _linear,
    _ln,
    _mlp,
    _t,
    _tracker_head_shapes,
)

SAM3_COMPONENT_PREFIXES = (
    "vision_encoder.",   # windowed ViT trunk + simple-FPN neck
    "text_encoder.",     # CLIP-style causal text tower
    "detector.",         # fusion encoder + query decoder + heads
    "tracker.",          # SAM2 heads (optional prefix; may be top-level)
)


def normalize_sam3_keys(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Strip ``model.`` and ``tracker.`` packaging prefixes.

    After this pass the tracker heads live at the exact SAM2 key names
    (``sam_prompt_encoder.…``, ``memory_attention.…``, …), so the SAM2
    head converter consumes them unchanged.
    """
    out: Dict[str, Any] = {}
    for k, v in sd.items():
        if k.startswith("model."):
            k = k[len("model."):]
        if k.startswith("tracker."):
            k = k[len("tracker."):]
        out[k] = v
    return out


def _tblock(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Pre-LN transformer block (ViT / text towers share this layout)."""
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "qkv": _linear(sd, f"{prefix}.attn.qkv"),
        "proj": _linear(sd, f"{prefix}.attn.proj"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp_fc1": _linear(sd, f"{prefix}.mlp.layers.0"),
        "mlp_fc2": _linear(sd, f"{prefix}.mlp.layers.1"),
    }


def _cross(sd: Dict[str, Any], prefix: str, flax_prefix: str) -> Dict[str, Any]:
    """torch q/k/v/out_proj cross-attention → the flat ``{p}_q…`` Dense
    names models/sam3.py ``_cross_attention`` uses."""
    return {
        f"{flax_prefix}_q": _linear(sd, f"{prefix}.q_proj"),
        f"{flax_prefix}_k": _linear(sd, f"{prefix}.k_proj"),
        f"{flax_prefix}_v": _linear(sd, f"{prefix}.v_proj"),
        f"{flax_prefix}_o": _linear(sd, f"{prefix}.out_proj"),
    }


def _fusion_layer(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    blk = {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "qkv": _linear(sd, f"{prefix}.attn.qkv"),
        "proj": _linear(sd, f"{prefix}.attn.proj"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "norm3": _ln(sd, f"{prefix}.norm3"),
        "mlp_fc1": _linear(sd, f"{prefix}.mlp.layers.0"),
        "mlp_fc2": _linear(sd, f"{prefix}.mlp.layers.1"),
    }
    blk.update(_cross(sd, f"{prefix}.text_cross", "text_cross"))
    return blk


def _decoder_layer(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    blk = {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "qkv": _linear(sd, f"{prefix}.attn.qkv"),
        "proj": _linear(sd, f"{prefix}.attn.proj"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "norm3": _ln(sd, f"{prefix}.norm3"),
        "mlp_fc1": _linear(sd, f"{prefix}.mlp.layers.0"),
        "mlp_fc2": _linear(sd, f"{prefix}.mlp.layers.1"),
    }
    blk.update(_cross(sd, f"{prefix}.img_cross", "img_cross"))
    return blk


def _convert_vision(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """vision_encoder.* → the ``vl_backbone`` subtree."""
    vb: Dict[str, Any] = {}
    vb["patch_embed"] = _conv(sd, "vision_encoder.patch_embed.proj")
    vb["pos_embed"] = _t(sd["vision_encoder.pos_embed"]).transpose(0, 2, 3, 1)
    for i in range(cfg.vit_depth):
        vb[f"blocks_{i}"] = _tblock(sd, f"vision_encoder.blocks.{i}")
    vb["norm"] = _ln(sd, "vision_encoder.norm")

    # ---------------------------------------------------------- FPN neck
    for lvl in ("p16", "p8", "p4"):
        lat = _conv(sd, f"vision_encoder.neck.{lvl}.lateral")
        vb[f"{lvl}_lateral"] = {"kernel": lat["kernel"]}   # use_bias=False
        vb[f"{lvl}_ln1"] = _ln(sd, f"vision_encoder.neck.{lvl}.ln1")
        out = _conv(sd, f"vision_encoder.neck.{lvl}.out")
        vb[f"{lvl}_out"] = {"kernel": out["kernel"]}
        vb[f"{lvl}_ln2"] = _ln(sd, f"vision_encoder.neck.{lvl}.ln2")
    for name in ("up8", "up4"):
        vb[name] = _convT(sd, f"vision_encoder.neck.{name}")
    return vb


def _convert_text(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """text_encoder.* → the ``text`` subtree."""
    tx: Dict[str, Any] = {}
    tx["token_embedding"] = {
        "embedding": _t(sd["text_encoder.token_embedding.weight"])}
    tx["pos_embed"] = _t(sd["text_encoder.pos_embed"])
    for i in range(cfg.text_depth):
        tx[f"blocks_{i}"] = _tblock(sd, f"text_encoder.blocks.{i}")
    tx["final_norm"] = _ln(sd, "text_encoder.final_norm")
    tx["text_proj"] = {"kernel": _t(sd["text_encoder.text_proj.weight"]).T}
    return tx


def _convert_detector(sd: Dict[str, Any], cfg) -> Dict[str, Any]:
    """detector.* → the ``detector`` subtree."""
    det: Dict[str, Any] = {}
    for i in range(cfg.fusion_layers):
        det[f"fusion_{i}"] = _fusion_layer(sd, f"detector.fusion.{i}")
    det["query_embed"] = _t(sd["detector.query_embed"])
    for i in range(cfg.decoder_layers):
        det[f"decoder_{i}"] = _decoder_layer(sd, f"detector.decoder.{i}")
    det["decoder_norm"] = _ln(sd, "detector.decoder_norm")
    det["score_head"] = _linear(sd, "detector.score_head")
    det["presence_head"] = _linear(sd, "detector.presence_head")
    det["box_head"] = _mlp(sd, "detector.box_head", 3)
    det["pixel_conv1"] = _conv(sd, "detector.pixel_conv1")
    det["pixel_ln"] = _ln(sd, "detector.pixel_ln")
    det["pixel_conv2"] = _conv(sd, "detector.pixel_conv2")
    det["mask_embed"] = _mlp(sd, "detector.mask_embed", 3)
    return det


def convert_sam3_state_dict(sd: Dict[str, Any], model) -> Dict[str, Any]:
    """Map a SAM3 state dict onto the SAM3 Flax param tree."""
    cfg = model.config
    sd = normalize_sam3_keys(sd)
    p: Dict[str, Any] = {
        "vl_backbone": _convert_vision(sd, cfg),
        "text": _convert_text(sd, cfg),
        "detector": _convert_detector(sd, cfg),
    }
    p.update(_convert_tracker_heads(sd, cfg))
    return p


def expected_sam3_state_dict_shapes(model) -> Dict[str, Tuple[int, ...]]:
    """Key → shape of the (normalized) SAM3 state dict this converter
    consumes — the synthetic-checkpoint contract mirroring
    ``weights.expected_state_dict_shapes`` for SAM2."""
    cfg = model.config
    sd: Dict[str, Tuple[int, ...]] = {}
    c = cfg.vit_width
    d = cfg.d_model
    pch = cfg.patch_size
    fs = cfg.feat_size

    sd["vision_encoder.patch_embed.proj.weight"] = (c, 3, pch, pch)
    sd["vision_encoder.patch_embed.proj.bias"] = (c,)
    sd["vision_encoder.pos_embed"] = (1, c, fs, fs)

    def tblock(prefix: str, width: int):
        sd[f"{prefix}.norm1.weight"] = (width,)
        sd[f"{prefix}.norm1.bias"] = (width,)
        sd[f"{prefix}.attn.qkv.weight"] = (3 * width, width)
        sd[f"{prefix}.attn.qkv.bias"] = (3 * width,)
        sd[f"{prefix}.attn.proj.weight"] = (width, width)
        sd[f"{prefix}.attn.proj.bias"] = (width,)
        sd[f"{prefix}.norm2.weight"] = (width,)
        sd[f"{prefix}.norm2.bias"] = (width,)
        sd[f"{prefix}.mlp.layers.0.weight"] = (4 * width, width)
        sd[f"{prefix}.mlp.layers.0.bias"] = (4 * width,)
        sd[f"{prefix}.mlp.layers.1.weight"] = (width, 4 * width)
        sd[f"{prefix}.mlp.layers.1.bias"] = (width,)

    for i in range(cfg.vit_depth):
        tblock(f"vision_encoder.blocks.{i}", c)
    sd["vision_encoder.norm.weight"] = (c,)
    sd["vision_encoder.norm.bias"] = (c,)

    for lvl, ch in (("p16", c), ("p8", c // 2), ("p4", c // 4)):
        sd[f"vision_encoder.neck.{lvl}.lateral.weight"] = (d, ch, 1, 1)
        sd[f"vision_encoder.neck.{lvl}.ln1.weight"] = (d,)
        sd[f"vision_encoder.neck.{lvl}.ln1.bias"] = (d,)
        sd[f"vision_encoder.neck.{lvl}.out.weight"] = (d, d, 3, 3)
        sd[f"vision_encoder.neck.{lvl}.ln2.weight"] = (d,)
        sd[f"vision_encoder.neck.{lvl}.ln2.bias"] = (d,)
    sd["vision_encoder.neck.up8.weight"] = (c, c // 2, 2, 2)
    sd["vision_encoder.neck.up8.bias"] = (c // 2,)
    sd["vision_encoder.neck.up4.weight"] = (c // 2, c // 4, 2, 2)
    sd["vision_encoder.neck.up4.bias"] = (c // 4,)

    tw = cfg.text_width
    sd["text_encoder.token_embedding.weight"] = (cfg.vocab_size, tw)
    sd["text_encoder.pos_embed"] = (cfg.context_length, tw)
    for i in range(cfg.text_depth):
        tblock(f"text_encoder.blocks.{i}", tw)
    sd["text_encoder.final_norm.weight"] = (tw,)
    sd["text_encoder.final_norm.bias"] = (tw,)
    sd["text_encoder.text_proj.weight"] = (d, tw)

    def cross(prefix: str):
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{prefix}.{nm}.weight"] = (d, d)
            sd[f"{prefix}.{nm}.bias"] = (d,)

    def det_layer(prefix: str, cross_name: str):
        for nrm in ("norm1", "norm2", "norm3"):
            sd[f"{prefix}.{nrm}.weight"] = (d,)
            sd[f"{prefix}.{nrm}.bias"] = (d,)
        sd[f"{prefix}.attn.qkv.weight"] = (3 * d, d)
        sd[f"{prefix}.attn.qkv.bias"] = (3 * d,)
        sd[f"{prefix}.attn.proj.weight"] = (d, d)
        sd[f"{prefix}.attn.proj.bias"] = (d,)
        cross(f"{prefix}.{cross_name}")
        sd[f"{prefix}.mlp.layers.0.weight"] = (4 * d, d)
        sd[f"{prefix}.mlp.layers.0.bias"] = (4 * d,)
        sd[f"{prefix}.mlp.layers.1.weight"] = (d, 4 * d)
        sd[f"{prefix}.mlp.layers.1.bias"] = (d,)

    for i in range(cfg.fusion_layers):
        det_layer(f"detector.fusion.{i}", "text_cross")
    sd["detector.query_embed"] = (cfg.num_queries + 1, d)
    for i in range(cfg.decoder_layers):
        det_layer(f"detector.decoder.{i}", "img_cross")
    sd["detector.decoder_norm.weight"] = (d,)
    sd["detector.decoder_norm.bias"] = (d,)
    sd["detector.score_head.weight"] = (1, d)
    sd["detector.score_head.bias"] = (1,)
    sd["detector.presence_head.weight"] = (1, d)
    sd["detector.presence_head.bias"] = (1,)
    for i, (o, h) in enumerate(((d, d), (d, d), (4, d))):
        sd[f"detector.box_head.layers.{i}.weight"] = (o, h)
        sd[f"detector.box_head.layers.{i}.bias"] = (o,)
    sd["detector.pixel_conv1.weight"] = (d, d, 3, 3)
    sd["detector.pixel_conv1.bias"] = (d,)
    sd["detector.pixel_ln.weight"] = (d,)
    sd["detector.pixel_ln.bias"] = (d,)
    sd["detector.pixel_conv2.weight"] = (d, d, 3, 3)
    sd["detector.pixel_conv2.bias"] = (d,)
    for i in range(3):
        sd[f"detector.mask_embed.layers.{i}.weight"] = (d, d)
        sd[f"detector.mask_embed.layers.{i}.bias"] = (d,)

    sd.update(_tracker_head_shapes(cfg))
    return sd


def report_unconsumed_keys(sd: Dict[str, Any], model) -> List[str]:
    """Keys in ``sd`` the converter would not consume — surfacing layout
    drift in future official releases instead of silently dropping
    tensors."""
    expected = set(expected_sam3_state_dict_shapes(model))
    expected.add("maskmem_tpos_enc")  # truncation: any leading size ≥ num_maskmem
    return sorted(k for k in normalize_sam3_keys(sd) if k not in expected)


# ---------------------------------------------------------------------------
# Checkpoint layout validation (`python -m saber_tpu.models.weights_sam3
# check <path>`).
#
# PROVENANCE / RISK: ``expected_sam3_state_dict_shapes`` is a
# reconstruction of the official SAM3 checkpoint layout (the reference
# consumes it through the external ``sam3`` package,
# saber/adapters/sam3/predictor.py:98-113; the checkpoint itself is
# HF-gated and unavailable in this environment). The goldens in
# tests/test_sam3_golden.py validate the converter against an independent
# torch re-implementation of the SAME reconstruction — they cannot catch a
# key-name or layout divergence from the real release. This checker turns
# the first real checkpoint load into a one-minute diff instead of a
# debugging session.
# ---------------------------------------------------------------------------


def check_state_dict(sd: Dict[str, Any], model) -> Dict[str, list]:
    """Diff an arbitrary state dict's keys/shapes against the layout this
    converter consumes. Returns {"missing", "unexpected",
    "shape_mismatch"} lists; all empty ⇒ the checkpoint will convert."""
    expected = expected_sam3_state_dict_shapes(model)
    got = {k: tuple(getattr(v, "shape", ())) for k, v in
           normalize_sam3_keys(sd).items()}
    missing = sorted(k for k in expected if k not in got)
    unexpected = report_unconsumed_keys(sd, model)
    mismatch = []
    for k, want in expected.items():
        if k in got and got[k] != tuple(want):
            if (k == "maskmem_tpos_enc" and len(got[k]) == len(want)
                    and got[k][1:] == tuple(want)[1:]
                    and got[k][0] >= want[0]):
                continue  # converter truncates the leading maskmem axis
            mismatch.append((k, got[k], tuple(want)))
    return {"missing": missing, "unexpected": unexpected,
            "shape_mismatch": mismatch}


def _load_raw_state_dict(path: str) -> Dict[str, Any]:
    """Load a raw (unconverted) state dict: torch .pt/.pth pickles, .npz,
    or .safetensors when that package exists."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file  # optional dep, gated
        return load_file(path)
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def format_check_report(report: Dict[str, list], head: int = 20) -> str:
    """Human-readable layout diff (grouped, truncated past ``head``)."""
    lines = []
    ok = not any(report.values())
    lines.append("layout check: " + ("OK — checkpoint will convert" if ok
                                     else "MISMATCH"))
    for name, rows in (("missing (expected, not in checkpoint)",
                        report["missing"]),
                       ("unexpected (in checkpoint, not consumed)",
                        report["unexpected"])):
        lines.append(f"  {name}: {len(rows)}")
        for k in rows[:head]:
            lines.append(f"    - {k}")
        if len(rows) > head:
            lines.append(f"    … and {len(rows) - head} more")
    rows = report["shape_mismatch"]
    lines.append(f"  shape mismatches: {len(rows)}")
    for k, got, want in rows[:head]:
        lines.append(f"    - {k}: checkpoint {got} vs expected {want}")
    if len(rows) > head:
        lines.append(f"    … and {len(rows) - head} more")
    return "\n".join(lines)


def _main(argv: List[str]) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m saber_tpu.models.weights_sam3",
        description="SAM3 checkpoint layout tools")
    sub = ap.add_subparsers(dest="cmd", required=True)
    chk = sub.add_parser("check", help="diff a checkpoint's keys/shapes "
                         "against the converter's expected layout")
    chk.add_argument("path", help=".pt/.pth/.npz/.safetensors state dict")
    chk.add_argument("--cfg", default="large", help="SAM3 config name")
    chk.add_argument("--image-size", type=int, default=None)
    chk.add_argument("--dump-keys", action="store_true",
                     help="also print every expected key and shape")
    args = ap.parse_args(argv)

    from saber_tpu.models.sam3 import SAM3, get_config

    model = SAM3(get_config(args.cfg, image_size=args.image_size))
    if args.dump_keys:
        for k, shape in sorted(expected_sam3_state_dict_shapes(model).items()):
            print(f"{k}\t{tuple(shape)}")
    report = check_state_dict(_load_raw_state_dict(args.path), model)
    print(format_check_report(report))
    return 0 if not any(report.values()) else 1


if __name__ == "__main__":  # pragma: no cover - exercised via subprocess test
    import sys

    sys.exit(_main(sys.argv[1:]))
