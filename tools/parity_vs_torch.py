"""IoU parity harness: JAX SAM2 vs the PyTorch reference.

The correctness gate for this framework is mask IoU ≥ 0.99 vs PyTorch SAM2
(BASELINE.md). This environment has neither the ``sam2`` package nor
checkpoints (zero egress), so parity is established in layers:

1. converter layout rules vs torch ops — tests/test_weights.py (runs here);
2. THIS script — run it on a machine with ``sam2`` + checkpoints installed:
   it loads the same .pt into both stacks and reports per-module activation
   deltas and end-to-end mask IoU on synthetic and/or real images.

Usage:
    python tools/parity_vs_torch.py --checkpoint sam2.1_hiera_tiny.pt \
        --cfg tiny [--image path.mrc] [--image-size 1024]
"""

import argparse
import sys

import numpy as np


def iou(a, b):
    a, b = np.asarray(a, bool), np.asarray(b, bool)
    u = np.logical_or(a, b).sum()
    return float(np.logical_and(a, b).sum() / u) if u else 1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--cfg", default="tiny",
                    choices=["tiny", "small", "base", "large"])
    ap.add_argument("--image", default=None, help="optional MRC/TIFF image")
    ap.add_argument("--image-size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax.numpy as jnp
    import torch

    try:
        from sam2.build_sam import build_sam2 as torch_build
        from sam2.sam2_image_predictor import SAM2ImagePredictor
    except ImportError:
        print("ERROR: the torch `sam2` package is required for this harness "
              "(pip install sam2). The converter layout rules are already "
              "torch-verified by tests/test_weights.py.")
        sys.exit(2)

    from saber_tpu.models.sam2 import SAM2, build_sam2

    # ---- load both stacks from the same checkpoint -----------------------
    cfg_yaml = {
        "tiny": "configs/sam2.1/sam2.1_hiera_t.yaml",
        "small": "configs/sam2.1/sam2.1_hiera_s.yaml",
        "base": "configs/sam2.1/sam2.1_hiera_b+.yaml",
        "large": "configs/sam2.1/sam2.1_hiera_l.yaml",
    }[args.cfg]
    tmodel = torch_build(cfg_yaml, args.checkpoint, device="cpu")
    tpred = SAM2ImagePredictor(tmodel)

    jmodel, jparams = build_sam2(args.cfg, image_size=args.image_size,
                                 checkpoint=args.checkpoint)

    # ---- input ------------------------------------------------------------
    rng = np.random.default_rng(args.seed)
    if args.image:
        from saber_tpu.utils.io import read_micrograph
        from saber_tpu.ops import preprocessing as prep
        img, _ = read_micrograph(args.image)
        img = np.asarray(prep.prepare(jnp.asarray(img), to_rgb=True))
    else:
        img = rng.random((args.image_size, args.image_size, 3)).astype(np.float32)

    # ---- encoder parity ----------------------------------------------------
    # both stacks consume the SAME uint8 image: the torch predictor
    # quantizes internally, so the JAX side must normalize the quantized
    # values too — otherwise up-to-1/255 input skew pollutes the deltas
    img8 = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    tpred.set_image(img8)
    t_embed = tpred._features["image_embed"][0].cpu().numpy()  # (256, h, w)

    # match torch preprocessing: uint8 → imagenet normalize (SAM2ImagePredictor)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    jimg = (img8.astype(np.float32) / 255.0 - mean) / std
    bb = jmodel.apply({"params": jparams}, jnp.asarray(jimg[None]),
                      method=SAM2.encode_image)
    j_embed = np.asarray(bb["vision_features"][0]).transpose(2, 0, 1)

    rel = (np.abs(j_embed - t_embed).max()
           / (np.abs(t_embed).max() + 1e-9))
    print(f"encoder max rel delta: {rel:.2e}")

    # ---- point-prompt mask parity ------------------------------------------
    ious = []
    margin = max(1, args.image_size // 4)
    for _ in range(8):
        pt = rng.integers(margin, args.image_size - margin, 2).astype(np.float32)
        tm, tscores, _ = tpred.predict(point_coords=pt[None],
                                       point_labels=np.array([1]),
                                       multimask_output=True)
        pts = jnp.asarray([[pt.tolist(), [0.0, 0.0]]], jnp.float32)
        lbl = jnp.asarray([[1, -1]], jnp.int32)
        jm, jiou, _, _ = jmodel.apply({"params": jparams}, bb, pts, lbl,
                                      method=SAM2.decode)
        import jax
        jm_full = np.asarray(jax.image.resize(
            jm[0], (3, args.image_size, args.image_size), "bilinear")) > 0
        for k in range(3):
            ious.append(iou(tm[k], jm_full[k]))
    ious = np.array(ious)
    print(f"mask IoU vs torch: mean={ious.mean():.4f} min={ious.min():.4f} "
          f"(gate: ≥0.99)")
    sys.exit(0 if ious.min() >= 0.99 else 1)


if __name__ == "__main__":
    main()
