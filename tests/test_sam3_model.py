"""SAM3 model tests: VL backbone contract, text encoder, detector heads,
processor semantics, classifier variant, and the text-prompted workflow
(reference surfaces: adapters/sam3/predictor.py, classifier/models/SAM3.py,
run_fib_segment.py:78-79)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saber_tpu.models.sam3 import (SAM3, SAM3Processor, build_sam3,
                                   get_config)


@pytest.fixture(scope="module")
def sam3():
    return build_sam3("test", image_size=64)


def test_backbone_sam2_compat(sam3):
    """The VL backbone emits the SAM2-compatible dict — the reference's
    sam2_backbone_out layer (classifier/models/SAM3.py:139-151)."""
    model, params = sam3
    img = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = model.apply({"params": params}, img, method=SAM3.encode_image)
    fs = model.config.feat_size
    assert out["vision_features"].shape == (2, fs, fs, 256)
    assert [f.shape[1] for f in out["backbone_fpn"]] == [4 * fs, 2 * fs, fs]
    assert len(out["vision_pos_enc"]) == 3


def test_feat_size_1008_would_be_63():
    """63×63 embedding at 1008 px (reference SAM3.py:23-26)."""
    cfg = get_config("large")
    assert cfg.image_size == 1008
    assert cfg.feat_size == 63


def test_text_encoder_shapes(sam3):
    model, params = sam3
    toks = jnp.zeros((2, 77), jnp.int32).at[:, 0].set(1).at[0, 3].set(999)
    out = model.apply({"params": params}, toks, method=SAM3.encode_text)
    assert out["seq"].shape == (2, 77, 256)
    assert out["pooled"].shape == (2, 256)
    # EOT pooling follows the argmax token position
    assert bool(out["valid"][0, 3]) and not bool(out["valid"][0, 4])


def test_detector_output_shapes(sam3):
    model, params = sam3
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    toks = jnp.zeros((1, 77), jnp.int32).at[0, 0].set(1)
    bb = model.apply({"params": params}, img, method=SAM3.encode_image)
    text = model.apply({"params": params}, toks, method=SAM3.encode_text)
    det = model.apply({"params": params}, bb, text, method=SAM3.detect)
    q = model.config.num_queries
    fs = model.config.feat_size
    assert det["mask_logits"].shape == (1, q, 4 * fs, 4 * fs)
    assert det["score_logits"].shape == (1, q)
    assert det["presence_logit"].shape == (1, 1)
    assert det["boxes"].shape == (1, q, 4)
    assert np.all(np.asarray(det["boxes"]) >= 0)
    assert np.all(np.asarray(det["boxes"]) <= 1)


def test_detection_depends_on_prompt(sam3):
    """Different text prompts must produce different detections (the text
    actually conditions the detector, not just the API)."""
    model, params = sam3
    proc = SAM3Processor(model, params)
    img = np.random.default_rng(0).random((40, 40)).astype(np.float32)
    state = proc.set_image(img)
    out_a = proc.set_text_prompt(state, "mitochondria")
    out_b = proc.set_text_prompt(state, "ribosome on a membrane")
    assert not np.allclose(out_a["masks_logits"], out_b["masks_logits"])


def test_processor_scores_sorted_and_bounded(sam3):
    model, params = sam3
    proc = SAM3Processor(model, params)
    img = np.random.default_rng(1).random((32, 48)).astype(np.float32)
    out = proc.set_text_prompt(proc.set_image(img), "vesicle")
    s = out["scores"]
    assert np.all((s >= 0) & (s <= 1))
    assert np.all(np.diff(s) <= 1e-6)          # sorted desc
    assert out["masks"].shape == (8, 1, 32, 48)
    assert out["masks_logits"].dtype == np.float32


def test_tracker_surface_shared_with_sam2(sam3):
    """SAM3 exposes the full SAM2 tracker surface (decode/memory) so
    VideoCore drives it — the grafted-tracker design
    (reference adapters/sam3/predictor.py:162-164)."""
    model, params = sam3
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    bb = model.apply({"params": params}, img, method=SAM3.encode_image)
    pts = jnp.asarray([[[32.0, 32.0], [0.0, 0.0]]], jnp.float32)
    lbl = jnp.asarray([[1, -1]], jnp.int32)
    masks, iou, sam_tokens, obj = model.apply(
        {"params": params}, bb, pts, lbl, method=SAM3.decode)
    fs = model.config.feat_size
    assert masks.shape[-1] == 4 * fs
    assert obj.shape == (1, 1)


def test_sam3_classifier_forward():
    from saber_tpu.classifier.models import get_classifier_model
    model = get_classifier_model("SAM3", num_classes=3)
    rng = jax.random.PRNGKey(0)
    embed = jnp.zeros((2, 4, 4, 256))
    mask = jnp.zeros((2, 4, 4))
    params = model.init(rng, embed, mask)["params"]
    logits = model.apply({"params": params}, embed, mask)
    assert logits.shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_sam3_classifier_trainer_step(tmp_path):
    """One training step with the frozen SAM3 backbone (reference
    classifier/models/SAM3.py:47-66 builds + freezes the same way)."""
    from saber_tpu.classifier.trainer import ClassifierTrainer
    trainer = ClassifierTrainer(
        "SAM3", num_classes=2, sam3_cfg="test", num_epochs=1,
        backbone_image_size=64, use_ema=False,
        results_dir=str(tmp_path))
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal((4, 64, 64)).astype(np.float32),
        "mask": (rng.random((4, 64, 64)) > 0.5).astype(np.float32),
        "label": rng.integers(0, 2, 4).astype(np.int32),
    }
    dev_batch = trainer._prepare_batch(batch)
    assert "embed" in dev_batch        # frozen backbone features, on device
    key = jax.random.PRNGKey(0)
    params, opt_state, ema, loss, preds = trainer._train_step(
        trainer.params, trainer.opt_state, trainer.ema_params, dev_batch, key)
    assert np.isfinite(float(loss))


def test_text_prompt_workflow_e2e(tmp_path, monkeypatch):
    """`saber segment fib --text-prompt` end-to-end on a synthetic stack —
    the reference's SAM3 route (run_fib_segment.py:78-79)."""
    import imageio.v2 as imageio
    from saber_tpu.entry_points.run_fib_segment import run_fib_segment

    monkeypatch.setenv("SABER_SAM3_PRESET", "test")
    monkeypatch.setenv("SABER_SAM3_IMAGE_SIZE", "64")
    rng = np.random.default_rng(0)
    for i in range(5):
        frame = rng.standard_normal((48, 48)).astype(np.float32)
        frame[16:32, 16:32] += 3.0
        imageio.imwrite(str(tmp_path / f"f{i:02d}.tif"), frame)

    out = str(tmp_path / "masks.npy")
    masks = run_fib_segment(str(tmp_path / "f*.tif"), output=out,
                            ini_depth=2, min_mask_area=1, save_movie=False,
                            text_prompt="organelle")
    assert masks.shape == (5, 48, 48)
    assert masks.dtype == np.uint32
    import os
    assert os.path.exists(out)
