"""Smoke test for tools/parity_vs_torch.py (VERDICT r3 item 8).

The real parity run needs the torch ``sam2`` package + official
checkpoints (environment-blocked here, BASELINE.md gate). This test keeps
the harness from rotting against our own API: it injects a fake ``sam2``
package that delegates to the saber_tpu JAX stack, so the harness runs
end to end — checkpoint load through build_sam2, SAM2.encode_image, the
``vision_features`` key, SAM2.decode — and, because both sides then run
identical computations on identical inputs, must report IoU 1.0/exit 0.
Any API drift in those surfaces breaks this test instead of the first
real-weights run.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

FAKE_BUILD = textwrap.dedent("""
    # fake sam2.build_sam: records (cfg name, checkpoint path) for the
    # predictor; the real package builds a torch model here.
    def build_sam2(cfg_yaml, checkpoint, device="cpu"):
        stem = cfg_yaml.rsplit("_", 1)[1].split(".")[0]   # t / s / b+ / l
        cfg = {"t": "tiny", "s": "small", "b+": "base", "l": "large"}[stem]
        return (cfg, checkpoint)
""")

FAKE_PREDICTOR = textwrap.dedent("""
    # fake sam2.sam2_image_predictor: delegates to the saber_tpu JAX
    # stack, mirroring tools/parity_vs_torch.py's own JAX path exactly —
    # same checkpoint, same normalization, same decode — so the harness's
    # comparison is stack-vs-itself and must be exact.
    import numpy as np
    import torch


    class SAM2ImagePredictor:
        def __init__(self, model):
            self.cfg, self.ckpt = model
            self._features = {}

        def set_image(self, img_uint8):
            import jax.numpy as jnp
            from saber_tpu.models.sam2 import SAM2, build_sam2
            self.size = img_uint8.shape[0]
            self.jmodel, self.jparams = build_sam2(
                self.cfg, image_size=self.size, checkpoint=self.ckpt)
            mean = np.array([0.485, 0.456, 0.406], np.float32)
            std = np.array([0.229, 0.224, 0.225], np.float32)
            jimg = (img_uint8.astype(np.float32) / 255.0 - mean) / std
            self.bb = self.jmodel.apply(
                {"params": self.jparams}, jnp.asarray(jimg[None]),
                method=SAM2.encode_image)
            embed = np.asarray(self.bb["vision_features"][0]).transpose(2, 0, 1)
            self._features = {"image_embed": torch.from_numpy(embed.copy())[None]}

        def predict(self, point_coords, point_labels, multimask_output=True):
            import jax
            import jax.numpy as jnp
            from saber_tpu.models.sam2 import SAM2
            pt = np.asarray(point_coords, np.float32)[0]
            pts = jnp.asarray([[pt.tolist(), [0.0, 0.0]]], jnp.float32)
            lbl = jnp.asarray([[1, -1]], jnp.int32)
            jm, jiou, _, _ = self.jmodel.apply(
                {"params": self.jparams}, self.bb, pts, lbl,
                method=SAM2.decode)
            masks = np.asarray(jax.image.resize(
                jm[0], (3, self.size, self.size), "bilinear")) > 0
            return masks, np.asarray(jiou[0]), None
""")

WRAPPER = textwrap.dedent("""
    import os, runpy, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    fake_dir, repo, ckpt = sys.argv[1:4]
    sys.path.insert(0, fake_dir)
    sys.path.insert(0, repo)
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.argv = ["parity_vs_torch.py", "--checkpoint", ckpt,
                "--cfg", "tiny", "--image-size", "128"]
    runpy.run_path(os.path.join(repo, "tools", "parity_vs_torch.py"),
                   run_name="__main__")
""")


@pytest.mark.slow
def test_parity_harness_runs_with_mocked_sam2(tmp_path):
    import torch

    from saber_tpu.models.sam2 import SAM2, get_config
    from saber_tpu.models.weights import expected_state_dict_shapes

    # synthetic official-layout checkpoint (torch pickle, like the release)
    model = SAM2(get_config("tiny", image_size=128))
    rng = np.random.default_rng(11)
    sd = {k: torch.from_numpy(
            (0.02 * rng.standard_normal(v)).astype(np.float32))
          for k, v in expected_state_dict_shapes(model).items()}
    ckpt = tmp_path / "sam2_tiny_synth.pt"
    torch.save({"model": sd}, ckpt)

    fake = tmp_path / "fake_pkgs" / "sam2"
    fake.mkdir(parents=True)
    (fake / "__init__.py").write_text("")
    (fake / "build_sam.py").write_text(FAKE_BUILD)
    (fake / "sam2_image_predictor.py").write_text(FAKE_PREDICTOR)
    wrapper = tmp_path / "run_harness.py"
    wrapper.write_text(WRAPPER)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, str(wrapper), str(fake.parent), repo, str(ckpt)],
        capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "encoder max rel delta" in out.stdout
    assert "min=1.0000" in out.stdout, out.stdout
