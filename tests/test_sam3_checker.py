"""SAM3 checkpoint layout checker (models/weights_sam3.check_state_dict +
the `python -m saber_tpu.models.weights_sam3 check` CLI).

The checker exists because expected_sam3_state_dict_shapes is a
reconstruction of the official layout (the reference loads it through the
external sam3 package, saber/adapters/sam3/predictor.py:98-113) — the
first real checkpoint load should be a one-minute diff, not a debugging
session (VERDICT r3 item 5). These tests exercise it on the synthetic
dict the goldens use.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from saber_tpu.models.sam3 import SAM3, get_config
from saber_tpu.models.weights_sam3 import (
    check_state_dict,
    expected_sam3_state_dict_shapes,
    format_check_report,
)


@pytest.fixture(scope="module")
def model():
    return SAM3(get_config("test"))


@pytest.fixture(scope="module")
def synth_sd(model):
    shapes = expected_sam3_state_dict_shapes(model)
    rng = np.random.default_rng(0)
    return {k: rng.standard_normal(shp).astype(np.float32)
            for k, shp in shapes.items()}


def test_exact_dict_is_clean(synth_sd, model):
    report = check_state_dict(synth_sd, model)
    assert report == {"missing": [], "unexpected": [], "shape_mismatch": []}
    assert "OK" in format_check_report(report)


def test_detects_missing_unexpected_and_mismatch(synth_sd, model):
    sd = dict(synth_sd)
    dropped = sorted(sd)[0]
    del sd[dropped]
    sd["totally.bogus.weight"] = np.zeros((3,), np.float32)
    reshaped = next(k for k in sorted(sd) if k != "totally.bogus.weight"
                    and sd[k].ndim >= 1)
    sd[reshaped] = np.zeros(sd[reshaped].shape + (2,), np.float32)

    report = check_state_dict(sd, model)
    assert dropped in report["missing"]
    assert "totally.bogus.weight" in report["unexpected"]
    assert reshaped in [k for k, _, _ in report["shape_mismatch"]]
    text = format_check_report(report)
    assert "MISMATCH" in text and dropped in text


def test_maskmem_tpos_leading_axis_tolerated(synth_sd, model):
    """The converter truncates maskmem_tpos_enc's leading axis (release
    checkpoints carry more slots than num_maskmem uses)."""
    sd = dict(synth_sd)
    k = "maskmem_tpos_enc"
    assert k in sd
    extra = np.concatenate([sd[k], sd[k][:2]], axis=0)
    sd[k] = extra
    report = check_state_dict(sd, model)
    assert report["shape_mismatch"] == []
    # a trailing-dim change is still flagged
    sd[k] = extra[..., :-1]
    assert check_state_dict(sd, model)["shape_mismatch"]


@pytest.mark.slow
def test_cli_check(synth_sd, tmp_path):
    """End-to-end CLI: exit 0 + OK on the clean dict, exit 1 on a broken
    one. Runs in a subprocess on the CPU backend."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PYTHONPATH", None)

    good = tmp_path / "good.npz"
    np.savez(good, **synth_sd)
    out = subprocess.run(
        [sys.executable, "-m", "saber_tpu.models.weights_sam3", "check",
         str(good), "--cfg", "test"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout

    bad_sd = dict(synth_sd)
    del bad_sd[sorted(bad_sd)[0]]
    bad = tmp_path / "bad.npz"
    np.savez(bad, **bad_sd)
    out = subprocess.run(
        [sys.executable, "-m", "saber_tpu.models.weights_sam3", "check",
         str(bad), "--cfg", "test"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300)
    assert out.returncode == 1, out.stdout + out.stderr
    assert "missing" in out.stdout
