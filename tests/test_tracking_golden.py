"""Full tracking-step torch golden (VERDICT r2 next-round #4b).

Composes the independently implemented torch modules from
tests/test_torch_golden.py (mask decoder, prompt encoder, memory encoder,
memory-attention layers) into ONE complete video tracking step with the
official SAM2 video-predictor semantics (the torch package the reference
drives at saber/adapters/sam2/predictor.py:182-348): seed a mask →
assemble the memory bank (conditioning frame + recency ring + object
pointers with temporal encodings) → memory-attention conditioning →
empty-prompt decode → object pointer projection → memory encoding → ring
update. Two consecutive steps are compared against VideoCore.seed/step so
the *composition* (and the fixed-capacity PropagationState bookkeeping)
is verified end to end, not just each module.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from test_torch_golden import (
    TorchMaskDecoder,
    TorchMemoryAttentionLayer,
    TorchMemoryEncoder,
    TorchPromptEncoder,
    _sub_sd,
)

from saber_tpu.models.position_encoding import position_embedding_sine
from saber_tpu.models.sam2 import SAM2, get_config
from saber_tpu.models.video import VideoCore, init_state
from saber_tpu.models.weights import (convert_torch_state_dict,
                                      expected_state_dict_shapes)

CFG = get_config("tiny", image_size=64, fused_encoder=False)


@pytest.fixture(scope="module")
def synth():
    model = SAM2(CFG)
    shapes = expected_state_dict_shapes(model)
    rng = np.random.default_rng(11)
    sd = {}
    for k, shp in shapes.items():
        if k.endswith(".weight") and len(shp) == 1:
            sd[k] = (1.0 + 0.1 * rng.standard_normal(shp)).astype(np.float32)
        else:
            sd[k] = (0.08 * rng.standard_normal(shp)).astype(np.float32)
    params = convert_torch_state_dict(sd, model)
    tsd = {k: torch.from_numpy(v) for k, v in sd.items()}
    return sd, tsd, params


def _mlp3_t(tsd, prefix, x, relu_last=False):
    for i in range(3):
        w = tsd[f"{prefix}.layers.{i}.weight"]
        b = tsd[f"{prefix}.layers.{i}.bias"]
        x = F.linear(x, w, b)
        if i < 2:
            x = F.relu(x)
    return x


class TorchVideoStep:
    """Official video-predictor single-step semantics in torch."""

    def __init__(self, tsd, cfg):
        self.cfg = cfg
        self.tsd = tsd
        self.dec = TorchMaskDecoder(256)
        self.dec.load_state_dict(_sub_sd(tsd, "sam_mask_decoder."))
        self.pe = TorchPromptEncoder(256, cfg.image_size, cfg.feat_size)
        self.pe.load_from(tsd)
        self.me = TorchMemoryEncoder()
        self.me.load_from(tsd)
        self.mem_layers = []
        for i in range(4):
            layer = TorchMemoryAttentionLayer(256, cfg.mem_dim)
            layer.load_state_dict(_sub_sd(tsd, f"memory_attention.layers.{i}."))
            self.mem_layers.append(layer)
        self.final_norm_w = tsd["memory_attention.norm.weight"]
        self.final_norm_b = tsd["memory_attention.norm.bias"]
        # checkpoints carry 7 tpos rows; truncate to the config's window —
        # the same semantics as the JAX converter (weights.py:175)
        self.maskmem_tpos = tsd["maskmem_tpos_enc"][:cfg.num_maskmem]
        self.no_obj_spatial = tsd["no_obj_embed_spatial"]    # (1, md)
        self.no_mem_embed = tsd["no_mem_embed"]              # (1, 1, d)
        fs = cfg.feat_size
        self.spatial_pos = torch.from_numpy(np.asarray(
            position_embedding_sine(fs, fs, cfg.mem_dim))).reshape(-1, cfg.mem_dim)
        self.curr_pos = torch.from_numpy(np.asarray(
            position_embedding_sine(fs, fs, cfg.d_model))).reshape(-1, cfg.d_model)

    # -- heads ------------------------------------------------------------

    def obj_ptr_tpos(self, tdiff):
        cfg = self.cfg
        t = tdiff / float(cfg.max_obj_ptrs_in_encoder - 1)
        half = cfg.d_model // 2
        idx = torch.arange(half, dtype=torch.float32)
        dim_t = 10000.0 ** (2.0 * torch.floor(idx / 2.0) / half)
        ang = t[..., None] / dim_t
        enc = torch.cat([torch.sin(ang), torch.cos(ang)], -1)
        return F.linear(enc, self.tsd["obj_ptr_tpos_proj.weight"],
                        self.tsd["obj_ptr_tpos_proj.bias"])

    def decode(self, conditioned, fpn0, fpn1, mask_inputs=None,
               dynamic=True):
        """Empty-prompt (or mask-prompted) decode. NHWC inputs."""
        b = conditioned.shape[0]
        pts = torch.zeros((b, 1, 2))
        lbl = -torch.ones((b, 1), dtype=torch.int32)
        sparse = self.pe.embed_points(pts, lbl)
        if mask_inputs is not None:
            dense = self.pe.embed_mask(mask_inputs.permute(0, 3, 1, 2))
        else:
            dense = self.pe.no_mask_embed.weight[0].reshape(
                1, -1, 1, 1).expand(b, 256, self.cfg.feat_size,
                                    self.cfg.feat_size)
        image_pe = self.pe.dense_pe().permute(2, 0, 1)[None]
        nchw = lambda t: t.permute(0, 3, 1, 2).contiguous()
        masks, iou, obj = self.dec(
            nchw(conditioned), image_pe, sparse, dense if dense.ndim == 4
            and dense.shape[1] == 256 else nchw(dense),
            (nchw(fpn0), nchw(fpn1)),
            multimask_output=False, dynamic=dynamic)
        tokens = self.dec.last_tokens[:, 0]
        obj_ptr = _mlp3_t(self.tsd, "obj_ptr_proj", tokens)
        return masks[:, 0], obj, obj_ptr

    def encode_memory(self, vision, mask_logits, obj_logits):
        """vision (B,fs,fs,256), mask_logits (B,S,S,1) NHWC."""
        cfg = self.cfg
        m = torch.sigmoid(mask_logits) * cfg.sigmoid_scale_for_mem_enc \
            + cfg.sigmoid_bias_for_mem_enc
        feats = self.me(vision.permute(0, 3, 1, 2),
                        m.permute(0, 3, 1, 2))               # (B, md, fs, fs)
        b, md = feats.shape[:2]
        feats = feats.flatten(2).permute(0, 2, 1)            # (B, T, md)
        is_obj = torch.sigmoid(obj_logits)                   # (B, 1)
        return feats + (1.0 - is_obj[..., None]) * self.no_obj_spatial[None]

    # -- the step ---------------------------------------------------------

    def assemble(self, st, frame_idx, tpos_sign):
        cfg = self.cfg
        n = cfg.num_maskmem
        r = st["mem_feats"].shape[0]
        b, t, md = st["cond_feats"].shape
        tpos = self.maskmem_tpos.reshape(n, 1, 1, md)
        feats = [st["cond_feats"]]
        pos = [(self.spatial_pos + tpos[n - 1, 0]).expand(b, t, md)]
        bias = [torch.zeros(b, t)]
        for j in range(r):
            feats.append(st["mem_feats"][j])
            pos.append((self.spatial_pos + tpos[j, 0]).expand(b, t, md))
            bias.append(torch.where(st["mem_frames"][j] < 0, -1e9, 0.0
                                    )[:, None].expand(b, t))
        split = cfg.d_model // md
        ptr_all = torch.cat([st["cond_ptr"][None], st["ptr"]], 0)   # (P1,B,256)
        ptr_frames = torch.cat([st["cond_frame"][None], st["ptr_frames"]], 0)
        p1 = ptr_all.shape[0]
        tdiff = (frame_idx - ptr_frames).float() * tpos_sign
        ptr_pos = self.obj_ptr_tpos(tdiff)                          # (P1,B,md)
        ptr_tokens = ptr_all.permute(1, 0, 2).reshape(b, p1 * split, md)
        ptr_pos_tokens = torch.repeat_interleave(
            ptr_pos.permute(1, 0, 2), split, dim=1)
        ptr_bias = torch.where(
            torch.repeat_interleave(ptr_frames.T < 0, split, dim=1),
            -1e9, 0.0)
        memory = torch.cat(feats + [ptr_tokens], 1)
        memory_pos = torch.cat(pos + [ptr_pos_tokens], 1)
        key_bias = torch.cat(bias + [ptr_bias], 1)
        return memory, memory_pos, key_bias, p1 * split

    def condition(self, vis_tokens, memory, memory_pos, key_bias, n_ptr):
        x = vis_tokens + 0.1 * self.curr_pos[None]
        for layer in self.mem_layers:
            x = layer(x, memory, memory_pos,
                      num_k_exclude_rope=n_ptr, key_bias=key_bias)
        return F.layer_norm(x, x.shape[-1:], self.final_norm_w,
                            self.final_norm_b, eps=1e-5)

    def seed(self, st, vision, fpn0, fpn1, masks, frame_idx):
        cfg = self.cfg
        b = masks.shape[0]
        size = cfg.image_size
        m = (masks > 0.5).float()
        high = m[..., None] * 20.0 - 10.0
        low = F.interpolate(high.permute(0, 3, 1, 2), size // 4,
                            mode="bilinear", antialias=True
                            ).permute(0, 2, 3, 1)[..., 0]
        # seeding runs the SAM heads WITHOUT memory: official semantics add
        # the learned no_mem_embed to the /16 features in that case
        embed = vision + self.no_mem_embed[0].reshape(1, 1, 1, -1)
        _, _, obj_ptr = self.decode(
            embed, fpn0, fpn1, mask_inputs=low[..., None], dynamic=False)
        mem = self.encode_memory(vision, high, torch.full((b, 1), 10.0))
        st["cond_feats"] = mem
        st["cond_frame"] = torch.full((b,), frame_idx, dtype=torch.int64)
        st["cond_ptr"] = obj_ptr
        return st, low

    def step(self, st, vision, fpn0, fpn1, frame_idx, tpos_sign):
        cfg = self.cfg
        b = st["cond_feats"].shape[0]
        fs = cfg.feat_size
        memory, memory_pos, key_bias, n_ptr = self.assemble(
            st, frame_idx, tpos_sign)
        vis_tokens = vision.reshape(b, fs * fs, cfg.d_model)
        with torch.no_grad():
            cond = self.condition(vis_tokens, memory, memory_pos,
                                  key_bias, n_ptr)
            cond = cond.reshape(b, fs, fs, cfg.d_model)
            low, obj_logits, obj_ptr = self.decode(cond, fpn0, fpn1)
            high = F.interpolate(low[:, None], cfg.image_size,
                                 mode="bilinear").permute(0, 2, 3, 1)
            mem = self.encode_memory(vision, high, obj_logits)
        # ring update (all objects active in this test: rel >= 1)
        st["mem_feats"] = torch.cat([mem[None], st["mem_feats"][:-1]], 0)
        st["mem_frames"] = torch.cat(
            [torch.full((1, b), frame_idx, dtype=torch.int64),
             st["mem_frames"][:-1]], 0)
        st["ptr"] = torch.cat([obj_ptr[None], st["ptr"][:-1]], 0)
        st["ptr_frames"] = torch.cat(
            [torch.full((1, b), frame_idx, dtype=torch.int64),
             st["ptr_frames"][:-1]], 0)
        return st, low, obj_logits


def _delta(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def test_full_tracking_step_golden(synth):
    sd, tsd, params = synth
    cfg = CFG
    b, fs = 2, cfg.feat_size
    rng = np.random.default_rng(12)
    # three frames of synthetic backbone features (encoder already golden
    # via test_torch_golden.test_full_image_pipeline_golden)
    vision = rng.standard_normal((3, b, fs, fs, 256)).astype(np.float32) * 0.5
    fpn0 = rng.standard_normal((3, b, 4 * fs, 4 * fs, 256)).astype(np.float32) * 0.5
    fpn1 = rng.standard_normal((3, b, 2 * fs, 2 * fs, 256)).astype(np.float32) * 0.5
    seed_masks = np.zeros((b, 64, 64), np.float32)
    seed_masks[0, 8:40, 8:40] = 1.0
    seed_masks[1, 32:60, 20:52] = 1.0

    # ---- torch side
    n = cfg.num_maskmem
    p = cfg.max_obj_ptrs_in_encoder - 1
    t = fs * fs
    tst = {
        "mem_feats": torch.zeros(n - 1, b, t, cfg.mem_dim),
        "mem_frames": -torch.ones(n - 1, b, dtype=torch.int64),
        "cond_feats": torch.zeros(b, t, cfg.mem_dim),
        "cond_frame": -torch.ones(b, dtype=torch.int64),
        "cond_ptr": torch.zeros(b, cfg.d_model),
        "ptr": torch.zeros(p, b, cfg.d_model),
        "ptr_frames": -torch.ones(p, b, dtype=torch.int64),
    }
    tracker = TorchVideoStep(tsd, cfg)
    with torch.no_grad():
        tst, t_low_seed = tracker.seed(
            tst, torch.from_numpy(vision[0]), torch.from_numpy(fpn0[0]),
            torch.from_numpy(fpn1[0]), torch.from_numpy(seed_masks), 0)
        t_lows, t_objs = [], []

        def shared(a):  # one frame's features broadcast over objects
            return torch.from_numpy(
                np.broadcast_to(a[0], a.shape).copy())

        for f in (1, 2):
            tst, low, obj = tracker.step(
                tst, shared(vision[f]), shared(fpn0[f]),
                shared(fpn1[f]), f, 1.0)
            t_lows.append(low.numpy())
            t_objs.append(obj.numpy())

    # ---- JAX side
    model = SAM2(cfg)
    core = VideoCore(model)
    state = init_state(b, cfg)

    def bb(f):
        return {"vision_features": jnp.asarray(vision[f]),
                "backbone_fpn": [jnp.asarray(fpn0[f]), jnp.asarray(fpn1[f])]}

    state, f_low_seed = core.seed(params, bb(0), jnp.asarray(seed_masks),
                                  jnp.asarray(0), state)
    f_lows, f_objs = [], []
    for f in (1, 2):
        # step takes ONE frame's features (no batch axis); all objects
        # share them, so the torch side must see the same broadcast
        frame = {"vision": jnp.asarray(vision[f][0]),
                 "fpn0": jnp.asarray(fpn0[f][0]),
                 "fpn1": jnp.asarray(fpn1[f][0])}
        state, (low, obj) = core.step(params, state, frame,
                                      jnp.asarray(f), jnp.asarray(1.0))
        f_lows.append(np.asarray(low))
        f_objs.append(np.asarray(obj))

    # seed masks agree (antialiased bilinear downsample tolerance)
    assert _delta(t_low_seed, f_low_seed) < 2e-2

    for i in (0, 1):
        scale = float(np.abs(t_lows[i]).max()) + 1.0
        assert _delta(t_lows[i], f_lows[i]) / scale < 2e-3, (i, _delta(
            t_lows[i], f_lows[i]) / scale)
        assert _delta(t_objs[i], f_objs[i]) < 5e-3, (i, _delta(
            t_objs[i], f_objs[i]))
        # the gate: binarized masks identical
        tm = t_lows[i] > 0
        fm = f_lows[i] > 0
        union = (tm | fm).sum()
        assert union == 0 or (tm & fm).sum() / union >= 0.99

    # memory state agrees after two steps (ring + pointers)
    assert _delta(tst["mem_feats"].numpy(), state.mem_feats) < 5e-3
    assert _delta(tst["ptr"].numpy(), state.ptr) < 5e-3
    assert np.array_equal(tst["mem_frames"].numpy(),
                          np.asarray(state.mem_frames))
