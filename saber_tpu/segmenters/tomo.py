"""Tomogram segmenters (reference saber/segmenters/tomo.py).

``segment_slab``: Gaussian z-smooth (σ=5) → normalize → mean-project a
±thickness slab → 2D AMG+classifier segmentation. ``segment_vol``: slab
seg → adapter.set_volume → bidirectional propagation.
``multiDepthTomoSegmenter``: re-seed at ``num_slabs`` centers spaced
``delta_z``, merge by max, 3D connected components.
"""

from typing import Optional

import numpy as np

from saber_tpu.config import AdapterConfig, AMGConfig
from saber_tpu.ops import preprocessing as preprocess
from saber_tpu.ops.gaussian import gaussian_smoothing
from saber_tpu.segmenters import utils
from saber_tpu.segmenters.base import saber3D


class tomoSegmenter(saber3D):
    def __init__(self, deviceID: int = 0, cfg: Optional[AdapterConfig] = None,
                 amg_cfg: Optional[AMGConfig] = None, min_mask_area: int = 50):
        super().__init__(deviceID=deviceID, cfg=cfg, amg_cfg=amg_cfg,
                         min_mask_area=min_mask_area)
        self.filter_threshold = 0.5
        self.vol = None
        self.image0 = None
        self.is_tomogram_mode = False

    def segment_slab(self, vol, slab_thickness: int = 10,
                     zSlice: Optional[int] = None, display: bool = True,
                     text: Optional[str] = None,
                     target_class: Optional[int] = 1):
        """Smooth/project/segment one slab (reference tomo.py:32-61).

        The smooth → normalize → project chain stays ON DEVICE (jnp in,
        jnp out); only the projected 2D image transfers to host. Round-
        tripping the full 512-cubed volume per stage cost ~1.5 GB of
        host↔device traffic before."""
        self.vol = preprocess.normalize(
            gaussian_smoothing(preprocess.upload_volume(vol, widen=False), 5, dim=0))
        if zSlice is None:
            zSlice = int(self.vol.shape[0] // 2)
        self.image0 = np.asarray(
            preprocess.project_tomogram(self.vol, zSlice, slab_thickness))
        self.segment_image(self.image0, display=display, text_prompt=text,
                           target_class=target_class)
        return self.masks

    def segment(self, vol, thickness: int = 10, zSlice: int = None,
                text: Optional[str] = None, target_class: Optional[int] = 1,
                save_run: str = None, display: bool = False):
        return self.segment_vol(vol, thickness, zSlice, text, target_class,
                                save_run, display)

    def segment_vol(self, vol, thickness: int, zSlice: int = None,
                    text: Optional[str] = None, target_class: Optional[int] = 1,
                    save_run: str = None, display: bool = False):
        """Slab seg → volumetric propagation (reference tomo.py:81-139)."""
        self.is_tomogram_mode = True
        self.segment_slab(vol, thickness, zSlice, display=False, text=text,
                          target_class=target_class)

        if not display and save_run is not None:
            from saber_tpu.visualization import results as cryoviz
            cryoviz.save_slab_seg(save_run, self.image, self.masks)

        if len(self.masks) == 0:
            return None

        if not self._vol_loaded:
            self.video_predictor.set_volume(self.vol)
            self._vol_loaded = True

        nx = self.vol.shape[0]
        ny, nz = self.masks[0]["segmentation"].shape[:2]
        self.ann_frame_idx = zSlice if zSlice is not None else nx // 2
        vol_masks = self.propagate((nx, ny, nz))

        if display:
            from saber_tpu.visualization import results as cryoviz
            cryoviz.view_3d_seg(self.vol, vol_masks)
        return vol_masks


class multiDepthTomoSegmenter(tomoSegmenter):
    """Re-seed at several depths and merge (reference tomo.py:162-253)."""

    def __init__(self, deviceID: int = 0, cfg: Optional[AdapterConfig] = None,
                 amg_cfg: Optional[AMGConfig] = None, target_class: int = 1,
                 min_mask_area: int = 100, min_rel_box_size: float = 0.025):
        self.min_rel_box_size = min_rel_box_size
        super().__init__(deviceID=deviceID, cfg=cfg, amg_cfg=amg_cfg,
                         min_mask_area=min_mask_area)
        # AFTER super().__init__: saber2D resets target_class to None,
        # which silently broke segment() on a fresh instance
        self.target_class = target_class
        if target_class < 1:
            raise ValueError(
                "Multi-Depth Tomogram Segmenter only supports single-class "
                "segmentation currently.")
        self.show_segments = False
        self.use_batched = False   # route segment() → batched_segment

    def segment(self, vol, thickness: int, num_slabs: int = 3,
                delta_z: int = 30, save_run: str = None, display: bool = False):
        self.show_segments = display
        if self.target_class > 0 or self.classifier is None:
            if self.use_batched:
                return self.batched_segment(vol, thickness, num_slabs,
                                            delta_z)
            return self.single_segment(vol, thickness, num_slabs, delta_z)
        raise NotImplementedError("Multiclass segmentation is not implemented yet")

    @staticmethod
    def _slab_centers(depth: int, num_slabs: int, delta_z: int):
        center = depth // 2
        return [int(center + (i - num_slabs // 2) * delta_z)
                for i in range(num_slabs)
                if 0 <= center + (i - num_slabs // 2) * delta_z < depth]

    def single_segment(self, vol, thickness, num_slabs, delta_z):
        """Per-slab propagation merged by max (reference tomo.py:205-253)."""
        combined = np.zeros(vol.shape, dtype=np.uint16)
        for slab_center in self._slab_centers(vol.shape[0], num_slabs, delta_z):
            masks3d = self.segment_vol(vol, thickness, zSlice=slab_center,
                                       display=False)
            if masks3d is None:
                continue
            np.maximum(combined, (masks3d > 0).astype(np.uint16), out=combined)
        combined = utils.separate_masks(combined)
        if self.show_segments:
            from saber_tpu.visualization import results as cryoviz
            cryoviz.view_3d_seg(vol, combined)
        return combined

    def batched_segment(self, vol, thickness, num_slabs: int = 3,
                        delta_z: int = 30):
        """Single-chip multi-slab batching: every slab center's seed
        masks ride ONE bidirectional propagation scan (per-object
        cond_frame, adapters segment_volume_multi_seed) instead of
        re-encoding + re-propagating the volume per slab — the
        reference's serial loop costs num_slabs full passes
        (tomo.py:205-253). AMG still runs once per slab projection
        (those are distinct 2D problems); smoothing/normalization run
        once. Output matches ``single_segment``'s binarized max-merge.
        """
        self.is_tomogram_mode = True
        self.vol = preprocess.normalize(
            gaussian_smoothing(preprocess.upload_volume(vol, widen=False), 5, dim=0))

        seeds_by_frame = {}
        for slab_center in self._slab_centers(vol.shape[0], num_slabs, delta_z):
            self.image0 = np.asarray(preprocess.project_tomogram(
                self.vol, slab_center, thickness))
            masks = self.segment_image(self.image0, display=False,
                                       target_class=self.target_class)
            if masks:
                seeds_by_frame[slab_center] = [m["segmentation"]
                                               for m in masks]
        if not seeds_by_frame:
            return utils.separate_masks(
                np.zeros(vol.shape, dtype=np.uint16))

        if not self._vol_loaded:
            self.video_predictor.set_volume(self.vol)
            self._vol_loaded = True
        labeled = self.video_predictor.segment_volume_multi_seed(
            seeds_by_frame, vol_shape=self.vol.shape,
            min_presence_score=self.filter_threshold)
        self.video_predictor.reset_state()
        combined = utils.separate_masks((labeled > 0).astype(np.uint16))
        if self.show_segments:
            from saber_tpu.visualization import results as cryoviz
            cryoviz.view_3d_seg(vol, combined)
        return combined

    def parallel_segment(self, vol, thickness, num_slabs: int = 3,
                         delta_z: int = 30,
                         num_devices: Optional[int] = None):
        """Multi-chip single-volume segmentation: each slab center's
        seed + bidirectional propagation runs on its own chip.

        The reference loops slabs serially on one GPU (tomo.py:205-253);
        the per-slab jobs are independent, so they farm over a DevicePool
        with one segmenter replica per chip. The binarized max-merge is
        order-independent, so the result is identical to single_segment.
        """
        from saber_tpu.parallel.pool import DevicePool

        centers = self._slab_centers(vol.shape[0], num_slabs, delta_z)
        mma, cfg = self.min_mask_area, self.adapter_cfg
        pool = DevicePool(
            init_fn=lambda i: {"seg": tomoSegmenter(
                deviceID=i, cfg=cfg, min_mask_area=mma)},
            num_devices=num_devices)

        def work(slab_center, device_id, models):
            seg = models["seg"]
            seg.filter_threshold = self.filter_threshold
            seg._vol_loaded = False
            return seg.segment_vol(vol, thickness, zSlice=slab_center,
                                   display=False)

        out = pool.execute(work, centers)
        failed = [r for r in out["results"] if not r["success"]]
        if failed:
            raise RuntimeError(
                f"{len(failed)} slab jobs failed: {failed[0]['error']}")
        combined = np.zeros(vol.shape, dtype=np.uint16)
        for r in out["results"]:
            if r["result"] is not None:
                np.maximum(combined, (r["result"] > 0).astype(np.uint16),
                           out=combined)
        return utils.separate_masks(combined)
