"""Zarr-backed persistence for text annotations
(reference saber/gui/text/data_manager.py:14-500).

Pure-Python: reads run images/masks from a candidate zarr, keeps per-run
global text + per-segmentation descriptions in memory, and persists to
``<save_path>`` as JSON (the reference writes an annotations zarr + JSON
sidecar; the JSON schema here matches the web GUI's
``*_text_annotations.json``, gui/web/server.py annotate_text).
"""

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from saber_tpu.gui.text.hashtag_manager import HashtagManager
from saber_tpu.utils import zarrlite


def circle_mask(shape: Tuple[int, int], cy: float, cx: float,
                radius: float) -> np.ndarray:
    """Filled-circle boolean mask (the text GUI's draw tool — reference
    segmentation_viewer.py _circle_drag_finish builds the same mask from
    the drag's center + radius)."""
    h, w = shape
    yy, xx = np.ogrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2) <= radius ** 2


def _normalize_text_payload(payload: Dict[str, Any],
                            key_offset=lambda run: 1) -> Dict[str, Any]:
    """Accept either on-disk text-annotation schema and return the
    in-memory form ``{run: {global_text, segmentations:{seg_id: text}}}``.

    The shared sidecar (``*_text_annotations.json``) is written in the
    WEB schema — ``{run: {"<key>": {text, hashtags}, "global": {...}}}``
    — by the web GUI (/api/annotate_text), the simple TextAnnotator, and
    this manager, so all three frontends interoperate. For 2D candidate
    stacks the web keys are 0-based stack indices while the manager's
    seg ids are 1-based (``key_offset`` = +1); for 3D label volumes the
    web keys BY LABEL VALUE (server _mask_entries by_value), which is
    already the seg-id space (``key_offset`` = 0 — supplied per run by
    the manager). Legacy manager-schema files
    ({"global_text", "segmentations"}) still load.
    """
    out: Dict[str, Any] = {}
    for run, d in payload.items():
        if not isinstance(d, dict):
            continue
        if "global_text" in d or "segmentations" in d:
            out[run] = {
                "global_text": d.get("global_text", ""),
                "segmentations": {str(k): v for k, v in
                                  d.get("segmentations", {}).items()}}
            continue
        gt, segs = "", {}
        off = key_offset(run)
        for k, v in d.items():
            text = v.get("text", "") if isinstance(v, dict) else str(v)
            if k == "global":
                gt = text
            elif k.lstrip("-").isdigit():
                segs[str(int(k) + off)] = text
        out[run] = {"global_text": gt, "segmentations": segs}
    return out


def mask_bbox(mask: np.ndarray) -> List[int]:
    """[y0, x0, y1, x1] inclusive bounds of the mask's support, or
    [0, 0, 0, 0] for an empty mask (reference data_manager._get_mask_bbox
    — stored with each saved segmentation)."""
    ys, xs = np.nonzero(np.asarray(mask) > 0)
    if ys.size == 0:
        return [0, 0, 0, 0]
    return [int(ys.min()), int(xs.min()), int(ys.max()), int(xs.max())]


class TextAnnotationDataManager:
    def __init__(self, zarr_path: str, save_path: Optional[str] = None):
        self.zarr_path = zarr_path
        self.save_path = save_path or (
            os.path.splitext(zarr_path)[0] + "_text_annotations.json")
        self.root = zarrlite.Group(zarr_path)
        self.run_ids: List[str] = list(self.root.keys())
        # {run: {"global_text": str, "segmentations": {seg_id: text}}}
        self.text_data: Dict[str, Dict[str, Any]] = {}
        # user-drawn masks per run, session-stashed so switching runs does
        # not lose unsaved drawings (reference stash_session_state /
        # read_with_session_fallback)
        self.user_masks: Dict[str, List[np.ndarray]] = {}
        self.masks_path = os.path.splitext(self.save_path)[0] + "_masks.zarr"
        # runs whose text actually changed this session: only these are
        # re-serialized on save, so entries written by the other
        # frontends (manual hashtags included) survive untouched
        self._dirty: set = set()
        if os.path.exists(self.save_path):
            with open(self.save_path) as f:
                payload = json.load(f)
            payload.pop("_hashtags", None)
            self.text_data = _normalize_text_payload(payload,
                                                     self._key_offset)

    def _key_offset(self, run_id: str) -> int:
        """Sidecar-key ↔ seg-id offset for a run: +1 for 2D candidate
        stacks (web keys are 0-based stack indices), 0 for 3D label
        volumes (web keys are label values — already seg ids)."""
        return 0 if self.is_volume_run(run_id) else 1

    def is_volume_run(self, run_id: str) -> bool:
        """True when the run's labels are a z-aligned label VOLUME (same
        shape as a 3D image) rather than a per-candidate stack — decided
        from zarr metadata only."""
        if run_id not in self.root:
            return False
        grp = self.root[run_id]
        if "0" not in grp or "labels" not in grp or "0" not in grp["labels"]:
            return False
        ishape = tuple(grp["0"].shape)
        return len(ishape) == 3 and tuple(
            grp["labels"]["0"].shape) == ishape

    # -- zarr reads ---------------------------------------------------------

    def read_data(self, run_id: str) -> Tuple[np.ndarray, np.ndarray]:
        """(image, masks) for one run; masks (N, H, W) or (Z, H, W)."""
        grp = self.root[run_id]
        image = np.asarray(grp["0"])
        if "labels" in grp and "0" in grp["labels"]:
            masks = np.asarray(grp["labels"]["0"])
        else:
            masks = np.zeros((0, *image.shape[-2:]), np.uint8)
        return image, masks

    def read_with_session_fallback(self, run_id: str
                                   ) -> Tuple[np.ndarray, np.ndarray]:
        """(image, masks) with session-drawn + previously saved user masks
        appended after the zarr candidates (reference
        read_with_session_fallback + _load_saved_masks)."""
        image, masks = self.read_data(run_id)
        extra = list(self._load_saved_masks(run_id))
        extra += self.user_masks.get(run_id, [])
        if extra:
            base = masks if masks.ndim == 3 else masks[None]
            hw = base.shape[-2:] if base.size else extra[0].shape
            extra_arr = np.stack([m.astype(base.dtype if base.size else
                                           np.uint8) for m in extra])
            base = base if base.size else np.zeros((0, *hw), extra_arr.dtype)
            masks = np.concatenate([base, extra_arr], axis=0)
        return image, masks

    # -- user-drawn masks (draw tool) ----------------------------------------

    def add_user_mask(self, run_id: str, mask: np.ndarray) -> int:
        """Stash a drawn mask for the run; returns its 1-based seg id in
        the combined stack (zarr candidates + saved + session masks)."""
        if self.is_volume_run(run_id):
            # a 2D drawn mask has no z-location in a label volume, and
            # appending it would corrupt the (Z,H,W) stack shape
            raise ValueError(
                f"run '{run_id}' holds a 3D label volume; the 2D circle "
                "draw tool is unavailable for volume runs")
        lst = self.user_masks.setdefault(run_id, [])
        lst.append(np.asarray(mask) > 0)
        _, masks = self.read_with_session_fallback(run_id)
        return masks.shape[0]

    def clear_session_state(self, run_id: str) -> None:
        self.user_masks.pop(run_id, None)

    def _load_saved_masks(self, run_id: str) -> List[np.ndarray]:
        if not os.path.exists(os.path.join(self.masks_path, ".zgroup")):
            return []
        root = zarrlite.Group(self.masks_path)
        if run_id not in root or "masks" not in root[run_id]:
            # acceptance-only saves create the run group with attrs but
            # no masks dataset — that is a valid state
            return []
        arr = np.asarray(root[run_id]["masks"])
        return [arr[i] for i in range(arr.shape[0])]

    def _n_candidates(self, run_id: str) -> int:
        """Candidate count from zarr metadata only (no chunk reads)."""
        grp = self.root[run_id]
        if "labels" in grp and "0" in grp["labels"]:
            shape = grp["labels"]["0"].shape
            return shape[0] if len(shape) == 3 else int(np.prod(shape) > 0)
        return 0

    def save_masks(self, run_id: str,
                   accepted: Optional[List[int]] = None) -> Optional[str]:
        """Persist the run's user-drawn masks into the sidecar masks zarr
        (reference save_masks_to_zarr); merges with masks saved earlier.
        Alongside the stack, each saved mask's metadata (description,
        hashtags, bbox, area, combined seg id) goes into the run group's
        attrs, and the run's accepted seg ids — candidates included — are
        recorded (reference writes accepted/rejected groups with
        description/hashtags/bbox/area attrs per segmentation).
        Returns the zarr path, or None if there is nothing to save."""
        session = self.user_masks.get(run_id, [])
        if not session and accepted is None and run_id not in self._dirty:
            # nothing new, no acceptance change, no text edits that could
            # stale the metadata — skip the stack load entirely (this
            # path fires on every run navigation)
            return None
        existing = self._load_saved_masks(run_id)
        if not session and accepted is None and not existing:
            return None                  # nothing saved, nothing to save
        all_saved = existing + [np.asarray(m) for m in session]
        root = zarrlite.Group.create(self.masks_path)
        grp = root.require_group(run_id)
        if session:
            stack = np.stack([m.astype(np.uint8) for m in all_saved])
            grp.create_dataset("masks", data=stack, overwrite=True)
        # combined-stack seg ids are 1-based after the zarr candidates.
        # Meta is recomputed on EVERY save (descriptions typed after a
        # mask was first saved must refresh the export metadata), but
        # only written when it differs — view-only saves stay no-ops.
        n_base = self._n_candidates(run_id)
        meta = []
        for i, m in enumerate(all_saved):
            seg_id = n_base + i + 1
            text = self.get_segmentation_text(run_id, seg_id)
            meta.append({
                "segmentation_id": seg_id,
                "description": text,
                "hashtags": sorted(HashtagManager.extract_hashtags(text)),
                "bbox": mask_bbox(m),
                "area": int(np.sum(np.asarray(m) > 0)),
            })
        if meta != grp.attrs.get("segmentations"):
            grp.attrs["segmentations"] = meta
        if accepted is not None:
            acc = sorted(int(i) for i in accepted)
            if acc != list(grp.attrs.get("accepted_ids", [])):
                grp.attrs["accepted_ids"] = acc
        self.user_masks[run_id] = []     # now part of the saved set
        return self.masks_path

    def load_masks_with_descriptions(self, run_id: str) -> Dict[str, Any]:
        """{'segmentation_<id>': {mask, description, hashtags, bbox, area,
        segmentation_id}} for every saved user mask (reference
        load_masks_with_descriptions — the training-data export surface)."""
        saved = self._load_saved_masks(run_id)
        if not saved:
            return {}
        grp = zarrlite.Group(self.masks_path)[run_id]
        meta = grp.attrs.get("segmentations", [])
        n_base = self._n_candidates(run_id)
        out: Dict[str, Any] = {}
        for i, m in enumerate(saved):
            # fallback (pre-metadata sidecars): reconstruct the
            # combined-stack id the descriptions/acceptance are keyed by
            info = meta[i] if i < len(meta) else {
                "segmentation_id": n_base + i + 1, "description": "",
                "hashtags": [], "bbox": mask_bbox(m),
                "area": int(np.sum(m > 0))}
            out[f"segmentation_{info['segmentation_id']}"] = {
                "mask": m, **info}
        return out

    def saved_accepted_ids(self, run_id: str) -> List[int]:
        if not os.path.exists(os.path.join(self.masks_path, ".zgroup")):
            return []
        root = zarrlite.Group(self.masks_path)
        if run_id not in root:
            return []
        return list(root[run_id].attrs.get("accepted_ids", []))

    def read_augmented_data(self, run_id: str
                            ) -> Tuple[np.ndarray, np.ndarray, set]:
        """(image, combined mask stack, accepted seg-id set) — the
        viewer-reload surface (reference read_augmented_data: source
        candidates + saved additions + the persisted acceptance set)."""
        image, masks = self.read_with_session_fallback(run_id)
        return image, masks, set(self.saved_accepted_ids(run_id))

    # -- in-memory text -----------------------------------------------------

    def _run(self, run_id: str) -> Dict[str, Any]:
        return self.text_data.setdefault(
            run_id, {"global_text": "", "segmentations": {}})

    def save_text_to_memory(self, run_id: str, global_text: str,
                            selected_id: Optional[int] = None,
                            seg_text: str = "") -> None:
        r = self._run(run_id)
        if r["global_text"] != global_text:
            r["global_text"] = global_text
            self._dirty.add(run_id)
        if selected_id is not None:
            key = str(selected_id)
            if r["segmentations"].get(key, "") != seg_text:
                r["segmentations"][key] = seg_text
                self._dirty.add(run_id)

    def get_global_text(self, run_id: str) -> str:
        return self._run(run_id).get("global_text", "")

    def get_segmentation_text(self, run_id: str, seg_id) -> str:
        return self._run(run_id)["segmentations"].get(str(seg_id), "")

    def annotated_runs(self) -> List[str]:
        return sorted(r for r, d in self.text_data.items()
                      if d.get("global_text")
                      or any(d.get("segmentations", {}).values()))

    # -- persistence ----------------------------------------------------------

    def load_run_annotations(self, run_id: str,
                             hashtag_manager: HashtagManager) -> None:
        """Rebuild hashtag state for one run from stored text."""
        hashtag_manager.clear_run_hashtags(run_id)
        r = self._run(run_id)
        hashtag_manager.add_hashtags_from_global(run_id, r["global_text"])
        for seg_id, text in r.get("segmentations", {}).items():
            hashtag_manager.add_hashtags_from_segmentation(run_id, seg_id,
                                                           text)

    def save_run_annotations(self, run_id: str,
                             hashtag_manager: HashtagManager) -> str:
        """Persist all text + hashtags to JSON (reference :236-292), in
        the WEB schema shared with /api/annotate_text and the simple
        TextAnnotator (see _normalize_text_payload). Web-side entries
        for runs this session never touched are preserved verbatim."""
        self.load_run_annotations(run_id, hashtag_manager)
        payload: Dict[str, Any] = {}
        if os.path.exists(self.save_path):
            with open(self.save_path) as f:
                payload = json.load(f)

        def merged_tags(new_text: str, old_entry) -> List[str]:
            # manual hashtags (stored but not derivable from the old
            # text, e.g. added via /api/annotate_text's hashtags field)
            # survive a text edit; tags the user deleted from the text
            # itself do not
            tags = set(HashtagManager.extract_hashtags(new_text))
            if isinstance(old_entry, dict):
                old_text = old_entry.get("text", "")
                manual = set(old_entry.get("hashtags", [])) - \
                    HashtagManager.extract_hashtags(old_text)
                tags |= manual
            return sorted(tags)

        # only runs edited THIS session are re-serialized; everything the
        # other frontends wrote — runs, entries, manual hashtags — is
        # preserved verbatim
        for run in sorted(self._dirty):
            d = self.text_data.get(run, {})
            old = payload.get(run)
            old = old if isinstance(old, dict) else {}
            # migrate away from the legacy manager schema: its keys must
            # not survive next to web-schema ones, or the loader's
            # legacy branch would revert this save on reload
            entry: Dict[str, Any] = {k: v for k, v in old.items()
                                     if k not in ("global_text",
                                                  "segmentations")}
            off = self._key_offset(run)
            items = [("global", d.get("global_text", ""))] + [
                (str(int(sid) - off), text)
                for sid, text in d.get("segmentations", {}).items()]
            for key, text in items:
                tags = merged_tags(text, old.get(key))
                if text or tags:     # cleared text keeps manual-only tags
                    entry[key] = {"text": text, "hashtags": tags}
                else:
                    entry.pop(key, None)
            if entry:
                payload[run] = entry
            else:
                payload.pop(run, None)
        self._dirty.clear()
        payload["_hashtags"] = hashtag_manager.get_data_for_save()
        with open(self.save_path, "w") as f:
            json.dump(payload, f, indent=1)
        return self.save_path

    def load_saved(self, hashtag_manager: HashtagManager) -> None:
        if not os.path.exists(self.save_path):
            return
        with open(self.save_path) as f:
            payload = json.load(f)
        hashtag_manager.load_data_from_save(payload.pop("_hashtags", {}))
        self.text_data = _normalize_text_payload(payload, self._key_offset)
