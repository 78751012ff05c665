"""Annotation-session logic shared by the Qt viewers and the web GUI.

The reference implements these behaviors inside Qt widget classes
(saber/gui/base/annotation_viewer.py, annotation_viewer_3d.py:17-477,
multi_class_segmentation_picker.py); here the state machine is a plain
testable class and the Qt widgets are thin shells, so the same logic
drives the dependency-free web annotator too.

Behaviors mirrored from the reference viewers:
- label-volume preparation: accept a label map directly or collapse a
  stack of binary masks to 1-based labels (annotation_viewer_3d.py:53-78)
- TAB10-cycled palette LUT for unannotated labels (:79-102)
- left/right LUTs: candidates colored on the left, only annotated labels
  colored (by class) on the right (:103-132)
- O(1) picking via the label map (:325-379)
- class assignment / removal with undo across runs (segmentation_picker
  undo stack), persisted in the apply_labels JSON schema
"""

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

TAB10 = np.array([
    [31, 119, 180], [255, 127, 14], [44, 160, 44], [214, 39, 40],
    [148, 103, 189], [140, 86, 75], [227, 119, 194], [127, 127, 127],
    [188, 189, 34], [23, 190, 207]], np.uint8)


def prepare_label_volume(masks) -> Tuple[np.ndarray, int]:
    """Masks → (int32 label volume, max label).

    A label map (integer array) passes through; a stack of binary masks
    (N, H, W) or (N, Z, H, W) collapses to 1-based labels, later masks
    painting over earlier (reference annotation_viewer_3d.py:53-78).
    """
    masks = np.asarray(masks)
    if np.issubdtype(masks.dtype, np.integer) and masks.ndim in (2, 3):
        lab = masks.astype(np.int32)
        return lab, int(lab.max())
    if masks.ndim >= 3:  # stack of binary masks
        stack = masks > 0.5
        lab = np.zeros(stack.shape[1:], np.int32)
        for i in range(stack.shape[0]):
            lab = np.where(stack[i], i + 1, lab)
        return lab, int(stack.shape[0])
    raise ValueError(f"cannot interpret masks with shape {masks.shape}")


def build_palette_lut(max_label: int, alpha: int = 110) -> np.ndarray:
    """(max_label+1, 4) RGBA LUT: label 0 transparent, others TAB10-cycled."""
    lut = np.zeros((max_label + 1, 4), np.uint8)
    if max_label:
        ids = np.arange(1, max_label + 1)
        lut[1:, :3] = TAB10[(ids - 1) % len(TAB10)]
        lut[1:, 3] = alpha
    return lut


class AnnotationSession:
    """Per-zarr annotation state: class assignment, undo, persistence."""

    def __init__(self, class_dict: Optional[Dict[str, str]] = None,
                 ann_path: Optional[str] = None):
        self.class_dict = dict(class_dict or {})
        self.ann_path = ann_path
        # {run: {"accepted": {class: [label,...]}, "rejected": [label,...]}}
        self.annotations: Dict[str, Dict] = {}
        self._undo: List[Tuple[str, int, Optional[str]]] = []
        if ann_path and os.path.exists(ann_path):
            with open(ann_path) as f:
                self.annotations = json.load(f)

    # -- state queries ---------------------------------------------------

    def _run(self, run: str) -> Dict:
        return self.annotations.setdefault(
            run, {"accepted": {}, "rejected": []})

    def state_of(self, run: str, label: int) -> Optional[str]:
        """Class id string, 'rejected', or None."""
        r = self._run(run)
        if label in r["rejected"]:
            return "rejected"
        for cls, labels in r["accepted"].items():
            if label in labels:
                return cls
        return None

    def labels_of_class(self, run: str, cls) -> List[int]:
        return list(self._run(run)["accepted"].get(str(cls), []))

    def annotated_runs(self) -> List[str]:
        return sorted(r for r, a in self.annotations.items()
                      if a.get("accepted") or a.get("rejected"))

    # -- mutations (undoable) ---------------------------------------------

    def _clear(self, run: str, label: int):
        r = self._run(run)
        r["rejected"] = [x for x in r["rejected"] if x != label]
        for labels in r["accepted"].values():
            if label in labels:
                labels.remove(label)

    def assign(self, run: str, label: int, cls) -> None:
        """Assign label to a class (removing any previous state)."""
        if label <= 0:
            return
        self._undo.append((run, label, self.state_of(run, label)))
        self._clear(run, label)
        self._run(run)["accepted"].setdefault(str(cls), []).append(label)

    def reject(self, run: str, label: int) -> None:
        if label <= 0:
            return
        self._undo.append((run, label, self.state_of(run, label)))
        self._clear(run, label)
        self._run(run)["rejected"].append(label)

    def remove(self, run: str, label: int) -> None:
        """Clear any annotation for the label (viewer 'remove' key,
        reference annotation_viewer_3d.py:380-423)."""
        self._undo.append((run, label, self.state_of(run, label)))
        self._clear(run, label)

    def undo(self) -> bool:
        """Undo the last mutation, across runs (picker undo stack)."""
        if not self._undo:
            return False
        run, label, prev = self._undo.pop()
        self._clear(run, label)
        if prev == "rejected":
            self._run(run)["rejected"].append(label)
        elif prev is not None:
            self._run(run)["accepted"].setdefault(prev, []).append(label)
        return True

    # -- rendering helpers -------------------------------------------------

    def left_right_luts(self, run: str, max_label: int
                        ) -> Tuple[np.ndarray, np.ndarray]:
        """Candidate LUT (left view) + annotated-only LUT (right view),
        reference annotation_viewer_3d.py:103-132."""
        left = build_palette_lut(max_label)
        right = np.zeros_like(left)
        r = self._run(run)
        for cls, labels in r["accepted"].items():
            color = TAB10[(int(cls) - 1) % len(TAB10)]
            for lab in labels:
                if 0 < lab <= max_label:
                    right[lab, :3] = color
                    right[lab, 3] = 170
                    left[lab, :3] = color      # annotated shows class color
        for lab in r["rejected"]:
            if 0 < lab <= max_label:
                left[lab] = (60, 60, 60, 60)   # dimmed
        return left, right

    @staticmethod
    def pick(label_map: np.ndarray, y: int, x: int) -> int:
        """O(1) label under a click (reference :325-341)."""
        h, w = label_map.shape[-2:]
        if not (0 <= y < h and 0 <= x < w):
            return 0
        return int(label_map[..., y, x] if label_map.ndim == 2
                   else label_map[y, x])

    # -- summaries (reference zarr_gui progress panel) ----------------------

    def class_counts(self, run: str) -> Dict[str, int]:
        """Accepted-mask count per class for one run."""
        r = self._run(run)
        return {cls: len(labels) for cls, labels in r["accepted"].items()
                if labels}

    def progress(self, runs: List[str]) -> Dict[str, Any]:
        """Curation progress over a run list (reference zarr_gui.py status
        bar: how many runs touched, per-class totals, rejected count)."""
        per_class: Dict[str, int] = {}
        rejected = 0
        touched = 0
        for run in runs:
            a = self.annotations.get(run)
            if not a:
                continue
            got = False
            for cls, labels in a.get("accepted", {}).items():
                if labels:
                    per_class[cls] = per_class.get(cls, 0) + len(labels)
                    got = True
            nrej = len(a.get("rejected", []))
            rejected += nrej
            touched += bool(got or nrej)
        return {"runs_annotated": touched, "runs_total": len(runs),
                "per_class": per_class, "rejected": rejected}

    # -- persistence --------------------------------------------------------

    def save(self, path: Optional[str] = None) -> str:
        path = path or self.ann_path
        if not path:
            raise ValueError("no annotation path configured")
        with open(path, "w") as f:
            json.dump(self.annotations, f, indent=1)
        return path


class ClassManager:
    """Class add/remove/select with TAB10 color cycling (reference
    zarr_gui.py ClassManagerWidget:22-150, logic only — the Qt widget is
    a shell over this)."""

    def __init__(self, classes: Optional[Dict[str, Dict]] = None):
        # {name: {"id": int, "color": [r, g, b]}}
        self.classes: Dict[str, Dict] = dict(classes or {})
        self.selected: Optional[str] = None
        if not self.classes:
            self.add("class_1")
        self.selected = next(iter(self.classes))

    def _next_color_index(self) -> int:
        used = {c.get("color_index") for c in self.classes.values()}
        i = 0
        while i in used:
            i += 1
        return i

    def add(self, name: str) -> bool:
        name = name.strip()
        if not name or name in self.classes:
            return False
        idx = self._next_color_index()
        self.classes[name] = {
            "id": max((c["id"] for c in self.classes.values()), default=0) + 1,
            "color": TAB10[idx % len(TAB10)].tolist(),
            "color_index": idx,
        }
        if self.selected is None:
            self.selected = name
        return True

    def remove(self, name: str) -> bool:
        """Remove a class; the last remaining class cannot be removed
        (reference remove_class guard)."""
        if name not in self.classes or len(self.classes) <= 1:
            return False
        del self.classes[name]
        if self.selected == name:
            self.selected = next(iter(self.classes))
        return True

    def select(self, name: str) -> bool:
        if name in self.classes:
            self.selected = name
            return True
        return False

    def id_of(self, name: Optional[str] = None) -> int:
        return self.classes[name or self.selected]["id"]

    def name_of(self, cls_id) -> Optional[str]:
        for name, info in self.classes.items():
            if str(info["id"]) == str(cls_id):
                return name
        return None

    def as_dict(self) -> Dict[str, Dict]:
        return {n: dict(c) for n, c in self.classes.items()}


def mask_boundary(mask: np.ndarray) -> Optional[np.ndarray]:
    """Boundary pixel coordinates (N, 2) [y, x] of a binary mask.

    Pure-numpy replacement for the reference's OpenCV contour extraction
    (gui/base/utils.py get_boundary_opencv_fast): a boundary pixel is an
    on-pixel with at least one off 4-neighbour. Returns None for empty
    masks, and subsamples very large boundaries the same way the
    reference caps contour points for draw speed."""
    m = np.asarray(mask) > 0
    if not m.any():
        return None
    inner = np.zeros_like(m)
    inner[1:-1, 1:-1] = (m[1:-1, 1:-1] & m[:-2, 1:-1] & m[2:, 1:-1]
                         & m[1:-1, :-2] & m[1:-1, 2:])
    ys, xs = np.nonzero(m & ~inner)
    pts = np.stack([ys, xs], axis=1)
    if len(pts) > 4000:                     # draw-speed cap (reference
        pts = pts[:: len(pts) // 2000]      # subsamples long contours)
    return pts


class HighlightState:
    """Click-to-highlight + boundary cache (reference
    annotation_viewer.py highlight_mask/clear_highlight, with the
    per-mask boundary computed lazily and cached)."""

    def __init__(self):
        self.current: Optional[int] = None
        self._boundary_cache: Dict[int, Optional[np.ndarray]] = {}

    def toggle(self, label: int) -> Optional[int]:
        """Highlight label, or clear if it was already highlighted.
        Returns the new highlighted label (None = cleared)."""
        self.current = None if self.current == label or label <= 0 else label
        return self.current

    def clear(self):
        self.current = None

    def boundary_of(self, label_map: np.ndarray, label: int
                    ) -> Optional[np.ndarray]:
        if label not in self._boundary_cache:
            self._boundary_cache[label] = mask_boundary(label_map == label)
        return self._boundary_cache[label]

    def invalidate(self, label: Optional[int] = None):
        """Drop cached boundaries (all, or one label) after data changes."""
        if label is None:
            self._boundary_cache.clear()
        else:
            self._boundary_cache.pop(label, None)


class SliceNavigator:
    """z-slider state for 3D review (reference annotation_viewer_3d
    slider + debounce, :214-246), plus label-jump navigation (the
    reference viewer's "where is this object?" workflow — scrubbing the
    slider until the highlighted mask appears — done in O(1) keypresses)."""

    def __init__(self, n_slices: int):
        self.n_slices = int(n_slices)
        self.current = self.n_slices // 2

    def set(self, z: int) -> int:
        self.current = max(0, min(self.n_slices - 1, int(z)))
        return self.current

    def step(self, delta: int) -> int:
        return self.set(self.current + delta)

    @staticmethod
    def labels_in_slice(label_volume: np.ndarray, z: int) -> List[int]:
        ids = np.unique(label_volume[z])
        return [int(i) for i in ids if i > 0]

    @staticmethod
    def slices_with_label(label_volume: np.ndarray, label: int,
                          areas: Optional[np.ndarray] = None) -> List[int]:
        """Sorted z indices where the label appears. Pass a precomputed
        ``per_slice_label_areas`` table when querying many labels — each
        bare call is a full-volume scan."""
        if areas is not None:
            zs = np.nonzero(areas[:, label])[0] if label < areas.shape[1] \
                else np.zeros(0, int)
        else:
            zs = np.nonzero((label_volume == label).any(axis=(1, 2)))[0]
        return [int(z) for z in zs]

    def jump_to_label(self, label_volume: np.ndarray, label: int,
                      direction: int = 1) -> Optional[int]:
        """Move to the nearest slice (strictly ahead in ``direction``,
        wrapping) that contains ``label``; None if it appears nowhere.
        If the label exists only on the current slice, stay put."""
        zs = self.slices_with_label(label_volume, label)
        if not zs:
            return None
        if direction >= 0:
            nxt = [z for z in zs if z > self.current]
            target = nxt[0] if nxt else zs[0]
        else:
            prv = [z for z in zs if z < self.current]
            target = prv[-1] if prv else zs[-1]
        return self.set(target)


class ViewState:
    """Zoom/pan state for the image viewport (reference viewers delegate
    this to pyqtgraph's ViewBox + a reset_view key,
    annotation_viewer_3d.py:432-436; headless here so the web UI and the
    Qt shells share the same clamped-rect math)."""

    def __init__(self, height: int, width: int,
                 min_zoom: float = 1.0, max_zoom: float = 40.0):
        self.h, self.w = int(height), int(width)
        self.min_zoom, self.max_zoom = float(min_zoom), float(max_zoom)
        self.zoom = 1.0
        self.cy, self.cx = self.h / 2.0, self.w / 2.0

    def reset(self):
        self.zoom, self.cy, self.cx = 1.0, self.h / 2.0, self.w / 2.0

    def zoom_by(self, factor: float, at: Optional[Tuple[float, float]] = None):
        """Zoom keeping the anchor point ``at`` (image coords) fixed in
        the viewport (scroll-wheel semantics)."""
        new = max(self.min_zoom, min(self.max_zoom, self.zoom * factor))
        if at is not None and new != self.zoom:
            ay, ax = at
            s = self.zoom / new
            self.cy = ay + (self.cy - ay) * s
            self.cx = ax + (self.cx - ax) * s
        self.zoom = new
        self._clamp()

    def pan(self, dy: float, dx: float):
        self.cy += dy
        self.cx += dx
        self._clamp()

    def _clamp(self):
        hh, hw = self.h / (2 * self.zoom), self.w / (2 * self.zoom)
        self.cy = min(max(self.cy, hh), self.h - hh)
        self.cx = min(max(self.cx, hw), self.w - hw)

    def rect(self) -> Tuple[int, int, int, int]:
        """Visible (y0, x0, y1, x1), integer-aligned, always in-bounds."""
        hh, hw = self.h / (2 * self.zoom), self.w / (2 * self.zoom)
        y0 = max(0, int(round(self.cy - hh)))
        x0 = max(0, int(round(self.cx - hw)))
        y1 = min(self.h, max(y0 + 1, int(round(self.cy + hh))))
        x1 = min(self.w, max(x0 + 1, int(round(self.cx + hw))))
        return y0, x0, y1, x1


class LinkedViews:
    """Synchronized zoom/pan across multiple viewports — the dual-view
    picker's left/right panes move together (reference
    segmentation_picker.py:40-55 keeps two aspect-locked ViewBoxes over
    the same image; the Qt shell links them with setXLink/setYLink, this
    headless model broadcasts every ViewState operation so the web UI
    shares the exact rect math)."""

    def __init__(self, *views: ViewState):
        self.views = list(views)

    def add(self, view: ViewState) -> None:
        # adopt the first view's state so a late-added pane snaps in sync
        if self.views:
            v0 = self.views[0]
            view.zoom, view.cy, view.cx = v0.zoom, v0.cy, v0.cx
        self.views.append(view)

    def zoom_by(self, factor: float,
                at: Optional[Tuple[float, float]] = None) -> None:
        for v in self.views:
            v.zoom_by(factor, at)

    def pan(self, dy: float, dx: float) -> None:
        for v in self.views:
            v.pan(dy, dx)

    def reset(self) -> None:
        for v in self.views:
            v.reset()


def masks_at(masks: np.ndarray, y: int, x: int) -> List[int]:
    """Indices of every mask in an (N, H, W) stack covering pixel (y, x)
    — the overlap set a click cycles through (reference
    segmentation_picker.py:163-169 scans self.masks per click)."""
    h, w = masks.shape[-2:]
    if not (0 <= y < h and 0 <= x < w):
        return []
    return [int(i) for i in np.nonzero(masks[:, y, x])[0]]


class ClickCycler:
    """Repeated clicks at one pixel cycle through the overlapping masks
    under it (reference segmentation_picker.py:168-178 —
    _last_click_pos / _current_mask_index). A click elsewhere restarts
    at the topmost hit."""

    def __init__(self):
        self._pos: Optional[Tuple[int, int]] = None
        self._idx = 0

    def hit(self, hits: List[int],
            pos: Tuple[int, int]) -> Optional[int]:
        """Pick one mask index from the overlap set for a click at
        ``pos``; None when nothing is under the cursor."""
        if not hits:
            self._pos = None
            return None
        if pos != self._pos:
            self._pos, self._idx = pos, 0
        else:
            self._idx += 1
        return hits[self._idx % len(hits)]

    def reset(self) -> None:
        self._pos, self._idx = None, 0


def per_slice_label_areas(label_volume: np.ndarray,
                          num_labels: Optional[int] = None) -> np.ndarray:
    """(Z, num_labels+1) voxel counts of every label in every z-slice in
    ONE pass over the volume (np.bincount per slice) — the building block
    for galleries and slice navigation, which would otherwise re-scan the
    full volume once per label (64 accepted masks on a 512³ volume = 128
    full passes; this is 1)."""
    if num_labels is None:
        num_labels = int(label_volume.max()) if label_volume.size else 0
    out = np.zeros((label_volume.shape[0], num_labels + 1), np.int64)
    for z in range(label_volume.shape[0]):
        c = np.bincount(label_volume[z].reshape(-1).astype(np.int64),
                        minlength=num_labels + 1)
        out[z, :] = c[:num_labels + 1]
    return out


def label_bbox(label_map: np.ndarray, label: int, pad: float = 0.15
               ) -> Optional[Tuple[int, int, int, int]]:
    """Padded bounding box (y0, x0, y1, x1) of a label; None if absent.
    2D maps only — for volumes pass the slice. Padding is a fraction of
    the box size (the reference's adaptive gallery crops,
    classifier/preprocess crop margins)."""
    m = label_map == label
    if not m.any():
        return None
    ys, xs = np.nonzero(m)
    y0, y1 = int(ys.min()), int(ys.max()) + 1
    x0, x1 = int(xs.min()), int(xs.max()) + 1
    py, px = int((y1 - y0) * pad) + 1, int((x1 - x0) * pad) + 1
    return (max(0, y0 - py), max(0, x0 - px),
            min(label_map.shape[0], y1 + py),
            min(label_map.shape[1], x1 + px))


def class_gallery(session: "AnnotationSession", run: str,
                  image: np.ndarray, label_map: np.ndarray,
                  cls, max_items: int = 64) -> List[Dict[str, Any]]:
    """Per-class gallery: padded crops of every mask accepted into
    ``cls`` for one run (reference behavior: the zarr GUI's per-class
    review gallery / create_png_gallery grouping, run_tomogram_segment.py
    gallery step — here headless so web + Qt share it).

    3D runs crop at each label's best slice (max mask area). Returns
    [{label, z, bbox, image, mask}] with image/mask already cropped.
    """
    is_3d = label_map.ndim == 3
    # one histogram pass for ALL labels, not a volume scan per label
    areas = per_slice_label_areas(label_map) if is_3d else None
    items: List[Dict[str, Any]] = []
    for label in session.labels_of_class(run, cls)[:max_items]:
        if is_3d:
            col = (areas[:, label] if label < areas.shape[1]
                   else np.zeros(label_map.shape[0], np.int64))
            z = int(np.argmax(col))
            if col[z] == 0:
                continue
            lm, im = label_map[z], image[z]
        else:
            z, lm, im = None, label_map, image
        box = label_bbox(lm, label)
        if box is None:
            continue
        y0, x0, y1, x1 = box
        items.append({
            "label": int(label), "z": z, "bbox": box,
            "image": im[y0:y1, x0:x1],
            "mask": (lm[y0:y1, x0:x1] == label),
        })
    return items
