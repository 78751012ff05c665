"""Headless drag-to-size circle draw tool
(reference saber/gui/text/segmentation_viewer.py:43-80, 565-622:
LeftDrawViewBox press/drag/release -> _circle_drag_start/update/finish).

The reference sizes a circular mask interactively: press anchors the
center, dragging grows a live preview to the cursor radius, release
commits the mask if the radius exceeds a minimum. The Qt shell here only
forwards events; all geometry and commit logic lives in this pure class
so it is testable headlessly and reusable by the web GUI.
"""

from typing import Optional, Tuple

import numpy as np

from saber_tpu.gui.text.data_manager import circle_mask


class CircleDrawTool:
    """State machine: start(y, x) -> update(y, x)* -> finish(y, x).

    ``update`` returns the live preview geometry ``(cy, cx, r)``;
    ``finish`` returns the committed boolean mask, or ``None`` when the
    drag stayed under ``min_radius`` pixels (reference
    MIN_CIRCLE_RADIUS_PX = 2.0) or started out of bounds.
    """

    MIN_RADIUS_PX = 2.0

    def __init__(self, shape: Tuple[int, int],
                 min_radius: float = MIN_RADIUS_PX):
        self.shape = (int(shape[0]), int(shape[1]))
        self.min_radius = float(min_radius)
        self._center: Optional[Tuple[float, float]] = None
        self._radius = 0.0

    @property
    def active(self) -> bool:
        return self._center is not None

    def start(self, y: float, x: float) -> bool:
        """Anchor the circle center; returns False (inactive) when the
        press lands outside the image (reference _circle_drag_start)."""
        h, w = self.shape
        if not (0 <= y < h and 0 <= x < w):
            self._center = None
            return False
        self._center = (float(y), float(x))
        self._radius = 0.0
        return True

    def update(self, y: float, x: float
               ) -> Optional[Tuple[float, float, float]]:
        """Grow the preview to the cursor; returns (cy, cx, r) or None
        when no drag is active."""
        if self._center is None:
            return None
        cy, cx = self._center
        self._radius = float(np.hypot(y - cy, x - cx))
        return (cy, cx, self._radius)

    def finish(self, y: float, x: float) -> Optional[np.ndarray]:
        """Commit: returns the filled-circle boolean mask, or None for a
        sub-minimum drag (reference _circle_drag_finish)."""
        geom = self.update(y, x)
        self._center = None
        if geom is None or geom[2] < self.min_radius:
            return None
        cy, cx, r = geom
        mask = circle_mask(self.shape, cy, cx, r)
        # the anchor pixel is inside by construction (r >= min_radius > 0)
        return mask

    def cancel(self) -> None:
        self._center = None
        self._radius = 0.0
