"""Qt dual-view segmentation picker (reference gui/base/
segmentation_picker.py:7-254).

Left pane shows every candidate mask, right pane the accepted set;
clicking a pixel accepts the mask under it, repeated clicks at the same
pixel CYCLE through overlapping masks (ClickCycler), 'r' undoes the last
accept, right-click resets both views. The two panes are zoom/pan-linked
(pyqtgraph setXLink/setYLink — the headless LinkedViews model mirrors
the same behavior for the web UI). All decision state lives in the
headless AnnotationSession (single-class accept = class "1"), so
accept/undo logic is covered by the session tests.
"""

from typing import List, Optional

import numpy as np

try:  # pragma: no cover - optional dependency
    import pyqtgraph as pg
    from PyQt5 import QtCore, QtWidgets
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "PyQt5/pyqtgraph are required for the Qt GUI "
        "(pip install saber-tpu[gui])") from e

from saber_tpu.gui.base.annotation_session import (TAB10, AnnotationSession,
                                                   ClickCycler, masks_at)


class SegmentationPicker(QtWidgets.QWidget):  # pragma: no cover - Qt
    """Accept/reject picker over an (N, H, W) candidate mask stack."""

    def __init__(self, image: np.ndarray, masks: np.ndarray,
                 session: Optional[AnnotationSession] = None,
                 run_id: str = "run"):
        super().__init__()
        self.image = np.asarray(image)
        self.masks = np.asarray(masks).astype(bool)
        self.session = session or AnnotationSession({"1": "accepted"})
        self.run_id = run_id
        self.cycler = ClickCycler()

        layout = QtWidgets.QHBoxLayout(self)
        self.views, self.mask_items = [], ([], [])
        for pane in range(2):
            glw = pg.GraphicsLayoutWidget()
            vb = glw.addViewBox(lockAspect=True)
            vb.setMenuEnabled(False)
            img = pg.ImageItem(self.image, axisOrder="row-major")
            vb.addItem(img)
            for i in range(self.masks.shape[0]):
                item = pg.ImageItem(self._overlay(i), axisOrder="row-major")
                item.setOpacity(0.4)
                item.setZValue(i + 1)
                vb.addItem(item)
                self.mask_items[pane].append(item)
            layout.addWidget(glw)
            self.views.append(vb)
        # synchronized dual-view zoom/pan (reference keeps both panes
        # aspect-locked over the same image; we additionally link ranges)
        self.views[1].setXLink(self.views[0])
        self.views[1].setYLink(self.views[0])
        self.views[0].scene().sigMouseClicked.connect(self._clicked)
        self.setFocusPolicy(QtCore.Qt.ClickFocus)
        self._refresh()

    # -- rendering ----------------------------------------------------------

    def _overlay(self, i: int) -> np.ndarray:
        color = TAB10[i % len(TAB10)]
        rgba = np.zeros((*self.masks.shape[1:], 4), np.uint8)
        m = self.masks[i]
        rgba[m, 0], rgba[m, 1], rgba[m, 2] = color
        rgba[m, 3] = 255
        return rgba

    def accepted(self) -> List[int]:
        # session labels are 1-based (0 = background); picker exposes
        # 0-based mask-stack indices
        return sorted(lab - 1 for lab in
                      self.session.labels_of_class(self.run_id, "1"))

    def _refresh(self):
        acc = set(self.accepted())
        for i in range(self.masks.shape[0]):
            self.mask_items[0][i].setVisible(i not in acc)
            self.mask_items[1][i].setVisible(i in acc)

    # -- interactions (reference mouse_clicked / keyPressEvent) -------------

    def _clicked(self, ev):
        if ev.button() == QtCore.Qt.RightButton:
            self.reset_view()
            return
        pos = self.mask_items[0][0].mapFromScene(ev.scenePos()) \
            if self.masks.shape[0] else None
        if pos is None:
            return
        y, x = int(pos.y()), int(pos.x())
        hit = self.cycler.hit(masks_at(self.masks, y, x), (y, x))
        if hit is not None and ev.button() == QtCore.Qt.LeftButton:
            self.session.assign(self.run_id, hit + 1, "1")
            self._refresh()

    def keyPressEvent(self, ev):
        if ev.key() == QtCore.Qt.Key_R:
            self.session.undo()
            self._refresh()
        else:
            super().keyPressEvent(ev)

    def reset_view(self):
        for vb in self.views:
            vb.autoRange()


def launch_picker(image, masks):  # pragma: no cover - Qt event loop
    app = QtWidgets.QApplication.instance() or QtWidgets.QApplication([])
    win = SegmentationPicker(image, masks)
    win.resize(1100, 600)
    win.show()
    app.exec_()
