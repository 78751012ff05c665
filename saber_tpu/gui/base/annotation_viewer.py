"""Qt 2D annotation viewer (reference gui/base/annotation_viewer.py).

Single-image dual view over AnnotationSession: left shows every candidate
mask with palette colors, right shows only accepted masks colored by
class. Clicking assigns the selected class; 'r' rejects; Ctrl+Z undoes.
Requires PyQt5 + pyqtgraph; logic lives in annotation_session.py.
"""

import numpy as np

try:  # pragma: no cover - optional dependency
    import pyqtgraph as pg
    from PyQt5 import QtCore, QtWidgets
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "PyQt5/pyqtgraph are required for the Qt GUI "
        "(pip install saber-tpu[gui])") from e

from saber_tpu.gui.base.annotation_session import (AnnotationSession,
                                                   HighlightState,
                                                   prepare_label_volume)


class AnnotationViewer(QtWidgets.QWidget):  # pragma: no cover - Qt
    """Dual-pane curation viewer.

    Interactions (reference annotation_viewer.py mouse_clicked /
    keyPressEvent / highlight_mask):
    - left click: highlight mask (boundary outline), click again to clear
    - a / Enter: assign highlighted mask to the selected class
    - 1-9: assign highlighted mask to class N directly
    - r: reject highlighted mask; x: clear its annotation
    - Ctrl+Z: undo (across runs)
    """

    def __init__(self, image, masks, class_dict, selected_class,
                 session: AnnotationSession, run_id: str):
        super().__init__()
        self.session = session
        self.run_id = run_id
        self.selected_class = selected_class
        self.image = np.asarray(image)
        self.labels, self.max_label = prepare_label_volume(masks)
        self.highlight = HighlightState()

        layout = QtWidgets.QHBoxLayout(self)
        self.mask_items = []
        self.boundary_items = []
        self.view_boxes = []
        for _ in range(2):
            glw = pg.GraphicsLayoutWidget()
            vb = glw.addViewBox(lockAspect=True)
            img = pg.ImageItem(self.image, axisOrder="row-major")
            mask = pg.ImageItem(axisOrder="row-major")
            bnd = pg.ScatterPlotItem(size=2, pen=None,
                                     brush=pg.mkBrush(255, 255, 0, 220))
            vb.addItem(img)
            vb.addItem(mask)
            vb.addItem(bnd)
            layout.addWidget(glw)
            self.mask_items.append(mask)
            self.boundary_items.append(bnd)
            self.view_boxes.append(vb)
        # synchronized dual-view zoom/pan (reference segmentation_picker
        # pane pairing; headless analog: annotation_session.LinkedViews)
        self.view_boxes[1].setXLink(self.view_boxes[0])
        self.view_boxes[1].setYLink(self.view_boxes[0])
        self.mask_items[0].mouseClickEvent = self._clicked
        self.status = QtWidgets.QLabel(self)
        self.status.move(8, 8)
        self._refresh()

    def _refresh(self):
        left, right = self.session.left_right_luts(self.run_id,
                                                   self.max_label)
        self.mask_items[0].setImage(self.labels, autoLevels=False, lut=left,
                                    levels=(0, self.max_label))
        self.mask_items[1].setImage(self.labels, autoLevels=False, lut=right,
                                    levels=(0, self.max_label))
        for bnd in self.boundary_items:
            bnd.setVisible(False)
        if self.highlight.current:
            pts = self.highlight.boundary_of(self.labels,
                                             self.highlight.current)
            if pts is not None:
                # outline on the pane where the mask is visible: right if
                # annotated, else left (reference highlight_mask)
                pane = (1 if self.session.state_of(
                    self.run_id, self.highlight.current)
                    not in (None, "rejected") else 0)
                self.boundary_items[pane].setData(pts[:, 1], pts[:, 0])
                self.boundary_items[pane].setVisible(True)
        counts = self.session.class_counts(self.run_id)
        self.status.setText(" ".join(f"{c}:{n}" for c, n in counts.items()))
        self.status.adjustSize()

    def _clicked(self, ev):
        pos = ev.pos()
        label = self.session.pick(self.labels, int(pos.y()), int(pos.x()))
        self.highlight.toggle(label)
        self._refresh()

    def _assign_highlight(self, cls):
        if self.highlight.current:
            self.session.assign(self.run_id, self.highlight.current, cls)
            self.highlight.clear()

    def keyPressEvent(self, ev):
        key = ev.key()
        if key == QtCore.Qt.Key_R and self.highlight.current:
            self.session.reject(self.run_id, self.highlight.current)
            self.highlight.clear()
        elif key == QtCore.Qt.Key_X and self.highlight.current:
            self.session.remove(self.run_id, self.highlight.current)
            self.highlight.clear()
        elif key in (QtCore.Qt.Key_A, QtCore.Qt.Key_Return,
                     QtCore.Qt.Key_Enter):
            self._assign_highlight(self.selected_class)
        elif QtCore.Qt.Key_1 <= key <= QtCore.Qt.Key_9:
            self._assign_highlight(key - QtCore.Qt.Key_0)
        elif (key == QtCore.Qt.Key_Z
              and ev.modifiers() & QtCore.Qt.ControlModifier):
            self.session.undo()
        self._refresh()
