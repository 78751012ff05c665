"""Qt 3D annotation viewer (reference gui/base/annotation_viewer_3d.py).

Thin pyqtgraph shell over AnnotationSession/SliceNavigator
(annotation_session.py): two ImageItems + label-map LUTs (left =
candidates, right = accepted by class), debounced z-slider, O(1) click
picking, keyboard remove, undo. Requires PyQt5 + pyqtgraph (optional
extra); all decision logic lives in the testable session module.
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
                                                   SliceNavigator,
                                                   prepare_label_volume)


class AnnotationSegmentationViewer3D(QtWidgets.QWidget):  # pragma: no cover
    """Dual-view 3D reviewer: scroll z, click to assign the selected class,
    'r' to reject, Delete to clear, Ctrl+Z to undo."""

    def __init__(self, volume, masks, class_dict, selected_class,
                 session: AnnotationSession, run_id: str):
        super().__init__()
        self.session = session
        self.run_id = run_id
        self.selected_class = selected_class
        self.volume = np.asarray(volume)
        if self.volume.ndim == 2:
            self.volume = self.volume[None]
        self.labels, self.max_label = prepare_label_volume(masks)
        if self.labels.ndim == 2:
            self.labels = np.broadcast_to(
                self.labels, self.volume.shape).copy()
        self.nav = SliceNavigator(self.volume.shape[0])
        self._build_ui()
        self._refresh()

    def _build_ui(self):
        layout = QtWidgets.QVBoxLayout(self)
        row = QtWidgets.QHBoxLayout()
        self.views = []
        self.img_items = []
        self.mask_items = []
        for _ in range(2):  # left candidates / right accepted
            glw = pg.GraphicsLayoutWidget()
            vb = glw.addViewBox(lockAspect=True)
            img = pg.ImageItem(axisOrder="row-major")
            mask = pg.ImageItem(axisOrder="row-major")
            vb.addItem(img)
            vb.addItem(mask)
            row.addWidget(glw)
            self.views.append(vb)
            self.img_items.append(img)
            self.mask_items.append(mask)
        layout.addLayout(row)

        self.slider = QtWidgets.QSlider(QtCore.Qt.Horizontal)
        self.slider.setRange(0, self.nav.n_slices - 1)
        self.slider.setValue(self.nav.current)
        self._debounce = QtCore.QTimer(singleShot=True, interval=30)
        self._debounce.timeout.connect(self._refresh)
        self.slider.valueChanged.connect(self._on_slider)
        layout.addWidget(self.slider)

        self.status = QtWidgets.QLabel()
        layout.addWidget(self.status)
        self.mask_items[0].mouseClickEvent = self._clicked

    def _on_slider(self, value):
        self.nav.set(value)
        self._debounce.start()

    def _refresh(self):
        z = self.nav.current
        img = self.volume[z]
        lab = self.labels[z]
        left, right = self.session.left_right_luts(self.run_id,
                                                   self.max_label)
        for item in self.img_items:
            item.setImage(img, autoLevels=True)
        self.mask_items[0].setImage(lab, autoLevels=False, lut=left,
                                    levels=(0, self.max_label))
        self.mask_items[1].setImage(lab, autoLevels=False, lut=right,
                                    levels=(0, self.max_label))
        self.status.setText(
            f"{self.run_id}  z={z}/{self.nav.n_slices - 1}  "
            f"class={self.selected_class}")

    def _clicked(self, ev):
        pos = ev.pos()
        label = self.session.pick(self.labels[self.nav.current],
                                  int(pos.y()), int(pos.x()))
        if label:
            self.session.assign(self.run_id, label, self.selected_class)
            self._refresh()

    def keyPressEvent(self, ev):
        if ev.key() == QtCore.Qt.Key_Z and ev.modifiers() & QtCore.Qt.ControlModifier:
            self.session.undo()
        elif ev.key() in (QtCore.Qt.Key_Left, QtCore.Qt.Key_Down):
            self.slider.setValue(self.nav.step(-1))
        elif ev.key() in (QtCore.Qt.Key_Right, QtCore.Qt.Key_Up):
            self.slider.setValue(self.nav.step(+1))
        self._refresh()
