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
                                                   prepare_label_volume)


class AnnotationViewer(QtWidgets.QWidget):  # pragma: no cover - Qt
    def __init__(self, image, masks, class_dict, selected_class,
                 session: AnnotationSession, run_id: str):
        super().__init__()
        self.session = session
        self.run_id = run_id
        self.selected_class = selected_class
        self.image = np.asarray(image)
        self.labels, self.max_label = prepare_label_volume(masks)

        layout = QtWidgets.QHBoxLayout(self)
        self.mask_items = []
        for _ in range(2):
            glw = pg.GraphicsLayoutWidget()
            vb = glw.addViewBox(lockAspect=True)
            img = pg.ImageItem(self.image, axisOrder="row-major")
            mask = pg.ImageItem(axisOrder="row-major")
            vb.addItem(img)
            vb.addItem(mask)
            layout.addWidget(glw)
            self.mask_items.append(mask)
        self.mask_items[0].mouseClickEvent = self._clicked
        self._refresh()

    def _refresh(self):
        left, right = self.session.left_right_luts(self.run_id,
                                                   self.max_label)
        self.mask_items[0].setImage(self.labels, autoLevels=False, lut=left,
                                    levels=(0, self.max_label))
        self.mask_items[1].setImage(self.labels, autoLevels=False, lut=right,
                                    levels=(0, self.max_label))

    def _clicked(self, ev):
        pos = ev.pos()
        label = self.session.pick(self.labels, int(pos.y()), int(pos.x()))
        if label:
            self.session.assign(self.run_id, label, self.selected_class)
            self._refresh()

    def keyPressEvent(self, ev):
        if ev.key() == QtCore.Qt.Key_R:
            pos = self.mapFromGlobal(self.cursor().pos())
            label = self.session.pick(self.labels, pos.y(), pos.x())
            if label:
                self.session.reject(self.run_id, label)
        elif (ev.key() == QtCore.Qt.Key_Z
              and ev.modifiers() & QtCore.Qt.ControlModifier):
            self.session.undo()
        self._refresh()
