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
                                                   HighlightState,
                                                   SliceNavigator,
                                                   prepare_label_volume)


class AnnotationSegmentationViewer3D(QtWidgets.QWidget):  # pragma: no cover
    """Dual-view 3D reviewer: scroll z (slider / arrow keys), click to
    highlight a label (boundary outline on the current slice), 'a'/Enter
    assigns the selected class, 1-9 assign class N, 'r' rejects, 'x'
    clears, Ctrl+Z undoes, Home recenters the z slider, 'n'/'p' jumps to
    the next/previous slice containing the highlighted label, 'g' opens
    the per-class gallery for the selected class."""

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
        self.highlight = HighlightState()
        self._hl_slice = None      # z the cached boundary belongs to
        self._build_ui()
        self._refresh()

    def _build_ui(self):
        layout = QtWidgets.QVBoxLayout(self)
        row = QtWidgets.QHBoxLayout()
        self.views = []
        self.img_items = []
        self.mask_items = []
        self.boundary_items = []
        for _ in range(2):  # left candidates / right accepted
            glw = pg.GraphicsLayoutWidget()
            vb = glw.addViewBox(lockAspect=True)
            img = pg.ImageItem(axisOrder="row-major")
            mask = pg.ImageItem(axisOrder="row-major")
            bnd = pg.ScatterPlotItem(size=2, pen=None,
                                     brush=pg.mkBrush(255, 255, 0, 220))
            vb.addItem(img)
            vb.addItem(mask)
            vb.addItem(bnd)
            row.addWidget(glw)
            self.views.append(vb)
            self.img_items.append(img)
            self.mask_items.append(mask)
            self.boundary_items.append(bnd)
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
        # synchronized dual-view zoom/pan + right-click reset (reference
        # annotation_viewer_3d.py:424-436)
        self.views[1].setXLink(self.views[0])
        self.views[1].setYLink(self.views[0])
        for vb in self.views:
            vb.setMenuEnabled(False)
            vb.mouseClickEvent = self._view_clicked

    def _view_clicked(self, ev):
        if ev.button() == QtCore.Qt.RightButton:
            self.reset_view()
            ev.accept()

    def reset_view(self):
        for vb in self.views:
            vb.autoRange()

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
        for bnd in self.boundary_items:
            bnd.setVisible(False)
        if self.highlight.current:
            # boundary is per-slice: invalidate the cache when z moved
            # (reference _update_highlight_boundary recomputes on slice
            # change)
            if self._hl_slice != z:
                self.highlight.invalidate()
                self._hl_slice = z
            pts = self.highlight.boundary_of(lab, self.highlight.current)
            if pts is not None:
                pane = (1 if self.session.state_of(
                    self.run_id, self.highlight.current)
                    not in (None, "rejected") else 0)
                self.boundary_items[pane].setData(pts[:, 1], pts[:, 0])
                self.boundary_items[pane].setVisible(True)
        counts = self.session.class_counts(self.run_id)
        counts_txt = " ".join(f"{c}:{n}" for c, n in counts.items())
        self.status.setText(
            f"{self.run_id}  z={z}/{self.nav.n_slices - 1}  "
            f"class={self.selected_class}  {counts_txt}")

    def _clicked(self, ev):
        pos = ev.pos()
        label = self.session.pick(self.labels[self.nav.current],
                                  int(pos.y()), int(pos.x()))
        self.highlight.toggle(label)
        self._hl_slice = self.nav.current
        self._refresh()

    def _assign_highlight(self, cls):
        if self.highlight.current:
            self.session.assign(self.run_id, self.highlight.current, cls)
            self.highlight.clear()

    def keyPressEvent(self, ev):
        key = ev.key()
        if key == QtCore.Qt.Key_Z and ev.modifiers() & QtCore.Qt.ControlModifier:
            self.session.undo()
        elif key in (QtCore.Qt.Key_Left, QtCore.Qt.Key_Down):
            self.slider.setValue(self.nav.step(-1))
        elif key in (QtCore.Qt.Key_Right, QtCore.Qt.Key_Up):
            self.slider.setValue(self.nav.step(+1))
        elif key == QtCore.Qt.Key_Home:
            self.slider.setValue(self.nav.set(self.nav.n_slices // 2))
        elif key == QtCore.Qt.Key_R and self.highlight.current:
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
        elif key in (QtCore.Qt.Key_N, QtCore.Qt.Key_P) and self.highlight.current:
            # label-jump navigation (SliceNavigator.jump_to_label)
            z = self.nav.jump_to_label(
                self.labels, self.highlight.current,
                +1 if key == QtCore.Qt.Key_N else -1)
            if z is not None:
                self.slider.setValue(z)
        elif key == QtCore.Qt.Key_G:
            self._show_gallery()
        self._refresh()

    def _show_gallery(self):
        """Per-class crop gallery for the selected class (headless logic:
        annotation_session.class_gallery; reference per-class review
        galleries)."""
        from saber_tpu.gui.base.annotation_session import class_gallery
        items = class_gallery(self.session, self.run_id, self.volume,
                              self.labels, self.selected_class)
        dlg = QtWidgets.QDialog(self)
        dlg.setWindowTitle(f"class {self.selected_class} — "
                           f"{len(items)} masks")
        grid = QtWidgets.QGridLayout(dlg)
        for i, it in enumerate(items):
            glw = pg.GraphicsLayoutWidget()
            glw.setFixedSize(140, 140)
            vb = glw.addViewBox(lockAspect=True)
            img = pg.ImageItem(axisOrder="row-major")
            img.setImage(np.asarray(it["image"]), autoLevels=True)
            vb.addItem(img)
            cap = QtWidgets.QLabel(
                f"mask {it['label']}"
                + (f" z={it['z']}" if it["z"] is not None else ""))
            cell = QtWidgets.QVBoxLayout()
            cell.addWidget(glw)
            cell.addWidget(cap)
            w = QtWidgets.QWidget()
            w.setLayout(cell)
            if it["z"] is not None:   # click → jump the z-slider there
                w.mousePressEvent = (
                    lambda _e, z=it["z"]: self.slider.setValue(
                        self.nav.set(z)))
            grid.addWidget(w, i // 6, i % 6)
        dlg.exec_()
