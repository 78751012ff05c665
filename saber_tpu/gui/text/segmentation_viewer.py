"""Qt text-annotation viewer (reference gui/text/segmentation_viewer.py).

Thin pyqtgraph shell: run list + image with label-map overlay + the
text_annotation.py widget panels. All state flows through
TextAnnotationController / TextAnnotationDataManager / HashtagManager /
CircleDrawTool (pure, tested modules).

Interactions (reference :379-500):
- left click on a mask: select it for description (boundary outline)
- right press + drag: size a circle draw preview; release commits the
  mask (reference LeftDrawViewBox -> _circle_drag_* protocol)
- 'a': toggle acceptance of the selected mask; accepted masks render at
  full opacity, others dimmed (reference set_accepted_indices)
"""

import numpy as np

try:  # pragma: no cover - optional dependency
    import pyqtgraph as pg
    from PyQt5 import QtCore, QtWidgets
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "PyQt5/pyqtgraph are required for the Qt GUI "
        "(pip install saber-tpu[gui])") from e

from saber_tpu.gui.base.annotation_session import (HighlightState,
                                                   build_palette_lut,
                                                   prepare_label_volume)
from saber_tpu.gui.text.annotation_controller import TextAnnotationController
from saber_tpu.gui.text.data_manager import TextAnnotationDataManager
from saber_tpu.gui.text.draw_tool import CircleDrawTool
from saber_tpu.gui.text.text_annotation import (ControlPanelWidget,
                                                GlobalDescriptionWidget,
                                                HashtagListWidget,
                                                SegmentationDescriptionWidget)


class TextSegmentationViewer(QtWidgets.QMainWindow):  # pragma: no cover
    def __init__(self, zarr_path: str):
        super().__init__()
        self.ctrl = TextAnnotationController(
            TextAnnotationDataManager(zarr_path))
        self.highlight = HighlightState()
        self.draw = None                    # CircleDrawTool, set per image
        self._build_ui()
        self._load(self.ctrl.current_run_id)

    def _build_ui(self):
        central = QtWidgets.QWidget()
        self.setCentralWidget(central)
        h = QtWidgets.QHBoxLayout(central)

        self.run_list = QtWidgets.QListWidget()
        self.run_list.addItems(self.ctrl.dm.run_ids)
        self.run_list.itemClicked.connect(
            lambda item: self._load(item.text()))
        h.addWidget(self.run_list, 1)

        mid = QtWidgets.QVBoxLayout()
        glw = pg.GraphicsLayoutWidget()
        self.vb = glw.addViewBox(lockAspect=True)
        self.img_item = pg.ImageItem(axisOrder="row-major")
        self.mask_item = pg.ImageItem(axisOrder="row-major")
        self.vb.addItem(self.img_item)
        self.vb.addItem(self.mask_item)
        self.boundary_item = pg.ScatterPlotItem(
            size=3, pen=None, brush=pg.mkBrush(255, 255, 255, 220))
        self.vb.addItem(self.boundary_item)
        # live circle-draw preview (reference _ensure_temp_circle_item)
        self.circle_item = QtWidgets.QGraphicsEllipseItem()
        self.circle_item.setPen(pg.mkPen((255, 255, 0), width=2))
        self.circle_item.setVisible(False)
        self.vb.addItem(self.circle_item)
        self.mask_item.mouseClickEvent = self._clicked
        self.mask_item.mouseDragEvent = self._dragged
        mid.addWidget(glw)
        h.addLayout(mid, 3)

        right = QtWidgets.QVBoxLayout()
        self.global_panel = GlobalDescriptionWidget()
        self.global_panel.editor.textChanged.connect(
            lambda: self.ctrl.on_text_changed(
                global_text=self.global_panel.get_text()))
        right.addWidget(self.global_panel, 2)
        self.seg_panel = SegmentationDescriptionWidget()
        self.seg_panel.editor.textChanged.connect(
            lambda: self.ctrl.on_text_changed(
                seg_text=self.seg_panel.get_text()))
        right.addWidget(self.seg_panel, 2)
        self.tag_panel = HashtagListWidget()
        right.addWidget(self.tag_panel, 1)
        self.controls = ControlPanelWidget()
        self.controls.prev_button.clicked.connect(lambda: self._step(-1))
        self.controls.next_button.clicked.connect(lambda: self._step(+1))
        self.controls.save_button.clicked.connect(self._save)
        right.addWidget(self.controls)
        h.addLayout(right, 2)

    # -- data flow -----------------------------------------------------------

    def _load(self, run_id: str):
        self._apply(self.ctrl.on_image_selected(run_id))

    def _step(self, delta: int):
        self._apply(self.ctrl.step_run(delta))
        self.run_list.setCurrentRow(self.ctrl.run_idx)

    def _apply(self, state):
        run_id = state["run_id"]
        if self.ctrl.dm.is_volume_run(run_id):
            # z-aligned label VOLUME (3D run): seg ids are label values;
            # mid-slice with the image. The 2D circle draw tool has no
            # z-location here, so drawing is disabled for these runs.
            image, vol = self.ctrl.dm.read_data(run_id)
            labels, self.max_label = prepare_label_volume(vol)
            self.labels = np.asarray(labels[labels.shape[0] // 2])
            self.draw = None
        else:
            # per-candidate stack (+ session/saved drawn masks): force
            # the binary-stack branch (>0) so id-valued uint8/uint16
            # planes from masks_to_array map to their 1-based STACK
            # position, not their stored values
            image, masks, _ = self.ctrl.dm.read_augmented_data(run_id)
            masks = np.asarray(masks)
            if masks.ndim == 2:
                masks = masks[None]
            lab, _ = prepare_label_volume(masks > 0)
            self.labels = np.asarray(lab)
            self.max_label = masks.shape[0]
            self.draw = CircleDrawTool(self.labels.shape)
        image = np.asarray(image)
        if image.ndim == 3:
            image = image[image.shape[0] // 2]
        self.highlight = HighlightState()
        self.img_item.setImage(np.asarray(image), autoLevels=True)
        self._refresh_overlay()
        self.boundary_item.setVisible(False)
        self.global_panel.set_text(state["global_text"])
        self.seg_panel.clear_selection()
        self._refresh_tags(state["hashtags"])

    def _refresh_tags(self, tags):
        self.tag_panel.set_tags(sorted(tags),
                                color_of=self.ctrl.hm.get_hashtag_color)

    def _refresh_overlay(self):
        """Palette LUT with described masks recolored by their first
        hashtag (reference update_mask_colors); accepted masks full
        alpha, others dimmed (reference set_accepted_indices)."""
        lut = build_palette_lut(self.max_label)
        for seg_id, hex_color in self.ctrl.seg_color_mapping().items():
            if 0 < seg_id <= self.max_label:
                r, g, b = (int(hex_color[i:i + 2], 16) for i in (1, 3, 5))
                lut[seg_id] = (r, g, b, 140)
        accepted = set(self.ctrl.accepted_for())
        if accepted:
            for seg_id in range(1, self.max_label + 1):
                lut[seg_id, 3] = 230 if seg_id in accepted else 70
        self.mask_item.setImage(self.labels, autoLevels=False, lut=lut,
                                levels=(0, self.max_label))

    # -- interactions --------------------------------------------------------

    def _clicked(self, ev):
        # selection is left-click only; an aborted right-button draw
        # (press+release without movement) must not change the selection
        if hasattr(ev, "button") and ev.button() != QtCore.Qt.LeftButton:
            return
        pos = ev.pos()
        y, x = int(pos.y()), int(pos.x())
        if not (0 <= y < self.labels.shape[0]
                and 0 <= x < self.labels.shape[1]):
            return
        seg = int(self.labels[y, x])
        if seg > 0:
            text = self.ctrl.select_segmentation(seg)
            self.seg_panel.set_selected_segmentation(seg)
            self.seg_panel.set_text(text)
            self.highlight.toggle(seg)
            self._refresh_boundary()
        else:
            self.ctrl.select_segmentation(None)
            self.seg_panel.clear_selection()
            self.highlight.clear()
            self.boundary_item.setVisible(False)

    def _dragged(self, ev):
        """Right-drag sizes the circle draw tool (reference
        LeftDrawViewBox press/drag/release -> CircleDrawTool)."""
        if self.draw is None or ev.button() != QtCore.Qt.RightButton:
            ev.ignore()
            return
        ev.accept()
        pos = ev.pos()
        if ev.isStart():
            self.draw.start(float(pos.y()), float(pos.x()))
            return
        geom = self.draw.update(float(pos.y()), float(pos.x())) \
            if not ev.isFinish() else None
        if geom is not None:
            cy, cx, r = geom
            self.circle_item.setRect(QtCore.QRectF(cx - r, cy - r,
                                                   2 * r, 2 * r))
            self.circle_item.setVisible(True)
            return
        if ev.isFinish():
            self.circle_item.setVisible(False)
            mask = self.draw.finish(float(pos.y()), float(pos.x()))
            if mask is not None:
                self._commit_drawn(mask)

    def _commit_drawn(self, mask: np.ndarray):
        seg_id = self.ctrl.add_drawn_mask(mask)
        self.labels = np.where(mask & (self.labels == 0), seg_id,
                               self.labels)
        self.max_label = max(self.max_label, seg_id)
        self.highlight.invalidate()
        self.seg_panel.set_selected_segmentation(seg_id)
        self.seg_panel.set_text("")
        self._refresh_overlay()

    def _refresh_boundary(self):
        label = self.highlight.current
        pts = (self.highlight.boundary_of(self.labels, label)
               if label else None)
        if pts is None:
            self.boundary_item.setVisible(False)
        else:
            self.boundary_item.setData(pts[:, 1], pts[:, 0])
            self.boundary_item.setVisible(True)

    def keyPressEvent(self, event):
        key = event.text().lower()
        if key == "a" and self.seg_panel.get_selected_id() is not None:
            self.ctrl.toggle_accept(self.seg_panel.get_selected_id())
            self._refresh_overlay()
        elif key == "n":
            self._step(+1)
        elif key == "p":
            self._step(-1)
        elif key == "s":
            self._save()
        else:
            super().keyPressEvent(event)

    def _save(self):
        path = self.ctrl.save_current_run_data()
        self.statusBar().showMessage(f"saved → {path}", 3000)
        self._refresh_tags(
            self.ctrl.hm.all_hashtags(self.ctrl.current_run_id))
        self._refresh_overlay()


def launch_text_viewer(zarr_path: str):  # pragma: no cover
    app = QtWidgets.QApplication.instance() or QtWidgets.QApplication([])
    win = TextSegmentationViewer(zarr_path)
    win.show()
    app.exec_()
