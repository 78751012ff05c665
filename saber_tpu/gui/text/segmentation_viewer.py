"""Qt text-annotation viewer (reference gui/text/segmentation_viewer.py).

Thin pyqtgraph shell: run list + image with label-map overlay + global
text box + per-segmentation text box + hashtag list. All state flows
through TextAnnotationController / TextAnnotationDataManager /
HashtagManager (pure, tested modules).
"""

import numpy as np

try:  # pragma: no cover - optional dependency
    import pyqtgraph as pg
    from PyQt5 import QtWidgets
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "PyQt5/pyqtgraph are required for the Qt GUI "
        "(pip install saber-tpu[gui])") from e

from saber_tpu.gui.base.annotation_session import (build_palette_lut,
                                                   prepare_label_volume)
from saber_tpu.gui.text.annotation_controller import TextAnnotationController
from saber_tpu.gui.text.data_manager import TextAnnotationDataManager


class TextSegmentationViewer(QtWidgets.QMainWindow):  # pragma: no cover
    def __init__(self, zarr_path: str):
        super().__init__()
        self.ctrl = TextAnnotationController(
            TextAnnotationDataManager(zarr_path))
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
        vb = glw.addViewBox(lockAspect=True)
        self.img_item = pg.ImageItem(axisOrder="row-major")
        self.mask_item = pg.ImageItem(axisOrder="row-major")
        vb.addItem(self.img_item)
        vb.addItem(self.mask_item)
        self.mask_item.mouseClickEvent = self._clicked
        mid.addWidget(glw)
        h.addLayout(mid, 3)

        right = QtWidgets.QVBoxLayout()
        right.addWidget(QtWidgets.QLabel("run notes (#hashtags)"))
        self.global_text = QtWidgets.QPlainTextEdit()
        self.global_text.textChanged.connect(
            lambda: self.ctrl.on_text_changed(
                global_text=self.global_text.toPlainText()))
        right.addWidget(self.global_text)
        right.addWidget(QtWidgets.QLabel("selected segmentation"))
        self.seg_text = QtWidgets.QPlainTextEdit()
        self.seg_text.textChanged.connect(
            lambda: self.ctrl.on_text_changed(
                seg_text=self.seg_text.toPlainText()))
        right.addWidget(self.seg_text)
        self.tag_list = QtWidgets.QListWidget()
        right.addWidget(self.tag_list)
        save = QtWidgets.QPushButton("save")
        save.clicked.connect(self._save)
        right.addWidget(save)
        h.addLayout(right, 2)

    def _load(self, run_id: str):
        state = self.ctrl.on_image_selected(run_id)
        # session fallback keeps unsaved drawn masks visible across run
        # switches (reference read_with_session_fallback)
        image, masks = self.ctrl.dm.read_with_session_fallback(run_id)
        if image.ndim == 3:
            image = image[image.shape[0] // 2]
        self.labels, self.max_label = prepare_label_volume(masks)
        if self.labels.ndim == 3:
            self.labels = self.labels[self.labels.shape[0] // 2]
        self.img_item.setImage(np.asarray(image), autoLevels=True)
        self._refresh_overlay()
        self.global_text.setPlainText(state["global_text"])
        self.tag_list.clear()
        self.tag_list.addItems(state["hashtags"])

    def _refresh_overlay(self):
        """Palette LUT with described masks recolored by their first
        hashtag (reference update_mask_colors)."""
        lut = build_palette_lut(self.max_label)
        for seg_id, hex_color in self.ctrl.seg_color_mapping().items():
            if 0 < seg_id <= self.max_label:
                r, g, b = (int(hex_color[i:i + 2], 16) for i in (1, 3, 5))
                lut[seg_id] = (r, g, b, 140)
        self.mask_item.setImage(self.labels, autoLevels=False, lut=lut,
                                levels=(0, self.max_label))

    def _clicked(self, ev):
        # right-click starts the circle draw tool; left selects
        if hasattr(ev, "button") and ev.button() == 2:
            self._draw_at(ev.pos())
            return
        pos = ev.pos()
        y, x = int(pos.y()), int(pos.x())
        if 0 <= y < self.labels.shape[0] and 0 <= x < self.labels.shape[1]:
            seg = int(self.labels[y, x])
            if seg > 0:
                text = self.ctrl.select_segmentation(seg)
                self.seg_text.setPlainText(text)

    def _draw_at(self, pos, radius: float = 12.0):
        """Draw-tool: append a circular mask at the click position
        (reference circle-drag tool; fixed radius here, resizable via
        repeated application)."""
        from saber_tpu.gui.text.data_manager import circle_mask
        m = circle_mask(self.labels.shape, float(pos.y()), float(pos.x()),
                        radius)
        seg_id = self.ctrl.add_drawn_mask(m)
        self.labels = np.where(m & (self.labels == 0), seg_id, self.labels)
        self.max_label = max(self.max_label, seg_id)
        self.seg_text.setPlainText("")
        self._refresh_overlay()

    def _save(self):
        path = self.ctrl.save_current_run_data()
        self.statusBar().showMessage(f"saved → {path}", 3000)
        self.tag_list.clear()
        self.tag_list.addItems(
            sorted(self.ctrl.hm.all_hashtags(self.ctrl.current_run_id)))
        self._refresh_overlay()


def launch_text_viewer(zarr_path: str):  # pragma: no cover
    app = QtWidgets.QApplication.instance() or QtWidgets.QApplication([])
    win = TextSegmentationViewer(zarr_path)
    win.show()
    app.exec_()
