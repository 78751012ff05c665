"""Qt multi-class picker (reference gui/base/multi_class_segmentation_picker.py).

Adds a class-button bar to the annotation viewers: one colored button per
class from the zarr's ``labels`` attrs, the active class drives
AnnotationSession.assign on click. Run navigation + save round-trips the
apply_labels JSON schema.
"""

import os

import numpy as np

try:  # pragma: no cover - optional dependency
    from PyQt5 import QtWidgets
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "PyQt5/pyqtgraph are required for the Qt GUI "
        "(pip install saber-tpu[gui])") from e

from saber_tpu.gui.base.annotation_session import TAB10, AnnotationSession
from saber_tpu.gui.base.annotation_viewer_3d import AnnotationSegmentationViewer3D
from saber_tpu.utils import zarrlite


class MultiClassSegmentationPicker(QtWidgets.QMainWindow):  # pragma: no cover
    """Per-class curation over every run in a candidate zarr."""

    def __init__(self, zarr_path: str):
        super().__init__()
        self.root = zarrlite.Group(zarr_path)
        self.runs = list(self.root.keys())
        self.run_idx = 0
        class_dict = dict(self.root.attrs.get("labels", {})) or {
            "1": "class 1", "2": "class 2"}
        self.session = AnnotationSession(
            class_dict,
            ann_path=os.path.splitext(zarr_path)[0] + "_annotations.json")
        self.selected_class = next(iter(class_dict))
        self._build_ui(class_dict)
        self._load_run()

    def _build_ui(self, class_dict):
        central = QtWidgets.QWidget()
        self.setCentralWidget(central)
        self.vbox = QtWidgets.QVBoxLayout(central)

        bar = QtWidgets.QHBoxLayout()
        for cls, name in class_dict.items():
            btn = QtWidgets.QPushButton(f"{cls}: {name}")
            color = TAB10[(int(cls) - 1) % len(TAB10)]
            btn.setStyleSheet(f"background-color: rgb({color[0]},"
                              f"{color[1]},{color[2]})")
            btn.clicked.connect(lambda _, c=cls: self._select_class(c))
            bar.addWidget(btn)
        for text, fn in (("prev run", lambda: self._step(-1)),
                         ("next run", lambda: self._step(1)),
                         ("undo", self._undo),
                         ("save", self._save)):
            btn = QtWidgets.QPushButton(text)
            btn.clicked.connect(fn)
            bar.addWidget(btn)
        self.vbox.addLayout(bar)
        self.viewer = None

    def _select_class(self, cls):
        self.selected_class = cls
        if self.viewer is not None:
            self.viewer.selected_class = cls

    def _load_run(self):
        run = self.runs[self.run_idx]
        grp = self.root[run]
        image = np.asarray(grp["0"])
        masks = np.asarray(grp["labels"]["0"]) if "labels" in grp else \
            np.zeros((1, *image.shape[-2:]), np.uint8)
        if self.viewer is not None:
            self.vbox.removeWidget(self.viewer)
            self.viewer.deleteLater()
        self.viewer = AnnotationSegmentationViewer3D(
            image, masks, self.session.class_dict, self.selected_class,
            self.session, run)
        self.vbox.addWidget(self.viewer)
        self.setWindowTitle(f"saber-tpu picker — {run} "
                            f"({self.run_idx + 1}/{len(self.runs)})")

    def _step(self, d):
        self.run_idx = (self.run_idx + d) % len(self.runs)
        self._load_run()

    def _undo(self):
        self.session.undo()
        if self.viewer is not None:
            self.viewer._refresh()

    def _save(self):
        path = self.session.save()
        self.statusBar().showMessage(f"saved → {path}", 3000)


def launch_multi_class_picker(zarr_path: str):  # pragma: no cover
    app = QtWidgets.QApplication.instance() or QtWidgets.QApplication([])
    win = MultiClassSegmentationPicker(zarr_path)
    win.show()
    app.exec_()
