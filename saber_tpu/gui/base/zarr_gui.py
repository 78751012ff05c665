"""Qt annotation GUI (reference saber/gui/base/zarr_gui.py:15-537).

Click-to-accept mask curation over a candidate zarr: dual-view picker
(candidates left, accepted right), per-class manager, undo stack,
annotations written to the same JSON schema as the web annotator
(consumed by classifier/preprocess/apply_labels.py). Requires PyQt5 +
pyqtgraph (optional extra; not present in this image — the module imports
lazily and the CLI gates on it, saber_tpu/gui/run.py).
"""

import json
import os

import numpy as np

try:
    import pyqtgraph as pg
    from PyQt5 import QtCore, QtWidgets
except ImportError as e:  # pragma: no cover - optional dependency
    raise ImportError(
        "PyQt5/pyqtgraph are required for the Qt GUI "
        "(pip install saber-tpu[gui])") from e

from saber_tpu.utils import zarrlite


class SegmentationPicker(QtWidgets.QMainWindow):  # pragma: no cover - Qt
    """Dual-view accept/reject picker (reference segmentation_picker.py)."""

    def __init__(self, zarr_path: str):
        super().__init__()
        self.zarr_path = zarr_path
        self.root = zarrlite.Group(zarr_path)
        self.runs = list(self.root.keys())
        self.ann_path = os.path.splitext(zarr_path)[0] + "_annotations.json"
        self.annotations = {}
        if os.path.exists(self.ann_path):
            self.annotations = json.load(open(self.ann_path))
        self.run_idx = 0
        self.current_class = 1
        self.undo_stack = []
        self._build_ui()
        self._load_run()

    def _build_ui(self):
        self.setWindowTitle("saber-tpu annotator")
        central = QtWidgets.QWidget()
        layout = QtWidgets.QHBoxLayout(central)
        self.left_view = pg.ImageView()
        self.right_view = pg.ImageView()
        layout.addWidget(self.left_view)
        layout.addWidget(self.right_view)
        side = QtWidgets.QVBoxLayout()
        self.class_spin = QtWidgets.QSpinBox()
        self.class_spin.setMinimum(1)
        self.class_spin.valueChanged.connect(
            lambda v: setattr(self, "current_class", v))
        side.addWidget(QtWidgets.QLabel("class"))
        side.addWidget(self.class_spin)
        for text, fn in [("next run", self._next_run),
                         ("prev run", self._prev_run),
                         ("undo", self._undo), ("save", self._save)]:
            b = QtWidgets.QPushButton(text)
            b.clicked.connect(fn)
            side.addWidget(b)
        self.counter = QtWidgets.QLabel()
        side.addWidget(self.counter)
        side.addStretch(1)
        layout.addLayout(side)
        self.setCentralWidget(central)
        self.left_view.getImageItem().mouseClickEvent = self._on_click

    def _load_run(self):
        run = self.runs[self.run_idx]
        grp = self.root[run]
        self.image = np.asarray(grp["0"])
        if self.image.ndim == 3:
            self.image = self.image[self.image.shape[0] // 2]
        stack = np.asarray(grp["labels"]["0"]) if "labels" in grp else \
            np.zeros((0, *self.image.shape), np.uint8)
        self.stack = stack if stack.ndim == 3 else stack[None]
        self.ann = self.annotations.setdefault(
            run, {"accepted": {}, "rejected": []})
        self._refresh()

    def _refresh(self):
        overlay = self.image.copy().astype(np.float32)
        self.left_view.setImage(overlay.T)
        accepted = np.zeros_like(self.image, np.float32)
        for cls, idxs in self.ann["accepted"].items():
            for i in idxs:
                accepted[self.stack[i] > 0] = int(cls)
        self.right_view.setImage(accepted.T)
        n_ann = len([r for r in self.annotations.values()
                     if r["accepted"] or r["rejected"]])
        self.counter.setText(
            f"run {self.run_idx + 1}/{len(self.runs)} — annotated {n_ann}")

    def _on_click(self, event):
        pos = event.pos()
        x, y = int(pos.x()), int(pos.y())
        for i in range(self.stack.shape[0]):
            if 0 <= y < self.stack.shape[1] and 0 <= x < self.stack.shape[2] \
                    and self.stack[i, y, x] > 0:
                cls = str(self.current_class)
                acc = self.ann["accepted"].setdefault(cls, [])
                if i not in acc:
                    acc.append(i)
                    self.undo_stack.append((cls, i))
                self._refresh()
                return

    def _undo(self):
        if self.undo_stack:
            cls, i = self.undo_stack.pop()
            if i in self.ann["accepted"].get(cls, []):
                self.ann["accepted"][cls].remove(i)
            self._refresh()

    def _next_run(self):
        self.run_idx = (self.run_idx + 1) % len(self.runs)
        self._load_run()

    def _prev_run(self):
        self.run_idx = (self.run_idx - 1) % len(self.runs)
        self._load_run()

    def _save(self):
        with open(self.ann_path, "w") as f:
            json.dump(self.annotations, f, indent=1)


def launch_gui(zarr_path: str):  # pragma: no cover - Qt event loop
    """Entry point (reference zarr_gui.py:531)."""
    app = QtWidgets.QApplication([])
    win = SegmentationPicker(zarr_path)
    win.resize(1400, 700)
    win.show()
    app.exec_()
