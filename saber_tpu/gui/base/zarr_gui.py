"""Qt annotation GUI (reference saber/gui/base/zarr_gui.py:15-537).

Full curation workbench over a candidate zarr: run-list panel, dual-view
annotation viewer (candidates left, accepted-by-class right, boundary
highlight), class-manager panel (add/remove classes, TAB10 colors,
per-class counters), rotation toggle, JSON import/export, keyboard
navigation, and an annotation progress counter. Decision logic lives in
annotation_session.py (AnnotationSession / ClassManager / HighlightState
— tested headlessly); this module is the Qt shell. Annotations use the
same JSON schema the web annotator writes (consumed by
classifier/preprocess/apply_labels.py). Requires PyQt5 + pyqtgraph
(optional extra; the CLI gates on it, saber_tpu/gui/run.py).
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

from saber_tpu.gui.base.annotation_session import (AnnotationSession,
                                                   ClassManager)
from saber_tpu.gui.base.annotation_viewer import AnnotationViewer
from saber_tpu.utils import zarrlite


class ClassManagerWidget(QtWidgets.QWidget):  # pragma: no cover - Qt
    """Side panel over the ClassManager model (reference zarr_gui.py:22-150)."""

    class_changed = QtCore.pyqtSignal()

    def __init__(self, model: ClassManager, parent=None):
        super().__init__(parent)
        self.model = model
        layout = QtWidgets.QVBoxLayout(self)
        layout.addWidget(QtWidgets.QLabel("<b>Classes</b>"))

        add_row = QtWidgets.QHBoxLayout()
        self.class_input = QtWidgets.QLineEdit(placeholderText="new class")
        add_btn = QtWidgets.QPushButton("add")
        add_btn.clicked.connect(self._add)
        self.class_input.returnPressed.connect(self._add)
        add_row.addWidget(self.class_input)
        add_row.addWidget(add_btn)
        layout.addLayout(add_row)

        self.class_list = QtWidgets.QListWidget()
        self.class_list.itemClicked.connect(
            lambda item: (self.model.select(item.data(QtCore.Qt.UserRole)),
                          self.class_changed.emit()))
        layout.addWidget(self.class_list)

        remove_btn = QtWidgets.QPushButton("remove selected")
        remove_btn.clicked.connect(self._remove)
        layout.addWidget(remove_btn)
        self.counter = QtWidgets.QLabel()
        layout.addWidget(self.counter)
        layout.addStretch(1)
        self.refresh()

    def _add(self):
        if self.model.add(self.class_input.text()):
            self.class_input.clear()
            self.refresh()
            self.class_changed.emit()

    def _remove(self):
        item = self.class_list.currentItem()
        if item and self.model.remove(item.data(QtCore.Qt.UserRole)):
            self.refresh()
            self.class_changed.emit()

    def refresh(self, counts=None):
        self.class_list.clear()
        for name, info in self.model.classes.items():
            n = (counts or {}).get(str(info["id"]), 0)
            item = QtWidgets.QListWidgetItem(f"{name} ({n})")
            item.setData(QtCore.Qt.UserRole, name)
            r, g, b = info["color"]
            item.setForeground(pg.mkColor(r, g, b))
            if name == self.model.selected:
                item.setSelected(True)
            self.class_list.addItem(item)


class SegmentationPicker(QtWidgets.QMainWindow):  # pragma: no cover - Qt
    """Curation workbench (reference zarr_gui.py ZarrSegmentationGUI)."""

    def __init__(self, zarr_path: str):
        super().__init__()
        self.zarr_path = zarr_path
        self.root = zarrlite.Group(zarr_path)
        self.runs = list(self.root.keys())
        self.ann_path = os.path.splitext(zarr_path)[0] + "_annotations.json"
        self.session = AnnotationSession(ann_path=self.ann_path)
        self.classes = ClassManager()
        self.run_idx = 0
        self.rotation = 0          # 0/1/2/3 quarter turns (rotate button)
        self._cache = {}           # run_id -> (image, masks) prefetch cache
        self._build_ui()
        self._load_run()

    # -- UI -----------------------------------------------------------------

    def _build_ui(self):
        self.setWindowTitle("saber-tpu annotator")
        splitter = QtWidgets.QSplitter()

        # left: run list
        left = QtWidgets.QWidget()
        ll = QtWidgets.QVBoxLayout(left)
        ll.addWidget(QtWidgets.QLabel("<b>Runs</b>"))
        self.run_list = QtWidgets.QListWidget()
        for r in self.runs:
            self.run_list.addItem(r)
        self.run_list.currentRowChanged.connect(self._on_run_selected)
        ll.addWidget(self.run_list)
        self.counter = QtWidgets.QLabel()
        ll.addWidget(self.counter)
        splitter.addWidget(left)

        # middle: viewer + actions
        mid = QtWidgets.QWidget()
        ml = QtWidgets.QVBoxLayout(mid)
        self.viewer_holder = QtWidgets.QVBoxLayout()
        ml.addLayout(self.viewer_holder, stretch=1)
        btns = QtWidgets.QHBoxLayout()
        for text, fn in [("prev (p)", self._prev_run),
                         ("next (n)", self._next_run),
                         ("rotate", self._rotate),
                         ("undo (ctrl-z)", self._undo),
                         ("import", self._import),
                         ("export", self._export),
                         ("save (ctrl-s)", self._save)]:
            b = QtWidgets.QPushButton(text)
            b.clicked.connect(fn)
            btns.addWidget(b)
        ml.addLayout(btns)
        splitter.addWidget(mid)

        # right: class manager
        self.class_widget = ClassManagerWidget(self.classes)
        self.class_widget.class_changed.connect(self._on_class_changed)
        splitter.addWidget(self.class_widget)
        splitter.setStretchFactor(1, 1)
        self.setCentralWidget(splitter)
        self.viewer = None

        menu = self.menuBar().addMenu("&File")
        for text, fn, key in [("Save", self._save, "Ctrl+S"),
                              ("Export annotations", self._export, None),
                              ("Import annotations", self._import, None)]:
            act = menu.addAction(text)
            act.triggered.connect(fn)
            if key:
                act.setShortcut(key)
        self.statusBar().showMessage(
            "click mask = highlight · a/1-9 = assign · r = reject · "
            "x = clear · n/p = next/prev run")

    # -- data ---------------------------------------------------------------

    def _read_run(self, run):
        if run not in self._cache:
            grp = self.root[run]
            image = np.asarray(grp["0"])
            if image.ndim == 3:
                image = image[image.shape[0] // 2]
            stack = np.asarray(grp["labels"]["0"]) if "labels" in grp else \
                np.zeros((0, *image.shape), np.uint8)
            self._cache[run] = (image, stack if stack.ndim == 3 else stack[None])
            if len(self._cache) > 8:             # bounded prefetch cache
                self._cache.pop(next(iter(self._cache)))
        return self._cache[run]

    def _load_run(self):
        run = self.runs[self.run_idx]
        image, stack = self._read_run(run)
        if self.rotation:
            image = np.rot90(image, self.rotation)
            stack = np.rot90(stack, self.rotation, axes=(1, 2))
        if self.viewer is not None:
            self.viewer.setParent(None)
        self.viewer = AnnotationViewer(
            image, stack, self.classes.as_dict(), self.classes.id_of(),
            self.session, run)
        self.viewer_holder.addWidget(self.viewer)
        self.run_list.blockSignals(True)
        self.run_list.setCurrentRow(self.run_idx)
        self.run_list.blockSignals(False)
        self._refresh_counters()
        # prefetch the next run's arrays so navigation stays snappy
        # (reference zarr_gui prefetch thread)
        if self.run_idx + 1 < len(self.runs):
            self._read_run(self.runs[self.run_idx + 1])

    def _refresh_counters(self):
        prog = self.session.progress(self.runs)
        self.counter.setText(
            f"run {self.run_idx + 1}/{len(self.runs)} — "
            f"annotated {prog['runs_annotated']}")
        run = self.runs[self.run_idx]
        self.class_widget.refresh(self.session.class_counts(run))

    # -- actions --------------------------------------------------------------

    def _on_run_selected(self, row):
        if 0 <= row < len(self.runs):
            self.run_idx = row
            self._load_run()

    def _on_class_changed(self):
        if self.viewer is not None:
            self.viewer.selected_class = self.classes.id_of()
        self._refresh_counters()

    def _rotate(self):
        self.rotation = (self.rotation + 1) % 4
        self._load_run()

    def _next_run(self):
        self.run_idx = (self.run_idx + 1) % len(self.runs)
        self._load_run()

    def _prev_run(self):
        self.run_idx = (self.run_idx - 1) % len(self.runs)
        self._load_run()

    def _undo(self):
        self.session.undo()
        if self.viewer is not None:
            self.viewer._refresh()
        self._refresh_counters()

    def _save(self):
        self.session.save(self.ann_path)
        self.statusBar().showMessage(f"saved {self.ann_path}", 3000)

    def _export(self):
        path, _ = QtWidgets.QFileDialog.getSaveFileName(
            self, "Export annotations", self.ann_path, "JSON (*.json)")
        if path:
            self.session.save(path)

    def _import(self):
        path, _ = QtWidgets.QFileDialog.getOpenFileName(
            self, "Import annotations", "", "JSON (*.json)")
        if path:
            with open(path) as f:
                self.session.annotations.update(json.load(f))
            self._load_run()

    def keyPressEvent(self, ev):
        if ev.key() == QtCore.Qt.Key_N:
            self._next_run()
        elif ev.key() == QtCore.Qt.Key_P:
            self._prev_run()
        elif (ev.key() == QtCore.Qt.Key_S
              and ev.modifiers() & QtCore.Qt.ControlModifier):
            self._save()
        elif (ev.key() == QtCore.Qt.Key_Z
              and ev.modifiers() & QtCore.Qt.ControlModifier):
            self._undo()
        elif self.viewer is not None:
            self.viewer.keyPressEvent(ev)
            self._refresh_counters()

    def closeEvent(self, ev):  # auto-save on exit (reference menu action)
        try:
            self.session.save(self.ann_path)
        except Exception:
            pass
        ev.accept()


def launch_gui(zarr_path: str):  # pragma: no cover - Qt event loop
    """Entry point (reference zarr_gui.py:531)."""
    app = QtWidgets.QApplication([])
    win = SegmentationPicker(zarr_path)
    win.resize(1600, 800)
    win.show()
    app.exec_()
