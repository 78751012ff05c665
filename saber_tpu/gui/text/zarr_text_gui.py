"""Qt free-text/hashtag annotation GUI
(reference saber/gui/text/zarr_text_gui.py:25-240 + segmentation_viewer,
data_manager, annotation_controller, hashtag_manager modules).

Per-segmentation notes and #hashtags for text/VLM-style supervision.
Persists to the same ``*_text_annotations.json`` sidecar as the web
annotator's /api/annotate_text endpoint, so both frontends interoperate.
Requires PyQt5 + pyqtgraph (optional extra)."""

import json
import os

import numpy as np

try:
    import pyqtgraph as pg
    from PyQt5 import QtWidgets
except ImportError as e:  # pragma: no cover - optional dependency
    raise ImportError(
        "PyQt5/pyqtgraph are required for the Qt text GUI "
        "(pip install saber-tpu[gui]); use `saber web` instead") from e

from saber_tpu.utils import zarrlite


class TextAnnotator(QtWidgets.QMainWindow):  # pragma: no cover - Qt
    def __init__(self, zarr_path: str):
        super().__init__()
        self.root = zarrlite.Group(zarr_path)
        self.runs = list(self.root.keys())
        self.text_path = os.path.splitext(zarr_path)[0] + "_text_annotations.json"
        self.ann = {}
        if os.path.exists(self.text_path):
            self.ann = json.load(open(self.text_path))
        # (run, idx) pairs edited this session — only these merge into
        # the file on save, so entries the web GUI or the rich manager
        # wrote meanwhile are never clobbered by our init-time snapshot
        self.dirty = set()
        self.run_idx = 0
        self.seg_idx = 0
        self._build_ui()
        self._load()

    def _build_ui(self):
        self.setWindowTitle("saber-tpu text annotator")
        central = QtWidgets.QWidget()
        layout = QtWidgets.QHBoxLayout(central)
        self.view = pg.ImageView()
        layout.addWidget(self.view, stretch=3)
        side = QtWidgets.QVBoxLayout()
        self.info = QtWidgets.QLabel()
        side.addWidget(self.info)
        self.text_edit = QtWidgets.QPlainTextEdit()
        side.addWidget(self.text_edit)
        self.tag_label = QtWidgets.QLabel()
        side.addWidget(self.tag_label)
        for label, fn in [("prev seg", lambda: self._step(-1)),
                          ("next seg", lambda: self._step(1)),
                          ("next run", self._next_run),
                          ("save", self._save)]:
            b = QtWidgets.QPushButton(label)
            b.clicked.connect(fn)
            side.addWidget(b)
        side.addStretch(1)
        layout.addLayout(side, stretch=1)
        self.setCentralWidget(central)

    def _current_stack(self):
        grp = self.root[self.runs[self.run_idx]]
        stack = np.asarray(grp["labels"]["0"]) if "labels" in grp else \
            np.zeros((0, 4, 4), np.uint8)
        return np.asarray(grp["0"]), (stack if stack.ndim == 3 else stack[None])

    def _load(self):
        img, stack = self._current_stack()
        if img.ndim == 3:
            img = img[img.shape[0] // 2]
        overlay = img.astype(np.float32).copy()
        if self.seg_idx < stack.shape[0]:
            overlay[stack[self.seg_idx] > 0] = overlay.max()
        self.view.setImage(overlay.T)
        run = self.runs[self.run_idx]
        self.info.setText(f"{run} — segmentation {self.seg_idx + 1}/{stack.shape[0]}")
        entry = self.ann.get(run, {}).get(str(self.seg_idx), {})
        self.text_edit.setPlainText(entry.get("text", ""))
        self.tag_label.setText(" ".join(entry.get("hashtags", [])))

    def _commit_current(self):
        run = self.runs[self.run_idx]
        text = self.text_edit.toPlainText()
        from saber_tpu.gui.text.hashtag_manager import HashtagManager
        tags = sorted(HashtagManager.extract_hashtags(text))
        if text.strip():
            idx = str(self.seg_idx)
            prev = self.ann.get(run, {}).get(idx)
            entry = {"text": text, "hashtags": tags}
            if prev != entry:
                self.ann.setdefault(run, {})[idx] = entry
                self.dirty.add((run, idx))

    def _step(self, d):
        self._commit_current()
        _, stack = self._current_stack()
        self.seg_idx = int(np.clip(self.seg_idx + d, 0, max(stack.shape[0] - 1, 0)))
        self._load()

    def _next_run(self):
        self._commit_current()
        self.run_idx = (self.run_idx + 1) % len(self.runs)
        self.seg_idx = 0
        self._load()

    def _save(self):
        self._commit_current()
        # merge this session's edits into the CURRENT file contents
        payload = {}
        if os.path.exists(self.text_path):
            payload = json.load(open(self.text_path))
        for run, idx in sorted(self.dirty):
            payload.setdefault(run, {})[idx] = self.ann[run][idx]
        self.dirty.clear()
        with open(self.text_path, "w") as f:
            json.dump(payload, f, indent=1)


def launch_text_gui(zarr_path: str):  # pragma: no cover - Qt event loop
    app = QtWidgets.QApplication([])
    win = TextAnnotator(zarr_path)
    win.resize(1200, 700)
    win.show()
    app.exec_()
