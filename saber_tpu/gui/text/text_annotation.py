"""Qt widgets for the text-annotation GUI
(reference saber/gui/text/text_annotation.py:8-137).

Small composable panels the viewer window assembles: a run-level
description editor, a per-segmentation description editor that tracks
the current selection, a save/navigation control strip, and the hashtag
list. All state mutation is delegated to TextAnnotationController — the
widgets only surface text and clicks.
"""

try:  # pragma: no cover - optional dependency
    from PyQt5 import QtWidgets
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "PyQt5 is required for the Qt GUI "
        "(pip install saber-tpu[gui])") from e


class GlobalDescriptionWidget(QtWidgets.QWidget):  # pragma: no cover - Qt
    """Run-level notes editor (reference :8-37)."""

    def __init__(self):
        super().__init__()
        lay = QtWidgets.QVBoxLayout(self)
        lay.setContentsMargins(0, 0, 0, 0)
        lay.addWidget(QtWidgets.QLabel("run notes (#hashtags)"))
        self.editor = QtWidgets.QPlainTextEdit()
        self.editor.setPlaceholderText(
            "Describe the whole image; #hashtags become classes")
        lay.addWidget(self.editor)

    def get_text(self) -> str:
        return self.editor.toPlainText()

    def set_text(self, text: str) -> None:
        self.editor.blockSignals(True)
        self.editor.setPlainText(text)
        self.editor.blockSignals(False)


class SegmentationDescriptionWidget(QtWidgets.QWidget):  # pragma: no cover
    """Per-segmentation editor with a selection header (reference
    :39-92): disabled until a mask is selected."""

    def __init__(self):
        super().__init__()
        self._selected = None
        lay = QtWidgets.QVBoxLayout(self)
        lay.setContentsMargins(0, 0, 0, 0)
        self.header = QtWidgets.QLabel("no segmentation selected")
        lay.addWidget(self.header)
        self.editor = QtWidgets.QPlainTextEdit()
        self.editor.setEnabled(False)
        lay.addWidget(self.editor)

    def set_selected_segmentation(self, seg_id: int) -> None:
        self._selected = int(seg_id)
        self.header.setText(f"segmentation #{seg_id}")
        self.editor.setEnabled(True)

    def clear_selection(self) -> None:
        self._selected = None
        self.header.setText("no segmentation selected")
        self.set_text("")
        self.editor.setEnabled(False)

    def get_selected_id(self):
        return self._selected

    def get_text(self) -> str:
        return self.editor.toPlainText()

    def set_text(self, text: str) -> None:
        self.editor.blockSignals(True)
        self.editor.setPlainText(text)
        self.editor.blockSignals(False)


class ControlPanelWidget(QtWidgets.QWidget):  # pragma: no cover - Qt
    """Save + prev/next strip (reference :94-116)."""

    def __init__(self):
        super().__init__()
        lay = QtWidgets.QHBoxLayout(self)
        lay.setContentsMargins(0, 0, 0, 0)
        self.prev_button = QtWidgets.QPushButton("◀ prev")
        self.save_button = QtWidgets.QPushButton("save")
        self.next_button = QtWidgets.QPushButton("next ▶")
        for b in (self.prev_button, self.save_button, self.next_button):
            lay.addWidget(b)


class HashtagListWidget(QtWidgets.QWidget):  # pragma: no cover - Qt
    """Hashtag legend for the current run (reference :118-136)."""

    def __init__(self):
        super().__init__()
        lay = QtWidgets.QVBoxLayout(self)
        lay.setContentsMargins(0, 0, 0, 0)
        lay.addWidget(QtWidgets.QLabel("hashtags"))
        self.list_widget = QtWidgets.QListWidget()
        lay.addWidget(self.list_widget)

    def get_list_widget(self) -> QtWidgets.QListWidget:
        return self.list_widget

    def set_tags(self, tags, color_of=None) -> None:
        from PyQt5 import QtGui
        self.list_widget.clear()
        for t in tags:
            item = QtWidgets.QListWidgetItem(t)
            if color_of is not None:
                item.setForeground(QtGui.QColor(color_of(t)))
            self.list_widget.addItem(item)
