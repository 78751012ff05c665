"""Hashtag bookkeeping for the text-annotation GUI
(reference saber/gui/text/hashtag_manager.py:7-112).

Pure-Python (no Qt): extraction, per-run + per-segmentation tracking,
deterministic colors, and the save/load dict schema. The Qt viewer and
the web GUI both consume this.
"""

import re
from typing import Any, Dict, Set

_HASHTAG_RE = re.compile(r"#\w[\w-]*")

_COLORS = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
           "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf"]


class HashtagManager:
    def __init__(self):
        # {run: {"global": set, "segmentations": {seg_id: set}}}
        self.run_hashtags: Dict[str, Dict[str, Any]] = {}
        self._color_order: Dict[str, int] = {}

    @staticmethod
    def extract_hashtags(text: str) -> Set[str]:
        return set(_HASHTAG_RE.findall(text or ""))

    def get_hashtag_color(self, hashtag: str) -> str:
        if hashtag not in self._color_order:
            self._color_order[hashtag] = len(self._color_order)
        return _COLORS[self._color_order[hashtag] % len(_COLORS)]

    def _run(self, run_id: str) -> Dict[str, Any]:
        return self.run_hashtags.setdefault(
            run_id, {"global": set(), "segmentations": {}})

    def clear_run_hashtags(self, run_id: str) -> None:
        self.run_hashtags.pop(run_id, None)

    def add_hashtags_from_global(self, run_id: str, global_text: str) -> None:
        self._run(run_id)["global"] |= self.extract_hashtags(global_text)

    def add_hashtags_from_segmentation(self, run_id: str, seg_id,
                                       seg_text: str) -> None:
        segs = self._run(run_id)["segmentations"]
        segs[str(seg_id)] = (segs.get(str(seg_id), set())
                             | self.extract_hashtags(seg_text))

    def all_hashtags(self, run_id: str) -> Set[str]:
        r = self._run(run_id)
        out = set(r["global"])
        for tags in r["segmentations"].values():
            out |= tags
        return out

    def get_data_for_save(self) -> Dict[str, Any]:
        return {
            run: {"global": sorted(r["global"]),
                  "segmentations": {k: sorted(v)
                                    for k, v in r["segmentations"].items()}}
            for run, r in self.run_hashtags.items()}

    def load_data_from_save(self, data: Dict[str, Any]) -> None:
        self.run_hashtags = {
            run: {"global": set(r.get("global", [])),
                  "segmentations": {k: set(v) for k, v in
                                    r.get("segmentations", {}).items()}}
            for run, r in (data or {}).items()}
