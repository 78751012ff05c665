"""Text-annotation session controller
(reference saber/gui/text/annotation_controller.py:15-310).

Pure-Python state machine between the data manager, hashtag manager, and
whatever view is attached (the Qt viewer or the web GUI): current run,
selected segmentation, text commit/restore, accepted-mask tracking.
"""

from typing import Any, Dict, List, Optional

from saber_tpu.gui.text.data_manager import TextAnnotationDataManager
from saber_tpu.gui.text.hashtag_manager import HashtagManager


class TextAnnotationController:
    def __init__(self, data_manager: TextAnnotationDataManager,
                 hashtag_manager: Optional[HashtagManager] = None):
        self.dm = data_manager
        self.hm = hashtag_manager or HashtagManager()
        self.dm.load_saved(self.hm)
        self.run_idx = 0
        self.selected_segmentation: Optional[int] = None
        self.accepted_masks: Dict[str, List[int]] = {}
        # seed pending state from persisted data so an immediate run switch
        # or save does not clobber loaded annotations with empties
        self._pending_global = self.dm.get_global_text(self.current_run_id)
        self._pending_seg = ""

    # -- run navigation -----------------------------------------------------

    @property
    def current_run_id(self) -> str:
        return self.dm.run_ids[self.run_idx]

    def on_image_selected(self, run_id: str) -> Dict[str, Any]:
        """Switch run: commit the previous one, load the next one's state
        (reference :64-131)."""
        self.save_current_run_data()
        self.run_idx = self.dm.run_ids.index(run_id)
        self.selected_segmentation = None
        self._pending_global = self.dm.get_global_text(run_id)
        self._pending_seg = ""
        self.dm.load_run_annotations(run_id, self.hm)
        return {
            "run_id": run_id,
            "global_text": self._pending_global,
            "segmentations": dict(
                self.dm._run(run_id)["segmentations"]),
            "hashtags": sorted(self.hm.all_hashtags(run_id)),
        }

    def step_run(self, delta: int) -> Dict[str, Any]:
        idx = (self.run_idx + delta) % len(self.dm.run_ids)
        return self.on_image_selected(self.dm.run_ids[idx])

    # -- selection / text edits ----------------------------------------------

    def select_segmentation(self, seg_id: Optional[int]) -> str:
        """Commit text for the previous selection, return the stored text
        for the new one (reference :239-299)."""
        self._commit_pending()
        self.selected_segmentation = seg_id
        self._pending_seg = (
            self.dm.get_segmentation_text(self.current_run_id, seg_id)
            if seg_id is not None else "")
        return self._pending_seg

    def on_text_changed(self, global_text: Optional[str] = None,
                        seg_text: Optional[str] = None) -> None:
        if global_text is not None:
            self._pending_global = global_text
        if seg_text is not None:
            self._pending_seg = seg_text

    def add_drawn_mask(self, mask) -> int:
        """Append a user-drawn mask to the current run's stack and select
        it for description (reference on_mask_added: a drawn mask is
        immediately the editing target)."""
        seg_id = self.dm.add_user_mask(self.current_run_id, mask)
        self.select_segmentation(seg_id)
        return seg_id

    def seg_color_mapping(self, run_id: Optional[str] = None
                          ) -> Dict[int, str]:
        """{seg_id: hex color} — each described segmentation takes the
        color of its first hashtag, so masks sharing a tag share a color
        (reference update_colors_for_run / update_mask_colors)."""
        run = run_id or self.current_run_id
        self._commit_pending()
        self.dm.load_run_annotations(run, self.hm)
        segs = self.hm.run_hashtags.get(run, {}).get("segmentations", {})
        out: Dict[int, str] = {}
        for seg_id, tags in segs.items():
            if tags:
                out[int(seg_id)] = self.hm.get_hashtag_color(sorted(tags)[0])
        return out

    def _accepted(self, run_id: str) -> List[int]:
        """Seed-once acceptance list for a run (from the saved sidecar)."""
        if run_id not in self.accepted_masks:
            self.accepted_masks[run_id] = self.dm.saved_accepted_ids(run_id)
        return self.accepted_masks[run_id]

    def accept_mask(self, seg_id: int) -> None:
        """Track an accepted mask for the run (reference :176-201)."""
        accepted = self._accepted(self.current_run_id)
        if seg_id not in accepted:
            accepted.append(seg_id)

    def toggle_accept(self, seg_id: int) -> bool:
        """Flip acceptance for a mask; returns the new state (reference
        keyPressEvent 'a' on the selected segmentation)."""
        accepted = self._accepted(self.current_run_id)
        if seg_id in accepted:
            accepted.remove(seg_id)
            return False
        accepted.append(seg_id)
        return True

    def accepted_for(self, run_id: Optional[str] = None) -> List[int]:
        return list(self._accepted(run_id or self.current_run_id))

    def _commit_pending(self) -> None:
        self.dm.save_text_to_memory(
            self.current_run_id, self._pending_global,
            self.selected_segmentation, self._pending_seg)

    # -- persistence -----------------------------------------------------------

    def save_current_run_data(self) -> str:
        self._commit_pending()
        run = self.current_run_id
        # user-drawn masks + acceptance set → sidecar zarr. Only pass the
        # acceptance list when it actually changed: view-only navigation
        # (which seeds accepted_masks via accepted_for) must not rewrite
        # the sidecar or its per-mask metadata.
        acc = self.accepted_masks.get(run)
        if acc is not None and sorted(acc) == sorted(
                self.dm.saved_accepted_ids(run)):
            acc = None
        self.dm.save_masks(run, accepted=acc)
        return self.dm.save_run_annotations(run, self.hm)
