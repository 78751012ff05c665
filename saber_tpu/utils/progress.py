"""Progress display (reference saber/utils/progress.py:21-66).

Rich progress-bar iterator wrapper with a tqdm/plain fallback; silent in
non-TTY batch logs."""

import sys
from typing import Iterable, Iterator, Optional


def progress_iter(iterable: Iterable, description: str = "Processing",
                  total: Optional[int] = None, disable: bool = False
                  ) -> Iterator:
    """Wrap an iterable with a progress bar."""
    if disable or not sys.stderr.isatty():
        yield from iterable
        return
    try:
        from rich.progress import track
        yield from track(iterable, description=description, total=total)
    except ImportError:
        try:
            from tqdm import tqdm
            yield from tqdm(iterable, desc=description, total=total)
        except ImportError:
            yield from iterable
