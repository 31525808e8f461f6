"""Labelled stopwatch (reference: src/common/timer.{hh,cc}).

On TPU the first call of a jitted function includes compilation; use
``Timer`` around warmed-up regions, and remember ``jax.block_until_ready``
on the region's outputs — device execution is asynchronous.
"""

from __future__ import annotations

import time


class Timer:

    def __init__(self, label: str = ""):
        self.label = label
        self.reset()

    def reset(self):
        self._elapsed = 0.0
        self._running = False
        self._t0 = None

    def start(self):
        self._t0 = time.monotonic()
        self._running = True

    def stop(self):
        if self._running:
            self._elapsed += time.monotonic() - self._t0
            self._running = False

    @property
    def elapsed(self) -> float:
        if self._running:
            return self._elapsed + (time.monotonic() - self._t0)
        return self._elapsed

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    def __str__(self):
        return f"[timer {self.label}] : {self.elapsed:.4f} s"


def sync(tree):
    """Force REAL completion of the dispatch stream producing ``tree``.

    ``jax.block_until_ready`` on the tunnelled axon TPU platform returns
    before device execution finishes (tools/scaling_study.py works
    around the same bug), so phase wall-clocks bounded by it
    under-measure.  A host transfer of any output leaf cannot complete
    until the producing program (and, transitively, every enqueued
    predecessor) has executed — pull the smallest leaf.
    """
    import jax
    import numpy as np
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "size")]
    if leaves:
        np.asarray(min(leaves, key=lambda a: a.size))
    return tree
