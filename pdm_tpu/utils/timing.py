"""Timing helpers that are honest on every backend.

The axon TPU plugin's ``block_until_ready`` does not actually block, so any
wall-clock measurement must force a (tiny) host fetch. ``sync`` pulls one
scalar from an arbitrary pytree of device arrays.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import numpy as np


def sync(tree: Any) -> None:
    """Force completion of all computation producing ``tree`` by fetching
    one element of one leaf to host."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "shape")]
    if leaves:
        np.asarray(leaves[-1]).ravel()[:1]


class Timer:
    """Context manager: with Timer() as t: ...; t.elapsed (seconds)."""

    def __init__(self, sync_tree: Any = None):
        self._sync_tree = sync_tree

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync_tree is not None:
            sync(self._sync_tree)
        self.elapsed = time.perf_counter() - self.start
        return False
