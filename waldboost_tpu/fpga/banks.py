"""Pixel memory banks for conflict-free parallel feature reads in hardware.

Semantics parity with /root/reference/waldboost/fpga/banks.py: a detection
window's pixels are assigned to ``bh * bw`` memory banks by their position
modulo the bank block — ``bank(r, c) = (r % bh) * bw + (c % bw)``, identical
for every channel — and the scheduler hands one bank to each tree depth in
round-robin order, so the per-depth parallel pixel reads of a hardware tree
evaluator never collide on a memory port.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

__all__ = ["PixelBanks", "BankScheduler"]


class PixelBanks:
    """Window-pixel -> memory-bank map over an (H, W) or (H, W, C) window."""

    def __init__(self, shape: Sequence[int], block_shape: Tuple[int, int]):
        if len(shape) not in (2, 3):
            raise ValueError("Shape must be (H,W) or (H,W,C)")
        H, W = int(shape[0]), int(shape[1])
        C = int(shape[2]) if len(shape) == 3 else 1
        bh, bw = int(block_shape[0]), int(block_shape[1])
        rows = np.arange(H) % bh
        cols = np.arange(W) % bw
        plane = rows[:, None] * bw + cols[None, :]
        self.pattern = np.broadcast_to(plane[:, :, None], (H, W, C)).copy()
        self.n_banks = bh * bw

    def bank_pixels(self, bank_ids) -> np.ndarray:
        """Flat (row-major HWC) pixel indices belonging to ``bank_ids``,
        grouped by bank in the given order."""
        flat = self.pattern.reshape(-1)
        return np.concatenate([np.where(flat == b)[0] for b in bank_ids])


class BankScheduler:
    """Assigns one bank per tree depth, cycling through banks across calls so
    consecutive stages exercise different memory ports."""

    def __init__(self, n_banks: int = 8):
        self.n_banks = int(n_banks)
        self._next = 0

    def schedule(self, max_depth: int = 2):
        out = []
        for _ in range(max_depth):
            out.append([self._next])
            self._next = (self._next + 1) % self.n_banks
        return out
