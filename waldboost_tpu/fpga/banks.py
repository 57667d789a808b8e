"""Pixel memory banks for conflict-free parallel feature reads in hardware.

Parity with /root/reference/waldboost/fpga/banks.py: the detection window's
pixels are tiled into ``block_shape`` banks; the scheduler assigns one bank
per tree depth so parallel node evaluations never collide on a memory port.
"""

from __future__ import annotations

from itertools import count

import numpy as np

__all__ = ["PixelBanks", "BankScheduler"]


def _bank_pattern(shape, block_shape) -> np.ndarray:
    assert len(shape) in (2, 3), "Shape must be (H,W) or (H,W,C)"
    if len(shape) == 2:
        shape = tuple(shape) + (1,)
    b = np.arange(np.prod(block_shape)).reshape(block_shape)
    n = np.ceil(np.array(shape[:2]) / block_shape).astype(int)
    banks = np.tile(b, n.tolist())
    u, v, c = shape
    banks = np.atleast_3d(np.dstack([banks] * c))
    return banks[:u, :v, ...]


class PixelBanks:
    """Maps window pixels to memory banks (/root/reference/waldboost/fpga/banks.py:18-23)."""

    def __init__(self, shape, block_shape):
        self.pattern = _bank_pattern(shape, block_shape)

    def bank_pixels(self, bank_ids) -> np.ndarray:
        """Flat pixel indices belonging to the given banks."""
        return np.concatenate(
            [np.flatnonzero(self.pattern == b) for b in bank_ids])


class BankScheduler:
    """Round-robin bank assignment, one bank per tree depth
    (/root/reference/waldboost/fpga/banks.py:26-32)."""

    def __init__(self, n_banks: int = 8):
        self.n_banks = int(n_banks)
        self.bank_counter = count()

    def schedule(self, max_depth: int = 2):
        return [[next(self.bank_counter) % self.n_banks]
                for _ in range(max_depth)]
