"""Test-only numba shim: just enough to *execute* /root/reference/waldboost.

``njit``/``jit`` are pass-through decorators (the decorated numpy code runs
as plain Python).  ``stencil`` is a tiny vectorized interpreter for the
relative-offset kernels the reference uses: the kernel function is called
once with a window proxy whose ``[di, dj, ...]`` yields the matching shifted
view of the interior, and output borders (where the neighborhood leaves the
array) are zero — the numba stencil default.  Integer inputs are promoted to
int64 inside the kernel, matching numba's integer arithmetic promotion
(uint8 does NOT wrap inside an @stencil kernel).
"""

import numpy as np

__version__ = "0.0-shim"


def njit(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]

    def deco(f):
        return f

    return deco


jit = njit


def prange(*args):
    return range(*args)


class _Window:
    def __init__(self, arr, lo, hi):
        self.arr = arr
        self.lo = lo
        self.hi = hi

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        sl = []
        for d in range(self.arr.ndim):
            off = idx[d] if d < len(idx) else 0
            sl.append(slice(self.lo[d] + off,
                            self.arr.shape[d] - self.hi[d] + off))
        view = self.arr[tuple(sl)]
        if np.issubdtype(view.dtype, np.integer):
            return view.astype(np.int64)
        return view


def stencil(func=None, neighborhood=None, **kwargs):
    def deco(kernel):
        def run(arr):
            nb = list(neighborhood) if neighborhood is not None else []
            while len(nb) < arr.ndim:
                nb.append((0, 0))
            lo = [-int(n[0]) for n in nb]
            hi = [int(n[1]) for n in nb]
            win = _Window(arr, lo, hi)
            interior = kernel(win)
            out = np.zeros(arr.shape, dtype=np.asarray(interior).dtype)
            region = tuple(slice(lo[d], arr.shape[d] - hi[d])
                           for d in range(arr.ndim))
            out[region] = interior
            return out

        return run

    if func is not None and callable(func):
        return deco(func)
    return deco
