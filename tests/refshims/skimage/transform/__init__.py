"""Test-only skimage.transform shim: bilinear resize in float64.

Implements exactly the call the reference makes
(/root/reference/waldboost/channels.py:132):
``resize(img, (nh, nw), preserve_range=True, order=1, anti_aliasing=False)``
with skimage's half-pixel-centre coordinate convention and edge clamping,
computed in float64 and returned as float64 (the reference applies the
trailing ``.astype(dtype)`` itself).
"""

import numpy as np


def resize(image, output_shape, order=1, preserve_range=True,
           anti_aliasing=False, mode="reflect", cval=0.0, clip=True):
    assert order == 1 and not anti_aliasing and preserve_range, \
        "shim supports the reference's exact call only"
    nh, nw = int(output_shape[0]), int(output_shape[1])
    h, w = image.shape[:2]
    x = image.astype(np.float64)
    if (nh, nw) == (h, w):
        return x.copy()

    def coords(n_in, n_out):
        c = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        c = np.clip(c, 0, n_in - 1)
        i0 = np.minimum(np.floor(c).astype(int), max(n_in - 2, 0))
        return i0, c - i0

    i0, fr = coords(h, nh)
    j0, fc = coords(w, nw)
    fr = fr.reshape((-1,) + (1,) * (x.ndim - 1))
    top = x[i0]
    bot = x[np.minimum(i0 + 1, h - 1)]
    x = top * (1 - fr) + bot * fr
    fc = fc.reshape((1, -1) + (1,) * (x.ndim - 2))
    left = x[:, j0]
    right = x[:, np.minimum(j0 + 1, w - 1)]
    return left * (1 - fc) + right * fc
