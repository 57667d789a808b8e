"""Test-only skimage.transform shim: bilinear resize, exact for integers.

Implements exactly the call the reference makes
(/root/reference/waldboost/channels.py:132):
``resize(img, (nh, nw), preserve_range=True, order=1, anti_aliasing=False)``
with skimage's half-pixel-centre coordinate convention and edge clamping.

For integer-dtype images the interpolation is computed in EXACT integer
arithmetic (the bilinear taps are rationals with denominator 2*n_out, so the
4-corner combine has an exact int64 numerator) and returned as the exact
rational value in float64 — the reference's trailing ``.astype(dtype)``
truncation is then deterministic: exact-integer interpolation values have NO
float ties.  This is the same convention the device implements
(waldboost_tpu.ops.exact; PARITY.md §1).  Real skimage computes in f64 and
may land either side of an exact integer by ~1e-16 — a measure-zero
deviation this test bed resolves toward exact arithmetic.

Float images keep the f64 lerp (no truncation is involved downstream).
"""

import numpy as np


def _exact_axis(n_in, n_out):
    k = np.arange(n_out, dtype=np.int64)
    den = 2 * n_out
    c_num = (2 * k + 1) * n_in - n_out
    c_num = np.clip(c_num, 0, (n_in - 1) * den)
    if n_in > 1:
        i0 = np.minimum(c_num // den, n_in - 2)
    else:
        i0 = np.zeros_like(c_num)
    return i0, c_num - i0 * den, den


def resize(image, output_shape, order=1, preserve_range=True,
           anti_aliasing=False, mode="reflect", cval=0.0, clip=True):
    assert order == 1 and not anti_aliasing and preserve_range, \
        "shim supports the reference's exact call only"
    nh, nw = int(output_shape[0]), int(output_shape[1])
    h, w = image.shape[:2]
    if (nh, nw) == (h, w):
        return image.astype(np.float64).copy()

    if np.issubdtype(image.dtype, np.integer):
        x = image.astype(np.int64)
        i0, fr, den_r = _exact_axis(h, nh)
        j0, fc, den_c = _exact_axis(w, nw)
        i1 = np.minimum(i0 + 1, h - 1)
        j1 = np.minimum(j0 + 1, w - 1)
        wr0 = (den_r - fr)[:, None]
        wr1 = fr[:, None]
        a = wr0 * x[i0] + wr1 * x[i1]          # exact row combine
        wc0 = (den_c - fc)[None, :]
        wc1 = fc[None, :]
        num = wc0 * a[:, j0] + wc1 * a[:, j1]  # exact <= 255*den_r*den_c
        return num / float(den_r * den_c)      # one correctly-rounded div

    x = image.astype(np.float64)

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
