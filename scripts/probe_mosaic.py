"""Probe Mosaic (pallas TPU) support for pooling-ish primitives.

nohup python scripts/probe_mosaic.py > /tmp/probe.log 2>&1 &
"""
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, body, shape=(256, 512), out_shape=None):
    x = np.random.RandomState(0).rand(*shape).astype(np.float32)
    if out_shape is None:
        out_shape = (shape[0] // 2, shape[1] // 2)

    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    try:
        t0 = time.perf_counter()
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )
        out = jax.jit(fn)(x)
        out = np.asarray(out)
        dt = time.perf_counter() - t0
        # reference: 2x2 sum pool
        ref = x.reshape(shape[0] // 2, 2, shape[1] // 2, 2).sum(axis=(1, 3))
        ok = out.shape == ref.shape and np.allclose(out, ref)
        print(f"{name}: compiled+ran in {dt:.1f}s, correct_pool={ok}", flush=True)
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)


probe("sublane_stride2", lambda x: (x[0::2, 0::2] + x[1::2, 0::2]
                                    + x[0::2, 1::2] + x[1::2, 1::2]))
probe("reshape_sum", lambda x: x.reshape(x.shape[0] // 2, 2,
                                         x.shape[1] // 2, 2).sum(axis=(1, 3)))


def via_transpose(x):
    r = x[0::2, :] + x[1::2, :]          # sublane stride-2
    rt = r.T                              # (512, 128)
    c = rt[0::2, :] + rt[1::2, :]
    return c.T


probe("transpose_pool", via_transpose)


def via_dot(x):
    h, w = x.shape
    Pc = np.zeros((w, w // 2), np.float32)
    Pc[np.arange(w), np.arange(w) // 2] = 1.0
    r = x[0::2, :] + x[1::2, :]
    return jax.lax.dot(r, jnp.asarray(Pc),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)


probe("rowslice_dot_pool", via_dot)

print("DONE", flush=True)
