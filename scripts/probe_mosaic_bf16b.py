"""Probe round 2: i16-bitcast compares for the fast cascade mode.

Round 1 (probe_mosaic_bf16.py): bf16 add/mul/max/convert legalize; packed
bf16 cmpf does NOT; the i16 probes crashed on a SCALAR tpu.bitcast (only
vectors bitcast).  Here every constant's bit pattern is computed on the
HOST (ml_dtypes) and only ARRAYS bitcast in-kernel.

  nohup python scripts/probe_mosaic_bf16b.py > /tmp/probe_bf16b.log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import ml_dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (256, 512)


def bits16(v):
    """Host: bf16 bit pattern of float v as a python int (i16)."""
    return int(np.asarray(v, ml_dtypes.bfloat16).view(np.int16))


def probe(name, body, in_dtype=jnp.bfloat16, out_dtype=jnp.float32):
    x = np.abs(np.random.RandomState(0).rand(*SHAPE).astype(np.float32)) * 4

    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...]).astype(out_dtype)

    try:
        t0 = time.perf_counter()
        fn = pl.pallas_call(kernel,
                            out_shape=jax.ShapeDtypeStruct(SHAPE, out_dtype))
        out = np.asarray(jax.jit(fn)(jnp.asarray(x, in_dtype)))
        print(f"{name}: OK ({time.perf_counter()-t0:.1f}s) "
              f"sample={out.ravel()[:4]}", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)
        return False


def main():
    T1 = bits16(1.0)

    probe("bitcast_bf16_i16", lambda x: jax.lax.bitcast_convert_type(
        x, jnp.int16).astype(jnp.float32))
    probe("i16_cmp_const", lambda x: (
        jax.lax.bitcast_convert_type(x, jnp.int16) <= jnp.int16(T1)
    ).astype(jnp.float32))
    probe("i16_select_const", lambda x: jax.lax.bitcast_convert_type(
        jnp.where(jax.lax.bitcast_convert_type(x, jnp.int16)
                  <= jnp.int16(T1),
                  jnp.int16(bits16(0.25)), jnp.int16(bits16(-0.25))),
        jnp.bfloat16).astype(jnp.float32))
    probe("bf16_select_from_i16cmp", lambda x: jnp.where(
        jax.lax.bitcast_convert_type(x, jnp.int16) <= jnp.int16(T1),
        jnp.asarray(0.25, jnp.bfloat16),
        jnp.asarray(-0.25, jnp.bfloat16)).astype(jnp.float32))
    probe("i16_flip_sign_order", lambda x: (
        jax.lax.bitcast_convert_type(x, jnp.int16)
        ^ ((jax.lax.bitcast_convert_type(x, jnp.int16) >> 15)
           | jnp.int16(-0x8000))).astype(jnp.float32))

    # --- timed chains: f32 cmp/select vs i16 cmp/select + bf16 adds ------
    T = 16
    thr = np.linspace(0.5, 3.5, 3 * T).astype(np.float32)
    leaf = (np.random.RandomState(1).randn(4 * T) * 0.25).astype(np.float32)

    def chain_f32(x_ref, o_ref):
        x = x_ref[...]
        hs = jnp.zeros(SHAPE, jnp.float32)
        for t in range(T):
            b0 = x <= thr[3 * t]
            b1 = x <= thr[3 * t + 1]
            b2 = x <= thr[3 * t + 2]
            lo = jnp.where(b1, leaf[4 * t], leaf[4 * t + 1])
            hi = jnp.where(b2, leaf[4 * t + 2], leaf[4 * t + 3])
            hs = hs + jnp.where(b0, lo, hi)
        o_ref[...] = hs

    def chain_i16(x_ref, o_ref):
        xb = jax.lax.bitcast_convert_type(x_ref[...], jnp.int16)
        hs = jnp.zeros(SHAPE, jnp.bfloat16)
        for t in range(T):
            b0 = xb <= jnp.int16(bits16(thr[3 * t]))
            b1 = xb <= jnp.int16(bits16(thr[3 * t + 1]))
            b2 = xb <= jnp.int16(bits16(thr[3 * t + 2]))
            lo = jnp.where(b1, jnp.int16(bits16(leaf[4 * t])),
                           jnp.int16(bits16(leaf[4 * t + 1])))
            hi = jnp.where(b2, jnp.int16(bits16(leaf[4 * t + 2])),
                           jnp.int16(bits16(leaf[4 * t + 3])))
            r = jnp.where(b0, lo, hi)
            hs = hs + jax.lax.bitcast_convert_type(r, jnp.bfloat16)
        o_ref[...] = hs.astype(jnp.float32)

    def chain_i16_f32acc(x_ref, o_ref):
        xb = jax.lax.bitcast_convert_type(x_ref[...], jnp.int16)
        hs = jnp.zeros(SHAPE, jnp.float32)
        for t in range(T):
            b0 = xb <= jnp.int16(bits16(thr[3 * t]))
            b1 = xb <= jnp.int16(bits16(thr[3 * t + 1]))
            b2 = xb <= jnp.int16(bits16(thr[3 * t + 2]))
            lo = jnp.where(b1, jnp.int16(bits16(leaf[4 * t])),
                           jnp.int16(bits16(leaf[4 * t + 1])))
            hi = jnp.where(b2, jnp.int16(bits16(leaf[4 * t + 2])),
                           jnp.int16(bits16(leaf[4 * t + 3])))
            r = jnp.where(b0, lo, hi)
            hs = hs + jax.lax.bitcast_convert_type(
                r, jnp.bfloat16).astype(jnp.float32)
        o_ref[...] = hs

    x32 = np.abs(np.random.RandomState(2).rand(*SHAPE).astype(np.float32)) * 4

    def run_timed(name, kern, in_dtype):
        try:
            fn = jax.jit(pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
                grid=(64,),
                in_specs=[pl.BlockSpec(SHAPE, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(SHAPE, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)))
            xs = [jnp.asarray(x32 + i, in_dtype) for i in range(8)]
            float(np.asarray(fn(xs[0]))[0, 0])
            best = np.inf
            for r in range(3):
                t0 = time.perf_counter()
                last = None
                for i in range(8):
                    last = fn(xs[i])
                float(np.asarray(last)[0, 0])
                best = min(best, time.perf_counter() - t0)
            per = best / (8 * 64)
            print(f"{name}: {per * 1e6:.1f} us/tile-pass", flush=True)
            return per
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)
            return None

    a = run_timed("chain_f32", chain_f32, jnp.float32)
    b = run_timed("chain_i16_bf16acc", chain_i16, jnp.bfloat16)
    c = run_timed("chain_i16_f32acc", chain_i16_f32acc, jnp.bfloat16)
    if a and b:
        print(f"speedup bf16acc vs f32: {a / b:.2f}x", flush=True)
    if a and c:
        print(f"speedup f32acc vs f32: {a / c:.2f}x", flush=True)


if __name__ == "__main__":
    main()
