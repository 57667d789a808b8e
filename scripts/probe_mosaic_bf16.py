"""Probe Mosaic (v5e, jax 0.9) legalization + THROUGHPUT of 16-bit vector
ops for the fast serving mode.

Round-5 finding that motivates this: packed bf16 ``arith.cmpf``
(vector<8x128x2xbf16>) FAILS to legalize — the bf16 cascade stage chain
cannot use float compares.  Candidate replacements probed here:

  * bf16 add/mul/select/max (the non-compare stage ops)
  * i16 cmpi on bitcast bf16 operands (non-negative bf16 orders like its
    bit pattern, so ``a <= b``  <=>  ``bits(a) <= bits(b)``)
  * i16 select of response bit patterns + bitcast back to bf16
  * conversions bool->bf16, bf16<->f32

Then times a synthetic 8-stage depth-2 routing chain in
(a) f32 (the exact kernel's op mix) vs (b) the i16-compare/bf16-add
encoding, same tile count, to measure the packed-throughput win.

  nohup python scripts/probe_mosaic_bf16.py > /tmp/probe_bf16.log 2>&1 &
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (256, 512)


def probe(name, body, in_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16):
    x = (np.random.RandomState(0).rand(*SHAPE).astype(np.float32) * 4)

    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    try:
        t0 = time.perf_counter()
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, out_dtype),
        )
        out = np.asarray(jax.jit(fn)(jnp.asarray(x, in_dtype)))
        dt = time.perf_counter() - t0
        print(f"{name}: OK ({dt:.1f}s) sample={out.ravel()[:3]}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split(chr(10))[0][:200]
        print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    # --- elementwise bf16 ops ------------------------------------------
    probe("bf16_add", lambda x: x + jnp.asarray(0.5, jnp.bfloat16))
    probe("bf16_mul", lambda x: x * jnp.asarray(0.5, jnp.bfloat16))
    probe("bf16_max", lambda x: jnp.maximum(x, jnp.asarray(1.0, jnp.bfloat16)))
    probe("bf16_cmp", lambda x: (x <= jnp.asarray(1.0, jnp.bfloat16))
          .astype(jnp.bfloat16))
    probe("bf16_sub_sign_trick",
          lambda x: jnp.sign(jnp.asarray(1.0, jnp.bfloat16) - x))
    # --- i16 bitcast-ordered compares ----------------------------------
    def i16cmp(x):
        xb = jax.lax.bitcast_convert_type(x, jnp.int16)
        t = jax.lax.bitcast_convert_type(jnp.asarray(1.0, jnp.bfloat16),
                                         jnp.int16)
        return (xb <= t).astype(jnp.bfloat16)
    probe("i16_cmp_bitcast", i16cmp)

    def i16select(x):
        xb = jax.lax.bitcast_convert_type(x, jnp.int16)
        t = jax.lax.bitcast_convert_type(jnp.asarray(1.0, jnp.bfloat16),
                                         jnp.int16)
        lo = jax.lax.bitcast_convert_type(jnp.asarray(0.25, jnp.bfloat16),
                                          jnp.int16)
        hi = jax.lax.bitcast_convert_type(jnp.asarray(-0.25, jnp.bfloat16),
                                          jnp.int16)
        r = jnp.where(xb <= t, lo, hi)
        return jax.lax.bitcast_convert_type(r, jnp.bfloat16)
    probe("i16_select_bitcast", i16select)

    def bf16_select_from_i16cmp(x):
        xb = jax.lax.bitcast_convert_type(x, jnp.int16)
        t = jax.lax.bitcast_convert_type(jnp.asarray(1.0, jnp.bfloat16),
                                         jnp.int16)
        return jnp.where(xb <= t, jnp.asarray(0.25, jnp.bfloat16),
                         jnp.asarray(-0.25, jnp.bfloat16))
    probe("bf16_select_from_i16cmp", bf16_select_from_i16cmp)
    probe("i16_add", lambda x: jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.int16) + jnp.int16(1),
        jnp.bfloat16))
    probe("bf16_to_f32", lambda x: x.astype(jnp.float32),
          out_dtype=jnp.float32)
    probe("f32_to_bf16", lambda x: x.astype(jnp.bfloat16),
          in_dtype=jnp.float32)

    # --- throughput: synthetic stage chain f32 vs i16/bf16 --------------
    # 8 depth-2 stages: per stage 3 compares + 3 selects + 1 add
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
        x = x_ref[...]  # bf16
        xb = jax.lax.bitcast_convert_type(x, jnp.int16)
        cast = lambda v: jax.lax.bitcast_convert_type(
            jnp.asarray(v, jnp.bfloat16), jnp.int16)
        hs = jnp.zeros(SHAPE, jnp.bfloat16)
        for t in range(T):
            b0 = xb <= cast(thr[3 * t])
            b1 = xb <= cast(thr[3 * t + 1])
            b2 = xb <= cast(thr[3 * t + 2])
            lo = jnp.where(b1, cast(leaf[4 * t]), cast(leaf[4 * t + 1]))
            hi = jnp.where(b2, cast(leaf[4 * t + 2]), cast(leaf[4 * t + 3]))
            r = jnp.where(b0, lo, hi)
            hs = hs + jax.lax.bitcast_convert_type(r, jnp.bfloat16)
        o_ref[...] = hs.astype(jnp.float32)

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
            msg = str(e).split(chr(10))[0][:200]
            print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)
            return None

    a = run_timed("chain_f32", chain_f32, jnp.float32)
    b = run_timed("chain_i16_bf16", chain_i16, jnp.bfloat16)
    if a and b:
        print(f"speedup i16/bf16 vs f32: {a / b:.2f}x", flush=True)


if __name__ == "__main__":
    main()
