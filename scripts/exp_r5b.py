"""Probe Mosaic ops needed by the fused shelf pass-2 kernel.

Kernel shape under test (one level, one colblock):
  - manual DMA of a cols window (oh, 128) x4 (corner,phase) from HBM into a
    (oh, 512)-lane rhs scratch at 128-aligned lane offsets
  - per rowblock: dot lhs (4*rb, kwp) @ rhs[k0:k0+kwp, :] with k0 8-aligned
    SUBLANE slice of the VMEM scratch
  - f32 lerp of the 4 corner sub-blocks, floor, bf16 cast
  - STORE into an out scratch at a static MISALIGNED lane offset (x0),
    including a partial-width last block
  - DMA out scratch -> HBM band at 8-aligned row offset

nohup python scripts/exp_r5b.py > /tmp/exp_r5b.log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    oh, kwp, rb = 480, 256, 64
    PW = 768
    x0 = 37          # misaligned lane offset into the out band
    wlast = 90       # partial store width
    k0 = 104         # 8-aligned sublane slice offset

    rng = np.random.RandomState(0)
    cols = jnp.asarray(rng.randint(0, 256, (4, oh, 128)).astype(np.float32),
                       dtype=jnp.bfloat16)          # (cornerphase, oh, 128)
    lhs = jnp.asarray((rng.rand(4 * rb, kwp) < 0.01).astype(np.float32),
                      dtype=jnp.bfloat16)
    fh = jnp.asarray(rng.rand(rb, 128).astype(np.float32))
    fw = jnp.asarray(rng.rand(8, 128).astype(np.float32))

    def kernel(lhs_ref, fh_ref, fw_ref, cols_hbm, out_hbm,
               rhs_ref, band_ref, sem, osem):
        # 4 DMAs into the 512-lane rhs scratch at aligned offsets
        for i in range(4):
            copy = pltpu.make_async_copy(
                cols_hbm.at[i], rhs_ref.at[:, i * 128:(i + 1) * 128], sem)
            copy.start()
            copy.wait()
        band_ref[...] = jnp.zeros_like(band_ref)
        # sublane-sliced dot operand
        acc = jax.lax.dot_general(
            lhs_ref[...], rhs_ref[k0:k0 + kwp, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g00 = acc[0 * rb:1 * rb, 0:128]
        g01 = acc[1 * rb:2 * rb, 128:256]
        g10 = acc[2 * rb:3 * rb, 256:384]
        g11 = acc[3 * rb:4 * rb, 384:512]
        fh_ = fh_ref[...]
        fw_ = fw_ref[0:1, :]
        ta = g00 * (1.0 - fh_) + g10 * fh_
        tb = g01 * (1.0 - fh_) + g11 * fh_
        blk = ta * (1.0 - fw_) + tb * fw_
        blk = jnp.floor(blk + 1e-4).astype(jnp.bfloat16)
        # misaligned full store + misaligned partial store
        band_ref[0:rb, x0:x0 + 128] = blk
        band_ref[rb:2 * rb, x0 + 128:x0 + 128 + wlast] = blk[:, :wlast]
        ocopy = pltpu.make_async_copy(band_ref, out_hbm.at[8:8 + 2 * rb],
                                      osem)
        ocopy.start()
        ocopy.wait()

    out = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((8 + 2 * rb + 8, PW), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((oh, 512), jnp.bfloat16),
            pltpu.VMEM((2 * rb, PW), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(lhs, fh, fw, cols)
    out = np.asarray(jax.block_until_ready(out))

    # reference
    colsn = np.asarray(cols.astype(jnp.float32))
    rhs = np.concatenate([colsn[i] for i in range(4)], axis=1)
    acc = np.asarray(lhs.astype(jnp.float32)) @ rhs[k0:k0 + kwp]
    g00 = acc[0 * rb:1 * rb, 0:128]
    g01 = acc[1 * rb:2 * rb, 128:256]
    g10 = acc[2 * rb:3 * rb, 256:384]
    g11 = acc[3 * rb:4 * rb, 384:512]
    fh_ = np.asarray(fh)
    fw_ = np.asarray(fw)[0:1]
    ta = g00 * (1.0 - fh_) + g10 * fh_
    tb = g01 * (1.0 - fh_) + g11 * fh_
    blk = np.floor(ta * (1.0 - fw_) + tb * fw_ + 1e-4)
    ref = np.zeros((8 + 2 * rb + 8, PW), np.float32)
    ref[8:8 + rb, x0:x0 + 128] = blk
    ref[8 + rb:8 + 2 * rb, x0 + 128:x0 + 128 + wlast] = blk[:, :wlast]
    # rows outside the DMA'd band are uninitialized -> compare band only
    got = out[8:8 + 2 * rb].astype(np.float32)
    want = ref[8:8 + 2 * rb]
    ok = np.array_equal(got, want)
    import jax.numpy as _jnp
    want_bf = np.asarray(_jnp.asarray(want, dtype=_jnp.bfloat16).astype(_jnp.float32))
    ok2 = np.array_equal(got, want_bf)
    print("probe numerics exact:", ok, "| exact after bf16-rounding ref:", ok2)
    print("min mismatched value:", want[got != want].min() if (got != want).any() else None)
    if not ok:
        bad = np.argwhere(got != want)
        print("mismatches:", bad.shape[0], bad[:5])
    print("DONE")


if __name__ == "__main__":
    main()
