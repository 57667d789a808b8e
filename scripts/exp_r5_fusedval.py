"""Round-5 TPU validation: fused shelf kernel vs XLA plane path, on device.

nohup python scripts/exp_r5_fusedval.py > /tmp/fusedval.log 2>&1 &

Builds the VGA flagship canvas twice (WB_PLANE_FUSED=1 / 0), runs batch=2
distinct random uint8 inputs through both, and compares the CONTENT region
of the channel-kernel canvases on device.

CAVEAT (this comparison is a FALSE ALARM by construction): the channel
kernel's dead-tile skip leaves gap regions INSIDE the content canvas
uninitialized (they are only ever read for statically-dead windows), and
the two programs' separately-allocated outputs hold different garbage —
including NaNs — there.  Use exp_r5_fusedval2.py (plane comparison, fully
initialized) and exp_r5_fusedval3.py (end-to-end boxes) instead; both
proved bitwise equality on real TPU (2026-08-18).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_model
    from waldboost_tpu.parallel import detect as pdet

    h, w = 480, 640
    B = 2
    model = _flagship_model()

    t0 = time.time()
    os.environ["WB_PLANE_FUSED"] = "1"
    parts_f = pdet.make_batched_detector(model, (h, w), _raw=True)
    canvas_f = parts_f[0]
    os.environ["WB_PLANE_FUSED"] = "0"
    parts_x = pdet.make_batched_detector(model, (h, w), _raw=True)
    canvas_x = parts_x[0]
    packed = parts_f[3]
    Hc, Wc = parts_f[4]
    print(f"built: content {Hc}x{Wc}, {time.time()-t0:.1f}s", flush=True)

    rng = np.random.RandomState(42)
    imgs = jnp.asarray(rng.randint(0, 256, (B, h, w)).astype(np.uint8))

    mats_f = canvas_f.mats
    mats_x = canvas_x.mats

    @jax.jit
    def diff(images):
        cf = canvas_f(images, mats_f)[:, :Hc, :Wc]
        cx = canvas_x(images, mats_x)[:, :Hc, :Wc]
        d = jnp.abs(cf.astype(jnp.float32) - cx.astype(jnp.float32))
        return jnp.max(d), jnp.sum(d > 0), jnp.max(jnp.abs(cf))

    t0 = time.time()
    mx, nbad, mag = diff(imgs)
    print(f"compiled+ran in {time.time()-t0:.1f}s", flush=True)
    print(f"max|diff|={float(mx)}  n_mismatch={int(nbad)}  max|fused|={float(mag)}",
          flush=True)
    ok = float(mx) == 0.0
    print("RESULT:", "BITWISE-OK" if ok else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
