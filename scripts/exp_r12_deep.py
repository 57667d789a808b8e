"""Deep-cascade (256 trained stages) serving-kernel compile matrix.

The masked serving kernel stack-OOMs scoped VMEM (30.07M/16M) compiling
the 256-stage TRAINED model at VGA geometry with the default serving
config (and_tree + preshift_lazy + block 16) — the r7 sweep's synthetic
256-stage cascades compiled, so something about the trained node layout
(distinct feature pairs -> more lazy slab copies per cond region?) or
the encoding's live set pushes the Mosaic stack over.  Try the cheap
knobs before building segmented evaluation:

  a. default            (and_tree, preshift lazy, block 16)
  b. preshift_lazy=False (all slabs copied up front)
  c. preshift=False      (direct reads)
  d. block=8
  e. and_tree=False      (-inf latch: single-carry, no oks lists)
  f. e + preshift_lazy=False

  nohup python scripts/exp_r12_deep.py > /tmp/exp_deep.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import waldboost_tpu as wb
    from waldboost_tpu.channels import _normalize_opts
    from waldboost_tpu.model import _canvas_jit, _packed_plan_cached
    from waldboost_tpu.ops.cascade_static import (
        cascade_masked_grid_static, static_cascade_from_model)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "models", "flagship_hard_256.pb")
    model = wb.load(path)
    m, n, _ = model.shape
    shrink, n_per_oct, smooth, cf = _normalize_opts(model.channel_opts)
    packed = _packed_plan_cached(480, 640, shrink, n_per_oct, (m, n),
                                 halo=cf.halo)
    valid = jnp.asarray(packed.valid_mask((m, n)))
    sc = static_cascade_from_model(model)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (480, 640)).astype(np.uint8))
    canvas = _canvas_jit(img, shrink, n_per_oct, smooth, cf, packed)
    configs = [
        ("default", dict()),
        ("eager_preshift", dict(preshift_lazy=False)),
        ("no_preshift", dict(preshift=False)),
        ("block8", dict(block=8)),
        ("inf_latch", dict(and_tree=False)),
        ("inf_latch_eager", dict(and_tree=False, preshift_lazy=False)),
        ("inf_latch_block8", dict(and_tree=False, block=8)),
    ]
    for label, kw in configs:
        args = dict(with_n_weak=False, preshift=True, preshift_lazy=True,
                    preshift_min_uses=1, block=16, and_tree=True)
        args.update(kw)
        try:
            t0 = time.perf_counter()
            masked, nw, cnt = cascade_masked_grid_static(
                canvas, sc, valid, (m, n), **args)
            c = int(cnt)
            print(json.dumps({"cfg": label, "ok": True,
                              "survivors": c,
                              "s": round(time.perf_counter() - t0, 1)}),
                  flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:140]
            print(json.dumps({"cfg": label, "ok": False, "err": msg}),
                  flush=True)


if __name__ == "__main__":
    main()
