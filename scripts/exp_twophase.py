"""TPU micro-bench: two-phase component costs at VGA canvas scale.

nohup python scripts/exp_twophase.py > /tmp/exp_tp.log 2>&1 &
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

    N = 724592          # flagship VGA canvas window grid
    S = 3357            # prefix survivors
    CAP = 8192
    B = 32
    rng = np.random.RandomState(0)

    def timeit(name, fn, inputs, iters=8):
        out = fn(inputs[0])
        _ = float(np.asarray(out).ravel()[0])
        out = fn(inputs[1])
        _ = float(np.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        last = None
        for i in range(iters):
            last = fn(inputs[2 + i])
        _ = float(np.asarray(last).ravel()[0])
        dt = (time.perf_counter() - t0) / iters / B * 1e3
        print(json.dumps({"name": name, "ms_per_image": round(dt, 4)}),
              flush=True)

    def make_scores():
        out = []
        for _ in range(10):
            x = np.full((B, N), -np.inf, np.float32)
            for b in range(B):
                idx = rng.choice(N, S, replace=False)
                x[b, idx] = rng.randn(S).astype(np.float32)
            out.append(jnp.asarray(x))
        return out

    scores = make_scores()

    for recall in (0.95, 1.0):
        for cap in (4096, 8192):
            f = jax.jit(jax.vmap(
                lambda x: jax.lax.approx_max_k(x, cap,
                                               recall_target=recall)[0].sum()))
            timeit(f"approx_max_k_cap{cap}_r{recall}", f, scores)

    f = jax.jit(jax.vmap(lambda x: jax.lax.top_k(x, 4096)[0].sum()))
    timeit("flat_top_k_4096", f, scores)

    # sparse suffix: 52 stages x depth-2 gathers on CAP windows from a canvas
    from __graft_entry__ import _flagship_model
    from waldboost_tpu.ops.cascade import cascade_suffix_sparse, slice_cascade

    model = _flagship_model()
    casc, meta = model._get_cascade()
    C, U, V = 4, 536, 1408
    m, n = 12, 12
    canvases = [jnp.asarray(rng.rand(B, C, U, V).astype(np.float32) * 50)
                for _ in range(10)]
    idx0 = jnp.asarray(
        np.stack([rng.choice((U - m) * (V - n), CAP, replace=False)
                  for _ in range(B)]).astype(np.int32))
    sc0 = jnp.asarray(rng.randn(B, CAP).astype(np.float32))
    al0 = jnp.asarray(np.ones((B, CAP), bool))

    def suffix(cvs):
        f = jax.vmap(lambda cv, i, s, a: cascade_suffix_sparse(
            cv, casc, (m, n), meta, i, s, a, 12)[0].sum())
        return f(cvs, idx0, sc0, al0)

    timeit("suffix_sparse_cap8192", jax.jit(suffix), canvases)

    idx1 = idx0[:, :4096]
    sc1 = sc0[:, :4096]
    al1 = al0[:, :4096]

    def suffix4k(cvs):
        f = jax.vmap(lambda cv, i, s, a: cascade_suffix_sparse(
            cv, casc, (m, n), meta, i, s, a, 12)[0].sum())
        return f(cvs, idx1, sc1, al1)

    timeit("suffix_sparse_cap4096", jax.jit(suffix4k), canvases)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
