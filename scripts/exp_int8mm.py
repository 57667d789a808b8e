"""TPU probe: int8 MXU matmul vs bf16 for the selector-resize shapes.

nohup python scripts/exp_int8mm.py > /tmp/exp_i8.log 2>&1 &
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

    rng = np.random.RandomState(0)
    B = 32
    M, K, N = 480, 640, 9728  # octave-0 grouped pass-1 shape

    a_f = [jnp.asarray(rng.rand(B, M, K).astype(np.float32)) for _ in range(10)]
    w_f32 = rng.rand(K, N).astype(np.float32)
    w_bf = jnp.asarray(w_f32, jnp.bfloat16)
    a_s8 = [jnp.asarray(rng.randint(-128, 128, (B, M, K), dtype=np.int8))
            for _ in range(10)]
    w_s8 = jnp.asarray(rng.randint(0, 2, (K, N), dtype=np.int8))

    bf = jax.jit(lambda a: jnp.einsum(
        "bmk,kn->bmn", a, w_bf,
        preferred_element_type=jnp.bfloat16)[0, 0, 0].astype(jnp.float32))
    s8 = jax.jit(lambda a: jnp.einsum(
        "bmk,kn->bmn", a, w_s8,
        preferred_element_type=jnp.int32)[0, 0, 0])

    def timeit(name, fn, inputs, iters=8, reps=3):
        best = None
        for _ in range(reps):
            _ = float(fn(inputs[0]))
            _ = float(fn(inputs[1]))
            t0 = time.perf_counter()
            last = None
            for i in range(iters):
                last = fn(inputs[2 + (i % 8)])
            _ = float(last)
            dt = (time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
        flops = 2 * B * M * K * N
        print(json.dumps({"name": name, "ms": round(best * 1e3, 3),
                          "tflops": round(flops / best / 1e12, 1)}),
              flush=True)

    timeit("bf16", bf, a_f)
    timeit("s8", s8, a_s8)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
