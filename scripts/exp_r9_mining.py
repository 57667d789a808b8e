"""Where does the training-mining dispatch time go? (VERDICT r2 #4)

profile_train_device.py shows mine_scan = 50% of device-pool training wall
(~0.9 s per batch-of-8 dispatch).  Candidates: (a) device compute
(canvas + pallas cascade), (b) the bit-packed survivor-map D2H transfer
(the tunnel crawls at ~40 KB/s), (c) host unpackbits + nonzero,
(d) labeling, (e) the crop gather + transfer.  This measures each leg
separately on a realistically-deep model, and prototypes a capped
on-device survivor-coordinate extraction as the bitmap's replacement.

  nohup python scripts/exp_r9_mining.py > /tmp/exp_mining.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, reps=6):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.median(ts))


def main():
    import waldboost_tpu as wb
    from waldboost_tpu import model as M
    from waldboost_tpu.parallel.trainer import train_sharded
    from waldboost_tpu.utils import fake_data_generator

    # realistic mid-training model: 16 stages, the training config
    model = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=4, smooth=1,
                                       channels="grad_hist"))
    gen = fake_data_generator(seed=11)
    train_sharded(model, gen, mesh=None,
                  learner=wb.Learner(alpha=0.2, max_depth=2), length=16,
                  min_tp=500, min_fp=500, seed=0)
    print(f"model: {len(model)} stages", flush=True)

    B = 8
    rng = np.random.RandomState(3)
    batches = []
    g2 = fake_data_generator(seed=77)
    for _ in range(16):
        batches.append(np.stack([next(g2)["image"] for _ in range(B)]))

    m, n, _ = model.shape
    shrink, n_per_oct, smooth, cf = M._normalize_opts(model.channel_opts)
    packed = M._packed_plan_cached(256, 256, shrink, n_per_oct, (m, n),
                                   halo=cf.halo)
    valid = jnp.asarray(packed.valid_mask((m, n)))
    casc, depth = model._get_cascade()

    # warmup all programs
    it = iter(batches)
    out = M._run_packed_batch(jnp.asarray(next(it)), casc, valid, shrink,
                              n_per_oct, smooth, cf, (m, n), depth, packed)
    canvas, hs, alive, n_weak = out
    print("grid:", alive.shape, "valid:", int(valid.sum()), flush=True)
    _ = np.asarray(M._packbits_jit(alive))

    # (a) device compute only: FIFO-drain a scalar from the last result
    k = [0]

    def compute_only():
        b = batches[k[0] % len(batches)]
        k[0] += 1
        _, hs_, al_, _ = M._run_packed_batch(
            jnp.asarray(b), casc, valid, shrink, n_per_oct, smooth, cf,
            (m, n), depth, packed)
        float(hs_[0, 0, 0])

    t_min, t_med = timeit(compute_only)
    print(f"(a) canvas+cascade compute : {t_min*1e3:7.1f} ms min "
          f"{t_med*1e3:7.1f} med", flush=True)

    # (b) + packbits transfer
    def with_packbits():
        b = batches[k[0] % len(batches)]
        k[0] += 1
        _, hs_, al_, _ = M._run_packed_batch(
            jnp.asarray(b), casc, valid, shrink, n_per_oct, smooth, cf,
            (m, n), depth, packed)
        pb = np.asarray(M._packbits_jit(al_))
        return pb

    t_min2, t_med2 = timeit(with_packbits)
    pb = with_packbits()
    print(f"(b) + packed-alive D2H     : {t_min2*1e3:7.1f} ms min "
          f"{t_med2*1e3:7.1f} med   ({pb.nbytes} bytes)", flush=True)

    # (c) host unpack + nonzero
    def host_unpack():
        bits = np.unpackbits(pb, axis=-1, bitorder="little")[:, :, :alive.shape[-1]]
        return [np.nonzero(bits[i]) for i in range(B)]

    t_min3, t_med3 = timeit(host_unpack)
    per_image = host_unpack()
    n_surv = sum(r.size for r, _ in per_image)
    print(f"(c) host unpack+nonzero    : {t_min3*1e3:7.1f} ms min "
          f"{t_med3*1e3:7.1f} med   ({n_surv} survivors/batch)", flush=True)

    # (d) capped on-device coordinate extraction (the bitmap replacement):
    # top_k over index-where-alive; exact when count <= cap
    GU, GV = alive.shape[-2], alive.shape[-1]
    CAP = 2048

    @jax.jit
    def coords_dev(al):
        flat = al.reshape(B, -1)
        idx = jnp.arange(GU * GV, dtype=jnp.int32)[None]
        keyed = jnp.where(flat, idx, -1)
        top, _ = jax.lax.top_k(keyed, CAP)      # survivor indices, desc
        cnt = jnp.sum(flat, axis=1, dtype=jnp.int32)
        return top.astype(jnp.int32), cnt

    def with_coords():
        b = batches[k[0] % len(batches)]
        k[0] += 1
        _, hs_, al_, _ = M._run_packed_batch(
            jnp.asarray(b), casc, valid, shrink, n_per_oct, smooth, cf,
            (m, n), depth, packed)
        top, cnt = coords_dev(al_)
        top = np.asarray(top)
        cnt = np.asarray(cnt)
        return top, cnt

    top, cnt = with_coords()  # warmup
    t_min4, t_med4 = timeit(with_coords)
    print(f"(d) + capped coords D2H    : {t_min4*1e3:7.1f} ms min "
          f"{t_med4*1e3:7.1f} med   (cap {CAP}, counts {cnt.tolist()})",
          flush=True)

    # exactness: coords == bitmap nonzero when under cap
    for i in range(B):
        if cnt[i] <= CAP:
            want = set(zip(*per_image[i]))
            got = {(int(t) // GV, int(t) % GV) for t in top[i] if t >= 0}
            # note: per_image comes from a DIFFERENT batch (k advanced);
            # recompute both on one batch for the check below
            break

    # strict check on one fixed batch
    _, hs_, al_, _ = M._run_packed_batch(
        jnp.asarray(batches[0]), casc, valid, shrink, n_per_oct, smooth, cf,
        (m, n), depth, packed)
    pb0 = np.asarray(M._packbits_jit(al_))
    bits0 = np.unpackbits(pb0, axis=-1, bitorder="little")[:, :, :GV]
    top0, cnt0 = coords_dev(al_)
    top0, cnt0 = np.asarray(top0), np.asarray(cnt0)
    ok = True
    for i in range(B):
        want = set(zip(*np.nonzero(bits0[i])))
        got = {(int(t) // GV, int(t) % GV) for t in top0[i][:cnt0[i]]}
        if cnt0[i] <= CAP and want != got:
            ok = False
    print(f"coords exactness vs bitmap: {'OK' if ok else 'MISMATCH'}",
          flush=True)


if __name__ == "__main__":
    main()
