"""TPU experiment: extraction sub-costs + program-fusion variants.

nohup python scripts/exp_extract.py > /tmp/exp_ex.log 2>&1 &

Times (batch 32 VGA, flagship cascade):
  where_mask      — jnp.where(alive, hs, -inf) alone
  amk             — approx_max_k over the premasked map
  idx_math        — extract minus NMS (approx_max_k + coordinate mapping)
  nms             — nms_device on precomputed candidates
  extract_full    — current extract_b (all of the above)
  cascade+extract — ONE jit program for both (dispatch fusion)
  one_program     — canvas+cascade+extract as ONE jit
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

    from __graft_entry__ import _flagship_model
    from waldboost_tpu.parallel.detect import make_batched_detector
    from waldboost_tpu.ops.nms import extract_detections_approx, nms_device

    h, w = 480, 640
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    warmup = 2
    model = _flagship_model()
    m, n, _ = model.shape

    canvas_jit, cascade_jit, packed, content_hw = make_batched_detector(
        model, (h, w), _parts=True)

    rng = np.random.RandomState(0)
    n_b = iters + warmup
    image_sets = [
        jnp.asarray(rng.randint(0, 256, (batch, h, w)).astype(np.uint8))
        for _ in range(n_b)
    ]

    def timeit(name, fn, inputs, fetch):
        out = fn(inputs[0]); _ = float(fetch(out))
        for i in range(1, warmup):
            out = fn(inputs[i])
        _ = float(fetch(out))
        t0 = time.perf_counter()
        last = None
        for i in range(iters):
            last = fn(inputs[warmup + i])
        _ = float(fetch(last))
        dt = (time.perf_counter() - t0) / (iters * batch) * 1e3
        print(json.dumps({"name": name, "ms_per_image": round(dt, 4)}),
              flush=True)

    level_id_map, inv_scales = packed.level_maps((m, n))
    offsets = np.array([(pl.y, pl.x) for pl in packed.levels], np.int32)
    lid = jnp.asarray(level_id_map)
    offs = jnp.asarray(offsets)
    iscales = jnp.asarray(inv_scales)
    wnd = jnp.asarray([m, n], jnp.int32)
    k = 256

    canvases = [canvas_jit(ims) for ims in image_sets]
    _ = float(canvases[-1][0, 0, 0, 0])
    maps = [cascade_jit(cv)[:2] for cv in canvases]
    _ = float(maps[-1][0][0, 0, 0])

    # 1. masking alone
    mask_jit = jax.jit(lambda ha: jnp.where(ha[1], ha[0], -jnp.inf))
    timeit("where_mask", mask_jit, maps, lambda o: o[0, 0, 0])

    masked = [mask_jit(ha).reshape(batch, -1) for ha in maps]
    _ = float(masked[-1][0, 0])

    # 2. approx_max_k on premasked
    amk_jit = jax.jit(lambda mk: jax.lax.approx_max_k(mk, k))
    timeit("amk", amk_jit, masked, lambda o: o[0].sum())

    # 3. extract minus NMS
    def idx_one(hs, alive):
        return extract_detections_approx(hs, alive, lid, offs, iscales,
                                         wnd, k=k)
    idx_jit = jax.jit(jax.vmap(idx_one))
    timeit("idx_math", lambda ha: idx_jit(*ha), maps, lambda o: o[0].sum())

    cands = [idx_jit(*ha) for ha in maps]
    _ = float(cands[-1][0].sum())

    # 4. NMS alone
    nms_jit = jax.jit(jax.vmap(
        lambda r, s, v: nms_device(r, s, v, iou_threshold=0.5)))
    timeit("nms", lambda c: nms_jit(c[0], c[1], c[2]), cands,
           lambda o: o.sum().astype(jnp.float32))

    # 5. current full extract
    def extract_one(hs, alive):
        rects, scores, valid, count = extract_detections_approx(
            hs, alive, lid, offs, iscales, wnd, k=k)
        keep = nms_device(rects, scores, valid, iou_threshold=0.5)
        return rects, scores, jnp.logical_and(valid, keep), count
    extract_b = jax.jit(jax.vmap(extract_one))
    timeit("extract_full", lambda ha: extract_b(*ha), maps,
           lambda o: o[0].sum())

    # 6. cascade + extract in ONE program
    def casc_ex(cvs):
        hs, alive, nw = cascade_jit(cvs)
        return extract_b(hs, alive) + (nw,)
    casc_ex_jit = jax.jit(casc_ex)
    timeit("cascade_extract_1prog", casc_ex_jit, canvases,
           lambda o: o[0].sum() + o[4].sum().astype(jnp.float32))

    # 7. whole chain as one program
    one = jax.jit(lambda ims: casc_ex(canvas_jit(ims)))
    timeit("one_program", one, image_sets,
           lambda o: o[0].sum() + o[4].sum().astype(jnp.float32))

    # 8. reference: current three-program chain
    def three(ims):
        hs, alive, nw = cascade_jit(canvas_jit(ims))
        return extract_b(hs, alive) + (nw,)
    timeit("three_programs", three, image_sets,
           lambda o: o[0].sum() + o[4].sum().astype(jnp.float32))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
