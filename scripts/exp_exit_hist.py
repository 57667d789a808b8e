"""Per-tile cascade exit-stage histogram (CPU; XLA evaluator).

For the flagship model on a noise VGA image: at which stage does each
(128, 256) kernel tile fully die?  Tile-level early exit saves exactly the
stages after that point — this bounds what block-exit tuning can buy.

python scripts/exp_exit_hist.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from waldboost_tpu.channels import _normalize_opts
    from waldboost_tpu.model import _channel_canvas_batch, _packed_plan_cached
    from waldboost_tpu.ops.cascade import cascade_response_grid
    from waldboost_tpu.ops.cascade_static import cascade_grid

    h, w = 480, 640
    model = _flagship_model()
    m, n, _ = model.shape
    shrink, n_per_oct, smooth, cf = _normalize_opts(model.channel_opts)
    packed = _packed_plan_cached(h, w, shrink, n_per_oct, (m, n), halo=cf.halo)
    valid = jnp.asarray(packed.valid_mask((m, n)))
    casc, depth = model._get_cascade()
    T = casc.n_stages

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (1, h, w)).astype(np.uint8)
    cvs = _channel_canvas_batch(jnp.asarray(img), shrink, n_per_oct, smooth,
                                cf, packed)
    # per-stage survivor masks via n_stages_cap sweep is O(T^2); instead run
    # full evaluator once per prefix length on a coarse set of checkpoints
    from waldboost_tpu.ops.cascade import slice_cascade

    Hc, Wc = packed.canvas_h, packed.canvas_w
    TU, TV, gi, gj, HU, HV = cascade_grid((Hc, Wc), (m, n))
    print(f"tiling TU={TU} TV={TV} gi={gi} gj={gj} tiles={gi*gj}")
    gu, gv = valid.shape
    checkpoints = list(range(0, T + 1, 4))
    alive_frac = []
    live_tiles = []
    vm = np.zeros((gi * TU, gj * TV), bool)
    vm[:gu, :gv] = np.asarray(valid)
    tiles_valid = vm.reshape(gi, TU, gj, TV).any(axis=(1, 3))
    for cap in checkpoints:
        if cap == 0:
            a = vm
        else:
            cs = slice_cascade(casc, 0, cap)
            _, alive, _ = cascade_response_grid(cvs[0], cs, (m, n), depth,
                                                init_alive=valid)
            a = np.zeros((gi * TU, gj * TV), bool)
            a[:gu, :gv] = np.asarray(alive)
        frac = a[:gu, :gv].sum() / max(np.asarray(valid).sum(), 1)
        tl = a.reshape(gi, TU, gj, TV).any(axis=(1, 3))
        alive_frac.append(frac)
        live_tiles.append(int(tl.sum()))
        print(f"stage {cap:3d}: window-alive {frac:8.5f}  "
              f"live tiles {int(tl.sum()):3d}/{int(tiles_valid.sum())}",
              flush=True)
    # integral of live tiles over stages = total tile-stages the kernel runs
    ts = np.trapz(live_tiles, checkpoints)
    print(f"tile-stages integral ~ {ts:.0f} (vs {T * int(tiles_valid.sum())} "
          f"with no exit)")


if __name__ == "__main__":
    main()
