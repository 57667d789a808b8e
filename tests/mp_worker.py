"""Multi-process mesh worker (VERDICT r4 #4: DCN multi-slice analog).

Launched N times by test_multiprocess.py / __graft_entry__'s 2-process
dryrun phase: each process owns ``local_devices`` virtual CPU devices,
joins a jax.distributed coordinator, and runs the SAME program (the
multi-controller SPMD contract) over the global mesh:

  1. an 8-stage ``train_sharded`` run with the device pool sharded over
     all global devices (mining runs per-process on local devices; the
     host-staged inserts replicate),
  2. a batched sharded detection over the global mesh.

Process 0 writes the trained cascade + detection outputs to ``--out`` as
an .npz for the parent to compare against a single-process run of the
same program on the same total device count.
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from waldboost_tpu.parallel.mesh import is_multiprocess, make_mesh

    n_total = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_total, (len(jax.devices()), n_total)
    mesh = make_mesh(n_total)
    assert is_multiprocess(mesh) == (args.num_processes > 1)

    run_program(mesh, args.out if args.process_id == 0 else None)
    # all processes must stay alive until the collectives finish
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("mp_worker_done")


def run_program(mesh, out_path):
    """The shared train + detect program (also run single-process by the
    test to produce the reference outputs)."""
    import jax
    import numpy as np

    import waldboost_tpu as wb
    from waldboost_tpu.parallel.detect import make_batched_detector_boxes
    from waldboost_tpu.parallel.mesh import is_multiprocess, shard_array
    from waldboost_tpu.utils import fake_data_generator

    gen = fake_data_generator(seed=5)
    model = wb.Model((12, 12, 4), dict(shrink=2, n_per_oct=2, smooth=1,
                                       channels="grad_hist"))
    learner = wb.train(model, gen, mesh=mesh, length=8,
                       pool=wb.SamplePool(min_tp=64, min_fp=64, seed=0),
                       learner=wb.Learner(alpha=0.2, max_depth=2))

    n_dev = mesh.devices.size
    rng = np.random.RandomState(3)
    images = rng.randint(0, 256, (n_dev, 48, 64)).astype(np.uint8)
    fn, _ = make_batched_detector_boxes(model, (48, 64), mesh=mesh, k=64,
                                        nms_iou=0.5)
    out = fn(shard_array(images, mesh))
    if is_multiprocess(mesh):
        from jax.experimental import multihost_utils
        rects, scores, valid, count, nweak = \
            multihost_utils.process_allgather(out[:5], tiled=True)
    else:
        rects, scores, valid, count, nweak = map(np.asarray, out[:5])

    if out_path:
        trees = {}
        for t, weak in enumerate(model.classifier):
            trees[f"thr{t}"] = weak.threshold
            trees[f"feat{t}"] = weak.feature
            trees[f"pred{t}"] = weak.prediction
        np.savez(out_path, theta=np.asarray(model.theta, np.float64),
                 losses=np.asarray(learner.losses, np.float64),
                 rects=rects, scores=scores, valid=valid, count=count,
                 **trees)


if __name__ == "__main__":
    main()
