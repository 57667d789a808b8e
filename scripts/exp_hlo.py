"""Dump compiled HLO of the serving program; summarize conv/fusion ops.

nohup python scripts/exp_hlo.py > /tmp/exp_hlo.log 2>&1 &
"""
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_model
    from waldboost_tpu.parallel.detect import make_batched_detector_boxes

    h, w = 480, 640
    batch = 32
    model = _flagship_model()
    fn, _ = make_batched_detector_boxes(model, (h, w), k=256, nms_iou=0.5,
                                        with_n_weak=False)
    imgs = jnp.zeros((batch, h, w), jnp.uint8)
    # fn is a lambda over jbody; re-jit to lower
    lowered = jax.jit(lambda x: fn(x)).lower(imgs)
    comp = lowered.compile()
    txt = comp.as_text()
    with open("/tmp/serving_hlo.txt", "w") as f:
        f.write(txt)
    print("bytes:", len(txt), flush=True)

    # summarize convolutions
    convs = re.findall(r"convolution\(.*", txt)
    print("n convolution lines:", len(convs))
    for ln in convs[:40]:
        print("  ", ln[:220])
    # shapes of conv ops: find lines like %convolution.N = TYPE[...]
    for mm in re.finditer(r"(\S+) = (\S+) convolution\((.*?)\)(.*)", txt):
        pass
    # fusion kinds
    kinds = Counter()
    for mm in re.finditer(r"fusion\(", txt):
        kinds["fusion"] += 1
    print("fusion call count:", kinds)


if __name__ == "__main__":
    main()
