"""Regenerate the golden end-to-end eval fixture.

Writes tests/golden/eval_golden.npz: final detections + mAP for the fixed
synthetic dataset and fixed-seed weights defined in tests/_golden_common.py.
Run ONLY when an intentional pipeline change invalidates the goldens, and
say so in the commit message.

    JAX_PLATFORMS=cpu python tools/make_golden_fixture.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tests._golden_common import build_and_run


def main():
    with tempfile.TemporaryDirectory() as root:
        dets, video_ids, avg_map, jit_map = build_and_run(root)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "eval_golden.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        segments=dets["segments"], scores=dets["scores"],
        labels=dets["labels"], valid=dets["valid"],
        video_ids=np.asarray(video_ids), avg_map=np.float64(avg_map),
        jit_map=np.float64(jit_map),
    )
    n = int(dets["valid"].sum())
    print(f"wrote {out}: {dets['segments'].shape[0]} videos, "
          f"{n} detections, avg mAP {avg_map:.6f}, "
          f"jittered-GT mAP {jit_map:.6f}")


if __name__ == "__main__":
    main()
