"""Offline check: given the saved rendered-loop map, do the true revisit
pairs (q ~ 137-144 vs cand 0-8) pass _match_points / sim3 / verification?
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from snakeslam_tpu.loop.keyframe_database import KeyframeDatabase
from snakeslam_tpu.loop.loop_closing import LoopClosing
from snakeslam_tpu.map.serialization import load_map
from snakeslam_tpu.ops import bow as BOW
from snakeslam_tpu.system.settings import InputType, Settings

VOC = os.path.join(os.path.dirname(__file__), "..", "snakeslam_tpu",
                   "data", "orbvoc_synth.npz")


def main():
    smap = load_map("/tmp/rendered_loop_map.npz")
    voc = BOW.load_vocabulary_cached(VOC)
    db = KeyframeDatabase(voc, smap)

    s = Settings()
    s.input_type = InputType.Stereo
    s.enable_imu = False
    s.width, s.height = 320, 240
    s.fx, s.fy, s.cx, s.cy = 260.0, 260.0, 160.0, 120.0
    s.bf = 260.0 * 0.12
    s.fd_features = 600
    s.feature_slots = 1024
    s.local_map_slots = 2048
    s.th_depth = 20.0
    lc = LoopClosing(s, smap, db)

    for q, cand in [(137, 1), (138, 2), (139, 3), (140, 5), (141, 3),
                    (143, 8), (144, 8)]:
        pairs = lc._match_points(q, cand)
        n = 0 if pairs is None else len(pairs[0])
        out = lc._compute_sim3(q, cand)
        print(f"q={q} cand={cand} pairs={n} "
              f"sim3+verify={'ACCEPT' if out is not None else 'REJECT'}",
              flush=True)
        if out is not None:
            sc, R, t, pr = out
            print(f"   s={sc:.4f} |t|={np.linalg.norm(t):.3f} "
                  f"fusion_pairs={len(pr[0])}")


if __name__ == "__main__":
    main()
