"""A/B the PRODUCTION detect path (detect_project_features: loader-thread
uploads + double-buffered dispatch + cache writes) on real mission frames
at device_batch = 1 / 2 / 4.

The r4 mission bench measured 0.512 s/img with the widened batch policy
(B=4 at 2176x1440) vs r3's 0.114 s/img at B=1 — while the synchronous
probe said B=4 is 1.4x FASTER. This isolates which story is true for the
pipelined path the mission actually runs.

Usage: python scripts_dev/detect_batch_ab.py /tmp/mission2812/mission [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    proj_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mission2812/mission"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    import jax
    from imageanalysis_tpu.io.project import ProjectMgr
    from imageanalysis_tpu.features import detect

    print("backend:", jax.default_backend(), flush=True)
    proj = ProjectMgr(proj_dir)
    proj.load_images_info()
    full = list(proj.image_list)
    print(f"{len(full)} images; timing {n} per config", flush=True)

    for dbatch in (8, 8):
        proj.image_list = full[:n]
        cfg = detect.DetectorConfig(backend="tpu", scale=1.0,
                                    max_features=4096, equalize=True,
                                    device_batch=dbatch)
        # warm compile on a throwaway pair so timing is steady-state
        proj.image_list = full[:dbatch]
        detect.detect_project_features(proj, cfg, use_cache=False,
                                       progress=False)
        proj.image_list = full[:n]
        t0 = time.perf_counter()
        detect.detect_project_features(proj, cfg, use_cache=False,
                                       progress=False)
        dt = time.perf_counter() - t0
        print(f"device_batch={dbatch}: {dt:.1f}s for {n} imgs "
              f"({dt/n*1000:.0f} ms/img)", flush=True)


if __name__ == "__main__":
    main()
