"""Find a heading-bias level where traditional fails and smart recovers."""
import os
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1")
import jax
jax.config.update("jax_platforms", "cpu")

import shutil
import sys

import numpy as np

from imageanalysis_tpu.apps import process
from imageanalysis_tpu.io import camera_db
from imageanalysis_tpu.io.project import ProjectMgr
from imageanalysis_tpu.testing.synthetic import SyntheticMission

BIAS = float(sys.argv[1]) if len(sys.argv) > 1 else 15.0


def run(strategy, base):
    proj_dir = os.path.join(base, f"m_{strategy}")
    m = SyntheticMission(proj_dir, n_images=5, img_size=(640, 480),
                         altitude=90.0, spacing=12.0, yaw_jitter=0.0, seed=9)
    m.generate()
    pix4d = os.path.join(proj_dir, "pix4d.csv")
    lines = open(pix4d).read().splitlines()
    out = [lines[0]]
    for ln in lines[1:]:
        f = ln.split(",")
        f[6] = "%.2f" % (float(f[6]) + BIAS)
        out.append(",".join(f))
    open(pix4d, "w").write("\n".join(out) + "\n")
    db = os.path.join(base, "cams")
    camera_db.save("Synthetic_TestCam_none", m.camera_config(), db)
    rc = process.main([proj_dir, "--camera", "Synthetic_TestCam_none",
                       "--camera-db", db, "--scale", "1.0", "--ground", "0.0",
                       "--batch-size", "2", "--min-chain-len", "2",
                       "--match-strategy", strategy])
    proj = ProjectMgr(proj_dir)
    proj.load_images_info()
    ref = proj.ned_reference_lla()
    true_ned = m.true_camera_ned(ref)
    errs = []
    for i, im in enumerate(proj.image_list):
        ned, _, _ = im.get_camera_pose(opt=im.has_opt_pose())
        errs.append(np.linalg.norm(np.array(ned) - true_ned[i]))
    return rc, float(np.mean(errs)), float(np.max(errs))


base = "/tmp/smart_contrast"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(base)
for strat in ("traditional", "smart"):
    rc, mean_e, max_e = run(strat, base)
    print(f"bias={BIAS} {strat:12s}: rc={rc} cam_err mean={mean_e:.2f}m "
          f"max={max_e:.2f}m", flush=True)
