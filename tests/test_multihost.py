"""Multi-host (DCN) execution test: 2 real processes, one global mesh.

The reference is single-process (SURVEY.md §2f); our multi-host story is
jax.distributed + one NamedSharding mesh spanning every process's devices
(parallel/multihost.py). This test actually EXECUTES that path: two
subprocesses, 4 virtual CPU devices each, Gloo collectives standing in for
DCN, running the sharded BA LM step whose camera/point reductions cross the
process boundary. Both ranks must agree on the step.
"""

import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "multihost_child.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dcn_ba_step():
    port = _free_port()
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_PLATFORM_NAME"] = "cpu"
        env["JAX_COORDINATOR"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(i)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, CHILD], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"rank {i} failed:\n{out}"

    # both ranks computed the identical replicated BA step
    norms = [re.search(r"ba_step dc_norm=([\d.]+)", o) for o in outs]
    assert all(norms), outs
    assert norms[0].group(1) == norms[1].group(1)

    # the work-list shards partition the list between ranks
    shards = [re.search(r"shard (\d+)\.\.(\d+) n=(\d+)", o) for o in outs]
    assert all(shards), outs
    n0, n1 = int(shards[0].group(3)), int(shards[1].group(3))
    assert n0 + n1 == 37
    assert int(shards[1].group(1)) == int(shards[0].group(2)) + 1


def test_two_process_distributed_matching(tmp_path):
    """Each rank matches its slice of the shared project's pair list; rank 0
    merges the shards into the canonical .match files. Coverage must equal
    the single-process run (counts may differ slightly: RANSAC keys depend
    on batch boundaries)."""
    import pickle

    from imageanalysis_tpu.apps import process
    from imageanalysis_tpu.io import camera_db
    from imageanalysis_tpu.testing.synthetic import SyntheticMission

    proj_dir = str(tmp_path / "m")
    m = SyntheticMission(proj_dir, n_images=6, img_size=(640, 480),
                         altitude=90.0, spacing=12.0, seed=13)
    m.generate()
    db = str(tmp_path / "cams")
    camera_db.save("Synthetic_TestCam_none", m.camera_config(), db)
    rc = process.main([proj_dir, "--camera", "Synthetic_TestCam_none",
                       "--camera-db", db, "--scale", "1.0", "--ground", "0.0",
                       "--batch-size", "4", "--min-chain-len", "2"])
    assert rc == 0

    meta = os.path.join(proj_dir, "ImageAnalysis", "meta")
    single = {}
    for f in os.listdir(meta):
        if f.endswith(".match"):
            with open(os.path.join(meta, f), "rb") as fh:
                ml = pickle.load(fh)
            single[f] = {k: len(v) for k, v in ml.items() if len(v)}
            os.remove(os.path.join(meta, f))
    assert any(single.values())

    port = _free_port()
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_PLATFORM_NAME"] = "cpu"
        env["JAX_COORDINATOR"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(i)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, CHILD, proj_dir], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
        assert "matched total=" in out

    merged = {}
    for f in os.listdir(meta):
        if f.endswith(".match"):
            with open(os.path.join(meta, f), "rb") as fh:
                ml = pickle.load(fh)
            merged[f] = {k: len(v) for k, v in ml.items() if len(v)}
    # same pair coverage as the single-process run
    for f, pairs in single.items():
        assert set(merged.get(f, {})) == set(pairs), (f, pairs, merged.get(f))
    # shards were cleaned up after the merge
    shard_dir = os.path.join(proj_dir, "ImageAnalysis", "match_shards")
    assert not os.listdir(shard_dir) if os.path.isdir(shard_dir) else True


def test_two_process_smart_strategy_matches_single(tmp_path):
    """Multi-host `--match-strategy smart` with a planted +20° heading bias:
    per-rank SmartState evidence shards must merge (matcher.py
    _merge_multihost_matches) so rank 0's yaw correction sees EVERY rank's
    pair evidence — the run must recover the cameras like the single-process
    smart run does (closes the r2 comment-only guarantee / ADVICE medium)."""
    import json

    import numpy as np

    from imageanalysis_tpu.apps import process
    from imageanalysis_tpu.io import camera_db
    from imageanalysis_tpu.io.project import ProjectMgr
    from imageanalysis_tpu.testing.synthetic import SyntheticMission

    def make_mission(sub):
        proj_dir = str(tmp_path / sub)
        m = SyntheticMission(proj_dir, n_images=6, img_size=(640, 480),
                             altitude=90.0, spacing=12.0, yaw_jitter=0.0,
                             seed=9)
        m.generate()
        pix4d = os.path.join(proj_dir, "pix4d.csv")
        with open(pix4d) as f:
            lines = f.read().splitlines()
        out = [lines[0]]
        for ln in lines[1:]:
            fields = ln.split(",")
            fields[6] = "%.2f" % (float(fields[6]) + 20.0)
            out.append(",".join(fields))
        with open(pix4d, "w") as f:
            f.write("\n".join(out) + "\n")
        return proj_dir, m

    db = str(tmp_path / "cams")

    def cam_err(proj_dir, m):
        proj = ProjectMgr(proj_dir)
        proj.load_images_info()
        ref = proj.ned_reference_lla()
        true_ned = m.true_camera_ned(ref)
        return float(np.mean([np.linalg.norm(
            np.array(im.get_camera_pose(opt=im.has_opt_pose())[0])
            - true_ned[i]) for i, im in enumerate(proj.image_list)]))

    # single-process smart reference run
    dir_single, m_single = make_mission("single")
    camera_db.save("Synthetic_TestCam_none", m_single.camera_config(), db)
    rc = process.main([dir_single, "--camera", "Synthetic_TestCam_none",
                       "--camera-db", db, "--scale", "1.0", "--ground",
                       "0.0", "--batch-size", "4", "--min-chain-len", "2",
                       "--match-strategy", "smart"])
    assert rc == 0
    err_single = cam_err(dir_single, m_single)

    # identical mission, 2-process smart run
    dir_multi, m_multi = make_mission("multi")
    port = _free_port()
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_PLATFORM_NAME"] = "cpu"
        env["JAX_COORDINATOR"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(i)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, CHILD, "--process", dir_multi, db, "smart"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, f"rank {i} failed:\n{out[-4000:]}"
        assert "pipeline rc=0" in out
    err_multi = cam_err(dir_multi, m_multi)

    # both runs recover through the yaw correction; multi-host must not be
    # meaningfully worse than single (evidence merged, not rank-0-only)
    assert err_single < 0.6, err_single
    assert err_multi < max(0.6, 1.5 * err_single), (err_multi, err_single)

    # the merged smart.json carries yaw evidence near the planted −20°
    with open(os.path.join(dir_multi, "ImageAnalysis", "smart.json")) as f:
        smart = json.load(f)
    yaws = [n["yaw_error"] for n in smart.values() if "yaw_error" in n]
    assert yaws, "no yaw evidence survived the multi-host merge"
    assert abs(np.median(yaws) + 20.0) < 6.0, yaws


def test_two_process_full_pipeline(tmp_path):
    """The SAME `process` command on 2 ranks runs the whole pipeline
    multi-host: rank-0 host stages, sharded detection + matching, BA on
    the global mesh — and recovers the synthetic camera poses."""
    import numpy as np

    from imageanalysis_tpu.io import camera_db
    from imageanalysis_tpu.io.project import ProjectMgr
    from imageanalysis_tpu.testing.synthetic import SyntheticMission

    proj_dir = str(tmp_path / "m")
    m = SyntheticMission(proj_dir, n_images=6, img_size=(640, 480),
                         altitude=90.0, spacing=12.0, seed=21)
    m.generate()
    db = str(tmp_path / "cams")
    camera_db.save("Synthetic_TestCam_none", m.camera_config(), db)

    port = _free_port()
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_PLATFORM_NAME"] = "cpu"
        env["JAX_COORDINATOR"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(i)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, CHILD, "--process", proj_dir, db], env=env,
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, f"rank {i} failed:\n{out[-4000:]}"
        assert "pipeline rc=0" in out

    proj = ProjectMgr(proj_dir)
    proj.load_images_info()
    ref = proj.ned_reference_lla()
    true_ned = m.true_camera_ned(ref)
    est = np.asarray([im.get_camera_pose(opt=True)[0]
                      for im in proj.image_list])
    err = np.linalg.norm(est - true_ned[: len(est)], axis=1)
    assert err.mean() < 1.0, err
    # render outputs: surface from rank 0, per-image eggs from BOTH ranks'
    # shards (the per-image renders split across processes)
    models = os.path.join(proj_dir, "ImageAnalysis", "models")
    assert os.path.isfile(os.path.join(models, "surface.bin"))
    eggs = {f for f in os.listdir(models) if f.endswith(".egg")}
    expected = {im.name + ".egg" for im in proj.image_list}
    assert eggs >= expected, (eggs, expected)
