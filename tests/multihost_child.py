"""Child process for the 2-process multi-host (DCN) execution test.

Launched by tests/test_multihost.py with JAX_COORDINATOR/JAX_NUM_PROCESSES/
JAX_PROCESS_ID set and 4 virtual CPU devices per process: initializes
jax.distributed through parallel.multihost, builds the 8-device global mesh
spanning both processes, and runs the sharded BA LM step whose psum crosses
the process boundary (Gloo standing in for DCN). Prints one parseable line
per check; exits nonzero on any failure.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from imageanalysis_tpu.parallel import multihost  # noqa: E402

if not multihost.maybe_initialize_distributed():
    sys.exit("jax.distributed did not initialize")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from imageanalysis_tpu.ba import bundle  # noqa: E402
from imageanalysis_tpu.parallel import sharded  # noqa: E402

pid = jax.process_index()
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4, jax.local_device_count()

mesh = multihost.global_mesh()
assert mesh.devices.size == 8

# cross-process collective: replicated-host-data device_put + global sum
x = np.arange(16, dtype=np.float32).reshape(8, 2)
sh = NamedSharding(mesh, P("dp"))
xd = jax.device_put(x, sh)
s = jax.jit(jnp.sum, in_shardings=(sh,),
            out_shardings=NamedSharding(mesh, P()))(xd)
got = float(s.addressable_shards[0].data)
assert got == float(x.sum()), (got, x.sum())
print(f"proc {pid}: psum ok {got}", flush=True)

# process_shard covers the pair work-list exactly once across ranks
items = list(range(37))
mine = multihost.process_shard(items)
print(f"proc {pid}: shard {mine[0]}..{mine[-1]} n={len(mine)}", flush=True)

# sharded BA step over the 2-process mesh: the normal-equation reductions
# ride the cross-process collective path (DCN on a real pod)
rng = np.random.default_rng(0)
n_cam, n_pt, n_obs = 6, 40, 256
cams = np.zeros((n_cam, 7), np.float32)
cams[:, 2] = -100.0
cams[:, 0] = np.arange(n_cam) * 30.0
cams[:, 3] = 0.7071068
cams[:, 5] = -0.7071068
pts = np.c_[rng.uniform(0, 150, (n_pt, 2)),
            rng.uniform(-3, 3, (n_pt, 1))].astype(np.float32)
obs = bundle.BAObservations(
    cam_idx=rng.integers(0, n_cam, n_obs).astype(np.int32),
    pt_idx=rng.integers(0, n_pt, n_obs).astype(np.int32),
    uv=rng.uniform(0, 1000, (n_obs, 2)).astype(np.float32),
    weight=np.ones(n_obs, np.float32),
)
K = jnp.asarray(np.array([[1000.0, 0, 500], [0, 1000.0, 500], [0, 0, 1]],
                         np.float32))
step = sharded.sharded_lm_step(mesh, cg_iters=5)
obs_dev = sharded.shard_observations(obs, mesh)
dc, dp, _ = step(jnp.asarray(cams), jnp.asarray(pts), obs_dev, K,
                 jnp.zeros(5, jnp.float32), jnp.float32(1e-3))
dc_host = np.asarray(dc.addressable_shards[0].data)
assert np.isfinite(dc_host).all()
print(f"proc {pid}: ba_step dc_norm={np.linalg.norm(dc_host):.6f}", flush=True)

# distributed pair matching over a shared project dir (optional arg):
# each rank matches its slice of the work list; rank 0 merges the shards
if len(sys.argv) > 2 and sys.argv[1] == "--process":
    # full multi-host pipeline: the same process.main command on every rank;
    # optional 4th arg selects the match strategy (smart exercises the
    # per-rank SmartState evidence shards + rank-0 merge + yaw correction)
    from imageanalysis_tpu.apps import process

    strategy = sys.argv[4] if len(sys.argv) > 4 else "traditional"
    rc = process.main([sys.argv[2], "--camera", "Synthetic_TestCam_none",
                       "--camera-db", sys.argv[3], "--scale", "1.0",
                       "--ground", "0.0", "--batch-size", "4",
                       "--min-chain-len", "2",
                       "--match-strategy", strategy])
    assert rc == 0, rc
    print(f"proc {pid}: pipeline rc={rc}", flush=True)
elif len(sys.argv) > 1:
    from imageanalysis_tpu.io.project import ProjectMgr
    from imageanalysis_tpu.match.matcher import MatchConfig, find_matches

    proj = ProjectMgr(sys.argv[1])
    proj.load_images_info()
    total = find_matches(proj, MatchConfig(batch_size=4, n_hyp=64),
                         save_interval=1e9)
    print(f"proc {pid}: matched total={total}", flush=True)
