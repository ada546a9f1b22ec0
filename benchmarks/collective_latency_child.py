"""One rank of collective_latency_bench: time a camera-block psum on the
same 8-process Gloo mesh ba_scaling_child uses, so the sharded-BA
overhead can be decomposed into (collectives per solve) x (per-psum host
transport cost). Prints one parseable JSON line."""

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    n_cam = int(sys.argv[1])
    reps = int(sys.argv[2])

    from imageanalysis_tpu.parallel import multihost
    if not multihost.maybe_initialize_distributed():
        sys.exit("jax.distributed did not initialize")
    mesh = multihost.global_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jax.device_put(jnp.ones((n_cam, 7), jnp.float32),
                       NamedSharding(mesh, P()))

    @jax.jit
    def step(v, i):
        def f(u):
            return jax.lax.psum(u * (1.0 + 1e-9 * i), "dp")
        return jax.shard_map(f, mesh=mesh, in_specs=P(), out_specs=P())(v)

    # warm (compile)
    y = step(x, jnp.float32(0.0))
    y.block_until_ready()
    # chained-scalar timing protocol (block_until_ready returns early on
    # some tunneled runtimes; harmless extra rigor on CPU)
    t0 = time.perf_counter()
    v = x
    for i in range(reps):
        v = step(v, jnp.float32(i + 1))
    s = float(jnp.sum(v))  # forces the chain
    wall = time.perf_counter() - t0
    rank = jax.process_index()
    print("COLL_LAT_JSON: " + json.dumps({
        "rank": rank, "reps": reps, "n_cam": n_cam,
        "wall_s": round(wall, 3),
        "per_psum_ms": round(wall / reps * 1e3, 3),
        "checksum": s,
    }), flush=True)
    sys.exit(0)


if __name__ == "__main__":
    main()
