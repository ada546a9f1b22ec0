"""Multi-host (DCN) bootstrap for mission-scale runs.

The single-host mesh in parallel/sharded.py extends across hosts with
``jax.distributed``: each host contributes its local chips to one global
mesh, the dp axis spans all of them, and XLA routes the BA psum over
ICI within a slice and DCN between slices. This module wraps the
initialization handshake with environment auto-detection so the same
pipeline command works on 1 host or N:

    # host 0..N-1 (or let TPU pod metadata fill everything in):
    JAX_COORDINATOR=host0:1234 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=2 \
        python -m imageanalysis_tpu.apps.stages optimize <dir> --mesh all

The same mechanism scales a SINGLE v5e-8 host across all its chips: launch
8 processes pinned to one chip each (TPU_VISIBLE_DEVICES=<i> or the
runtime's chips-per-process setting) with JAX_NUM_PROCESSES=8 and a
localhost coordinator — detection, matching and rendering shard by
process, and the BA psum rides ICI. Validated end-to-end by
tests/test_multihost.py (2 processes, virtual devices, Gloo).

Design note (scaling-book recipe): the pipeline's parallelism is pure
data parallelism — pairs for matching, observations for BA — so the only
cross-host collective is the BA reduction; everything else is embarrassingly
parallel and DCN bandwidth is irrelevant to it. Cameras/points are
replicated (2812 cams + 5M points ≈ 70 MB, far under HBM), which keeps
the Schur matvecs local and the psum the lone boundary.
"""

from __future__ import annotations

import os

from ..io.logger import log


def maybe_initialize_distributed():
    """Initialize jax.distributed when multi-host env vars are present.

    Uses JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID when set;
    on TPU pods with none set, jax.distributed.initialize() autodetects
    from the pod metadata. Returns True when running multi-process."""
    import jax

    coord = os.environ.get("JAX_COORDINATOR")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    explicit = coord and nproc is not None and pid is not None
    # pod autodetect only when the worker list names OTHER hosts — some
    # single-host TPU runtimes set TPU_WORKER_HOSTNAMES for themselves
    workers = [w for w in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
               if w.strip()]
    if not explicit and len(workers) < 2:
        return False
    try:
        if explicit:
            jax.distributed.initialize(coordinator_address=coord,
                                       num_processes=int(nproc),
                                       process_id=int(pid))
        else:
            jax.distributed.initialize()   # pod metadata autodetect
    except RuntimeError as e:
        # already initialized, or a backend came up first (init must
        # precede any computation — callers that want DCN must call this
        # before touching jax)
        if "already" not in str(e) and "before" not in str(e):
            raise
        log(f"multi-host init skipped: {e}")
        return jax.process_count() > 1
    n = jax.process_count()
    if n > 1:
        log(f"multi-host: process {jax.process_index()}/{n}, "
            f"{jax.local_device_count()} local of {jax.device_count()} "
            "global devices")
    return n > 1


def global_mesh(axis="dp"):
    """One mesh over every device of every process (dp over ICI + DCN)."""
    import jax
    from jax.sharding import Mesh

    import numpy as np

    return Mesh(np.array(jax.devices()), (axis,))


def barrier(name="sync"):
    """Cross-process sync point; no-op single-process."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def is_rank0():
    import jax

    return jax.process_index() == 0


def agree(flag: bool, name="decision") -> bool:
    """Rank 0's boolean decision, broadcast so every rank branches
    identically. Each rank reading STEP marker files independently can
    observe different state (NFS attribute-cache lag after rank 0 touches
    a marker, coarse mtime granularity) — mismatched branches then reach
    barriers in different orders and the job hangs. Single-process: the
    local flag, unchanged."""
    import jax

    if jax.process_count() <= 1:
        return bool(flag)
    import numpy as np
    from jax.experimental import multihost_utils

    v = multihost_utils.broadcast_one_to_all(
        np.array([1 if flag else 0], np.int32))
    return bool(np.asarray(v)[0])


def process_shard(items, axis_index=None, axis_total=None):
    """This process's contiguous slice of a host-side work list (pairs,
    images): multi-host data parallelism for the stages that never touch
    a collective."""
    import jax

    i = axis_index if axis_index is not None else jax.process_index()
    n = axis_total if axis_total is not None else jax.process_count()
    per = (len(items) + n - 1) // n
    return items[i * per:(i + 1) * per]
