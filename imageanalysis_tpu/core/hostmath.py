"""Pin tiny eager geometry onto the CPU backend.

The core geometry modules are pure jnp so they compose with jit/vmap on
device — but host-side orchestration loops (per-image pose chains, cull
statistics) also call them EAGERLY, and on a remote-tunnel TPU runtime
every eager dispatch pays ~200 ms of round-trip latency (measured r2;
CPU backend: sub-ms after trace). Wrapping those loops in
``host_default_device()`` keeps the math identical while routing the
ops to the in-process CPU backend.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def host_default_device():
    import jax

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        yield
        return
    with jax.default_device(cpu):
        yield
