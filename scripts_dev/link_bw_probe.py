"""Characterize the host->device tunnel: bytes-proportional or
per-element? Is there a faster upload path than jax.device_put?"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

rng = np.random.default_rng(0)


def t_upload(arr, reps=5, via="device_put"):
    f = jax.jit(lambda x: x.sum())  # force materialization cheaply
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        if via == "device_put":
            d = jax.device_put(arr)
            d.block_until_ready()
        elif via == "jit_arg":
            r = f(arr)
            r.block_until_ready()
        ts.append(time.perf_counter() - t)
    return sorted(ts)[len(ts) // 2]


shapes = [
    ("u8 1MB", rng.integers(0, 255, (1024, 1024), np.uint8).astype(np.uint8)),
    ("u8 3.1MB", rng.integers(0, 255, (1440, 2176), np.uint8).astype(np.uint8)),
    ("u8 12.5MB", rng.integers(0, 255, (4, 1440, 2176), np.uint8).astype(np.uint8)),
    ("f32 12.5MB same px as 3.1MB u8", rng.random((1440, 2176), np.float32)),
    ("i32 3.1MB view", None),
]
img = shapes[1][1]
shapes[4] = ("i32 3.1MB view",
             np.frombuffer(img.tobytes(), np.int32).reshape(1440, 544).copy())

# warm
jax.device_put(np.zeros((8, 8), np.uint8)).block_until_ready()
jax.jit(lambda x: x.sum())(np.zeros((8, 8), np.uint8)).block_until_ready()

for name, arr in shapes:
    dt = t_upload(arr)
    mb = arr.nbytes / 1e6
    print(f"device_put {name}: {dt*1000:.1f} ms  ({mb/dt:.1f} MB/s)")

dt = t_upload(img, via="jit_arg")
print(f"jit-arg u8 3.1MB (incl tiny result): {dt*1000:.1f} ms "
      f"({img.nbytes/1e6/dt:.1f} MB/s)")

# concurrency: two parallel device_puts from two threads
import concurrent.futures as cf
a1 = rng.integers(0, 255, (1440, 2176), np.uint8).astype(np.uint8)
a2 = rng.integers(0, 255, (1440, 2176), np.uint8).astype(np.uint8)
def up(a):
    d = jax.device_put(a)
    d.block_until_ready()
with cf.ThreadPoolExecutor(2) as ex:
    t = time.perf_counter()
    list(ex.map(up, [a1, a2]))
    dt2 = time.perf_counter() - t
print(f"2 parallel 3.1MB uploads: {dt2*1000:.1f} ms total "
      f"({2*a1.nbytes/1e6/dt2:.1f} MB/s aggregate)")
