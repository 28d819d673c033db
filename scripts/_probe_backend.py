"""Dev probe: axon-backend overheads that shape the trainer's step time.

Measures (a) H2D transfer bandwidth at several sizes, (b) per-dispatch
overhead of a trivial jitted op after a D2H (degraded-sync mode), (c) D2H
bandwidth. The round-4 train proof spent 15.1 s/step while the device compute
is ~0.2 s — this pins down where the other ~14 s live.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("backend:", jax.default_backend(), flush=True)
    dev = jax.devices()[0]

    # trivial dispatch cost (before any D2H)
    f = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(np.float32(0.0), dev)
    _ = float(np.asarray(f(x)))  # compile + first D2H → degraded-sync mode

    t0 = time.perf_counter()
    y = x
    for _ in range(20):
        y = f(y)
    _ = float(np.asarray(y))
    print(f"dispatch+chain of 20 tiny: {(time.perf_counter()-t0)*1e3:.1f} ms",
          flush=True)

    # per-call with a forcing D2H each time (the trainer's _log pattern)
    t0 = time.perf_counter()
    for _ in range(10):
        _ = float(np.asarray(f(x)))
    print(f"10x dispatch+D2H scalar: {(time.perf_counter()-t0)*1e3:.1f} ms",
          flush=True)

    # H2D bandwidth
    for mb in (1, 4, 16):
        a = np.random.rand(mb * 256 * 1024).astype(np.float32)  # mb MB
        d = jax.device_put(a, dev)
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            d = jax.device_put(a, dev)
        jax.block_until_ready(d)
        # force real completion with a dependent D2H
        _ = float(np.asarray(jnp.sum(d[:8])))
        dt = (time.perf_counter() - t0) / n
        print(f"H2D {mb} MB: {dt*1e3:.1f} ms  ({mb/dt:.1f} MB/s)", flush=True)

    # D2H bandwidth
    for mb in (1, 16):
        d = jax.device_put(np.random.rand(mb * 256 * 1024).astype(np.float32),
                           dev)
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            _ = np.asarray(d)
        dt = (time.perf_counter() - t0) / n
        print(f"D2H {mb} MB: {dt*1e3:.1f} ms  ({mb/dt:.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
