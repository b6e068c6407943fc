"""Probe the tunneled TPU link: transfer costs, overlap behavior.

Answers, empirically:
  1. H2D cost vs payload size (fixed + per-MB)
  2. D2H cost vs payload size
  3. pure device compute time for the P chunk (inputs pre-staged)
  4. does H2D overlap device compute? (thread-issued device_put)
  5. does D2H overlap device compute?
  6. do host records+entropy overlap device compute?
Run: python tools/link_probe.py
"""
from __future__ import annotations

import sys
import pathlib
import threading
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t(fn, n=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1000


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # 1/2: transfer cost curves
    for mb in (0.25, 1.0, 4.0, 8.0):
        a = np.zeros(int(mb * 1e6), np.uint8)
        up = t(lambda: jax.device_put(a).block_until_ready())
        d = jax.device_put(a)
        jax.block_until_ready(d)
        down = t(lambda: np.asarray(d))
        print(f"payload {mb:5.2f} MB: H2D {up:7.1f} ms   D2H {down:7.1f} ms",
              flush=True)

    # 3: pure compute (heavy matmul chain ~ P-chunk scale)
    x = jax.device_put(np.random.rand(2048, 2048).astype(np.float32))
    jax.block_until_ready(x)

    @jax.jit
    def heavy(x):
        for _ in range(60):
            x = jnp.tanh(x @ x) * 0.99
        return x

    jax.block_until_ready(heavy(x))
    comp = t(lambda: jax.block_until_ready(heavy(x)), n=3)
    print(f"pure compute:       {comp:7.1f} ms", flush=True)

    # 4: H2D concurrent with compute
    a = np.zeros(int(4e6), np.uint8)
    base_up = t(lambda: jax.device_put(a).block_until_ready())

    def overlap_h2d():
        r = heavy(x)
        t0 = time.perf_counter()
        jax.device_put(a).block_until_ready()
        up_in = (time.perf_counter() - t0) * 1000
        jax.block_until_ready(r)
        return up_in

    jax.block_until_ready(heavy(x))
    ups = [overlap_h2d() for _ in range(3)]
    print(f"H2D(4MB) during compute: {np.mean(ups):7.1f} ms "
          f"(idle: {base_up:.1f} ms) -> "
          f"{'OVERLAPS' if np.mean(ups) < base_up + comp * 0.5 else 'SERIALIZES'}",
          flush=True)

    # total wall with overlap attempt vs serial sum
    def wall_h2d():
        t0 = time.perf_counter()
        r = heavy(x)
        jax.device_put(a).block_until_ready()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) * 1000
    walls = [wall_h2d() for _ in range(3)]
    print(f"  wall(compute||H2D): {np.mean(walls):7.1f} ms vs serial "
          f"{comp + base_up:7.1f} ms", flush=True)

    # 5: D2H concurrent with compute
    d = jax.device_put(np.zeros(int(4e6), np.uint8))
    jax.block_until_ready(d)
    base_down = t(lambda: np.asarray(d))

    def wall_d2h():
        t0 = time.perf_counter()
        r = heavy(x)
        np.asarray(d)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) * 1000
    walls = [wall_d2h() for _ in range(3)]
    print(f"  wall(compute||D2H): {np.mean(walls):7.1f} ms vs serial "
          f"{comp + base_down:7.1f} ms", flush=True)

    # 6: D2H from a SEPARATE THREAD while main thread computes
    def wall_d2h_thread():
        got = []

        def pull():
            t0 = time.perf_counter()
            np.asarray(d)
            got.append((time.perf_counter() - t0) * 1000)
        t0 = time.perf_counter()
        r = heavy(x)
        th = threading.Thread(target=pull)
        th.start()
        jax.block_until_ready(r)
        th.join()
        return (time.perf_counter() - t0) * 1000, got[0]
    res = [wall_d2h_thread() for _ in range(3)]
    print(f"  wall(compute||D2H-thread): {np.mean([r[0] for r in res]):7.1f}"
          f" ms (pull saw {np.mean([r[1] for r in res]):7.1f} ms)",
          flush=True)

    # 7: two chained computes + interleaved pull of first result
    @jax.jit
    def heavy2(x):
        for _ in range(60):
            x = jnp.tanh(x @ x) * 0.99
        return x

    def wall_pipe():
        t0 = time.perf_counter()
        r1 = heavy(x)
        r2 = heavy2(r1)
        np.asarray(d)           # unrelated pull while r1/r2 compute
        jax.block_until_ready(r2)
        return (time.perf_counter() - t0) * 1000
    jax.block_until_ready(heavy2(heavy(x)))
    walls = [wall_pipe() for _ in range(3)]
    print(f"  wall(2xcompute||D2H): {np.mean(walls):7.1f} ms vs serial "
          f"{2 * comp + base_down:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
