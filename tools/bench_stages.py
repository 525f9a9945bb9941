#!/usr/bin/env python
"""Quick stage-split timings on the real chip (round-2 perf work).

Usage: python tools/bench_stages.py [what ...]
  what in {pipe, frontend, dpll, fir, transpose, all}
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    what = set(sys.argv[1:]) or {"all"}
    import jax
    import jax.numpy as jnp

    from gnuais_tpu.ops import demod, fir, fused
    from gnuais_tpu.runtime import pipeline as pl

    S, T = 1024, 49_152
    n = S * T
    rng = np.random.default_rng(0)
    x = rng.integers(-3000, 3000, (S, T), dtype=np.int16)
    xj = jax.device_put(jnp.asarray(x))
    xf = jax.device_put(jnp.asarray(x, dtype=jnp.float32))
    carry = pl.init_carry(S)
    print(f"backend={jax.default_backend()} S={S} T={T} "
          f"({n/1e6:.1f} Msamp/block)")

    if what & {"transpose", "all"}:
        f = jax.jit(lambda a: fused._to_tiles(a)[0])
        dt = timeit(f, xj)
        print(f"transpose int16 [S,T]->[T,8,128]: {dt*1e3:7.2f} ms "
              f"({n/dt/1e9:6.2f} Gsamp/s)")
        dt = timeit(f, xf)
        print(f"transpose f32   [S,T]->[T,8,128]: {dt*1e3:7.2f} ms "
              f"({n/dt/1e9:6.2f} Gsamp/s)")

    if what & {"fir", "all"}:
        f = jax.jit(lambda a: fir.fir_exact(a, carry.history)[0])
        dt = timeit(f, xj)
        print(f"fir_exact (XLA):                  {dt*1e3:7.2f} ms "
              f"({n/dt/1e9:6.2f} Gsamp/s)")

    if what & {"firconv", "all"}:
        f = jax.jit(lambda a: fir.fir_conv(a, carry.history)[0])
        dt = timeit(f, xj)
        print(f"fir_conv (XLA conv):              {dt*1e3:7.2f} ms "
              f"({n/dt/1e9:6.2f} Gsamp/s)")

    if what & {"mxupipe", "all"}:
        f = jax.jit(lambda a: pl.decode_block(
            a, jnp.int32(T), carry, frame_slots=32, fused_pipeline=True,
            mxu_fir=True)[1].count)
        dt = timeit(f, xj)
        print(f"mxu_fir + pipeline (no-FIR):      {dt*1e3:7.2f} ms "
              f"({n/dt/1e9:6.2f} Gsamp/s)")

    if what & {"crc", "all"}:
        f = jax.jit(lambda a: pl.decode_block(
            a, jnp.int32(T), carry, frame_slots=32, fused_pipeline=True,
            device_crc=True)[1].count)
        dt = timeit(f, xj)
        print(f"pipeline + device_crc:            {dt*1e3:7.2f} ms "
              f"({n/dt/1e9:6.2f} Gsamp/s)")

    if what & {"fullblock", "all"}:
        f = jax.jit(lambda a: pl.decode_block(
            a, jnp.int32(T), carry, frame_slots=32,
            fused_pipeline=True)[1].count)
        dt = timeit(f, xj)
        print(f"decode_block fused (host crc):    {dt*1e3:7.2f} ms "
              f"({n/dt/1e9:6.2f} Gsamp/s)")

    if what & {"mxucrc", "all"}:
        f = jax.jit(lambda a: pl.decode_block(
            a, jnp.int32(T), carry, frame_slots=32, fused_pipeline=True,
            mxu_fir=True, device_crc=True)[1].count)
        dt = timeit(f, xj)
        print(f"mxu_fir + pipeline + device_crc:  {dt*1e3:7.2f} ms "
              f"({n/dt/1e9:6.2f} Gsamp/s)")

    if what & {"dpll", "all"}:
        tiles = jax.device_put(
            np.asarray(x[:1024].T.reshape(T, 8, 128), dtype=np.float32))
        st = jnp.zeros((8, 128), jnp.int32)
        f = jax.jit(lambda a: fused.dpll_pallas_tiles(
            a, jnp.int32(T), st, st, st)[0])
        dt = timeit(f, tiles)
        print(f"dpll kernel (pre-tiled):          {dt*1e3:7.2f} ms "
              f"({n/dt/1e9:6.2f} Gsamp/s)")

    if what & {"frontend", "all"}:
        f = jax.jit(lambda a: fused.frontend_fused(
            a, jnp.int32(T), carry.history, carry.dpll)[0])
        dt = timeit(f, xj)
        print(f"frontend_fused (FIR+DPLL+slot):   {dt*1e3:7.2f} ms "
              f"({n/dt/1e9:6.2f} Gsamp/s)")

    if what & {"pipe", "all"}:
        f = jax.jit(lambda a: fused.pipeline_fused(
            a, jnp.int32(T), carry.history, carry.dpll, carry.hdlc)[0])
        dt = timeit(f, xj)
        print(f"pipeline_fused (full):            {dt*1e3:7.2f} ms "
              f"({n/dt/1e9:6.2f} Gsamp/s)")


if __name__ == "__main__":
    main()
