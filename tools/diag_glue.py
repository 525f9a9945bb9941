#!/usr/bin/env python
"""Where do the flagship's ~16.7 ms/block go?  Time the data-path glue
pieces in isolation at the flagship shape (S=4096, T=49152, SB=12):
  t1  [S, K*T] -> [K, S, T] superblock pre-transpose
  t2  per-block _to_tiles transpose (x12)
  t3  one-shot whole-superblock tiling [S, K*T] -> [K, nt*T, sb, 128]
  t4  compact_candidates on a realistic candidate tensor
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, *args, iters=6, bytes_moved=None):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    extra = ""
    if bytes_moved:
        extra = f"  ({bytes_moved/best/1e9:6.0f} GB/s)"
    print(f"  {name:44s}: {best*1e3:8.2f} ms{extra}")
    return best


def main():
    import jax
    import jax.numpy as jnp
    from gnuais_tpu.ops import demod
    from gnuais_tpu.ops.fused import _to_tiles

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    S, T, K, SB = 4096, 49_152, 12, 32
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.integers(-3000, 3000, (S, T), np.int16)))
    xk = jax.jit(lambda a: jnp.tile(a, (1, K)))(x)
    jax.block_until_ready(xk)
    nbytes = S * T * K * 2

    f1 = jax.jit(lambda a: a.reshape(S, K, T).transpose(1, 0, 2))
    timeit("[S,K*T] -> [K,S,T] superblock transpose", f1, xk,
           bytes_moved=2 * nbytes)

    f2 = jax.jit(lambda a: _to_tiles(a, SB)[0])
    xb = jax.device_put(jnp.asarray(
        rng.integers(-3000, 3000, (S, T), np.int16)))
    t2 = timeit("_to_tiles one block (x12 per superblock)", f2, xb,
                bytes_moved=2 * S * T * 2)
    print(f"  {'':44s}  -> x{K} = {t2*K*1e3:.2f} ms")

    ts = SB * 128
    nt = -(-S // ts)

    def tile_all(a):
        xp = jnp.pad(a, ((0, nt * ts - S), (0, 0)))
        return xp.reshape(nt, ts, K, T).transpose(2, 0, 3, 1) \
            .reshape(K, nt * T, SB, 128)
    f3 = jax.jit(tile_all)
    timeit("one-shot whole-superblock tiling", f3, xk,
           bytes_moved=2 * nbytes)

    # compact_candidates at the real candidate shape
    n_chunks = T // (4 * 64)
    kk = n_chunks * demod.MINI_SLOTS
    cand = jnp.zeros((S, kk), bool).at[:, ::97].set(True)
    cw = jnp.zeros((S, kk, demod.REG_WORDS), jnp.uint32)
    cl = jnp.zeros((S, kk), jnp.int32)
    cs = jnp.zeros((S, kk), jnp.int32)
    ce = jnp.zeros((S, kk), jnp.int32)
    l2 = jnp.zeros((S,), jnp.int32)
    ov = jnp.zeros((S,), jnp.int32)

    @jax.jit
    def compact(cv, w, l, s_, e, l2_, ov_):
        return demod.compact_candidates(
            demod.init_frames(S, 32), cv, w, l, s_, e,
            lost2=l2_, over=ov_)
    t4 = timeit("compact_candidates one block (x12)", compact,
                cand, cw, cl, cs, ce, l2, ov)
    print(f"  {'':44s}  -> x{K} = {t4*K*1e3:.2f} ms")


if __name__ == "__main__":
    main()
