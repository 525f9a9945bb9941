#!/usr/bin/env python
"""Isolate the fused kernel + transposes from the frame-slot machinery:
a 12-block lax.scan over pipeline_fused WITHOUT compact_candidates,
vs the production decode_superblock at the same shapes.  Per-dispatch
verified readback (candidate counts)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from gnuais_tpu.golden import encoder as E
    from gnuais_tpu.ops.fused import pipeline_fused
    from gnuais_tpu.ops import demod
    from gnuais_tpu import constants as C
    from gnuais_tpu.runtime import pipeline as pl

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    S, T, K = 4096, 49_152, 12
    fir = "mxu"
    guarded = False
    rng = np.random.default_rng(0)
    bufs, wants = [], []
    for v in range(2):
        n_pay = 3 + v
        audio = E.synthesize_capture(
            [E.random_payload(np.random.default_rng(v + 1))
             for _ in range(n_pay)], gap_bits=64, lead_in_bits=64 + 16 * v)
        b = np.zeros((S, T), np.int16)
        b[:, :len(audio)] = audio
        d = jax.device_put(jnp.asarray(b))
        bufs.append(jax.jit(lambda a: jnp.tile(a, (1, K)))(d))
        wants.append(n_pay * S * K)
    jax.block_until_ready(bufs)

    hist0 = jnp.zeros((S, C.FIR_LEN), jnp.float32)
    dpll0 = demod.init_dpll(S)
    hdlc0 = demod.init_hdlc(S)

    @jax.jit
    def noglue(xk):
        xs = xk.reshape(S, K, T).transpose(1, 0, 2)       # [K, S, T]

        def body(c, xb):
            h, d, hh = c
            (cand_valid, cw, cl, cs, ce, l2, ov, h2, d2, hh2) = \
                pipeline_fused(xb, jnp.int32(T), h, d, hh,
                               sublanes=32, fir_mode=fir,
                               guarded=guarded, assume_full=True)
            return (h2, d2, hh2), cand_valid.sum()

        _, counts = jax.lax.scan(body, (hist0, dpll0, hdlc0), xs)
        return counts.sum()

    def run(name, fn, expect_fn, iters=8):
        out = fn(bufs[0])
        got = int(np.asarray(out))
        assert got == expect_fn(0), (got, expect_fn(0))
        times = []
        for k in range(iters):
            x = bufs[k % 2]
            t0 = time.time()
            got = int(np.asarray(fn(x)))
            times.append(time.time() - t0)
            assert got == expect_fn(k), (got, expect_fn(k))
        med = sorted(times)[len(times) // 2]
        print(f"{name:28s}: median {med*1e3:8.2f} ms  "
              f"{S*T*K/med/1e9:6.2f} Gsamp/s  best "
              f"{S*T*K/min(times)/1e9:6.2f}")

    run("kernel+transposes (no slots)", noglue, lambda k: wants[k % 2])

    carry0 = pl.init_carry(S)

    @jax.jit
    def full(xk):
        c, frames, _ = pl.decode_superblock(
            xk, jnp.int32(T * K), carry0, K, frame_slots=32,
            fused_pipeline=True, kernel_sublanes=32, mxu_fir=True,
            assume_full=True, with_peak=False)
        return frames.count.sum()

    run("decode_superblock (full)", full, lambda k: wants[k % 2])


if __name__ == "__main__":
    main()
