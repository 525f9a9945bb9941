#!/usr/bin/env python
"""Honest per-stage kernel timings: fully jitted wrappers, ONE dispatch
in flight, a small host readback per iteration (forces real completion;
block_until_ready alone is not trustworthy through the axon tunnel),
n_valid jittered so no dispatch repeats.  Subtract the measured
readback/dispatch floor (~23 ms) to compare device work."""
import functools
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax
    import jax.numpy as jnp
    from gnuais_tpu.ops import fused
    from gnuais_tpu.runtime import pipeline as pl
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    S, T = 1024, 49_152
    n = S * T
    rng = np.random.default_rng(0)
    x = rng.integers(-3000, 3000, (S, T), dtype=np.int16)
    xj = jax.device_put(jnp.asarray(x))
    xf = jax.device_put(jnp.asarray(x, dtype=jnp.float32))
    carry = pl.init_carry(S)
    print(f"backend={jax.default_backend()} S={S} T={T} "
          f"(numbers include ~23 ms dispatch+readback floor)")
    which = set(sys.argv[1:]) or {"all"}

    def bench(name, fn, state0, iters=5):
        t0 = time.time()
        s, probe = fn(state0, 0)
        _ = np.asarray(probe)
        compile_s = time.time() - t0
        times = []
        for k in range(1, iters + 1):
            t0 = time.time()
            s, probe = fn(s, k)
            _ = np.asarray(probe)     # force + fetch tiny result
            times.append(time.time() - t0)
        med = sorted(times)[len(times)//2]
        print(f"{name:36s}: {med*1e3:8.2f} ms total "
              f"(~{(med-0.023)*1e3:7.2f} ms device)  "
              f"{n/max(med-0.023,1e-9)/1e9:6.2f} Gsamp/s-device  "
              f"(compile {compile_s:.0f}s)")
        return med

    if which & {"pipe", "all"}:
        @jax.jit
        def pipe_step(c, k):
            c2, fr, _ = pl.decode_block(xj, jnp.int32(T - (k % 13)), c,
                                        frame_slots=32,
                                        fused_pipeline=True)
            return c2, c2.dpll.pll[:8]
        bench("decode_block fused full", pipe_step, carry)

    if which & {"lobe", "all"}:
        @jax.jit
        def lobe_step(c, k):
            c2, fr, _ = pl.decode_block(xj, jnp.int32(T - (k % 13)), c,
                                        frame_slots=32,
                                        fused_pipeline=True,
                                        lobe_fir=True)
            return c2, c2.dpll.pll[:8]
        bench("decode_block fused lobe", lobe_step, carry)

    if which & {"frontend", "all"}:
        @jax.jit
        def fe_step(c, k):
            hist, dpll = c
            g, gv, gp, h2, d2 = fused.frontend_fused(
                xj, jnp.int32(T - (k % 13)), hist, dpll)
            return (h2, d2), d2.pll[:8]
        bench("frontend_fused (FIR+DPLL+slot)", fe_step,
              (carry.history, carry.dpll))

    if which & {"dpll", "all"}:
        @jax.jit
        def dp_step(c, k):
            bv, bits, d2 = fused.dpll_fused(xf, jnp.int32(T - (k % 13)), c)
            return d2, d2.pll[:8]
        bench("dpll_fused (DPLL only, f32 in)", dp_step, carry.dpll)

    if which & {"noop", "all"}:
        @jax.jit
        def no_step(c, k):
            s = jnp.sum(xj[:, :128].astype(jnp.int32)) + c + k
            return s, s
        bench("dispatch+readback floor (no-op)", no_step, jnp.int32(0))

if __name__ == "__main__":
    main()
