#!/usr/bin/env python
"""Carry-chained kernel micro-bench on the real chip.

The axon plugin dedupes repeated identical dispatches, and a repeated
identical block drives the decoder carry to a FIXED POINT — after
which carry-chaining no longer varies the dispatch and numbers inflate
(observed 300+ "Gsamp/s").  Every iteration here differs: n_valid
cycles through distinct values, so the masked tail (and hence the
carry) never repeats.  Timing is checked for linearity across iter
counts; per-iteration numbers must agree.
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def run(S=1024, T=49_152, iters=(10, 30), **flags):
    import jax
    import jax.numpy as jnp
    from gnuais_tpu.runtime import pipeline as pl
    rng = np.random.default_rng(0)
    x = rng.integers(-3000, 3000, (S, T), dtype=np.int16)
    xj = jax.device_put(jnp.asarray(x))
    carry = pl.init_carry(S)

    def step(c, nv):
        return pl.decode_block(xj, nv, c, frame_slots=32,
                               fused_pipeline=True, **flags)

    t0 = time.time()
    c, fr, _ = step(carry, jnp.int32(T))
    jax.block_until_ready(fr)
    compile_s = time.time() - t0
    out = []
    k = 0
    for it in iters:
        t0 = time.time()
        for _ in range(it):
            k += 1
            c, fr, _ = step(c, jnp.int32(T - (k % 13)))
        jax.block_until_ready((c, fr))
        dt = (time.time() - t0) / it
        out.append(dt)
        print(f"S={S} T={T} {flags} iters={it}: {dt*1e3:7.2f} ms  "
              f"{S*T/dt/1e9:6.2f} Gsamp/s   (compile {compile_s:.1f}s)")
    return out

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    flags = {}
    S, T = 1024, 49_152
    for a in sys.argv[1:]:
        if a == "mxu": flags["mxu_fir"] = True
        elif a == "crc": flags["device_crc"] = True
        elif a.startswith("S="): S = int(a[2:])
        elif a.startswith("T="): T = int(a[2:])
    run(S, T, **flags)

if __name__ == "__main__":
    main()
