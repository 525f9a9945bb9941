#!/usr/bin/env python
"""Stage-split profiler on the real chip: times the full decode step in
its three variants plus the isolated frontend kernel and HDLC scan.

Usage: python tools/profile_stages.py [n_streams] [block_len]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gnuais_tpu.runtime import pipeline as pl
    from gnuais_tpu.ops import demod
    from gnuais_tpu.ops.fused import frontend_fused

    sys.path.insert(0, ".")
    import bench

    bench._enable_compile_cache()
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    block_len = int(sys.argv[2]) if len(sys.argv) > 2 else 49_152

    batch, n_payloads = bench.build_batch(n_streams, block_len)
    xj = jax.device_put(jnp.asarray(batch))
    nv = jnp.int32(block_len)
    carry0 = pl.init_carry(n_streams)

    def timeit(name, fn, iters=10):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        sps = n_streams * block_len / dt
        print(f"{name:32s} {dt*1e3:8.2f} ms   {sps/1e9:8.3f} Gsamp/s")
        return out

    # full step variants
    for label, kw in [
        ("step fast_dpll", dict(fast_dpll=True)),
        ("step fused_frontend", dict(fused_frontend=True)),
    ]:
        def fn(kw=kw):
            return pl.decode_block(xj, nv, carry0, frame_slots=32,
                                   exact_fir=True, **kw)
        c1, frames, _ = timeit(label, fn)
        count = np.asarray(frames.count)
        assert (count == n_payloads).all(), count[:8]

    # isolated frontend kernel
    fe = jax.jit(lambda x, c: frontend_fused(x, nv, c.history, c.dpll))
    gbits, gvalid, gpos, _h, _d = timeit(
        "frontend kernel (fused)", lambda: fe(xj, carry0))

    # isolated HDLC scan on the frontend's output
    gbits, gvalid, gpos = jax.block_until_ready((gbits, gvalid, gpos))
    f0 = demod.init_frames(n_streams, 32)
    h0 = demod.init_hdlc(n_streams)
    hd = jax.jit(lambda b, v, p: demod.hdlc_scan(b, v, h0, f0, p))
    timeit("hdlc_scan (XLA)", lambda: hd(gbits, gvalid, gpos))


if __name__ == "__main__":
    main()
