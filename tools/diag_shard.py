#!/usr/bin/env python
"""Diagnose the single-chip shard_map overhead on the flagship config.

BENCH_r03 recorded 0.819 efficiency for the flagship (S=4096, SB=12,
sublanes=32, lobe FIR) through shard_map on one chip, while the S=1024
config measured 0.996-0.998.  Hypotheses:
  (a) tunnel jitter + few iters (8) -> unstable median;
  (b) HBM pressure: the bench holds 2 input variants (~9.7 GB) plus the
      superblock transpose intermediates, and the sharded phase adds a
      sharding-annotated copy -> paging/fragmentation;
  (c) a genuine shard_map lowering cost at this shape.

Protocol: ONE input variant, interleaved direct/sharded dispatches
(paired, cancels tunnel drift), per-dispatch count verification,
min + median over >= 16 pairs.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(superblock=12, n_streams=4096, sublanes=32, iters=16):
    import jax
    import jax.numpy as jnp

    from bench import build_batch, _enable_compile_cache
    from gnuais_tpu.runtime import pipeline as pl
    from gnuais_tpu.parallel import mesh as M
    from gnuais_tpu.parallel.sharded import make_sharded_decode

    _enable_compile_cache()
    block_len = 49_152
    kflags = dict(kernel_sublanes=sublanes, lobe_fir=True)

    batch, n_pay = build_batch(n_streams, block_len, 4, seed=0)
    d = jax.device_put(jnp.asarray(batch))
    xj = jax.jit(lambda a: jnp.tile(a, (1, superblock)))(d)
    xj.block_until_ready()
    del d, batch
    nv = jnp.int32(block_len * superblock)
    carry0 = pl.init_carry(n_streams)

    def step(x, c):
        return pl.decode_superblock(x, nv, c, superblock,
                                    frame_slots=32, exact_fir=True,
                                    fused_pipeline=True, **kflags)

    mesh = M.make_stream_mesh(1)
    fn = make_sharded_decode(mesh, frame_slots=32, fused_pipeline=True,
                             superblock=superblock, **kflags)
    xs = jax.device_put(xj, M.stream_sharding(mesh))
    cs0 = jax.device_put(pl.init_carry(n_streams),
                         M.carry_sharding(mesh))

    want = n_pay * n_streams * superblock

    # compile both
    t0 = time.time()
    c1, f1, _ = step(xj, carry0)
    assert int(np.asarray(f1.count).sum()) == want
    print(f"direct compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    c2, f2, _ = fn(xs, nv, cs0)
    assert int(np.asarray(f2.count).sum()) == want
    print(f"sharded compile+run {time.time()-t0:.1f}s", flush=True)

    td, ts = [], []
    for k in range(iters):
        t0 = time.time()
        c1, f, _ = step(xj, c1)
        assert int(np.asarray(f.count).sum()) == want
        td.append(time.time() - t0)
        t0 = time.time()
        c2, f, _ = fn(xs, nv, c2)
        assert int(np.asarray(f.count).sum()) == want
        ts.append(time.time() - t0)
    n = n_streams * block_len * superblock

    def stats(ts):
        a = sorted(ts)
        return (f"min {a[0]*1e3:7.1f} ms  med {a[len(a)//2]*1e3:7.1f} ms "
                f" max {a[-1]*1e3:7.1f} ms  sps(med) {n/a[len(a)//2]/1e9:6.2f} G")

    print("direct :", stats(td))
    print("sharded:", stats(ts))
    print("per-iter direct  :", " ".join(f"{t*1e3:.0f}" for t in td))
    print("per-iter sharded :", " ".join(f"{t*1e3:.0f}" for t in ts))
    eff = sorted(td)[len(td)//2] / sorted(ts)[len(ts)//2]
    print(f"efficiency(med) = {eff:.3f}   min-based = "
          f"{sorted(td)[0]/sorted(ts)[0]:.3f}")


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--superblock", type=int, default=12)
    p.add_argument("--streams", type=int, default=4096)
    p.add_argument("--sublanes", type=int, default=32)
    p.add_argument("--iters", type=int, default=16)
    a = p.parse_args()
    main(a.superblock, a.streams, a.sublanes, a.iters)
