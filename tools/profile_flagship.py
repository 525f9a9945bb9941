#!/usr/bin/env python
"""Op-level attribution of the flagship dispatch via jax.profiler.

Runs the flagship superblock config on the real chip, captures a
profiler trace around a few verified dispatches, then parses the
trace's device-side events and prints self-time by op, separating the
Pallas kernel (custom-call) from the XLA glue (transposes, compaction,
scan plumbing).  This replaces strip-variant differencing with a direct
measurement of where the ~110 ns/step non-HDLC marginal goes.

Usage: python tools/profile_flagship.py [--superblock K] [--streams S]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--superblock", type=int, default=12)
    ap.add_argument("--streams", type=int, default=4096)
    ap.add_argument("--block-len", type=int, default=49_152)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--outdir", default="/tmp/flagship_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache, build_batch
    from gnuais_tpu.runtime import pipeline as pl

    _enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    n_streams, block_len, sb = args.streams, args.block_len, args.superblock
    batch, n_pay = build_batch(n_streams, block_len, 4, seed=0)
    x = jax.device_put(jnp.asarray(batch))
    x = jax.jit(lambda a: jnp.tile(a, (1, sb)))(x)
    nv = jnp.int32(block_len * sb)
    carry = pl.init_carry(n_streams)

    def step(xx, c):
        return pl.decode_superblock(
            xx, nv, c, sb, frame_slots=32, fused_pipeline=True,
            assume_full=True, kernel_sublanes=32, mxu_fir=True,
            kernel_unroll=64, kernel_guarded=False, with_peak=False)

    c, frames, _ = step(x, carry)
    total = int(np.asarray(jnp.sum(frames.count)))
    assert total == n_pay * n_streams * sb, (total, n_pay * n_streams * sb)
    print(f"warm; verified {total} frames", flush=True)

    # a couple more warm dispatches so the trace window is steady-state
    for _ in range(2):
        c, frames, _ = step(x, c)
        assert int(np.asarray(jnp.sum(frames.count))) == total

    os.makedirs(args.outdir, exist_ok=True)
    t0 = time.time()
    with jax.profiler.trace(args.outdir):
        for _ in range(args.iters):
            c, frames, _ = step(x, c)
            assert int(np.asarray(jnp.sum(frames.count))) == total
    dt = time.time() - t0
    n_samp = args.iters * n_streams * block_len * sb
    print(f"traced {args.iters} dispatches: {n_samp/dt/1e9:.2f} Gsamp/s "
          f"(incl. sync)", flush=True)

    # ---- parse the perfetto trace ---------------------------------------
    cands = glob.glob(os.path.join(
        args.outdir, "plugins/profile/*/*.trace.json.gz"))
    if not cands:
        cands = glob.glob(os.path.join(args.outdir, "**/*.trace.json.gz"),
                          recursive=True)
    if not cands:
        sys.exit(f"no *.trace.json.gz found under {args.outdir} — "
                 "did the profiler trace step fail?")
    path = max(cands, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]

    # device-side lanes: pid/tid names tell us which track is the TPU
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items()
                if "TPU" in n or "/device" in n.lower()}
    by_op = defaultdict(float)
    cnt = defaultdict(int)
    total_us = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        by_op[name] += dur
        cnt[name] += 1
        total_us += dur
    print(f"\ntrace: {path}")
    print(f"device tracks: {[names[p] for p in dev_pids]}")
    print(f"total device op time: {total_us/1e3:.1f} ms over "
          f"{args.iters} dispatches\n")
    print(f"{'op':<64} {'ms':>9} {'%':>6} {'n':>6}")
    for name, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{name[:64]:<64} {us/1e3:>9.2f} "
              f"{100*us/total_us:>5.1f}% {cnt[name]:>6}")


if __name__ == "__main__":
    main()
