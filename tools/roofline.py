#!/usr/bin/env python
"""Chain-latency roofline for the fused decode kernel.

The flagship kernel is NOT issue-bound: removing the 23-op lobe FIR
(fir_mode="mxu") moves throughput by only ~3.5 %, and the round-4 op
diet (valid-gate elision + HDLC where-chain merge, ~8 ops/sample)
moved it by ~0 — so "ops x issue rate" does not predict its speed.
This tool tests the next hypothesis: that the wall is the LATENCY of
the sequential per-sample recurrence.

Round-4 verdict: it is NOT — the measured chains (dpll 9 ns, +hdlc
40 ns, +shift 51 ns per step at [32,128]) sit ~4x above the full
kernel's achieved rate, so the recurrence leaves headroom.  The real
costs found by honest bisection (tools/diag_strip.py) were the
guarded per-slot snapshot (+14 % when unguarded) and the candidate
compaction outside the kernel (+36 % after the k-index/gather rework);
the residual ~220 ns/step floor is Mosaic scheduling of the unrolled
body (loads, state round-trips), insensitive to unroll depth and time
chunk size.  The tool stays as the calibration harness for future
kernel work.

Calibration kernels run ONLY the dependent chains, in registers, with
no HBM input or output per step (state lives in VMEM scratch; the
"filtered sample" is synthesized by a 2-op LCG so nothing
const-folds):

  dpll        the exact DPLL recurrence ops (receiver.c:109-135
              semantics as compiled in ops/fused.py)
  dpll+hdlc   + the real _hdlc_slot_tiles state update every 4 steps
  dpll+hdlc+shift  + the real _single_shift register shift per slot

Comparing their steps/s against the full kernel's steps/s at the same
tile width bounds how far the full kernel sits from the recurrence's
measured speed of light.  samples/s = steps/s * (sublanes*128) lanes.

Protocol: one dispatch in flight, per-iteration readback of the final
state tile (forces completion; the axon tunnel lies otherwise), median
of >= 5 iterations, LCG-seeded so no two dispatches are identical.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 128


def make_chain_kernel(sublanes: int, steps: int, mode: str,
                      unroll: int = 32, time_chunk: int = 512):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gnuais_tpu import constants as C
    from gnuais_tpu.ops.fused import (HDLC_VARS, _hdlc_slot_tiles,
                                      _single_shift)
    from gnuais_tpu.ops.demod import REG_WORDS

    with_hdlc = "hdlc" in mode
    with_shift = "shift" in mode
    with_stream = "stream" in mode

    if with_stream:
        # same grid structure as the real kernel: int16 input tiles
        # stream HBM->VMEM per grid step and the per-body load+cast
        # feeds the chain — isolates the cost of input streaming itself
        return _make_streamed_kernel(sublanes, steps, mode, unroll,
                                     time_chunk)

    def kernel(seed_ref, out_ref, state, hst, sreg):
        @pl.when(pl.program_id(0) == 0)
        def _():
            state[0] = seed_ref[:]           # lcg
            state[1] = jnp.zeros_like(seed_ref[:])   # pll
            state[2] = jnp.zeros_like(seed_ref[:])   # prev
            state[3] = jnp.zeros_like(seed_ref[:])   # lastbit
            hst[:] = jnp.zeros(hst.shape, jnp.int32)
            sreg[:] = jnp.zeros(sreg.shape, jnp.uint32)

        def body(u, _):
            lcg = state[0]
            pll = state[1]
            prev = state[2]
            lastbit = state[3]
            hv = tuple(hst[i] for i in range(HDLC_VARS))
            srg = [sreg[w] for w in range(REG_WORDS)]
            acc = None
            for k in range(unroll):
                # 2-op stand-in for the (parallel-computable) FIR value
                lcg = lcg * 1103515245 + 12345
                curr = (lcg > 0).astype(jnp.int32)
                # the exact DPLL chain as compiled in _pipeline_kernel
                trans = curr ^ prev
                nudge = jnp.where(pll < C.PLL_CENTER, C.PLL_NUDGE,
                                  -C.PLL_NUDGE)
                pll_adv = pll + trans * nudge + C.PLL_INC
                emit_b = pll_adv > 0xFFFF
                bit = 1 - (curr ^ lastbit)
                pll = pll_adv & 0xFFFF
                lastbit = jnp.where(emit_b, curr, lastbit)
                prev = curr
                code = jnp.where(emit_b, 8 | (bit << 2) | (k & 3), 0)
                acc = code if acc is None else acc | code
                if (k & 3) == 3:
                    if with_hdlc:
                        gval = acc >= 8
                        gbit = (acc >> 2) & 1
                        spos = jnp.full_like(acc, u * unroll + k)
                        hv, app, emit, flen, bad = _hdlc_slot_tiles(
                            hv, gbit, gval, spos)
                        if with_shift:
                            srg = _single_shift(srg, gbit, app)
                    acc = None
            state[0] = lcg
            state[1] = pll
            state[2] = prev
            state[3] = lastbit
            for i in range(HDLC_VARS):
                hst[i] = hv[i]
            for w in range(REG_WORDS):
                sreg[w] = srg[w]
            return 0

        jax.lax.fori_loop(0, steps // unroll, body, 0)
        out_ref[:] = state[1]

    return pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        grid=(1,),
        in_specs=[pl.BlockSpec((sublanes, LANES), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((sublanes, LANES), lambda i: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((4, sublanes, LANES), jnp.int32),
            pltpu.VMEM((HDLC_VARS, sublanes, LANES), jnp.int32),
            pltpu.VMEM((REG_WORDS, sublanes, LANES), jnp.uint32),
        ],
        out_shape=jax.ShapeDtypeStruct((sublanes, LANES), jnp.int32),
    )


def _make_streamed_kernel(sublanes: int, steps: int, mode: str,
                          unroll: int, time_chunk: int):
    """Chain kernel with REAL grid-streamed int16 input (the same
    BlockSpec structure as the production kernel): per grid step a
    [time_chunk, sb, 128] int16 tile arrives from HBM and each body
    loads+casts its unroll slice to feed the slicer."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gnuais_tpu import constants as C
    from gnuais_tpu.ops.fused import (HDLC_VARS, _hdlc_slot_tiles,
                                      _single_shift)
    from gnuais_tpu.ops.demod import REG_WORDS

    with_hdlc = "hdlc" in mode
    with_shift = "shift" in mode
    with_fir = "fir" in mode
    n_dummy = 16 if "blocks" in mode else 0
    cpt = steps // time_chunk
    # loop PASSES x over the same input blocks (index map i % cpt): the
    # effective step count grows past the dispatch floor's noise without
    # more HBM — the dispatch is still unique per call (distinct input
    # arrays), so the dedup cannot serve it
    passes = max(1, (1 << 22) // steps)
    LANES_ = 128
    from gnuais_tpu.ops.fused import LOBE_HI, LOBE_LO, _TAPS_F32
    from gnuais_tpu import constants as C2

    def kernel(x_ref, *rest):
        # rest = [dummy_in...]*n_dummy, out_ref, [dummy_out...]*n_dummy,
        #        state, hist, hst, sreg
        dummy_in = rest[:n_dummy]
        out_ref = rest[n_dummy]
        dummy_out = rest[n_dummy + 1: 2 * n_dummy + 1]
        state, hist, hst, sreg = rest[2 * n_dummy + 1:]

        @pl.when(pl.program_id(0) == 0)
        def _():
            state[1] = jnp.zeros((sublanes, LANES_), jnp.int32)
            state[2] = jnp.zeros((sublanes, LANES_), jnp.int32)
            state[3] = jnp.zeros((sublanes, LANES_), jnp.int32)
            hist[:] = jnp.zeros(hist.shape, jnp.float32)
            hst[:] = jnp.zeros(hst.shape, jnp.int32)
            sreg[:] = jnp.zeros(sreg.shape, jnp.uint32)

        for j in range(n_dummy):
            # touch each dummy carry block like the production kernel's
            # i//cpt-mapped state specs (read once, write once)
            dummy_out[j][:] = dummy_in[j][:]

        def body(u, _):
            base = u * unroll
            x8 = x_ref[pl.ds(base, unroll)].astype(jnp.float32)
            if with_fir:
                win = [hist[i] for i in range(C2.FIR_LEN)]
                win += [x8[k] for k in range(unroll)]
            pll = state[1]
            prev = state[2]
            lastbit = state[3]
            hv = tuple(hst[i] for i in range(HDLC_VARS))
            srg = [sreg[w] for w in range(REG_WORDS)]
            acc = None
            for k in range(unroll):
                if with_fir:
                    # production lobe FIR: 8 symmetric-pair muls
                    f = None
                    for i in range(LOBE_LO, (LOBE_LO + LOBE_HI + 1) // 2):
                        pair = win[k + i] + win[k + C2.FIR_LEN - 1 - i]
                        term = pair * _TAPS_F32[i]
                        f = term if f is None else f + term
                    curr = (f > 0.0).astype(jnp.int32)
                else:
                    curr = (x8[k] > 0.0).astype(jnp.int32)
                trans = curr ^ prev
                nudge = jnp.where(pll < C.PLL_CENTER, C.PLL_NUDGE,
                                  -C.PLL_NUDGE)
                pll_adv = pll + trans * nudge + C.PLL_INC
                emit_b = pll_adv > 0xFFFF
                bit = 1 - (curr ^ lastbit)
                pll = pll_adv & 0xFFFF
                lastbit = jnp.where(emit_b, curr, lastbit)
                prev = curr
                code = jnp.where(emit_b, 8 | (bit << 2) | (k & 3), 0)
                acc = code if acc is None else acc | code
                if (k & 3) == 3:
                    if with_hdlc:
                        gval = acc >= 8
                        gbit = (acc >> 2) & 1
                        spos = jnp.full_like(acc, u * unroll + k)
                        hv, app, emit, flen, bad = _hdlc_slot_tiles(
                            hv, gbit, gval, spos)
                        if with_shift:
                            srg = _single_shift(srg, gbit, app)
                    acc = None
            state[1] = pll
            state[2] = prev
            state[3] = lastbit
            for i in range(HDLC_VARS):
                hst[i] = hv[i]
            for w in range(REG_WORDS):
                sreg[w] = srg[w]
            if with_fir:
                for i in range(C2.FIR_LEN):
                    hist[i] = win[unroll + i]
            return 0

        jax.lax.fori_loop(0, time_chunk // unroll, body, 0)

        @pl.when(pl.program_id(0) == passes * cpt - 1)
        def _():
            out_ref[:] = state[1]

    dummy2 = pl.BlockSpec((sublanes, LANES_), lambda i: (0, 0))
    inner = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        grid=(passes * cpt,),
        in_specs=[pl.BlockSpec((time_chunk, sublanes, LANES_),
                               lambda i: (i % cpt, 0, 0))]
        + [dummy2] * n_dummy,
        out_specs=[dummy2] + [dummy2] * n_dummy,
        scratch_shapes=[
            pltpu.VMEM((4, sublanes, LANES_), jnp.int32),
            pltpu.VMEM((36, sublanes, LANES_), jnp.float32),
            pltpu.VMEM((HDLC_VARS, sublanes, LANES_), jnp.int32),
            pltpu.VMEM((REG_WORDS, sublanes, LANES_), jnp.uint32),
        ],
        out_shape=[jax.ShapeDtypeStruct((sublanes, LANES_), jnp.int32)]
        + [jax.ShapeDtypeStruct((sublanes, LANES_), jnp.int32)] * n_dummy,
    )

    if n_dummy:
        def call(x):
            ds = [jnp.zeros((sublanes, LANES_), jnp.int32)
                  for _ in range(n_dummy)]
            return inner(x, *ds)[0]
    else:
        def call(x):
            return inner(x)[0]

    build = jax.jit(lambda seed: (
        jnp.tile(seed.astype(jnp.int16)[None], (steps, 1, 1))
        + (jnp.arange(steps, dtype=jnp.int16) % 251)[:, None, None]))
    jcall = jax.jit(call)
    jcall.effective_steps = passes * steps
    return jcall, build


def measure(fn, seed0, iters=7):
    """Min-of-N: the tunnel adds tens of ms of one-sided jitter, so the
    minimum is the best estimator of dispatch+device time."""
    import jax.numpy as jnp
    out = fn(jnp.asarray(seed0))
    _ = np.asarray(out)                      # compile + settle
    times = []
    for k in range(iters):
        seed = seed0 + k + 1                 # distinct dispatches
        t0 = time.time()
        out = fn(jnp.asarray(seed))
        _ = np.asarray(out)                  # force truthful completion
        times.append(time.time() - t0)
    return min(times)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    sublanes = 32
    steps = 1 << 22                          # ~4 M chain steps/dispatch
    for a in sys.argv[1:]:
        if a.startswith("SL="):
            sublanes = int(a[3:])
        elif a.startswith("STEPS="):
            steps = int(a[6:])

    rng = np.random.default_rng(7)
    seed0 = rng.integers(1, 2**31 - 1, (sublanes, LANES), dtype=np.int32)

    lanes = sublanes * LANES
    print(f"chain calibration @[{sublanes},128], {steps} steps/dispatch "
          f"(backend={jax.default_backend()})")
    # dispatch+readback floor: a near-empty kernel, measured FIRST
    floor = measure(make_chain_kernel(sublanes, 32, "dpll"), seed0)
    print(f"  dispatch floor    : {floor*1e3:8.2f} ms")
    results = {}
    for mode in ("dpll", "dpll+hdlc", "dpll+hdlc+shift",
                 "stream+dpll", "stream+dpll+hdlc+shift",
                 "stream+fir+dpll+hdlc+shift",
                 "stream+blocks+dpll+hdlc+shift"):
        if "stream" in mode:
            # streamed-input modes: PRE-materialize distinct int16
            # input variants (every timed dispatch must be unique or
            # the plugin serves cached results) and time only the
            # kernel.  Shrink steps so several variants fit HBM.
            st = min(steps, 1 << 17)
            inner_j, build = make_chain_kernel(sublanes, st, mode)
            inner = inner_j
            import jax.numpy as jnp
            # 5 distinct variants: one for the compile call, four for
            # the timed loop — NO dispatch may ever repeat (the plugin
            # dedup serves cached results for repeats)
            xs = [build(jnp.asarray(seed0 + v)) for v in range(5)]
            jax.block_until_ready(xs)
            _ = np.asarray(inner(xs[4]))         # compile
            times = []
            for k in range(4):
                t0 = time.time()
                _ = np.asarray(inner(xs[k]))
                times.append(time.time() - t0)
            dt, n_steps = min(times), inner_j.effective_steps
        else:
            fn = make_chain_kernel(sublanes, steps, mode)
            dt, n_steps = measure(fn, seed0), steps
        dev = max(dt - floor, 1e-9)
        sps = n_steps * lanes / dev
        ns = dev / n_steps * 1e9
        results[mode] = sps
        print(f"  {mode:22s}: {dt*1e3:8.2f} ms total  "
              f"({ns:6.1f} ns/step device)  -> {sps/1e9:6.2f} "
              f"Gsamp/s-equivalent")
    print()
    print("Compare with the full kernel's verified Gsamp/s at the same "
          "sublanes (tools/honest_bench.py); full/chain ratio is the "
          "fraction of the recurrence's measured speed of light the "
          "full kernel achieves.")


if __name__ == "__main__":
    main()
