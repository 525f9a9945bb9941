#!/usr/bin/env python
"""A/B the per-slot snapshot guard: pl.when(any(emit)) vs unconditional
selects, directly on pipeline_fused at the flagship tile shape."""
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
    from gnuais_tpu.ops.demod import init_hdlc
    from gnuais_tpu.ops import demod
    from gnuais_tpu import constants as C

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    S, T = 4096, 49_152
    fir = "mxu"
    guarded = True
    for a in sys.argv[1:]:
        if a == "unguarded":
            guarded = False
        elif a in ("vpu", "lobe", "mxu"):
            fir = a

    rng = np.random.default_rng(0)
    payloads = [E.random_payload(rng) for _ in range(4)]
    bufs, wants = [], []
    for v in range(3):
        audio = E.synthesize_capture(payloads[:3 + v % 2], gap_bits=64,
                                     lead_in_bits=64 + 16 * v)
        b = np.zeros((S, T), np.int16)
        b[:, :len(audio)] = audio
        bufs.append(jax.device_put(jnp.asarray(b)))
        wants.append((3 + v % 2) * S)

    hist0 = jnp.zeros((S, C.FIR_LEN), jnp.float32)
    dpll0 = demod.init_dpll(S)
    hdlc0 = init_hdlc(S)

    @jax.jit
    def step(x):
        (cand_valid, cw, cl, cs, ce, lost2, over, h, d, hh) = \
            pipeline_fused(x, jnp.int32(T), hist0, dpll0, hdlc0,
                           sublanes=32, fir_mode=fir, guarded=guarded,
                           assume_full=True)
        return cand_valid.sum()

    n = step(bufs[0])
    assert int(n) == wants[0], (int(n), wants[0])
    times = []
    for k in range(8):
        x = bufs[k % 3]
        t0 = time.time()
        total = int(np.asarray(step(x)))
        times.append(time.time() - t0)
        assert total == wants[k % 3], (total, wants[k % 3])
    med = sorted(times)[len(times) // 2]
    print(f"fir={fir} guarded={guarded}: median {med*1e3:.2f} ms = "
          f"{S*T/med/1e9:.2f} Gsamp/s  best {S*T/min(times)/1e9:.2f}")


if __name__ == "__main__":
    main()
