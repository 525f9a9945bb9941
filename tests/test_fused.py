"""Pallas DPLL kernel vs the exact scan (interpreter on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnuais_tpu.golden import encoder as E
from gnuais_tpu.golden.model import GoldenReceiver
from gnuais_tpu.ops import demod
from gnuais_tpu.ops.fused import dpll_fused
from gnuais_tpu.runtime.pipeline import BatchPipeline


def _noisy_batch(s, t, seed=0):
    rng = np.random.default_rng(seed)
    audio = E.synthesize_capture(
        [E.random_payload(rng) for _ in range(3)], gap_bits=48)
    x = np.zeros((s, t), dtype=np.float32)
    for i in range(s):
        n = min(len(audio), t)
        x[i, :n] = np.roll(audio[:n], i * 13)
    x += rng.normal(0, 300, x.shape).astype(np.float32)
    return x


def test_kernel_matches_scan_bitexact():
    s, t = 8, 2048
    x = _noisy_batch(s, t)
    st = demod.init_dpll(s)
    bv1, b1, st1 = demod.dpll_scan(jnp.asarray(x), jnp.arange(t) < t, st)
    bv2, b2, st2 = dpll_fused(jnp.asarray(x), jnp.int32(t), st)
    assert np.array_equal(np.asarray(bv1), np.asarray(bv2))
    assert np.array_equal(np.asarray(b1) * np.asarray(bv1),
                          np.asarray(b2) * np.asarray(bv2))
    for a, b in zip(st1, st2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_kernel_short_block_masking():
    s, t = 4, 1024
    x = _noisy_batch(s, t, seed=1)
    st = demod.init_dpll(s)
    nv = 700
    bv1, b1, st1 = demod.dpll_scan(jnp.asarray(x), jnp.arange(t) < nv, st)
    bv2, b2, st2 = dpll_fused(jnp.asarray(x), jnp.int32(nv), st)
    assert np.array_equal(np.asarray(bv1), np.asarray(bv2))
    for a, b in zip(st1, st2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_fast_pipeline_end_to_end():
    rng = np.random.default_rng(7)
    payloads = [E.random_payload(rng) for _ in range(8)]
    audio = E.synthesize_capture(payloads, gap_bits=48)
    g = GoldenReceiver("A")
    gf = g.run_block(audio)

    pipe = BatchPipeline(1, block_len=4096, frame_slots=64,
                         exact_fir=True, fast_dpll=True)
    got = []
    for off in range(0, len(audio), 4096):
        got += pipe.process(audio[None, off:off + 4096])[0]
    c = pipe.counters[0]
    assert (c.receivedframes, c.lostframes, c.lostframes2) == g.counters
    assert len(got) == len(gf)
    for a, b in zip(gf, got):
        assert np.array_equal(a.payload_bits[:a.bufferlen],
                              b.payload_bits[:b.bufferlen])
