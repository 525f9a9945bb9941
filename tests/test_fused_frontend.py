"""Fused FIR+DPLL+slotting kernel vs the unfused exact chain
(interpreter on CPU; the same code path runs compiled on TPU)."""

import numpy as np

import jax.numpy as jnp

from gnuais_tpu.golden import encoder as E
from gnuais_tpu.golden.model import GoldenReceiver
from gnuais_tpu.ops import demod, fir
from gnuais_tpu.ops.fused import frontend_fused
from gnuais_tpu.runtime.pipeline import BatchPipeline


def _noisy_batch(s, t, seed=0):
    rng = np.random.default_rng(seed)
    audio = E.synthesize_capture(
        [E.random_payload(rng) for _ in range(3)], gap_bits=48)
    x = np.zeros((s, t), dtype=np.int16)
    for i in range(s):
        n = min(len(audio), t)
        x[i, :n] = np.roll(audio[:n], i * 13)
    noise = rng.normal(0, 300, x.shape)
    return np.clip(x + noise, -32768, 32767).astype(np.int16)


def _reference_chain(x, nv, hist, dpll, block_base=0):
    t = x.shape[1]
    filtered, hist2 = fir.fir_exact(jnp.asarray(x), hist,
                                    n_valid=jnp.int32(nv))
    bv, b, st2 = demod.dpll_scan(filtered, jnp.arange(t) < nv, dpll)
    gb, gv, gp = demod.group_reduce_bits(bv, b, block_base)
    return gb, gv, gp, hist2, st2


def test_frontend_matches_unfused_bitexact():
    s, t = 8, 2048
    x = _noisy_batch(s, t)
    hist = fir.init_history(s)
    dpll = demod.init_dpll(s)
    gb1, gv1, gp1, h1, st1 = _reference_chain(x, t, hist, dpll)
    gb2, gv2, gp2, h2, st2 = frontend_fused(
        jnp.asarray(x), jnp.int32(t), hist, dpll)
    gv1 = np.asarray(gv1)
    assert np.array_equal(gv1, np.asarray(gv2))
    assert np.array_equal(np.asarray(gb1) * gv1, np.asarray(gb2) * gv1)
    assert np.array_equal(np.asarray(gp1) * gv1, np.asarray(gp2) * gv1)
    assert np.array_equal(np.asarray(h1), np.asarray(h2))
    for a, b in zip(st1, st2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_frontend_chained_blocks_and_block_base():
    s, t = 4, 1024
    x = _noisy_batch(s, 3 * t, seed=3)
    hist_a = fir.init_history(s)
    dpll_a = demod.init_dpll(s)
    hist_b, dpll_b = hist_a, dpll_a
    for blk in range(3):
        xb = x[:, blk * t:(blk + 1) * t]
        gb1, gv1, gp1, hist_a, dpll_a = _reference_chain(
            xb, t, hist_a, dpll_a, block_base=blk * t)
        gb2, gv2, gp2, hist_b, dpll_b = frontend_fused(
            jnp.asarray(xb), jnp.int32(t), hist_b, dpll_b,
            block_base=blk * t)
        gv = np.asarray(gv1)
        assert np.array_equal(gv, np.asarray(gv2))
        assert np.array_equal(np.asarray(gb1) * gv, np.asarray(gb2) * gv)
        assert np.array_equal(np.asarray(gp1) * gv, np.asarray(gp2) * gv)
        assert np.array_equal(np.asarray(hist_a), np.asarray(hist_b))
        for a, b in zip(dpll_a, dpll_b):
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_frontend_short_block_masking():
    s, t = 4, 1024
    x = _noisy_batch(s, t, seed=1)
    nv = 700
    hist = fir.init_history(s)
    dpll = demod.init_dpll(s)
    gb1, gv1, gp1, h1, st1 = _reference_chain(x, nv, hist, dpll)
    gb2, gv2, gp2, h2, st2 = frontend_fused(
        jnp.asarray(x), jnp.int32(nv), hist, dpll)
    gv = np.asarray(gv1)
    assert np.array_equal(gv, np.asarray(gv2))
    assert np.array_equal(np.asarray(gb1) * gv, np.asarray(gb2) * gv)
    assert np.array_equal(np.asarray(h1), np.asarray(h2))
    for a, b in zip(st1, st2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_frontend_short_block_history_carry():
    """n_valid < FIR_LEN: the carried history must splice history+samples,
    not wrap to the pad region (regression: dynamic_slice negative-index
    wraparound in _carry_history)."""
    s, t = 4, 512
    x = _noisy_batch(s, t, seed=5)
    for nv in (0, 1, 35):
        hist = fir.init_history(s) + 7.0   # non-zero so splices are visible
        dpll = demod.init_dpll(s)
        gb1, gv1, gp1, h1, st1 = _reference_chain(x, nv, hist, dpll)
        gb2, gv2, gp2, h2, st2 = frontend_fused(
            jnp.asarray(x), jnp.int32(nv), hist, dpll)
        assert np.array_equal(np.asarray(h1), np.asarray(h2)), nv
        gv = np.asarray(gv1)
        assert np.array_equal(gv, np.asarray(gv2)), nv
        for a, b in zip(st1, st2):
            assert np.array_equal(np.asarray(a), np.asarray(b)), nv


def test_fused_frontend_pipeline_end_to_end():
    rng = np.random.default_rng(7)
    payloads = [E.random_payload(rng) for _ in range(8)]
    audio = E.synthesize_capture(payloads, gap_bits=48)
    g = GoldenReceiver("A")
    gf = g.run_block(audio)

    pipe = BatchPipeline(1, block_len=4096, frame_slots=64,
                         fused_frontend=True)
    got = []
    for off in range(0, len(audio), 4096):
        got += pipe.process(audio[None, off:off + 4096])[0]
    c = pipe.counters[0]
    assert (c.receivedframes, c.lostframes, c.lostframes2) == g.counters
    assert len(got) == len(gf)
    for a, b in zip(gf, got):
        assert np.array_equal(a.payload_bits[:a.bufferlen],
                              b.payload_bits[:b.bufferlen])
