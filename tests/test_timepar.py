"""Time-parallel (sequence-parallel) decode vs the sequential chain."""

import numpy as np
import pytest

from gnuais_tpu.golden import encoder as E
from gnuais_tpu.golden.model import GoldenReceiver
from gnuais_tpu.parallel.timepar import time_parallel_decode


def _assert_parity(audio, chunk_len, **kw):
    g = GoldenReceiver("A")
    gf = g.run_block(audio)
    res = time_parallel_decode(audio, chunk_len=chunk_len, **kw)
    assert len(res.frames) == len(gf), (len(res.frames), len(gf))
    for a, b in zip(gf, res.frames):
        assert a.bufferlen == b.bufferlen
        assert np.array_equal(a.payload_bits[:a.bufferlen],
                              b.payload_bits[:b.bufferlen])
    return res


def test_many_chunks_parity():
    rng = np.random.default_rng(1)
    payloads = [E.random_payload(rng) for _ in range(30)]
    audio = E.synthesize_capture(payloads, gap_bits=64)
    res = _assert_parity(audio, chunk_len=8192)
    assert res.chunks >= 5


def test_busy_traffic_small_gaps():
    # minimal idle between frames: chunk boundaries land inside frames
    rng = np.random.default_rng(2)
    payloads = [E.random_payload(rng) for _ in range(50)]
    audio = E.synthesize_capture(payloads, gap_bits=24)
    _assert_parity(audio, chunk_len=8192)


def test_noise_parity():
    rng = np.random.default_rng(3)
    payloads = [E.random_payload(rng) for _ in range(25)]
    audio = E.synthesize_capture(payloads, gap_bits=48, noise_std=2000.0,
                                 seed=3)
    _assert_parity(audio, chunk_len=8192)


def test_boundary_straddling_frame():
    # place one long frame exactly across a chunk boundary
    p5 = E.make_type5(257000001)
    lead_bits = (8192 - 500) // 5
    audio = E.synthesize_capture([p5], gap_bits=16, lead_in_bits=lead_bits)
    audio = np.concatenate([audio, np.zeros(8192, np.int16)])
    _assert_parity(audio, chunk_len=8192)


def test_starts_are_monotonic():
    rng = np.random.default_rng(4)
    payloads = [E.random_payload(rng) for _ in range(12)]
    audio = E.synthesize_capture(payloads, gap_bits=64)
    res = time_parallel_decode(audio, chunk_len=8192)
    assert res.starts == sorted(res.starts)
    assert len(set(res.starts)) == len(res.starts)  # no duplicates
