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


def test_dense_frames_matches_slot_drain():
    """dense_frames + extract_dense must reproduce exactly the frames
    the per-stream slot drain yields — order, starts and payloads —
    and the capped-overflow fallback must engage."""
    import jax.numpy as jnp

    from gnuais_tpu.ops import demod
    from gnuais_tpu.runtime import pipeline as pl

    rng = np.random.default_rng(19)
    payloads = [E.random_payload(rng) for _ in range(5)]
    audio = E.synthesize_capture(payloads, gap_bits=64)
    s, t = 3, -(-len(audio) // 512) * 512
    x = np.zeros((s, t), dtype=np.int16)
    for i in range(s):
        x[i, : len(audio)] = audio
    c0 = pl.init_carry(s)
    _c, frames, _p = pl.decode_block(jnp.asarray(x), jnp.int32(len(audio)),
                                     c0, frame_slots=16)

    want = pl.extract_frames(frames)
    starts = np.asarray(frames.start)

    dense = demod.dense_frames(frames, cap=64)
    assert int(dense.total) == 5 * s and int(dense.over) == 0
    got = pl.extract_dense(dense, s)
    ends = np.asarray(frames.end)
    for i in range(s):
        assert len(got[i]) == len(want[i])
        for j, ((st, en, fr), wf) in enumerate(zip(got[i], want[i])):
            assert st == int(starts[i, j])
            assert en == int(ends[i, j])
            # the stop flag lands a frame-length after the data start
            assert en > st
            assert fr.crc_ok == wf.crc_ok
            assert np.array_equal(fr.payload_bits[:fr.bufferlen],
                                  wf.payload_bits[:wf.bufferlen])

    over = demod.dense_frames(frames, cap=4)
    assert int(over.total) == 4 and int(over.over) == 5 * s - 4


def test_timepar_dense_drain_parity():
    """The dense readback path must produce the same frame set as the
    slot drain path (dense_cap=None)."""
    rng = np.random.default_rng(23)
    payloads = [E.random_payload(rng) for _ in range(12)]
    audio = E.synthesize_capture(payloads, gap_bits=400)
    stream = np.tile(audio, 3).astype(np.int16)
    a = time_parallel_decode(stream, chunk_len=8192, dense_cap=None)
    b = time_parallel_decode(stream, chunk_len=8192, dense_cap=512)
    assert a.starts == b.starts and len(a.frames) == len(b.frames)
    for x_, y_ in zip(a.frames, b.frames):
        assert np.array_equal(x_.payload_bits[:x_.bufferlen],
                              y_.payload_bits[:y_.bufferlen])


def test_timepar_long_gaps_with_noise_floor_parity():
    """Long inter-frame gaps at a soundcard-realistic noise floor: the
    DPLL re-locks inside every lead overlap, so the parallel lanes must
    reproduce the sequential chain's frame set exactly.  (Digitally
    silent gaps are outside the resync envelope — see the module
    docstring.)"""
    from gnuais_tpu.runtime.pipeline import BatchPipeline

    rng = np.random.default_rng(31)
    payloads = [E.random_payload(rng) for _ in range(10)]
    audio = E.synthesize_capture(payloads, gap_bits=2000)
    stream = np.tile(audio, 2)
    noise = rng.normal(0, 300, stream.shape)
    stream = np.clip(stream + noise, -32768, 32767).astype(np.int16)

    bl = 16_384
    pipe = BatchPipeline(1, block_len=bl, frame_slots=64)
    seq = []
    for off in range(0, len(stream), bl):
        seq += pipe.process(stream[None, off:off + bl])[0]

    res = time_parallel_decode(stream, chunk_len=16_384)
    assert len(res.frames) == len(seq) == 20
    for a, b in zip(seq, res.frames):
        assert np.array_equal(a.payload_bits[:a.bufferlen],
                              b.payload_bits[:b.bufferlen])
