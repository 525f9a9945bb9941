"""JAX device pipeline vs golden model / reference oracle.

The exact path must reproduce the golden chain payload-for-payload
(and therefore the oracle's output byte-for-byte) on clean and noisy
captures, across block boundaries and stream batches.
"""

import numpy as np
import pytest

from gnuais_tpu import constants as C
from gnuais_tpu.golden import encoder as E
from gnuais_tpu.golden.model import GoldenReceiver
from gnuais_tpu.runtime.pipeline import BatchPipeline, JaxReceiver
from gnuais_tpu.runtime.session import DecodeSession
from tests.oracle_utils import run_oracle


def _golden_frames(audio):
    g = GoldenReceiver("A")
    frames = g.run_block(audio)
    return frames, g.counters


def _jax_frames(audio, block_len=16384, n_streams=1):
    pipe = BatchPipeline(n_streams, block_len=block_len, frame_slots=64)
    out = []
    for off in range(0, len(audio), block_len):
        blk = audio[off:off + block_len]
        out += pipe.process(np.tile(blk, (n_streams, 1)))[0]
    c = pipe.counters[0]
    return out, (c.receivedframes, c.lostframes, c.lostframes2)


def _assert_same_frames(golden, jax_frames):
    assert len(golden) == len(jax_frames)
    for a, b in zip(golden, jax_frames):
        assert a.bufferlen == b.bufferlen
        assert np.array_equal(a.payload_bits[:a.bufferlen],
                              b.payload_bits[:b.bufferlen])


def test_clean_capture_matches_golden():
    rng = np.random.default_rng(1)
    payloads = [E.random_payload(rng) for _ in range(30)]
    audio = E.synthesize_capture(payloads, gap_bits=48)
    gf, gc = _golden_frames(audio)
    jf, jc = _jax_frames(audio)
    assert gc == jc
    _assert_same_frames(gf, jf)


def test_noisy_capture_matches_golden():
    # noise exercises marginal slicer decisions — catches FIR rounding
    # differences between the device kernel and the C accumulation
    rng = np.random.default_rng(2)
    payloads = [E.random_payload(rng) for _ in range(20)]
    audio = E.synthesize_capture(payloads, gap_bits=40,
                                 noise_std=2500.0, seed=2)
    gf, gc = _golden_frames(audio)
    jf, jc = _jax_frames(audio)
    assert gc == jc
    _assert_same_frames(gf, jf)


def test_block_boundary_invariance():
    # decoding must be invariant to block framing (carry correctness),
    # including frames straddling block edges and short final blocks
    rng = np.random.default_rng(3)
    payloads = [E.random_payload(rng) for _ in range(12)]
    audio = E.synthesize_capture(payloads, gap_bits=40)
    ref, refc = _jax_frames(audio, block_len=len(audio) + 4)
    for bl in (1020, 1024, 4096, 7777):
        jf, jc = _jax_frames(audio, block_len=bl)
        assert jc == refc, bl
        _assert_same_frames(ref, jf)


def test_batch_streams_independent():
    # different captures on different streams decode independently
    rng = np.random.default_rng(4)
    caps = []
    for s in range(4):
        payloads = [E.random_payload(rng) for _ in range(5)]
        caps.append(E.synthesize_capture(payloads, gap_bits=40,
                                         lead_in_bits=64 + 8 * s))
    n = max(len(c) for c in caps)
    batch = np.zeros((4, n), dtype=np.int16)
    for s, c in enumerate(caps):
        batch[s, :len(c)] = c
    pipe = BatchPipeline(4, block_len=8192, frame_slots=64)
    got = [[] for _ in range(4)]
    for off in range(0, n, 8192):
        res = pipe.process(batch[:, off:off + 8192])
        for s in range(4):
            got[s].extend(res[s])
    for s in range(4):
        gf, gc = _golden_frames(caps[s])
        c = pipe.counters[s]
        assert gc == (c.receivedframes, c.lostframes, c.lostframes2)
        _assert_same_frames(gf, got[s])


def test_crc_failure_accounting():
    audio = E.synthesize_capture([E.make_type5(257099999)])
    bad = audio.copy()
    bad[900:905] = -bad[900:905]   # kill one bit cell mid-frame
    gf, gc = _golden_frames(bad)
    jf, jc = _jax_frames(bad)
    assert gc == jc == (0, 1, 0)
    assert not jf


def test_session_end_to_end_vs_oracle(oracle_bin):
    # full product path with the JAX backend: capture -> session ->
    # stdout lines, diffed against the reference binary
    rng = np.random.default_rng(5)
    payloads = [E.random_payload(rng) for _ in range(15)]
    audio = E.synthesize_capture(payloads, gap_bits=48)
    oracle_out, _, _ = run_oracle(oracle_bin, audio, "mono")
    sess = DecodeSession(lambda name: JaxReceiver(name))
    res = sess.run(audio)
    assert res.stdout_lines == oracle_out


def test_session_stereo_vs_oracle(oracle_bin):
    rng = np.random.default_rng(6)
    pa = [E.random_payload(rng) for _ in range(6)]
    pb = [E.random_payload(rng) for _ in range(6)]
    audio = E.interleave_stereo(
        E.synthesize_capture(pa, gap_bits=64),
        E.synthesize_capture(pb, gap_bits=64, lead_in_bits=96))
    oracle_out, _, _ = run_oracle(oracle_bin, audio, "both")
    sess = DecodeSession(lambda name: JaxReceiver(name),
                         sound_channels=C.SOUND_CHANNELS_BOTH)
    res = sess.run(audio)
    assert res.stdout_lines == oracle_out
