"""Adversarial frame density: minimum-size frames, zero idle gap.

Stresses the chunked HDLC scan's MINI_SLOTS-per-chunk bound (frame
completions must be > HDLC_CHUNK/MINI_SLOTS bit-slots apart) and the
group-reduce slotting at maximum bit rate.
"""

import numpy as np

from gnuais_tpu.golden import encoder as E
from gnuais_tpu.golden.model import GoldenReceiver
from gnuais_tpu.runtime.pipeline import BatchPipeline


def _tiny_payload(i):
    # 24-bit payload (3 bytes): the smallest whole-byte frame the
    # dispatcher accepts; type out of range is fine for the deframer
    w = E.BitWriter()
    w.put(1, 6).put(0, 2).put(i & 0xFFFF, 16)
    return w.array()


def test_dense_minimal_frames():
    payloads = [_tiny_payload(i) for i in range(60)]
    audio = E.synthesize_capture(payloads, gap_bits=0)
    g = GoldenReceiver("A")
    gf = g.run_block(audio)
    # at zero gap even the reference drops one frame (the preamble hunt
    # needs >14 alternations that back-to-back flags don't provide);
    # verified against the oracle binary: 59/60 on both
    assert g.counters == (59, 0, 0)

    pipe = BatchPipeline(1, block_len=8192, frame_slots=64)
    got = []
    for off in range(0, len(audio), 8192):
        got += pipe.process(audio[None, off:off + 8192])[0]
    c = pipe.counters[0]
    assert (c.receivedframes, c.lostframes, c.lostframes2) == g.counters
    for a, b in zip(gf, got):
        assert np.array_equal(a.payload_bits[:a.bufferlen],
                              b.payload_bits[:b.bufferlen])


def test_dense_frames_tight_slots():
    # frame_slots just big enough: the per-block slot compaction must
    # not drop or reorder anything
    payloads = [_tiny_payload(i) for i in range(30)]
    audio = E.synthesize_capture(payloads, gap_bits=0)
    pipe = BatchPipeline(1, block_len=len(audio) + (4 - len(audio) % 4) % 4,
                         frame_slots=30)
    got = pipe.process(audio[None, :])[0]
    g = GoldenReceiver("A")
    gf = g.run_block(audio)
    assert len(got) == len(gf)
    for f in got:
        assert f.bufferlen == 24
