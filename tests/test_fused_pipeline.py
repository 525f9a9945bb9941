"""Fully fused FIR+DPLL+slotting+HDLC kernel vs the exact chain
(interpreter on CPU; the same code path runs compiled on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gnuais_tpu.golden import encoder as E
from gnuais_tpu.golden.model import GoldenReceiver
from gnuais_tpu.runtime.pipeline import (BatchPipeline, decode_block,
                                         init_carry)


def _noisy_batch(s, t, seed=0, n_payloads=3, gap_bits=48):
    rng = np.random.default_rng(seed)
    audio = E.synthesize_capture(
        [E.random_payload(rng) for _ in range(n_payloads)],
        gap_bits=gap_bits)
    x = np.zeros((s, t), dtype=np.int16)
    for i in range(s):
        n = min(len(audio), t)
        x[i, :n] = np.roll(audio[:n], i * 13)
    noise = rng.normal(0, 300, x.shape)
    return np.clip(x + noise, -32768, 32767).astype(np.int16)


def _frames_equal(fa, fb):
    ca, cb = np.asarray(fa.count), np.asarray(fb.count)
    assert np.array_equal(ca, cb), (ca, cb)
    assert np.array_equal(np.asarray(fa.lost2), np.asarray(fb.lost2))
    assert np.array_equal(np.asarray(fa.dropped), np.asarray(fb.dropped))
    wa, wb = np.asarray(fa.words), np.asarray(fb.words)
    la, lb = np.asarray(fa.length), np.asarray(fb.length)
    sa, sb = np.asarray(fa.start), np.asarray(fb.start)
    ea, eb = np.asarray(fa.end), np.asarray(fb.end)
    for s in range(ca.shape[0]):
        k = ca[s]
        assert np.array_equal(wa[s, :k], wb[s, :k])
        assert np.array_equal(la[s, :k], lb[s, :k])
        assert np.array_equal(sa[s, :k], sb[s, :k])
        assert np.array_equal(ea[s, :k], eb[s, :k])


def _carry_equal(a, b):
    assert np.array_equal(np.asarray(a.history), np.asarray(b.history))
    for x, y in zip(a.dpll, b.dpll):
        assert np.array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(a.hdlc, b.hdlc):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_fused_pipeline_default_tier_parity():
    """Default-tier guard: one full frame through the fused kernel vs
    the exact chain, bit-exact (frames, counters, carries).  The wide
    interpret-mode shapes live in `-m slow`; this small shape keeps a
    plain `pytest` run from silently skipping every fused-kernel parity
    check (advisor round-3 medium finding)."""
    s, t = 4, 2560
    x = _noisy_batch(s, t, n_payloads=1, gap_bits=8)
    c0 = init_carry(s)
    c1, f1, p1 = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                              frame_slots=8)
    c2, f2, p2 = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                              frame_slots=8, fused_pipeline=True)
    assert (np.asarray(f1.count) == 1).all()
    _frames_equal(f1, f2)
    _carry_equal(c1, c2)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))


def test_fused_pipeline_assume_full_bitexact():
    """assume_full=True (static n_valid == T promise: valid gates
    compiled out) must be bit-identical to the general kernel on a full
    block."""
    s, t = 4, 2560
    x = _noisy_batch(s, t, n_payloads=1, gap_bits=8)
    c0 = init_carry(s)
    c1, f1, _ = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                             frame_slots=8, fused_pipeline=True)
    c2, f2, _ = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                             frame_slots=8, fused_pipeline=True,
                             assume_full=True)
    assert (np.asarray(f1.count) == 1).all()
    _frames_equal(f1, f2)
    _carry_equal(c1, c2)


def test_fused_pipeline_landing_body_equals_slot():
    """The body-landing snapshot scheme (one mini-buffer merge per
    unroll body, leaning on the >= ~27-slot stop-to-re-arm spacing)
    must be bit-identical to per-slot landing — frames, counters and
    carries — on frames, noise and a partial final block."""
    from gnuais_tpu import constants as C
    from gnuais_tpu.ops import demod
    from gnuais_tpu.ops.fused import pipeline_fused

    s, t = 4, 2560
    x = _noisy_batch(s, t, n_payloads=1, gap_bits=8)
    x[2] = np.clip(np.random.default_rng(3).normal(0, 6000, t),
                   -32768, 32767).astype(np.int16)   # pure noise row
    hist = jnp.zeros((s, C.FIR_LEN), jnp.float32)
    # one flag pair at unroll 32: each pipeline_fused variant is its
    # own interpret-mode compile (unroll 64 compiles pathologically
    # slowly on CPU XLA); the unroll-64 sweeps run compiled in the
    # on-TPU tier, which pins the same parity on silicon
    for nv, unroll in ((t - 333, 32),):
        outs = {}
        for landing in ("slot", "body"):
            d0, h0 = demod.init_dpll(s), demod.init_hdlc(s)
            outs[landing] = pipeline_fused(
                jnp.asarray(x), jnp.int32(nv), hist, d0, h0,
                block_base=77, unroll=unroll, landing=landing,
                lost2_lo=jnp.int32(0), lost2_hi=jnp.int32(nv))
        import jax
        for va, vb in zip(jax.tree.leaves(outs["slot"]),
                          jax.tree.leaves(outs["body"])):
            assert np.array_equal(np.asarray(va), np.asarray(vb)), \
                (nv, unroll)
        assert int(np.asarray(outs["body"][0]).sum()) >= s - 1


def test_kernel_compact_default_tier_parity():
    """In-kernel candidate compaction (kernel_compact=True: the kernel
    lands frames at the lane's running count in a VMEM-resident slot
    buffer; the ~99%-empty [S, K] candidate axis never reaches HBM)
    must be bit-identical to pipeline_fused + compact_candidates —
    frames, counters, dropped accounting and carries — on frames,
    masking and a lost2 position gate.  Shape and flags match
    test_fused_pipeline_default_tier_parity so the non-compact side
    reuses that test's compiled program (interpret-mode XLA compiles
    dominate this tier's wall time); slot overflow and the
    back-to-back minimal-frame sweep run in `-m slow`."""
    s, t = 4, 2560
    x = _noisy_batch(s, t, n_payloads=1, gap_bits=8)

    def cmp(nv, lo=-2**31, hi=2**31 - 1):
        # the bounds ride as DYNAMIC scalars so all three cases share
        # one compiled program per path (two compiles total)
        c0 = init_carry(s)
        c1, f1, _ = decode_block(jnp.asarray(x), jnp.int32(nv), c0,
                                 frame_slots=8, fused_pipeline=True,
                                 lost2_lo=jnp.int32(lo),
                                 lost2_hi=jnp.int32(hi))
        c2, f2, _ = decode_block(jnp.asarray(x), jnp.int32(nv), c0,
                                 frame_slots=8, fused_pipeline=True,
                                 lost2_lo=jnp.int32(lo),
                                 lost2_hi=jnp.int32(hi),
                                 kernel_compact=True)
        _frames_equal(f1, f2)
        assert np.array_equal(np.asarray(f1.crcfail),
                              np.asarray(f2.crcfail))
        _carry_equal(c1, c2)
        return f1

    f = cmp(t)
    assert np.asarray(f.count).max() >= 1
    cmp(t - 700)                                       # masked tail
    cmp(t, lo=500, hi=2000)                            # position gate


@pytest.mark.slow
def test_kernel_compact_device_crc_and_odd_slots():
    """kernel_compact composed with device_crc (the on-device CRC
    post-pass runs on the kernel-compacted batch) must match the
    non-compact device_crc path exactly; frame_slots=24 additionally
    exercises the paged merge's clamped final page (24 is not a PG=16
    multiple)."""
    s, t = 4, 4096
    x = _noisy_batch(s, t, seed=13, n_payloads=4, gap_bits=30)
    # corrupt one bit cell mid-payload so a CRC reject flows through
    # the crcfail accounting on both paths (checked against the golden
    # receiver: this position deframes but fails CRC; later positions
    # hit the stop flag and become wrong-size instead)
    x[1, 900:905] = -x[1, 900:905]
    c0 = init_carry(s)
    c1, f1, _ = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                             frame_slots=24, fused_pipeline=True,
                             device_crc=True)
    c2, f2, _ = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                             frame_slots=24, fused_pipeline=True,
                             device_crc=True, kernel_compact=True)
    _frames_equal(f1, f2)
    assert np.array_equal(np.asarray(f1.crcfail), np.asarray(f2.crcfail))
    assert np.asarray(f1.crcfail).sum() >= 1
    _carry_equal(c1, c2)


@pytest.mark.slow
def test_kernel_compact_slot_overflow():
    """frame_slots smaller than the frame count: the running-count
    landing must clip writes and report dropped identically to
    compact_candidates' overflow accounting."""
    s, t = 4, 4096
    x = _noisy_batch(s, t, seed=13, n_payloads=4, gap_bits=30)
    c0 = init_carry(s)
    c1, f1, _ = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                             frame_slots=1, fused_pipeline=True)
    c2, f2, _ = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                             frame_slots=1, fused_pipeline=True,
                             kernel_compact=True)
    _frames_equal(f1, f2)
    _carry_equal(c1, c2)


@pytest.mark.slow
def test_kernel_compact_backtoback_minimal_frames():
    """Back-to-back MINIMAL hand-crafted frames (1-byte payload, zero
    inter-frame gap — the densest emission pattern the deframer's own
    state machine permits, ~69 slots stop-to-stop) swept across chunk
    alignments: the running-count landing must stay bit-identical to
    compact_candidates at every phase, including stops on either side
    of a chunk boundary (consecutive flush merges)."""
    tiny = E.frame_line_bits(np.zeros(8, dtype=np.uint8))  # ~60 bits
    for lead in range(0, 56, 8):
        bits = [1] * (16 + lead) + list(tiny) + list(tiny) + [1] * 32
        levels = E.nrzi_encode(np.array(bits, dtype=np.uint8))
        audio = E.levels_to_audio(levels)
        t = 2048                    # fixed shape: one compile, 7 phases
        assert len(audio) <= t
        x = np.zeros((2, t), dtype=np.int16)
        x[:, :len(audio)] = audio
        c0 = init_carry(2)
        c1, f1, _ = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                                 frame_slots=8, fused_pipeline=True)
        c2, f2, _ = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                                 frame_slots=8, fused_pipeline=True,
                                 kernel_compact=True)
        _frames_equal(f1, f2)
        _carry_equal(c1, c2)
        assert int(np.asarray(f1.count)[0]) == 2, lead


@pytest.mark.slow
def test_fused_pipeline_matches_exact_bitexact():
    s, t = 8, 2048
    x = _noisy_batch(s, t)
    c0 = init_carry(s)
    c1, f1, p1 = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                              frame_slots=16)
    c2, f2, p2 = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                              frame_slots=16, fused_pipeline=True)
    _frames_equal(f1, f2)
    _carry_equal(c1, c2)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))


@pytest.mark.slow
def test_fused_pipeline_chained_blocks_short_tail():
    """Chained blocks with a short (masked) final block and nonzero
    block_base: carries and frame start positions must track the exact
    path through partial-frame hand-offs."""
    s, t = 4, 1024
    x = _noisy_batch(s, 3 * t, seed=3, n_payloads=4, gap_bits=24)
    ca = init_carry(s)
    cb = ca
    for blk in range(3):
        xb = x[:, blk * t:(blk + 1) * t]
        nv = t if blk < 2 else 700
        ca, fa, _ = decode_block(jnp.asarray(xb), jnp.int32(nv), ca,
                                 frame_slots=16, block_base=blk * t)
        cb, fb, _ = decode_block(jnp.asarray(xb), jnp.int32(nv), cb,
                                 frame_slots=16, block_base=blk * t,
                                 fused_pipeline=True)
        _frames_equal(fa, fb)
        _carry_equal(ca, cb)


@pytest.mark.slow
def test_fused_pipeline_tiny_final_block_history():
    """n_valid < FIR_LEN (36) on the final block: carried FIR history
    must splice [history | samples], not read the pad tail (regression
    for the _carry_history negative-index wraparound)."""
    s, t = 2, 512
    x = _noisy_batch(s, 2 * t, seed=11)
    for nv in (1, 35):
        ca = init_carry(s)
        cb = ca
        for blk, n in ((0, t), (1, nv)):
            xb = x[:, blk * t:(blk + 1) * t]
            ca, fa, _ = decode_block(jnp.asarray(xb), jnp.int32(n), ca,
                                     frame_slots=16, block_base=blk * t)
            cb, fb, _ = decode_block(jnp.asarray(xb), jnp.int32(n), cb,
                                     frame_slots=16, block_base=blk * t,
                                     fused_pipeline=True)
            _frames_equal(fa, fb)
            _carry_equal(ca, cb)


@pytest.mark.slow
def test_fused_pipeline_dense_frames_mini_slots():
    """Back-to-back frames (minimum gaps) exercise two completions per
    64-slot HDLC chunk — the mini-buffer depth bound."""
    rng = np.random.default_rng(9)
    payloads = [E.random_payload(rng, msg_type=1) for _ in range(12)]
    audio = E.synthesize_capture(payloads, gap_bits=1, lead_in_bits=32)
    t = (len(audio) + 511) // 512 * 512
    x = np.zeros((2, t), dtype=np.int16)
    x[:, :len(audio)] = audio
    c0 = init_carry(2)
    c1, f1, _ = decode_block(jnp.asarray(x), jnp.int32(len(audio)), c0,
                             frame_slots=32)
    c2, f2, _ = decode_block(jnp.asarray(x), jnp.int32(len(audio)), c0,
                             frame_slots=32, fused_pipeline=True)
    # The zero-gap preamble hunt can legitimately lose a frame (same as
    # the reference); the count must match the golden model, and stay
    # dense enough to exercise multiple completions per 64-slot chunk.
    g = GoldenReceiver("A")
    golden_n = len(g.run_block(audio))
    assert int(np.asarray(f1.count)[0]) == golden_n
    assert golden_n >= 11
    _frames_equal(f1, f2)
    _carry_equal(c1, c2)


@pytest.mark.slow
def test_fused_pipeline_mxu_fir_packet_parity():
    """mxu_fir swaps the in-kernel FIR for the XLA convolution — not
    guaranteed bit-exact on filtered floats, but packet decisions must
    match on captures (the parity gate for the throughput mode)."""
    s, t = 4, 2048
    x = _noisy_batch(s, t, seed=23)
    c0 = init_carry(s)
    c1, f1, _ = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                             frame_slots=16, fused_pipeline=True)
    c2, f2, _ = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                             frame_slots=16, fused_pipeline=True,
                             mxu_fir=True)
    _frames_equal(f1, f2)
    for a, b in zip(c1.dpll, c2.dpll):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # raw-sample FIR history must be carried identically (it is computed
    # from raw samples on both paths)
    assert np.array_equal(np.asarray(c1.history), np.asarray(c2.history))


@pytest.mark.slow
def test_fused_pipeline_lobe_fir_packet_parity():
    """The flagship bench FIR (fir_mode="lobe": 16 main-lobe taps,
    symmetric pairing) must keep packet decisions — payload words,
    lengths and counts — identical to the exact kernel on the bench's
    own capture shape (clean frames with per-stream lead-in variants;
    the bench additionally CRC-gates every run inline).  A slicer
    sample within rounding noise of a zero crossing CAN decide a
    borderline frame differently — the same statistical envelope as
    overlap-resync — which is why lobe stays a gated throughput mode
    and the byte-parity CLI paths never use it."""
    s, t = 4, 3584
    rng = np.random.default_rng(29)
    payloads = [E.random_payload(rng, msg_type=1) for _ in range(1)]
    x = np.zeros((s, t), dtype=np.int16)
    for i in range(s):
        audio = E.synthesize_capture(payloads, gap_bits=48,
                                     lead_in_bits=64 + 16 * i)
        assert len(audio) <= t, len(audio)
        x[i, :len(audio)] = audio
    c0 = init_carry(s)
    c1, f1, _ = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                             frame_slots=16, fused_pipeline=True)
    c2, f2, _ = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                             frame_slots=16, fused_pipeline=True,
                             lobe_fir=True)
    assert np.array_equal(np.asarray(f1.count), np.asarray(f2.count))
    assert (np.asarray(f1.count) == 1).all()
    for i in range(s):
        k = int(np.asarray(f1.count)[i])
        assert np.array_equal(np.asarray(f1.words)[i, :k],
                              np.asarray(f2.words)[i, :k])
        assert np.array_equal(np.asarray(f1.length)[i, :k],
                              np.asarray(f2.length)[i, :k])
        assert np.abs(np.asarray(f1.start)[i, :k]
                      - np.asarray(f2.start)[i, :k]).max(initial=0) <= 2


@pytest.mark.slow
def test_fused_pipeline_device_crc_filter():
    """device_crc compacts only CRC-passing frames on device; rejects
    land in the crcfail counter so BatchPipeline counters match the
    host-CRC path exactly — including a corrupted mid-frame bit cell."""
    rng = np.random.default_rng(17)
    payloads = [E.random_payload(rng) for _ in range(6)]
    audio = E.synthesize_capture(payloads, gap_bits=48)
    # invert one 5-sample bit cell inside the third frame to force a
    # CRC reject that still deframes (wrong-CRC counter path)
    third = 2 * (len(audio) // len(payloads)) + 700
    audio = audio.copy()
    audio[third:third + 5] = -audio[third:third + 5]

    bl = 4096
    pa = BatchPipeline(1, block_len=bl, frame_slots=64,
                       fused_pipeline=True)
    pb = BatchPipeline(1, block_len=bl, frame_slots=64,
                       fused_pipeline=True, device_crc=True)
    fa, fb = [], []
    for off in range(0, len(audio), bl):
        blk = audio[None, off:off + bl]
        fa += pa.process(blk)[0]
        fb += pb.process(blk)[0]
    ca, cb = pa.counters[0], pb.counters[0]
    assert (ca.receivedframes, ca.lostframes, ca.lostframes2) == \
           (cb.receivedframes, cb.lostframes, cb.lostframes2)
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        assert a.crc_ok and b.crc_ok
        assert np.array_equal(a.payload_bits[:a.bufferlen],
                              b.payload_bits[:b.bufferlen])


@pytest.mark.slow
def test_fused_pipeline_stream_grid_multi_tile():
    """S > 1024 rides extra stream tiles on the kernel grid; results
    must stay bit-identical to the exact chain on every tile (incl. the
    padded tail of the last tile)."""
    s, t = 1100, 512
    rng = np.random.default_rng(13)
    audio = E.synthesize_capture([E.random_payload(rng, msg_type=1)],
                                 gap_bits=8, lead_in_bits=8)
    x = np.zeros((s, t), dtype=np.int16)
    for i in range(s):
        n = min(len(audio), t)
        x[i, :n] = np.roll(audio[:n], i % 7)
    c0 = init_carry(s)
    c1, f1, p1 = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                              frame_slots=8)
    c2, f2, p2 = decode_block(jnp.asarray(x), jnp.int32(t), c0,
                              frame_slots=8, fused_pipeline=True)
    _frames_equal(f1, f2)
    _carry_equal(c1, c2)
    # the second stream tile (rows >= 1024) must carry real state too
    assert np.asarray(c2.dpll.pll)[1024:].any()


@pytest.mark.slow
def test_fused_pipeline_end_to_end_vs_golden():
    rng = np.random.default_rng(7)
    payloads = [E.random_payload(rng) for _ in range(8)]
    audio = E.synthesize_capture(payloads, gap_bits=48)
    g = GoldenReceiver("A")
    gf = g.run_block(audio)

    pipe = BatchPipeline(1, block_len=4096, frame_slots=64,
                         fused_pipeline=True)
    got = []
    for off in range(0, len(audio), 4096):
        got += pipe.process(audio[None, off:off + 4096])[0]
    c = pipe.counters[0]
    assert (c.receivedframes, c.lostframes, c.lostframes2) == g.counters
    assert len(got) == len(gf)
    for a, b in zip(gf, got):
        assert np.array_equal(a.payload_bits[:a.bufferlen],
                              b.payload_bits[:b.bufferlen])
