"""IQ front-end, device CRC kernel, and checkpoint/resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnuais_tpu import constants as C
from gnuais_tpu.golden import encoder as E
from gnuais_tpu.golden.model import GoldenReceiver
from gnuais_tpu.ops import demod
from gnuais_tpu.ops.crc import crc_check_frames, extract_payload_bits
from gnuais_tpu.ops.discriminator import (design_decim_fir, init_iq,
                                          iq_to_int16_audio)
from gnuais_tpu.runtime.checkpoint import restore_pipeline, save_pipeline
from gnuais_tpu.runtime.pipeline import BatchPipeline, decode_block, init_carry


# ------------------------------------------------------------ IQ front-end

def _audio_to_iq(audio: np.ndarray, decim: int, dev_hz: float = 2400.0,
                 fs_iq: float = None) -> np.ndarray:
    """Synthesize complex baseband IQ whose FM discrimination yields the
    given 48 kHz audio: upsample (hold), integrate phase, e^{j phi}."""
    fs_iq = fs_iq or 48_000.0 * decim
    x = np.repeat(audio.astype(np.float64) / 32767.0, decim)  # [-1, 1]
    inst_freq = x * dev_hz                                     # Hz
    phase = 2 * np.pi * np.cumsum(inst_freq) / fs_iq
    return np.exp(1j * phase).astype(np.complex64)


@pytest.mark.parametrize("decim", [2, 4])
def test_iq_frontend_decodes(decim):
    payloads = [E.make_type123(1, 257012345, 59.9, 10.7),
                E.make_type18(258123456, 60.39, 5.32)]
    audio = E.synthesize_capture(payloads, gap_bits=64)
    iq = _audio_to_iq(audio, decim)
    taps = jnp.asarray(design_decim_fir(decim))
    st = init_iq(1, ntaps=taps.shape[0])
    out, st = iq_to_int16_audio(
        jnp.asarray(iq[None, :].real.astype(np.float32)),
        jnp.asarray(iq[None, :].imag.astype(np.float32)),
        st, taps, decim)
    out_np = np.asarray(out)[0]
    # decode the discriminated audio through the golden chain
    rx = GoldenReceiver("A")
    frames = rx.run_block(out_np)
    assert rx.counters[0] == len(payloads), rx.counters
    for f, p in zip(frames, payloads):
        assert np.array_equal(f.payload_bits[: f.bufferlen], p)


# ------------------------------------------------------------ device CRC

def _frames_from_capture(payload_count=6, seed=0):
    rng = np.random.default_rng(seed)
    payloads = [E.random_payload(rng) for _ in range(payload_count)]
    audio = E.synthesize_capture(payloads, gap_bits=48)
    t = len(audio)
    carry = init_carry(1)
    carry, frames, _ = decode_block(jnp.asarray(audio[None, :]),
                                    jnp.int32(t), carry, frame_slots=32)
    return frames, payloads


def test_device_crc_matches_host():
    frames, payloads = _frames_from_capture()
    n = int(np.asarray(frames.count)[0])
    assert n == len(payloads)
    words = frames.words[0, :n]
    lens = frames.length[0, :n]
    ok = np.asarray(crc_check_frames(words, lens))
    assert ok.all()
    # payload extraction matches the encoder input
    pb = np.asarray(extract_payload_bits(words, lens))
    for k, p in enumerate(payloads):
        assert np.array_equal(pb[k, : len(p)], p)


def test_device_crc_rejects_corrupt():
    frames, _ = _frames_from_capture(payload_count=3, seed=1)
    n = int(np.asarray(frames.count)[0])
    words = np.asarray(frames.words[0, :n]).copy()
    lens = np.asarray(frames.length[0, :n])
    # flip a bit in the last register word — always inside the frame
    # (it holds the final 32 appended bits: flag tail + FCS)
    words[1, 14] ^= 1 << 20
    ok = np.asarray(crc_check_frames(jnp.asarray(words), jnp.asarray(lens)))
    assert ok[0] and not ok[1] and ok[2]


# ------------------------------------------------------------ checkpoint

def test_checkpoint_resume_exact(tmp_path):
    rng = np.random.default_rng(5)
    payloads = [E.random_payload(rng) for _ in range(10)]
    audio = E.synthesize_capture(payloads, gap_bits=40)
    bl = 4096

    def run(pipe, data, start=0):
        out = []
        for off in range(start, len(data), bl):
            blk = data[off:off + bl]
            out += pipe.process(blk[None, :])[0]
        return out

    # full run
    p1 = BatchPipeline(1, block_len=bl, frame_slots=64)
    all_frames = run(p1, audio)

    # run half, checkpoint mid-frame, restore into a fresh pipeline
    p2 = BatchPipeline(1, block_len=bl, frame_slots=64)
    half = (len(audio) // (2 * bl)) * bl
    first = run(p2, audio[:half])
    save_pipeline(tmp_path / "ck.npz", p2, half)

    p3 = BatchPipeline(1, block_len=bl, frame_slots=64)
    off, _extra = restore_pipeline(tmp_path / "ck.npz", p3)
    assert off == half
    rest = run(p3, audio, start=off)

    got = first + rest
    assert len(got) == len(all_frames)
    for a, b in zip(all_frames, got):
        assert a.bufferlen == b.bufferlen
        assert np.array_equal(a.payload_bits[:a.bufferlen],
                              b.payload_bits[:b.bufferlen])
    # restored counters carried over: final tallies must match
    c1, c3 = p1.counters[0], p3.counters[0]
    assert c1.receivedframes == c3.receivedframes
    assert c1.lostframes == c3.lostframes
    assert c1.lostframes2 == c3.lostframes2


def test_checkpoint_wrong_streams_rejected(tmp_path):
    p = BatchPipeline(2, block_len=1024)
    save_pipeline(tmp_path / "c.npz", p, 0)
    p1 = BatchPipeline(1, block_len=1024)
    with pytest.raises(ValueError):
        restore_pipeline(tmp_path / "c.npz", p1)
