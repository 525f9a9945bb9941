"""Golden-model parity against the reference binary.

The same synthetic raw capture is fed to the reference gnuais (oracle,
file-input mode) and to the golden NumPy chain; stdout must match
byte-for-byte and the NMEA socket broadcast packet-for-packet.
"""

import numpy as np
import pytest

from gnuais_tpu import constants as C
from gnuais_tpu.golden import encoder as E
from gnuais_tpu.golden.model import GoldenReceiver
from gnuais_tpu.runtime.session import DecodeSession
from tests.oracle_utils import run_oracle


def _golden_session(sound_channels=C.SOUND_CHANNELS_MONO, skip_type=None):
    return DecodeSession(lambda name: GoldenReceiver(name),
                         sound_channels=sound_channels, skip_type=skip_type)


def _mixed_payloads():
    return [
        E.make_type123(1, 257012345, 59.9139, 10.7522),
        E.make_type123(2, 987654321, -33.8688, 151.2093, rot=200, navstat=2),
        E.make_type123(3, 123456789, 37.8087, -122.4098, sog10=1022),
        E.make_type4(2570001, 59.0, 10.5),
        E.make_type5(257099999),
        E.make_type5(311000001, name="M/S LONGNAME 12345", dest="A VERY LONG DEST"),
        E.make_type18(258123456, 60.39, 5.32),
        E.make_type24a(257555000),
        E.make_type24b(257555000),
    ]


def test_mono_mixed_types(oracle_bin):
    audio = E.synthesize_capture(_mixed_payloads(), gap_bits=48)
    oracle_out, _, _ = run_oracle(oracle_bin, audio, "mono")
    res = _golden_session().run(audio)
    assert res.stdout_lines == oracle_out
    assert res.counters["A"] == (len(_mixed_payloads()), 0, 0)


def test_mono_random_payloads(oracle_bin):
    rng = np.random.default_rng(42)
    payloads = [E.random_payload(rng) for _ in range(60)]
    audio = E.synthesize_capture(payloads, gap_bits=40)
    oracle_out, _, _ = run_oracle(oracle_bin, audio, "mono")
    res = _golden_session().run(audio)
    assert res.stdout_lines == oracle_out
    # every payload framed; only types 1..24 produce stdout lines
    assert res.counters["A"][0] == len(payloads)


def test_mono_with_noise(oracle_bin):
    rng = np.random.default_rng(7)
    payloads = [E.random_payload(rng, msg_type=int(rng.integers(1, 25)))
                for _ in range(40)]
    audio = E.synthesize_capture(payloads, gap_bits=40, noise_std=1500.0, seed=7)
    oracle_out, _, _ = run_oracle(oracle_bin, audio, "mono")
    res = _golden_session().run(audio)
    assert res.stdout_lines == oracle_out


def test_stereo_both_channels(oracle_bin):
    rng = np.random.default_rng(3)
    pa = [E.random_payload(rng) for _ in range(25)]
    pb = [E.random_payload(rng) for _ in range(25)]
    ch_a = E.synthesize_capture(pa, gap_bits=80)
    ch_b = E.synthesize_capture(pb, gap_bits=64, lead_in_bits=128)
    audio = E.interleave_stereo(ch_a, ch_b)
    oracle_out, _, _ = run_oracle(oracle_bin, audio, "both")
    res = _golden_session(C.SOUND_CHANNELS_BOTH).run(audio)
    assert res.stdout_lines == oracle_out


def test_stereo_left_right_modes(oracle_bin):
    rng = np.random.default_rng(11)
    pa = [E.random_payload(rng) for _ in range(6)]
    pb = [E.random_payload(rng) for _ in range(6)]
    audio = E.interleave_stereo(
        E.synthesize_capture(pa, gap_bits=64),
        E.synthesize_capture(pb, gap_bits=64),
    )
    for mode_name, mode in (("left", C.SOUND_CHANNELS_LEFT),
                            ("right", C.SOUND_CHANNELS_RIGHT)):
        oracle_out, _, _ = run_oracle(oracle_bin, audio, mode_name)
        res = _golden_session(mode).run(audio)
        assert res.stdout_lines == oracle_out, mode_name


def test_ipc_nmea_broadcast(oracle_bin):
    payloads = _mixed_payloads()
    audio = E.synthesize_capture(payloads, gap_bits=48)
    _, ipc_nmea, _ = run_oracle(oracle_bin, audio, "mono", capture_ipc=True)
    res = _golden_session().run(audio)
    assert ipc_nmea, "no NMEA captured from oracle socket"
    assert res.nmea_sentences == ipc_nmea


def test_skip_type_config(oracle_bin):
    payloads = _mixed_payloads()
    audio = E.synthesize_capture(payloads, gap_bits=48)
    # one value per directive line (do_skip_type reads argv[1] only,
    # cfg.c:203-220)
    oracle_out, _, _ = run_oracle(
        oracle_bin, audio, "mono",
        extra_config="skip_type 1\nskip_type 5\nskip_type 24\n")
    res = _golden_session(skip_type=[1, 5, 24]).run(audio)
    assert res.stdout_lines == oracle_out


def test_multipart_sequence_rolls(oracle_bin):
    # >10 type-5 messages: multipart seqnr must roll 0..9 and wrap, and
    # single-part messages in between also advance it.
    payloads = []
    for i in range(12):
        payloads.append(E.make_type5(200000000 + i))
        payloads.append(E.make_type123(1, 300000000 + i, 10.0 + i, 20.0 + i))
    audio = E.synthesize_capture(payloads, gap_bits=48)
    oracle_out, _, _ = run_oracle(oracle_bin, audio, "mono")
    res = _golden_session().run(audio)
    assert res.stdout_lines == oracle_out
