"""Edge-case quirk parity with the reference decoder."""

import numpy as np
import pytest

from gnuais_tpu.golden import encoder as E
from gnuais_tpu.golden.model import GoldenReceiver
from gnuais_tpu.runtime.session import DecodeSession
from tests.oracle_utils import run_oracle


def _session():
    return DecodeSession(lambda n: GoldenReceiver(n))


def test_out_of_range_type_no_output_no_seqnr(oracle_bin):
    # type 25: CRC-valid frame, but the dispatcher drops it before NMEA
    # generation and before the seqnr roll (protodec.c:898-900).  The
    # following multipart type 5s expose the sequence counter: if the
    # dropped frame had rolled it, the seq digits would shift.
    rng = np.random.default_rng(0)
    payloads = [
        E.make_type5(200000001),
        E.random_payload(rng, msg_type=25),
        E.random_payload(rng, msg_type=63),
        E.make_type5(200000002),
    ]
    audio = E.synthesize_capture(payloads, gap_bits=48)
    oracle_out, _, _ = run_oracle(oracle_bin, audio, "mono")
    res = _session().run(audio)
    assert res.stdout_lines == oracle_out
    # only the two type 5s appear; their multipart seq ids must be 0,1
    assert len(res.stdout_lines) == 2
    assert ",2,2,0," in res.stdout_lines[0]
    assert ",2,2,1," in res.stdout_lines[1]
    # all four frames passed CRC though
    assert res.counters["A"] == (4, 0, 0)


def test_truncated_type5_reads_zero_padding(oracle_bin):
    # a type-5 header cut to 168 bits: field reads beyond the payload
    # hit the zeroed rbuffer (protodec.c:150 memset) — '@'-coded names
    # decode as spaces and strip to empty
    w = E.BitWriter()
    w.put(5, 6).put(0, 2).put(257000009, 30)
    w.put(0, 168 - 38)
    payload = w.array()
    audio = E.synthesize_capture([payload], gap_bits=48)
    oracle_out, _, _ = run_oracle(oracle_bin, audio, "mono")
    res = _session().run(audio)
    assert res.stdout_lines == oracle_out
    assert 'name "" destination ""' in res.stdout_lines[0]
    assert "draught 0.0" in res.stdout_lines[0]


def test_mmsi_zero_padding_format(oracle_bin):
    # %09ld: short MMSIs print zero-padded
    audio = E.synthesize_capture([E.make_type123(1, 7, 1.0, 2.0)])
    oracle_out, _, _ = run_oracle(oracle_bin, audio, "mono")
    res = _session().run(audio)
    assert res.stdout_lines == oracle_out
    assert "mmsi 000000007:" in res.stdout_lines[0]


def test_negative_coordinates_and_rot(oracle_bin):
    # southern/western hemispheres + the quirky overlapping field reads:
    # the parser takes rateofturn as 8 bits at offset 40, which overlaps
    # the ITU 4-bit navstat field at 38 — navstat=2 with rot=0 encodes
    # line bits whose quirky read yields rateofturn -128 (sign-wrapped
    # char) and navstat 0
    audio = E.synthesize_capture([
        E.make_type123(1, 500000001, -54.8019, -68.3030, navstat=2, rot=0),
        E.make_type123(1, 500000002, -36.8485, 174.7633, rot=0b11111100),
    ])
    oracle_out, _, _ = run_oracle(oracle_bin, audio, "mono")
    res = _session().run(audio)
    assert res.stdout_lines == oracle_out
    assert "rateofturn -128 navstat 0 " in res.stdout_lines[0]
    # rot bits 42..49: quirky read 40..47 sees 00 111111 -> 63
    assert "rateofturn 63 " in res.stdout_lines[1]
    assert "lat -54.801900" in res.stdout_lines[0]
    assert "lon -68.303000" in res.stdout_lines[0]
