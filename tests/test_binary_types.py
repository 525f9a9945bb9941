"""Deterministic coverage for the binary/ack/datalink message types
(6, 7, 8, 13, 20) including the DAC=1 weather (FI=11) and
persons-on-board (FI=40) submessages, diffed against the oracle."""

import numpy as np
import pytest

from gnuais_tpu.golden import encoder as E
from gnuais_tpu.golden.model import GoldenReceiver
from gnuais_tpu.runtime.session import DecodeSession
from tests.oracle_utils import run_oracle


def _type6_weather(mmsi=123456789, dst=987654321):
    w = E.BitWriter()
    w.put(6, 6).put(0, 2).put(mmsi, 30)
    w.put(1, 2)          # sequence
    w.put(dst, 30)
    w.put(0, 1)          # retransmit
    w.put(0, 1)          # spare
    w.put(1, 10)         # DAC = 1
    w.put(11, 6)         # FI = 11 (weather)
    # weather body from bit 88; fill a recognizable pattern
    for k in range(168 - 88):
        w.bits.append((k * 7 % 3) == 0 and 1 or 0)
    while len(w.bits) % 8:
        w.bits.append(0)
    return w.array()


def _type8_persons(mmsi=211000001, persons=42):
    w = E.BitWriter()
    w.put(8, 6).put(0, 2).put(mmsi, 30)
    w.put(0, 2)          # spare
    w.put(1, 10)         # DAC = 1
    w.put(40, 6)         # FI = 40
    w.put(persons, 13)   # persons-on-board at bit 56
    w.put(0, 3)
    w.put(0, 168 - 72 - 8)
    while len(w.bits) % 8:
        w.bits.append(0)
    return w.array()


def _type7_acks(mmsi=230000007, dsts=(111111111, 222222222, 333333333)):
    w = E.BitWriter()
    w.put(7, 6).put(0, 2).put(mmsi, 30)
    w.put(0, 2)
    for d in dsts:
        w.put(d, 30)
        w.put(1, 2)
    while len(w.bits) % 8:
        w.bits.append(0)
    return w.array()


def _type13(mmsi=230000013):
    w = E.BitWriter()
    w.put(13, 6).put(0, 2).put(mmsi, 30)
    w.put(0, 2)
    w.put(444444444, 30).put(3, 2)
    while len(w.bits) % 8:
        w.bits.append(0)
    return w.array()


def _type20(mmsi=2300020):
    w = E.BitWriter()
    w.put(20, 6).put(0, 2).put(mmsi, 30)
    w.put(0, 2)
    for ofs, slots, timeout, incr in ((1000, 5, 3, 250), (2000, 2, 7, 0)):
        w.put(ofs, 12).put(slots, 4).put(timeout, 3).put(incr, 11)
    while len(w.bits) % 8:
        w.bits.append(0)
    return w.array()


@pytest.fixture(scope="module")
def decoded(oracle_bin):
    payloads = [_type6_weather(), _type8_persons(), _type7_acks(),
                _type13(), _type20()]
    audio = E.synthesize_capture(payloads, gap_bits=48)
    oracle_out, _, _ = run_oracle(oracle_bin, audio, "mono")
    res = DecodeSession(lambda n: GoldenReceiver(n)).run(audio)
    return res.stdout_lines, oracle_out


def test_binary_types_match_oracle(decoded):
    ours, oracle = decoded
    assert len(ours) == 5
    assert ours == oracle


def test_binary_types_content(decoded):
    ours, _ = decoded
    assert "app_dac 1 app_fi 11(tide-weather) lat" in ours[0]
    assert "persons-on-board 42" in ours[1]
    assert "ack 1 (to 111111111" in ours[2] and "ack 3 (to 333333333" in ours[2]
    assert "type 13" in ours[3] and "ack 1 (to 444444444 seq 3)" in ours[3]
    assert "reserve 1 (ofs 1000 slots 5 timeout 3 incr 250)" in ours[4]
    assert "reserve 2 (ofs 2000" in ours[4]
