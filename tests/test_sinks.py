"""Sink layer: vessel cache, JSON-AIS export, DB writer, NMEA socket,
config parsing, CLI."""

import json
import os
import socket
import tempfile
import threading
import time

import numpy as np
import pytest

from gnuais_tpu import cli
from gnuais_tpu.ais.parser import Event
from gnuais_tpu.config import (Config, ConfigError, apply_directive,
                               parse_args_line, parse_interval, read_config)
from gnuais_tpu.golden import encoder as E
from gnuais_tpu.io.audio import write_raw_s16, write_wav
from gnuais_tpu.io.cache import VesselCache, export_json, JsonExporter
from gnuais_tpu.io.db import DbWriter
from gnuais_tpu.io.sinks import NmeaSocketServer


# --------------------------------------------------------------- config

def test_parse_interval():
    assert parse_interval("90") == 90
    assert parse_interval("1m30s") == 90
    assert parse_interval("1d2h3m4s") == 93784
    assert parse_interval("2h") == 7200


def test_parse_args_quoting():
    assert parse_args_line('mycall "my station" x') == ["mycall", "my station", "x"]
    assert parse_args_line('a b\tc') == ["a", "b", "c"]
    assert parse_args_line('s "es\\"caped"') == ["s", 'es"caped']


def test_directive_prefix_matching():
    cfg = Config()
    assert apply_directive(cfg, "soundch both")       # prefix match quirk
    assert cfg.sound_channels == 2
    assert apply_directive(cfg, "lat 59.5")
    assert cfg.mylat == 59.5
    assert not apply_directive(cfg, "nosuchthing 1")


def test_read_config_full(tmp_path):
    p = tmp_path / "g.conf"
    p.write_text(
        "mycall OH1TEST\n"
        "latitude 60.1\nlongitude 24.9\n"
        "statsinterval 5m\n"
        "uplink MarineTraffic json http://example.com/jsonais/post\n"
        "skip_type 9\nskip_type 10\n"
        "soundchannels both\n"
        "# comment line\n"
        "\n"
        "streams 16\nbackend exact\n")
    cfg = read_config(str(p))
    assert cfg.mycall == "OH1TEST"
    assert cfg.stats_interval == 300
    assert cfg.uplinks[0].url == "http://example.com/jsonais/post"
    assert cfg.skip_type == [9, 10]
    assert cfg.sound_channels == 2
    assert cfg.streams == 16


def test_bad_directives(tmp_path):
    cfg = Config()
    with pytest.raises(ConfigError):
        apply_directive(cfg, "skip_type 99")
    with pytest.raises(ConfigError):
        apply_directive(cfg, "uplink foo xml http://x/")
    p = tmp_path / "bad.conf"
    p.write_text("unknowndirective 1\n")
    with pytest.raises(ConfigError):
        read_config(str(p))


# --------------------------------------------------------------- cache

def _pos_event(mmsi, lat, lon, course=123.4, hdg=90, sog=5.5, navstat=0):
    return Event("position", mmsi, {"navstat": navstat, "lat": lat,
                                    "lon": lon, "heading": hdg,
                                    "course": course, "rateofturn": 0,
                                    "sog": sog})


def test_cache_and_json_export():
    cache = VesselCache()
    cache.apply_event(_pos_event(257000001, 59.5, 10.5), 1700000000)
    cache.apply_event(Event("vesseldata", 257000001, {
        "imo": 12345, "callsign": "LA1B", "name": "SHIP ONE",
        "destination": "OSLO", "shiptype": 70, "A": 10, "B": 20,
        "C": 3, "D": 4, "draught": 5.5}), 1700000001)
    cache.apply_event(Event("persons", 257000002, {"persons": 12}), 1700000002)

    entries = cache.rotate()
    blob, exported = export_json(entries, "TESTCALL", now=1700000100)
    assert exported == 3
    # blob must be valid JSON with the reference structure
    doc = json.loads(blob)
    assert doc["protocol"] == "jsonais"
    assert doc["encodetime"] == "20231114221500"
    msgs = doc["groups"][0]["msgs"]
    assert doc["groups"][0]["path"][0]["name"] == "TESTCALL"
    types = sorted(m["msgtype"] for m in msgs)
    assert types == [3, 5, 8]
    m3 = next(m for m in msgs if m["msgtype"] == 3)
    assert m3["lat"] == pytest.approx(59.5)
    assert m3["speed"] == 5.5 and m3["course"] == 123.4
    m5 = next(m for m in msgs if m["msgtype"] == 5)
    assert m5["shipname"] == "SHIP ONE" and m5["length"] == 30
    assert m5["ref_front"] == 10 and m5["width"] == 7 and m5["ref_left"] == 3
    m8 = next(m for m in msgs if m["msgtype"] == 8)
    assert m8["persons_on_board"] == 12
    # rotation emptied the cache
    blob2, exported2 = export_json(cache.rotate(), "TESTCALL")
    assert exported2 == 0


def test_cache_24b_zeroes_imo_draught():
    cache = VesselCache()
    cache.apply_event(Event("vesseldata", 1, {
        "imo": 999, "callsign": "X", "name": "N", "destination": "D",
        "shiptype": 1, "A": 1, "B": 1, "C": 1, "D": 1, "draught": 9.9}), 10)
    cache.apply_event(Event("vesseldatab", 1, {
        "callsign": "Y", "shiptype": 2, "A": 2, "B": 2, "C": 2, "D": 2}), 11)
    e = cache.rotate()[1]
    assert e.imo == 0 and e.draught == 0.0 and e.callsign == "Y"


def test_json_exporter_posts():
    posted = []
    cache = VesselCache()
    cache.apply_event(_pos_event(1, 10.0, 20.0), 100)
    exp = JsonExporter(cache, ["http://test/x"], "CALL",
                       post_fn=lambda url, blob: posted.append((url, blob)))
    blob = exp.export_once(now=100)
    assert blob and posted and posted[0][0] == "http://test/x"
    # empty cache -> no post
    assert exp.export_once(now=200) is None
    assert len(posted) == 1


def test_json_exporter_logs_failures_and_continues(caplog):
    """A failed POST must emit a log record (out_json.c:118-140 hlogs
    every curl failure) and the exporter must keep exporting; the
    consecutive-failure counter tracks uplink health."""
    import logging

    calls = []

    def flaky(url, blob):
        calls.append(url)
        if len(calls) <= 2:
            raise OSError("connection refused")

    cache = VesselCache()
    cache.apply_event(_pos_event(1, 10.0, 20.0), 100)
    exp = JsonExporter(cache, ["http://test/x"], "CALL", post_fn=flaky)
    with caplog.at_level(logging.ERROR, logger="gnuais"):
        assert exp.export_once(now=100) is not None
    assert any("JSON AIS export" in r.message and "failed" in r.message
               for r in caplog.records)
    assert exp.consecutive_failures["http://test/x"] == 1

    # exporter carries on: next rotation still posts, failure count grows
    cache.apply_event(_pos_event(2, 11.0, 21.0), 200)
    with caplog.at_level(logging.ERROR, logger="gnuais"):
        assert exp.export_once(now=200) is not None
    assert exp.consecutive_failures["http://test/x"] == 2

    # a success resets the counter
    cache.apply_event(_pos_event(3, 12.0, 22.0), 300)
    assert exp.export_once(now=300) is not None
    assert exp.consecutive_failures["http://test/x"] == 0


# --------------------------------------------------------------- db

def test_db_insert_and_keepsmall():
    db = DbWriter(":memory:")
    db.position(100, 1, 59.0, 10.0, 90.0, 45.0, 5.0)
    db.position(101, 1, 59.1, 10.1, 91.0, 46.0, 5.1)
    rows = db.conn.execute("select count(*) from ais_position").fetchone()
    assert rows[0] == 2

    small = DbWriter(":memory:", keepsmall=True)
    small.position(100, 1, 59.0, 10.0, 90.0, 45.0, 5.0)
    small.position(101, 1, 59.1, 10.1, 91.0, 46.0, 5.1)
    small.position(102, 2, 0.0, 0.0, 0.0, 0.0, 0.0)
    rows = small.conn.execute(
        "select mmsi, time from ais_position order by mmsi").fetchall()
    assert rows == [(1, 101), (2, 102)]


def test_db_oldlimit_prunes():
    db = DbWriter(":memory:", oldlimit=50)
    for i in range(25):
        db.position(i * 10, i, 1.0, 2.0, 0.0, 0.0, 0.0)
    # pruning fires on every 10th insert: at insert #20 (time 190) rows
    # older than 140 are dropped
    rows = db.conn.execute("select count(*) from ais_position").fetchone()[0]
    assert rows < 25


def test_db_nmea_and_vesselname():
    db = DbWriter(":memory:")
    db.nmea(100, "!AIVDM,1,1,,A,xyz,0*00")
    db.vesselname(100, 5, "NAME", "CLASS B")
    assert db.conn.execute("select message from ais_nmea").fetchone()[0].startswith("!AIVDM")
    assert db.conn.execute("select name from ais_vesseldata").fetchone()[0] == "NAME"


# --------------------------------------------------------------- socket

def test_nmea_socket_broadcast(tmp_path):
    path = str(tmp_path / "test.socket")
    srv = NmeaSocketServer(path)
    try:
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(path)
        time.sleep(0.1)  # let accept thread register the client
        srv.write("!AIVDM,1,1,,A,abc,0*11")
        srv.write("!AIVDM,1,1,,A,def,0*22")
        c.settimeout(2)
        data = c.recv(4096)
        assert data == b"!AIVDM,1,1,,A,abc,0*11!AIVDM,1,1,,A,def,0*22"
        c.close()
    finally:
        srv.close()
    assert not os.path.exists(path)


# --------------------------------------------------------------- cli

def test_cli_end_to_end(tmp_path, capsys):
    audio = E.synthesize_capture(
        [E.make_type123(1, 257012345, 59.9, 10.7), E.make_type5(257099999)])
    cap = tmp_path / "cap.raw"
    write_raw_s16(cap, audio)
    conf = tmp_path / "t.conf"
    conf.write_text("soundchannels mono\nmycall TEST\nbackend golden\n"
                    f"dbpath {tmp_path}/out.db\n")
    rc = cli.main(["-c", str(conf), "-l", str(cap), "-e", "err"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "ch A type 1 mmsi 257012345:" in out
    assert "ch A type 5 mmsi 257099999:" in out
    # DB got rows
    import sqlite3
    con = sqlite3.connect(tmp_path / "out.db")
    assert con.execute("select count(*) from ais_nmea").fetchone()[0] >= 3
    assert con.execute("select count(*) from ais_position").fetchone()[0] == 1


def test_cli_wav_input(tmp_path, capsys):
    audio = E.synthesize_capture([E.make_type18(258123456, 60.39, 5.32)])
    cap = tmp_path / "cap.wav"
    write_wav(cap, audio, channels=1)
    rc = cli.main(["-l", str(cap), "--backend", "golden", "-e", "err"])
    out = capsys.readouterr().out
    assert rc == 0 and "type 18 mmsi 258123456" in out


def test_cli_record_tee(tmp_path, capsys):
    audio = E.synthesize_capture([E.make_type123(1, 3, 1.0, 2.0)])
    cap = tmp_path / "c.raw"
    write_raw_s16(cap, audio)
    rec = tmp_path / "rec.raw"
    rc = cli.main(["-l", str(cap), "-s", str(rec), "--backend", "golden",
                   "-e", "err"])
    capsys.readouterr()
    assert rc == 0
    got = np.fromfile(rec, dtype="<i2")
    assert np.array_equal(got, audio[: len(got)])
    assert len(got) == len(audio) - (len(audio) % 1020 and 0 or 0) or len(got) <= len(audio)
