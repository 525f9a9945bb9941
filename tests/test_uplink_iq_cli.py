"""JSON-AIS uplink over real HTTP, IQ input through the CLI, and the
session-end export flush."""

import http.server
import json
import threading

import numpy as np
import pytest

from gnuais_tpu import cli
from gnuais_tpu.golden import encoder as E
from gnuais_tpu.io.cache import VesselCache, JsonExporter, post_json
from gnuais_tpu.ais.parser import Event


class _Collector(http.server.BaseHTTPRequestHandler):
    received = []

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        _Collector.received.append((self.path, self.headers.get_content_type(), body))
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"ok")

    def log_message(self, *a):
        pass


@pytest.fixture()
def http_server():
    _Collector.received = []
    srv = http.server.HTTPServer(("127.0.0.1", 0), _Collector)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/jsonais/post"
    srv.shutdown()


def test_uplink_real_http_post(http_server):
    cache = VesselCache()
    cache.apply_event(Event("position", 257000001, {
        "navstat": 0, "lat": 59.5, "lon": 10.5, "heading": 90,
        "course": 45.0, "rateofturn": 0, "sog": 7.7}), 1700000000)
    exp = JsonExporter(cache, [http_server], "HTTPTEST")
    blob = exp.export_once(now=1700000100)
    assert blob is not None
    assert len(_Collector.received) == 1
    path, ctype, body = _Collector.received[0]
    assert path == "/jsonais/post"
    assert ctype == "multipart/form-data"
    text = body.decode()
    assert 'name="jsonais"' in text
    assert '"protocol": "jsonais"' in text
    # the multipart body carries the exact blob
    assert blob.strip().splitlines()[0] in text


def test_cli_uplink_flush_on_eof(http_server, tmp_path, capsys):
    audio = E.synthesize_capture([E.make_type123(1, 257012345, 59.9, 10.7)])
    cap = tmp_path / "c.raw"
    np.asarray(audio, dtype="<i2").tofile(cap)
    conf = tmp_path / "c.conf"
    conf.write_text(f"mycall FLUSH\nbackend golden\n"
                    f"uplink Test json {http_server}\n")
    rc = cli.main(["-c", str(conf), "-l", str(cap), "-e", "err"])
    capsys.readouterr()
    assert rc == 0
    # the end-of-session export posted the decoded position
    assert len(_Collector.received) == 1
    assert b'"mmsi": 257012345' in _Collector.received[0][2]


def test_cli_iq_input(tmp_path, capsys):
    audio = E.synthesize_capture([E.make_type18(258123456, 60.39, 5.32)])
    x = np.repeat(audio.astype(np.float64) / 32767.0, 4)
    phase = 2 * np.pi * np.cumsum(x * 2400.0) / (48000.0 * 4)
    iq = np.exp(1j * phase).astype(np.complex64)
    raw = np.empty(len(iq) * 2, dtype="<f4")
    raw[0::2] = iq.real
    raw[1::2] = iq.imag
    f = tmp_path / "cap.iq"
    raw.tofile(f)
    conf = tmp_path / "c.conf"
    conf.write_text("inputformat iq\niqdecim 4\nbackend golden\n")
    rc = cli.main(["-c", str(conf), "-l", str(f), "-e", "err"])
    out = capsys.readouterr().out
    assert rc == 0 and "type 18 mmsi 258123456" in out
