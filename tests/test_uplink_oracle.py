"""JSON-AIS uplink byte-parity vs the REAL reference exporter.

The oracle uplink harness (tools/build_oracle.sh) compiles the
reference's out_json.c + cache.c unmodified and links the system's
real libcurl; driving the same cache updates into it and into the
repo's VesselCache must yield byte-identical "jsonais" form parts on a
capturing HTTP server (out_json.c:211-354 blob layout, the multipart
field of :187-203)."""

import calendar
import http.server
import re
import subprocess
import threading
from pathlib import Path

import pytest

from gnuais_tpu.io.cache import VesselCache, export_json, post_json

REPO = Path(__file__).resolve().parent.parent
HARNESS = REPO / ".oracle" / "build" / "uplink_harness"


@pytest.fixture(scope="module")
def harness(oracle_bin):
    # oracle_bin builds the whole tools/build_oracle.sh output; the
    # harness is skipped only where no libcurl runtime exists
    if not HARNESS.exists():
        subprocess.run(["bash", str(REPO / "tools" / "build_oracle.sh")],
                       check=True, capture_output=True)
    if not HARNESS.exists():
        pytest.skip("libcurl runtime unavailable; uplink harness not built")
    return HARNESS


class _Capture(http.server.BaseHTTPRequestHandler):
    store = {}

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        _Capture.store["body"] = self.rfile.read(n)
        _Capture.store["ctype"] = self.headers.get("Content-Type", "")
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"ok")

    def log_message(self, *a):
        pass


@pytest.fixture()
def http_capture():
    srv = http.server.HTTPServer(("127.0.0.1", 0), _Capture)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _Capture.store.clear()
    yield f"http://127.0.0.1:{srv.server_port}/jsonais", _Capture.store
    srv.shutdown()


def _jsonais_part(body: bytes, ctype: str) -> bytes:
    m = re.search(r"boundary=(\S+)", ctype)
    assert m, ctype
    boundary = ("--" + m.group(1)).encode()
    i = body.index(b'name="jsonais"')
    j = body.index(b"\r\n\r\n", i) + 4
    k = body.index(b"\r\n" + boundary, j)
    return body[j:k]


# One mixed population covering every exporter branch: ascending-MMSI
# walk order, pos-only, pos+static, 24B-only (imo/draught zeroing, no
# name -> no msgtype 5), name-only with EMPTY destination (C prints
# "destination": "" — pointer, not truthiness), persons-only, negative
# lat/lon, unset sentinel suppression.
UPDATES = [
    ("pos", 100, 230000001, 0, 60.15, 24.90, 90, 180.0, 0, 12.3),
    ("data", 110, 230000001, 9234567, "OH2XYZ", "TEST SHIP", "HELSINKI",
     70, 100, 30, 10, 12, 6.5),
    ("persons", 120, 230000001, 15),
    ("pos", 130, 230000002, 15, -33.8568, -151.2153, -1, -1.0, 0, -1.0),
    ("datab", 140, 230000003, "CALLB", 36, 8, 4, 2, 2),
    ("name", 150, 230000004, "NAME ONLY", ""),
    ("persons", 160, 230000005, 3),
]


def _apply_to_cache(cache: VesselCache):
    for u in UPDATES:
        kind, t, mmsi = u[0], u[1], u[2]
        if kind == "pos":
            cache.position(t, mmsi, u[3], u[4], u[5], u[6], u[7], u[8],
                           u[9])
        elif kind == "data":
            cache.vesseldata(t, mmsi, u[3], u[4], u[5], u[6], u[7], u[8],
                             u[9], u[10], u[11], u[12])
        elif kind == "datab":
            cache.vesseldatab(t, mmsi, u[3], u[4], u[5], u[6], u[7], u[8])
        elif kind == "name":
            cache.vesselname(t, mmsi, u[3], u[4])
        elif kind == "persons":
            cache.vessel_persons(t, mmsi, u[3])


def _tsv() -> str:
    lines = []
    for u in UPDATES:
        lines.append("\t".join(str(v) for v in u))
    return "\n".join(lines) + "\n"


def test_uplink_blob_byte_parity(harness, http_capture):
    url, store = http_capture
    r = subprocess.run([str(harness), url, "OH2TEST"], input=_tsv(),
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr[-500:]
    assert store, "oracle posted nothing"
    oracle_blob = _jsonais_part(store["body"], store["ctype"])

    # the only run-time-dependent byte run is encodetime: feed the
    # oracle's own encodetime into the repo exporter
    m = re.search(rb'"encodetime": "(\d{14})"', oracle_blob)
    assert m
    ts = m.group(1).decode()
    now = calendar.timegm((int(ts[0:4]), int(ts[4:6]), int(ts[6:8]),
                           int(ts[8:10]), int(ts[10:12]), int(ts[12:14]),
                           0, 0, 0))

    cache = VesselCache()
    _apply_to_cache(cache)
    blob, exported = export_json(cache.rotate(), "OH2TEST", now=now)
    assert exported > 0
    assert blob.encode() == oracle_blob, (
        "\n--- repo ---\n" + blob +
        "\n--- oracle ---\n" + oracle_blob.decode())


def test_uplink_multipart_field_matches_oracle(harness, http_capture):
    """The repo's own multipart POST must carry the identical jsonais
    field content and content-type the reference's libcurl form does."""
    url, store = http_capture
    r = subprocess.run([str(harness), url, "OH2TEST"], input=_tsv(),
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr[-500:]
    oracle_body = store["body"]
    oracle_part = _jsonais_part(oracle_body, store["ctype"])
    assert b"Content-Type: application/json" in oracle_body

    m = re.search(rb'"encodetime": "(\d{14})"', oracle_part)
    ts = m.group(1).decode()
    now = calendar.timegm((int(ts[0:4]), int(ts[4:6]), int(ts[6:8]),
                           int(ts[8:10]), int(ts[10:12]), int(ts[12:14]),
                           0, 0, 0))
    cache = VesselCache()
    _apply_to_cache(cache)
    blob, _ = export_json(cache.rotate(), "OH2TEST", now=now)

    store.clear()
    post_json(url, blob)
    repo_part = _jsonais_part(store["body"], store["ctype"])
    assert b"Content-Type: application/json" in store["body"]
    assert repo_part == oracle_part
