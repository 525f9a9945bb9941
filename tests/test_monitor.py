"""Ship monitor: AIVDM reassembly, ship table, live socket consumption."""

import socket
import threading
import time

import numpy as np
import pytest

from gnuais_tpu.ais.dispatcher import ChannelDispatcher
from gnuais_tpu.golden import encoder as E
from gnuais_tpu.golden.model import GoldenReceiver
from gnuais_tpu.io.sinks import NmeaSocketServer
from gnuais_tpu.monitor.ships import AivdmAssembler, ShipTable, payload_chars_to_bits
from gnuais_tpu.runtime.session import DecodeSession


def _sentences_for(payloads):
    sess = DecodeSession(lambda n: GoldenReceiver(n))
    audio = E.synthesize_capture(payloads, gap_bits=48)
    res = sess.run(audio)
    return res.nmea_sentences


def test_roundtrip_single_part():
    p = E.make_type123(1, 257012345, 59.9139, 10.7522)
    sents = _sentences_for([p])
    asm = AivdmAssembler()
    out = asm.feed("".join(sents).encode())
    assert len(out) == 1
    # payload bits (incl. fill) start with the original payload
    assert np.array_equal(out[0][: len(p)], p)


def test_roundtrip_multipart():
    p = E.make_type5(257099999)
    sents = _sentences_for([p])
    assert len(sents) == 2
    asm = AivdmAssembler()
    out = []
    for s in sents:                       # arrive in separate reads
        out += asm.feed(s.encode())
    assert len(out) == 1
    assert np.array_equal(out[0][: len(p)], p)


def test_fragmented_stream():
    p1 = E.make_type123(1, 111111111, 10.0, 20.0)
    p2 = E.make_type5(222222222)
    blob = "".join(_sentences_for([p1, p2])).encode()
    asm = AivdmAssembler()
    out = []
    for i in range(0, len(blob), 7):      # 7-byte fragments
        out += asm.feed(blob[i:i + 7])
    assert len(out) == 2


def test_multipart_out_of_order_dropped():
    p = E.make_type5(257099999)
    sents = _sentences_for([p])
    asm = AivdmAssembler()
    out = asm.feed(sents[1].encode())      # part 2 without part 1
    assert out == []


def test_ship_table_updates():
    table = ShipTable()
    p = E.make_type123(1, 257012345, 59.9139, 10.7522, sog10=55,
                       course10=900)
    ship = table.update_from_bits(p)
    assert ship and ship.mmsi == 257012345
    assert ship.latitude == pytest.approx(59.9139, abs=1e-4)
    assert ship.speed == pytest.approx(5.5)
    # static info merges into the same entry
    table.update_from_bits(E.make_type5(257012345, name="TESTSHIP"))
    assert table.ships[257012345].name == "TESTSHIP"
    text = table.render_text()
    assert "TESTSHIP" in text and "257012345" in text


def test_ship_table_bounded():
    table = ShipTable(max_ships=5)
    for i in range(8):
        table.update_from_bits(E.make_type123(1, 100000000 + i, 1.0, 2.0))
    assert len(table.ships) == 5 and table.dropped == 3


def test_live_socket_consumption(tmp_path):
    path = str(tmp_path / "mon.socket")
    srv = NmeaSocketServer(path)
    try:
        table = ShipTable()
        asm = AivdmAssembler()
        done = threading.Event()

        def consumer():
            c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            c.connect(path)
            c.settimeout(2)
            got = 0
            while got < 2:
                data = c.recv(4096)
                if not data:
                    break
                for bits in asm.feed(data):
                    table.update_from_bits(bits)
                    got += 1
            c.close()
            done.set()

        t = threading.Thread(target=consumer)
        t.start()
        time.sleep(0.15)
        for s in _sentences_for([E.make_type123(1, 333000111, 5.0, 6.0),
                                 E.make_type18(444000222, 7.0, 8.0)]):
            srv.write(s)
        assert done.wait(5)
        t.join()
        assert 333000111 in table.ships and 444000222 in table.ships
    finally:
        srv.close()


def test_webmap_server_serves_page_and_ships():
    """The gnuaisgui-equivalent map view: HTTP page + live ship JSON."""
    import json
    import urllib.request

    from gnuais_tpu.monitor.webmap import WebMapServer

    table = ShipTable()
    # inject one decoded position via the payload-bit path
    payload = E.make_type123(1, 257012345, 59.91, 10.75)
    disp = ChannelDispatcher("A")
    rx = GoldenReceiver("A")
    audio = E.synthesize_capture([payload])
    asm = AivdmAssembler()
    for fr in rx.run_block(audio):
        msg = disp.dispatch(fr.payload_bits, fr.bufferlen)
        for s in msg.nmea_sentences:
            for bits in asm.feed(s.encode()):
                table.update_from_bits(bits)
    assert len(table.ships) == 1

    import tempfile
    td = tempfile.mkdtemp()
    # one fake cached tile: the server must serve it at /tiles/5/17/9.png
    import os
    os.makedirs(os.path.join(td, "5", "17"), exist_ok=True)
    with open(os.path.join(td, "5", "17", "9.png"), "wb") as f:
        f.write(b"\x89PNG-fake-tile")

    srv = WebMapServer(table, port=0, tile_dir=td)
    srv.start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        page = urllib.request.urlopen(base + "/", timeout=5).read()
        # fully self-contained: no CDN/external asset references
        assert b"ships.json" in page and b"/tiles/" in page
        assert b"unpkg.com" not in page and b"https://" not in page
        data = json.loads(
            urllib.request.urlopen(base + "/ships.json", timeout=5).read())
        assert data["ships"][0]["mmsi"] == 257012345
        assert abs(data["ships"][0]["latitude"] - 59.91) < 0.01
        # local tile cache is served; uncached tiles 404 (client then
        # keeps its graticule sea)
        tl = urllib.request.urlopen(base + "/tiles/5/17/9.png",
                                    timeout=5).read()
        assert tl == b"\x89PNG-fake-tile"
        try:
            urllib.request.urlopen(base + "/tiles/5/0/0.png", timeout=5)
            assert False, "uncached tile should 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()
