"""MySQL backend: writer semantics + server-gone reconnect, tested
against a fake DB-API driver (no server needed) and cross-checked
against the sqlite DbWriter on the same event stream."""

import numpy as np
import pytest

from gnuais_tpu.ais.parser import Event
from gnuais_tpu.io.db import DbWriter
from gnuais_tpu.io.mysql import (CR_SERVER_GONE_ERROR, MySqlWriter,
                                 _server_gone)


class FakeOperationalError(Exception):
    def __init__(self, errno, msg):
        super().__init__(errno, msg)
        self.errno = errno


class FakeCursor:
    def __init__(self, conn):
        self.conn = conn
        self.rowcount = 0

    def execute(self, sql, args=()):
        if self.conn.dead:
            raise FakeOperationalError(CR_SERVER_GONE_ERROR,
                                       "MySQL server has gone away")
        if self.conn.fail_next:
            self.conn.fail_next = False
            self.conn.dead = True
            raise FakeOperationalError(CR_SERVER_GONE_ERROR,
                                       "MySQL server has gone away")
        self.conn.statements.append((sql, tuple(args)))
        # emulate UPDATE rowcount: hit iff mmsi seen before on the table
        if sql.startswith("UPDATE"):
            table = sql.split()[1]
            mmsi = args[-1]
            self.rowcount = 1 if (table, mmsi) in self.conn.rows else 0
        elif sql.startswith("INSERT"):
            table = sql.split()[2]
            self.conn.rows.add((table, args[1] if len(args) > 1 else None))


class FakeConn:
    def __init__(self, server):
        self.server = server
        self.statements = server.statements   # shared log
        self.rows = server.rows
        self.dead = False
        self.fail_next = False

    def cursor(self):
        return FakeCursor(self)

    def commit(self):
        if self.dead:
            raise FakeOperationalError(CR_SERVER_GONE_ERROR, "gone")

    def close(self):
        pass


class FakeServer:
    """connector module stand-in: .connect() hands out fresh conns."""

    def __init__(self):
        self.statements = []
        self.rows = set()
        self.conns = []

    def connect(self, **kw):
        c = FakeConn(self)
        self.conns.append(c)
        return c


def _writer(server, **kw):
    return MySqlWriter("localhost", "ais", "gnuais", "pw",
                       connector=server, **kw)


def test_server_gone_detection():
    assert _server_gone(FakeOperationalError(2006, "gone"))
    assert _server_gone(FakeOperationalError(2013, "lost"))
    assert not _server_gone(FakeOperationalError(1064, "syntax"))
    assert not _server_gone(ValueError("x"))


def test_schema_created_and_insert():
    srv = FakeServer()
    w = _writer(srv)
    assert sum(1 for s, _ in srv.statements
               if s.startswith("CREATE TABLE")) == 4
    w.position(100, 230123250, 60.1, 24.5, 90.0, 91.0, 10.2)
    ins = [s for s, _ in srv.statements if s.startswith("INSERT")]
    assert any("ais_position" in s for s in ins)


def test_reconnect_on_server_gone_retries_statement():
    """out_mysql.c:88-96 semantics: reconnect once and re-run the
    failed query; the row must still land."""
    srv = FakeServer()
    w = _writer(srv)
    n_conns = len(srv.conns)
    srv.conns[-1].fail_next = True
    w.nmea(123, "!AIVDM,1,1,,A,x,0*00")
    assert w.reconnects == 1
    assert len(srv.conns) == n_conns + 1
    assert any("ais_nmea" in s for s, _ in srv.statements
               if s.startswith("INSERT"))


def test_keepsmall_update_then_insert():
    srv = FakeServer()
    w = _writer(srv, keepsmall=True)
    w.position(1, 111, 1.0, 2.0, 3.0, 4.0, 5.0)     # miss -> INSERT
    w.position(2, 111, 1.1, 2.1, 3.0, 4.0, 5.0)     # hit  -> UPDATE only
    seq = [s.split()[0] for s, _ in srv.statements
           if "ais_position" in s and not s.startswith("CREATE")]
    assert seq == ["UPDATE", "INSERT", "UPDATE"]


def test_oldlimit_prunes_every_tenth_insert():
    srv = FakeServer()
    w = _writer(srv, oldlimit=3600)
    for i in range(10):
        w.nmea(1000 + i, f"!x{i}")
    dels = [(s, a) for s, a in srv.statements if s.startswith("DELETE")]
    assert len(dels) == 1
    assert dels[0][1] == (1009 - 3600,)


def test_event_routing_matches_sqlite_backend():
    srv = FakeServer()
    w = _writer(srv)
    sq = DbWriter(":memory:")
    events = [
        Event("position", 230123250,
              dict(lat=60.1, lon=24.5, heading=90, course=91.0, sog=10.2)),
        Event("basestation", 2300001, dict(lat=59.0, lon=10.0)),
        Event("vesseldata", 230123250,
              dict(name="TEST", destination="HELSINKI", draught=5.4,
                   A=100, B=20, C=10, D=10)),
        Event("vesseldatab", 230123251, dict(A=10, B=5, C=3, D=3)),
        Event("vesselname", 230123251, dict(name="X", destination="Y")),
    ]
    for ev in events:
        w.apply_event(ev, 1234)
        sq.apply_event(ev, 1234)
    my_inserts = [s for s, _ in srv.statements if s.startswith("INSERT")]
    assert len(my_inserts) == len(events)
    # the sqlite oracle holds the same rows
    assert sq.conn.execute("select count(*) from ais_position") \
        .fetchone()[0] == 1
    assert sq.conn.execute("select count(*) from ais_vesseldata") \
        .fetchone()[0] == 3


def test_missing_driver_raises_cleanly(monkeypatch):
    import gnuais_tpu.io.mysql as m
    monkeypatch.setattr(m, "find_connector", lambda: None)
    with pytest.raises(RuntimeError, match="driver"):
        MySqlWriter("h", "d", "u")
