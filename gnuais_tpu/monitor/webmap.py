"""Web map monitor: the gnuaisgui equivalent (gui.c:474-617,
osm-gps-map-ais.c:440-475) as a local HTTP view.

Serves a single-page OSM map (Leaflet + openstreetmap tiles, loaded by
the *browser*) over the live ship table fed from the receiver's NMEA
socket.  When the browser has no tile access the page degrades to a
plain lat/lon canvas plot, so the view works fully offline too.

    gnuais-tpu --monitor --map [--port 8787]
"""

from __future__ import annotations

import json
import socket as socket_mod
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from gnuais_tpu.monitor.ships import AivdmAssembler, ShipTable

PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>gnuais-tpu ships</title>
<link rel="stylesheet"
 href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css">
<style>
 body{margin:0;font:13px sans-serif}
 #map{position:absolute;inset:0 0 0 0}
 #fallback{display:none;position:absolute;inset:0}
 #hud{position:absolute;top:8px;right:8px;z-index:1000;
      background:rgba(255,255,255,.9);padding:6px 10px;border-radius:4px}
</style></head><body>
<div id="map"></div><canvas id="fallback"></canvas>
<div id="hud">loading…</div>
<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
<script>
let map=null, markers={};
function initLeaflet(){
  if(typeof L==="undefined") return false;
  map=L.map('map').setView([60,5],5);
  L.tileLayer('https://tile.openstreetmap.org/{z}/{x}/{y}.png',
    {attribution:'&copy; OpenStreetMap'}).addTo(map);
  return true;
}
function drawFallback(ships){
  const c=document.getElementById('fallback');
  c.style.display='block'; document.getElementById('map').style.display='none';
  c.width=innerWidth; c.height=innerHeight;
  const ctx=c.getContext('2d');
  ctx.fillStyle='#001a2e'; ctx.fillRect(0,0,c.width,c.height);
  const xs=ships.map(s=>s.longitude), ys=ships.map(s=>s.latitude);
  if(!ships.length) return;
  const x0=Math.min(...xs)-0.2, x1=Math.max(...xs)+0.2;
  const y0=Math.min(...ys)-0.2, y1=Math.max(...ys)+0.2;
  for(const s of ships){
    const px=(s.longitude-x0)/(x1-x0)*c.width;
    const py=(1-(s.latitude-y0)/(y1-y0))*c.height;
    ctx.fillStyle='#ffcf40'; ctx.beginPath();
    ctx.arc(px,py,4,0,7); ctx.fill();
    ctx.fillStyle='#9fc'; ctx.fillText(s.name||s.mmsi, px+6, py+4);
  }
}
async function tick(){
  try{
    const r=await fetch('/ships.json'); const d=await r.json();
    document.getElementById('hud').textContent=
      d.ships.length+' ships · '+new Date().toLocaleTimeString();
    if(map){
      for(const s of d.ships){
        const ll=[s.latitude, s.longitude];
        if(markers[s.mmsi]) markers[s.mmsi].setLatLng(ll);
        else markers[s.mmsi]=L.marker(ll).addTo(map)
          .bindPopup(()=>`<b>${s.name||s.mmsi}</b><br>MMSI ${s.mmsi}`+
            `<br>SOG ${s.speed} kn · COG ${s.course}°`+
            (s.destination?`<br>→ ${s.destination}`:''));
      }
    } else drawFallback(d.ships);
  }catch(e){ document.getElementById('hud').textContent='no data: '+e; }
  setTimeout(tick, 2000);
}
if(!initLeaflet()) console.log('leaflet unavailable; canvas fallback');
tick();
</script></body></html>
"""


class WebMapServer:
    """HTTP view over a live ShipTable."""

    def __init__(self, table: ShipTable, port: int = 8787,
                 host: str = "127.0.0.1"):
        self.table = table
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path.startswith("/ships.json"):
                    body = json.dumps(outer.snapshot()).encode()
                    ctype = "application/json"
                elif self.path == "/" or self.path.startswith("/index"):
                    body = PAGE.encode()
                    ctype = "text/html; charset=utf-8"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)

    def snapshot(self) -> dict:
        ships = [dict(mmsi=s.mmsi, latitude=s.latitude,
                      longitude=s.longitude, heading=s.heading,
                      course=s.course, speed=s.speed, type=s.type,
                      name=s.name, destination=s.destination,
                      last_seen=s.last_seen)
                 for s in self.table.ships.values()]
        return {"ships": ships, "dropped": self.table.dropped}

    def start(self) -> None:
        self._thread.start()

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()


def monitor_socket_with_map(path: str = "/tmp/gnuais.socket",
                            port: int = 8787,
                            duration: Optional[float] = None) -> ShipTable:
    """gnuaisgui main-loop equivalent: consume the NMEA socket into the
    ship table and serve the map view."""
    table = ShipTable()
    asm = AivdmAssembler()
    srv = WebMapServer(table, port)
    srv.start()
    print(f"map view: http://127.0.0.1:{srv.port}/", flush=True)
    s = socket_mod.socket(socket_mod.AF_UNIX, socket_mod.SOCK_STREAM)
    s.connect(path)
    s.settimeout(0.5)
    t0 = time.time()
    try:
        while duration is None or time.time() - t0 < duration:
            try:
                data = s.recv(4096)
            except socket_mod.timeout:
                continue
            if not data:
                break
            for bits in asm.feed(data):
                table.update_from_bits(bits)
    finally:
        s.close()
        srv.stop()
    return table
