"""HTTP control panel: route-parity server on the standard library.

Re-implements the reference's Flask surface (`mainn.py:404-700`) without the
Flask dependency (stdlib ``ThreadingHTTPServer``):

  GET  /                      control-panel page (reference: `templates/jjj.html`)
  GET  /points_stream         SSE: {points px, pose {x,y,ex,ey}, distance, rmse}
                              every 100 ms (`mainn.py:595-641`; also serves the
                              rmse field the reference UI expects but never got)
  GET  /video_feed            multipart JSON frames of current scan points
                              (`mainn.py:567-582`)
  GET  /map_image             current occupancy rendering as PNG (`mainn.py:584`)
  GET  /save_map?filename=X   persist PNG + pixel-coords npy (`mainn.py:434-454`)
  GET  /list_saved_files      *.png in the work dir (`mainn.py:455-462`)
  POST /add_point             add POI at the robot pose (`mainn.py:464-479`)
  POST /set_active_target     {id} or {id: null} (`mainn.py:481-505`)
  GET  /get_points_of_interest POIs in pixel coords (`mainn.py:507-522`)
  GET  /stop_stream /resume_stream  pause/unpause SLAM (`mainn.py:654-663`)
  GET  /save_frame            snapshot current map to capture_<ts>.png (`mainn.py:665`)
  GET  /capture_map           one-shot capture flag (`mainn.py:696-700`)
  POST /toggle_visibility     {map, icp} booleans (`mainn.py:646-652`)
  GET  /load_map/<file>       load PNG/PCD, switch to localization (`mainn.py:679`)
  POST /load_map_for_imshow   {filename} display a saved map (`mainn.py:404-431`)
  GET  /get_map_points/<base> saved npy pixel points as JSON (`mainn.py:524-540`)
  GET  /get_map_image/<file>  saved PNG bytes (`mainn.py:542-562`)
"""

from __future__ import annotations

import json
import os
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from icp_slam_yolo_tpu.serve.state import ServerState

_INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>tpu-slam control panel</title>
<style>
 body{font-family:system-ui;margin:1rem;background:#111;color:#eee}
 canvas{border:1px solid #444;background:#222}
 button{margin:.2rem;padding:.4rem .8rem}
 #stats{margin:.5rem 0;font-family:monospace}
</style></head>
<body>
<h2>tpu-slam</h2>
<div id="stats">pose: &mdash; | distance: &mdash; | rmse: &mdash;</div>
<div>
 <button onclick="fetch('/stop_stream')">pause</button>
 <button onclick="fetch('/resume_stream')">resume</button>
 <button onclick="fetch('/add_point',{method:'POST'})">add POI</button>
 <button onclick="saveMap()">save map</button>
 <button onclick="fetch('/save_frame')">save frame</button>
</div>
<canvas id="map" width="1000" height="833"></canvas>
<img id="icp" width="300" height="300" style="vertical-align:top;border:1px solid #444" title="ICP debug view">
<script>
const ctx = document.getElementById('map').getContext('2d');
let pois = [], landmarks = [];
async function refreshPois(){
  const r = await fetch('/get_points_of_interest');
  pois = (await r.json()).points;
}
refreshPois();
setInterval(async () => {
  document.getElementById('icp').src = '/icp_image?t=' + Date.now();
  landmarks = (await (await fetch('/landmarks')).json()).landmarks;
}, 2000);
function saveMap(){
  const name = prompt('filename base', 'map_1');
  if(name) fetch('/save_map?filename=' + encodeURIComponent(name));
}
const es = new EventSource('/points_stream');
es.onmessage = (ev) => {
  const d = JSON.parse(ev.data);
  ctx.fillStyle = '#222'; ctx.fillRect(0, 0, 1000, 833);
  if (d.points){
    ctx.fillStyle = '#4f4';
    for (const [x, y] of d.points) ctx.fillRect(x, y, 2, 2);
  }
  if (d.pose){
    ctx.fillStyle = '#48f';
    ctx.beginPath(); ctx.arc(d.pose.x, d.pose.y, 5, 0, 7); ctx.fill();
    ctx.strokeStyle = '#f44'; ctx.beginPath();
    ctx.moveTo(d.pose.x, d.pose.y); ctx.lineTo(d.pose.ex, d.pose.ey); ctx.stroke();
    document.getElementById('stats').textContent =
      `pose: ${d.pose.x},${d.pose.y} | distance: ${d.distance ?? '—'} | rmse: ${d.rmse ?? '—'}`;
  }
  ctx.fillStyle = '#ff0';
  for (const p of pois){ ctx.beginPath(); ctx.arc(p.pos_px[0], p.pos_px[1], 5, 0, 7); ctx.fill(); }
  ctx.fillStyle = '#f0f';  // fused pallet landmarks
  for (const lm of landmarks){
    ctx.fillRect(lm.px - 4, lm.py - 4, 8, 8);
    ctx.fillText('pallet x' + lm.n_obs, lm.px + 6, lm.py);
  }
  if (d.camera_data){
    document.getElementById('stats').textContent +=
      ` | pallet: ${d.camera_data.distance_mm}mm yaw ${d.camera_data.yaw_deg}°`;
  }
};
</script></body></html>
"""


def make_handler(state: ServerState):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet
            pass

        # --- helpers ------------------------------------------------------
        def _json(self, obj, code: int = 200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _bytes(self, data: bytes, mimetype: str, code: int = 200):
            self.send_response(code)
            self.send_header("Content-Type", mimetype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _body_json(self):
            length = int(self.headers.get("Content-Length") or 0)
            if not length:
                return {}
            return json.loads(self.rfile.read(length) or b"{}")

        # --- GET ------------------------------------------------------------
        def do_GET(self):
            url = urlparse(self.path)
            path, q = url.path, parse_qs(url.query)
            if path == "/":
                self._bytes(_INDEX_HTML.encode(), "text/html")
            elif path == "/points_stream":
                self._sse()
            elif path == "/video_feed":
                self._video_feed()
            elif path == "/map_image":
                self._bytes(state.map_png_bytes(), "image/png")
            elif path == "/icp_image":
                self._bytes(state.icp_view_png_bytes(), "image/png")
            elif path == "/landmarks":
                self._json({"landmarks": state.landmark_markers()})
            elif path == "/save_map":
                name = (q.get("filename") or [None])[0]
                if not name:
                    return self._json({"status": "error", "message": "filename required"}, 400)
                base = os.path.splitext(name)[0]
                state.save_map(base)
                self._json({"status": "success", "message": f"map saved as '{base}'"})
            elif path == "/list_saved_files":
                files = [f for f in os.listdir(state.work_dir) if f.endswith(".png")]
                self._json({"files": files})
            elif path == "/get_points_of_interest":
                pts = [
                    {"id": i, "name": f"Point {i + 1}", "pos_px": state.world_to_px(p[0], p[1])}
                    for i, p in enumerate(state.points_of_interest)
                ]
                self._json({"points": pts})
            elif path == "/stop_stream":
                state.paused.set()
                self._json({"status": "success", "message": "Stream stopped"})
            elif path == "/resume_stream":
                state.paused.clear()
                self._json({"status": "success", "message": "Stream resumed"})
            elif path == "/save_frame":
                fname = f"capture_{int(time.time())}.png"
                with open(os.path.join(state.work_dir, fname), "wb") as f:
                    f.write(state.map_png_bytes())
                self._json({"status": "success", "filename": fname})
            elif path == "/capture_map":
                state.capture_requested = True
                self._json({"message": "capturing map image..."})
            elif path.startswith("/load_map/"):
                fname = path[len("/load_map/"):]
                fp = os.path.join(state.work_dir, fname)
                if not os.path.exists(fp):
                    return self._json({"message": f"File {fname} not found"}, 404)
                try:
                    state.load_map(fp)
                except ValueError:
                    return self._json({"message": "unsupported file format"}, 400)
                self._json({"message": f"loaded map {fname}; switched to localization mode"})
            elif path.startswith("/get_map_points/"):
                base = path[len("/get_map_points/"):]
                npy = os.path.join(state.work_dir, base + ".npy")
                try:
                    pts = np.load(npy).tolist()
                    if pts:
                        pts = pts[:-1]  # parity quirk: reference drops the last row (`mainn.py:533`)
                    self._json({"points": pts})
                except FileNotFoundError:
                    self._json({"points": []})
            elif path.startswith("/get_map_image/"):
                fname = path[len("/get_map_image/"):]
                fp = os.path.join(state.work_dir, fname)
                if not os.path.exists(fp):
                    return self._bytes(b"File not found", "text/plain", 404)
                with open(fp, "rb") as f:
                    self._bytes(f.read(), "image/png")
            else:
                self._json({"error": "not found"}, 404)

        # --- POST -----------------------------------------------------------
        def do_POST(self):
            path = urlparse(self.path).path
            if path == "/add_point":
                pos = state.add_poi()
                self._json({"status": "success", "message": "point added", "new_point": pos})
            elif path == "/set_active_target":
                data = self._body_json()
                pid = data.get("id")
                if pid is None:
                    state.set_target(None)
                    return self._json({"status": "success", "message": "target cleared"})
                try:
                    pid = int(pid)
                except (TypeError, ValueError):
                    return self._json({"status": "error", "message": "invalid point id"}, 400)
                if state.set_target(pid):
                    self._json({"status": "success", "message": f"target set to point {pid + 1}"})
                else:
                    self._json({"status": "error", "message": "point id does not exist"}, 400)
            elif path == "/toggle_visibility":
                data = self._body_json()
                state.show_map = data.get("map", state.show_map)
                state.show_icp = data.get("icp", state.show_icp)
                self._json({"status": "success", "show_map": state.show_map, "show_icp": state.show_icp})
            elif path == "/load_map_for_imshow":
                data = self._body_json()
                fname = data.get("filename")
                if not fname or not os.path.exists(os.path.join(state.work_dir, fname)):
                    return self._json({"status": "error", "message": "file does not exist"}, 404)
                self._json({"status": "success", "message": f"displaying map {fname}"})
            else:
                self._json({"error": "not found"}, 404)

        # --- streams ----------------------------------------------------------
        def _sse(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            try:
                while not state.stopped.is_set():
                    payload = state.stream_payload()
                    if payload:
                        self.wfile.write(f"data: {json.dumps(payload)}\n\n".encode())
                        self.wfile.flush()
                    time.sleep(0.1)  # `mainn.py:639`
            except (BrokenPipeError, ConnectionResetError):
                pass

        def _video_feed(self):
            self.send_response(200)
            self.send_header("Content-Type", "multipart/x-mixed-replace; boundary=frame")
            self.end_headers()
            try:
                while not state.stopped.is_set():
                    with state.lock:
                        pts = list(state.last_scan_points_px)
                    body = json.dumps({"points": pts}).encode()
                    self.wfile.write(b"--frame\r\nContent-Type: application/json\r\n\r\n" + body + b"\r\n")
                    self.wfile.flush()
                    time.sleep(0.05)  # `mainn.py:581`
            except (BrokenPipeError, ConnectionResetError):
                pass

    return Handler


def make_server(state: ServerState, host: str = "0.0.0.0", port: int = 5000) -> ThreadingHTTPServer:
    return ThreadingHTTPServer((host, port), make_handler(state))


def serve(state: ServerState, host: str = "0.0.0.0", port: int = 5000) -> None:
    server = make_server(state, host, port)
    print(f"serving on http://{host}:{port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        state.stopped.set()
        server.shutdown()
