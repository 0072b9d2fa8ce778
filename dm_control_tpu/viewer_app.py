"""Interactive viewer: a browser-driven runtime for any environment.

The reference's viewer (dm_control/viewer/: GLFW window, mouse camera,
body perturbation, pause/step/speed, policy execution —
application.py:183-330, viewer.py:92-527) rebuilt for a headless TPU
host: the GUI is any web browser; the server is stdlib http.server; the
renderer is the in-graph raytracer.  All simulation runs in one
background loop thread; HTTP handlers only enqueue commands and read
the latest encoded frame, so the jitted step/render functions are never
called concurrently.

  from dm_control_tpu import suite, viewer_app
  env = suite.load('cartpole', 'swingup')
  viewer_app.launch(env, policy=None, port=8844)   # open localhost:8844

Controls (reference viewer/README parity):
  space pause/resume, enter single-step, backspace restart,
  +/- speed, mouse drag orbit, wheel zoom, right-drag pan,
  click select body, arrow buttons push the selected body.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu._src import render as _render
from dm_control_tpu.viewer import Runtime, State


def _png_bytes(img: np.ndarray) -> bytes:
  import struct
  import zlib
  img = np.asarray(img, np.uint8)
  h, w, _ = img.shape
  raw = b''.join(b'\x00' + img[row].tobytes() for row in range(h))

  def chunk(tag, payload):
    out = struct.pack('>I', len(payload)) + tag + payload
    return out + struct.pack('>I', zlib.crc32(tag + payload) & 0xFFFFFFFF)

  header = struct.pack('>IIBBBBB', w, h, 8, 2, 0, 0, 0)
  return (b'\x89PNG\r\n\x1a\n' + chunk(b'IHDR', header)
          + chunk(b'IDAT', zlib.compress(raw, 3)) + chunk(b'IEND', b''))


class CameraState:
  """Orbit camera (reference viewer/viewer.py camera controller)."""

  def __init__(self, lookat=(0.0, 0.0, 0.5), distance=3.0,
               azimuth=90.0, elevation=-15.0, fov_deg=45.0):
    self.lookat = np.asarray(lookat, np.float64)
    self.distance = float(distance)
    self.azimuth = float(azimuth)
    self.elevation = float(elevation)
    self.fov = float(fov_deg) * np.pi / 180.0

  def orbit(self, d_azimuth, d_elevation):
    self.azimuth = (self.azimuth + d_azimuth) % 360.0
    self.elevation = float(np.clip(self.elevation + d_elevation, -89., 89.))

  def zoom(self, factor):
    self.distance = float(np.clip(self.distance * factor, 0.2, 30.0))

  def pan(self, dx, dy):
    az = np.deg2rad(self.azimuth)
    right = np.array([np.sin(az), -np.cos(az), 0.0])
    self.lookat = self.lookat + right * dx + np.array([0, 0, dy])

  def pose(self, dtype=np.float32):
    pos, mat = _render.free_camera_pose(
        self.lookat, self.distance, self.azimuth, self.elevation)
    return (pos.astype(dtype), mat.astype(dtype), self.fov)


class Perturbation:
  """Constant world-frame force on a selected body (the role of the
  reference's mouse-drag perturbation, viewer/viewer.py:330-420)."""

  def __init__(self):
    self.body_id = -1
    self.force = np.zeros(3)

  def clear(self):
    self.body_id = -1
    self.force[:] = 0.0

  def apply(self, d):
    xf = jnp.zeros_like(d.xfrc_applied)
    if self.body_id >= 0 and np.any(self.force):
      xf = xf.at[self.body_id, :3].set(
          jnp.asarray(self.force, d.qpos.dtype))
    return d.replace(xfrc_applied=xf)


def _get_data(env):
  return env.physics


def _set_data(env, d):
  if getattr(env, '_carry', None) is not None:      # composer Environment
    env._carry = (d,) + tuple(env._carry[1:])
  elif hasattr(env, '_data'):                       # rl/control Environment
    env._data = d


class InteractiveViewer:
  """Simulation loop + command handling; serves frames over HTTP."""

  def __init__(self, env, policy: Optional[Callable] = None,
               height: int = 240, width: int = 320, port: int = 8844):
    self.env = env
    self.runtime = Runtime(env, policy)
    self.camera = CameraState()
    self.perturb = Perturbation()
    self.paused = False
    self.height, self.width = height, width
    self.port = port
    self._cmds: queue.Queue = queue.Queue()
    self._frame_lock = threading.Lock()
    self._frame_png = b''
    self._frame_seq = 0
    self._stop = threading.Event()
    self._httpd = None
    m = env.task.model
    self._model = m
    self._render_fn = jax.jit(
        lambda d, pos, mat: _render.render(
            m, d, height, width, camera=(pos, mat, self.camera.fov)))

  # -- command surface (HTTP POST /api and direct test calls) -------------

  def handle(self, cmd: dict) -> dict:
    op = cmd.get('op')
    if op == 'pause':
      self.paused = True
    elif op == 'resume':
      self.paused = False
      if self.runtime.state in (State.STOP, State.STOPPED):
        self.runtime.restart()
    elif op == 'step':
      self.runtime.single_step()
    elif op == 'restart':
      self.runtime.restart()
    elif op == 'speed':
      (self.runtime.time_multiplier.increase if cmd.get('delta', 1) > 0
       else self.runtime.time_multiplier.decrease)()
    elif op == 'orbit':
      self.camera.orbit(cmd.get('d_azimuth', 0.0), cmd.get('d_elevation', 0.0))
    elif op == 'zoom':
      self.camera.zoom(cmd.get('factor', 1.0))
    elif op == 'pan':
      self.camera.pan(cmd.get('dx', 0.0), cmd.get('dy', 0.0))
    elif op == 'select':
      d = _get_data(self.env)
      if d is not None:
        pos, mat, fov = self.camera.pose(np.asarray(d.qpos).dtype)
        # cursor y arrives top-left (browser); select wants bottom-left
        body_id, geom_id, world = _render.select(
            self._model, d, (cmd['x'], 1.0 - cmd['y']),
            self.height, self.width, camera=(pos, mat, fov))
        self.perturb.body_id = int(body_id)
        return {'ok': True, 'body': int(body_id), 'geom': int(geom_id),
                'pos': np.asarray(world).tolist()}
    elif op == 'perturb':
      self.perturb.force = np.asarray(
          [cmd.get('fx', 0.0), cmd.get('fy', 0.0), cmd.get('fz', 0.0)])
      if 'body' in cmd:
        self.perturb.body_id = int(cmd['body'])
      self._push_perturbation()
    elif op == 'clear_perturb':
      self.perturb.clear()
      self._push_perturbation()
    else:
      return {'ok': False, 'error': f'unknown op {op!r}'}
    return {'ok': True}

  def status(self) -> dict:
    return {
        'state': self.runtime.state,
        'paused': self.paused,
        'sim_time': self.runtime.get_time(),
        'speed': str(self.runtime.time_multiplier),
        'frame_seq': self._frame_seq,
        'selected_body': self.perturb.body_id,
        'camera': {'lookat': self.camera.lookat.tolist(),
                   'distance': self.camera.distance,
                   'azimuth': self.camera.azimuth,
                   'elevation': self.camera.elevation},
        'last_error': self.runtime.last_error,
    }

  def _push_perturbation(self):
    d = _get_data(self.env)
    if d is not None:
      _set_data(self.env, self.perturb.apply(d))

  # -- loop ----------------------------------------------------------------

  def loop_once(self, elapsed: float = None):
    """One iteration: drain commands, advance, render (tests drive this
    directly; the server thread loops it)."""
    while True:
      try:
        cmd, reply = self._cmds.get_nowait()
      except queue.Empty:
        break
      try:
        reply.append(self.handle(cmd))
      except Exception as e:                      # keep the loop alive
        reply.append({'ok': False, 'error': f'{type(e).__name__}: {e}'})
    dt = getattr(self.env, 'control_timestep', None)
    dt = dt() if callable(dt) else 0.02
    self.runtime.tick(elapsed if elapsed is not None else dt,
                      paused=self.paused)
    if self.perturb.body_id >= 0 and np.any(self.perturb.force):
      self._push_perturbation()
    self._render()

  def _render(self):
    d = _get_data(self.env)
    if d is None:
      return
    pos, mat, _ = self.camera.pose(np.asarray(d.qpos).dtype)
    img = np.asarray(self._render_fn(d, pos, mat))
    png = _png_bytes((np.clip(img, 0, 1) * 255).astype(np.uint8))
    with self._frame_lock:
      self._frame_png = png
      self._frame_seq += 1

  def frame(self) -> bytes:
    with self._frame_lock:
      return self._frame_png

  def submit(self, cmd: dict, timeout: float = 10.0) -> dict:
    """Thread-safe command submission (used by HTTP handlers)."""
    reply: list = []
    self._cmds.put((cmd, reply))
    deadline = time.time() + timeout
    while not reply and time.time() < deadline:
      time.sleep(0.005)
    return reply[0] if reply else {'ok': False, 'error': 'timeout'}

  # -- server ----------------------------------------------------------------

  def serve(self, block: bool = True, open_msg: bool = True):
    viewer = self

    class Handler(BaseHTTPRequestHandler):
      def log_message(self, *a):  # quiet
        pass

      def _send(self, code, ctype, body):
        self.send_response(code)
        self.send_header('Content-Type', ctype)
        self.send_header('Content-Length', str(len(body)))
        self.send_header('Cache-Control', 'no-store')
        self.end_headers()
        self.wfile.write(body)

      def do_GET(self):
        path = self.path.split('?')[0]
        if path == '/':
          self._send(200, 'text/html', _PAGE.encode())
        elif path == '/frame.png':
          png = viewer.frame()
          if not png:
            self._send(503, 'text/plain', b'no frame yet')
          else:
            self._send(200, 'image/png', png)
        elif path == '/status':
          self._send(200, 'application/json',
                     json.dumps(viewer.status()).encode())
        else:
          self._send(404, 'text/plain', b'not found')

      def do_POST(self):
        if self.path.split('?')[0] != '/api':
          self._send(404, 'text/plain', b'not found')
          return
        n = int(self.headers.get('Content-Length', 0))
        try:
          cmd = json.loads(self.rfile.read(n) or b'{}')
        except json.JSONDecodeError:
          self._send(400, 'text/plain', b'bad json')
          return
        out = viewer.submit(cmd)
        self._send(200, 'application/json', json.dumps(out).encode())

    self._httpd = ThreadingHTTPServer(('0.0.0.0', self.port), Handler)
    self.port = self._httpd.server_address[1]
    self._server_thread = threading.Thread(
        target=self._httpd.serve_forever, daemon=True)
    self._server_thread.start()
    if open_msg:
      print(f'viewer serving on http://localhost:{self.port}')
    if not block:
      self._loop_thread = threading.Thread(
          target=self._blocking_loop, daemon=True)
      self._loop_thread.start()
      return self
    try:
      self._blocking_loop()
    except KeyboardInterrupt:
      pass
    finally:
      self.close()

  def _blocking_loop(self):
    last = time.time()
    while not self._stop.is_set():
      now = time.time()
      elapsed, last = now - last, now
      self.loop_once(elapsed)
      # pace to ~real time: rendering dominates; only sleep if fast
      budget = 1.0 / 25 - (time.time() - now)
      if budget > 0:
        time.sleep(budget)

  def close(self):
    """Stop and JOIN both threads.  The sim loop runs jax/numpy; leaving
    it alive after close corrupts process-global numpy errstate for any
    code running on other threads (observed: np.testing.assert_allclose
    raising 'truth value of an array is ambiguous' in unrelated tests
    sharing the worker process)."""
    self._stop.set()
    if self._httpd is not None:
      self._httpd.shutdown()
      self._httpd = None
    for attr in ('_loop_thread', '_server_thread'):
      t = getattr(self, attr, None)
      if t is not None and t.is_alive():
        # long timeout: the loop thread may be inside its first XLA
        # compile (~1 min); abandoning it keeps a live jax/numpy thread
        # in the process, which corrupts numpy errstate for other code
        t.join(timeout=120.0)
        if t.is_alive():
          import warnings
          warnings.warn('viewer thread did not exit within 120s; '
                        'jax/numpy global state may be corrupted')
      setattr(self, attr, None)


def launch(env, policy: Optional[Callable] = None, port: int = 8844,
           height: int = 240, width: int = 320, block: bool = True):
  """Interactive `viewer.launch` (reference viewer/__init__.py:30)."""
  v = InteractiveViewer(env, policy, height=height, width=width, port=port)
  return v.serve(block=block)


_PAGE = """<!doctype html><html><head><title>dm_control_tpu viewer</title>
<style>body{background:#111;color:#ddd;font-family:monospace;margin:1em}
#f{border:1px solid #444;cursor:crosshair}button{margin:2px}
#hud{margin:6px 0;white-space:pre}</style></head><body>
<div><img id="f" width="640"></div><div id="hud"></div>
<div>
<button onclick="api({op:'pause'})">pause</button>
<button onclick="api({op:'resume'})">resume</button>
<button onclick="api({op:'step'})">step</button>
<button onclick="api({op:'restart'})">restart</button>
<button onclick="api({op:'speed',delta:1})">faster</button>
<button onclick="api({op:'speed',delta:-1})">slower</button>
<button onclick="api({op:'clear_perturb'})">clear push</button>
push: <button onclick="push(8,0,0)">+x</button>
<button onclick="push(-8,0,0)">-x</button>
<button onclick="push(0,8,0)">+y</button>
<button onclick="push(0,-8,0)">-y</button>
<button onclick="push(0,0,20)">+z</button>
</div><script>
const img=document.getElementById('f');
function refresh(){img.src='/frame.png?t='+Date.now();}
img.onload=()=>setTimeout(refresh,60); img.onerror=()=>setTimeout(refresh,300);
refresh();
async function api(c){const r=await fetch('/api',{method:'POST',
 body:JSON.stringify(c)});return r.json();}
async function hud(){const s=await (await fetch('/status')).json();
 document.getElementById('hud').textContent=
  `state=${s.state} paused=${s.paused} t=${s.sim_time.toFixed(2)}s `+
  `speed=${s.speed} body=${s.selected_body} az=${s.camera.azimuth.toFixed(0)}`+
  (s.last_error?'  ERR: '+s.last_error:'');
 setTimeout(hud,500);} hud();
function push(x,y,z){api({op:'perturb',fx:x,fy:y,fz:z});}
let drag=null;
img.addEventListener('mousedown',e=>{drag={x:e.clientX,y:e.clientY,
 b:e.button,moved:false};e.preventDefault();});
window.addEventListener('mousemove',e=>{if(!drag)return;
 const dx=e.clientX-drag.x, dy=e.clientY-drag.y;
 if(Math.abs(dx)+Math.abs(dy)>2)drag.moved=true;
 if(drag.b===2){api({op:'pan',dx:-dx*0.003,dy:dy*0.003});}
 else{api({op:'orbit',d_azimuth:-dx*0.5,d_elevation:dy*0.5});}
 drag.x=e.clientX;drag.y=e.clientY;});
window.addEventListener('mouseup',async e=>{
 if(drag&&!drag.moved&&drag.b===0){
  const r=img.getBoundingClientRect();
  const x=(e.clientX-r.left)/r.width, y=(e.clientY-r.top)/r.height;
  const out=await api({op:'select',x:x,y:y});
  console.log('selected',out);}
 drag=null;});
img.addEventListener('wheel',e=>{api({op:'zoom',
 factor:e.deltaY>0?1.1:0.9});e.preventDefault();});
img.addEventListener('contextmenu',e=>e.preventDefault());
document.addEventListener('keydown',e=>{
 if(e.key===' ')api({op:'pause'});
 if(e.key==='Enter')api({op:'step'});
 if(e.key==='Backspace')api({op:'restart'});
 if(e.key==='+')api({op:'speed',delta:1});
 if(e.key==='-')api({op:'speed',delta:-1});});
</script></body></html>"""
