"""Interactive viewer: command surface, frame serving, perturbation
(reference viewer/application_test.py + runtime_test.py roles)."""

import json
import urllib.request

import numpy as np
import pytest

from dm_control_tpu import suite
from dm_control_tpu import viewer_app


@pytest.fixture(scope='module')
def viewer():
  env = suite.load('cartpole', 'swingup', task_kwargs={'random': 3})
  v = viewer_app.InteractiveViewer(env, height=60, width=80, port=0)
  yield v
  v.close()


def test_loop_advances_sim(viewer):
  viewer.loop_once(0.1)
  t0 = viewer.runtime.get_time()
  viewer.loop_once(0.1)
  assert viewer.runtime.get_time() > t0
  assert viewer.frame()[:8] == b'\x89PNG\r\n\x1a\n'


def test_pause_and_single_step(viewer):
  viewer.handle({'op': 'pause'})
  viewer.loop_once(0.1)
  t0 = viewer.runtime.get_time()
  viewer.loop_once(0.1)
  assert viewer.runtime.get_time() == t0   # paused: no sim advance
  viewer.handle({'op': 'step'})
  assert viewer.runtime.get_time() > t0    # but single-step works
  viewer.handle({'op': 'resume'})


def test_camera_commands(viewer):
  az0 = viewer.camera.azimuth
  viewer.handle({'op': 'orbit', 'd_azimuth': 30.0})
  assert viewer.camera.azimuth == (az0 + 30.0) % 360.0
  d0 = viewer.camera.distance
  viewer.handle({'op': 'zoom', 'factor': 0.5})
  assert viewer.camera.distance < d0
  s0 = viewer.status()
  assert 'camera' in s0 and s0['state']


def test_select_and_perturb(viewer):
  viewer.handle({'op': 'restart'})
  viewer.loop_once(0.02)
  # center of the view should hit the cart or the pole (a real body)
  out = viewer.handle({'op': 'select', 'x': 0.5, 'y': 0.5})
  assert out['ok']
  # perturb an explicit body: the cart slides when pushed in +x
  m = viewer.env.task.model
  cart_b = m.name2id('body', 'cart')
  before = float(viewer.env.physics.qpos[0])
  viewer.handle({'op': 'perturb', 'body': cart_b, 'fx': 50.0})
  for _ in range(10):
    viewer.loop_once(0.04)
  after = float(viewer.env.physics.qpos[0])
  assert after > before + 1e-3, (before, after)
  viewer.handle({'op': 'clear_perturb'})
  assert viewer.perturb.body_id == -1


def test_http_server_roundtrip():
  # OWN viewer instance, closed in-test: serve() starts a 25 Hz sim-loop
  # thread, and a live jax/numpy thread outliving the test corrupts
  # numpy errstate for every other test sharing this worker process
  env = suite.load('cartpole', 'swingup', task_kwargs={'random': 4})
  v = viewer_app.InteractiveViewer(env, height=60, width=80, port=0)
  try:
    # prime the step/render compiles on THIS thread: otherwise the loop
    # thread spends its first loop_once inside a ~minute XLA compile,
    # outlives close()'s join, and keeps running jax/numpy concurrently
    # with later tests in this worker (numpy errstate corruption)
    v.loop_once(0.02)
    v.serve(block=False, open_msg=False)
    base = f'http://127.0.0.1:{v.port}'
    page = urllib.request.urlopen(f'{base}/', timeout=10).read()
    assert b'viewer' in page
    status = json.loads(
        urllib.request.urlopen(f'{base}/status', timeout=10).read())
    assert status['state']
    req = urllib.request.Request(
        f'{base}/api', data=json.dumps({'op': 'pause'}).encode(),
        method='POST')
    out = json.loads(urllib.request.urlopen(req, timeout=10).read())
    assert out['ok']
    # frame endpoint serves a PNG once the loop has rendered
    png = urllib.request.urlopen(f'{base}/frame.png', timeout=10).read()
    assert png[:8] == b'\x89PNG\r\n\x1a\n'
  finally:
    v.close()
