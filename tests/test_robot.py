"""Robot TCP backend protocol test against an in-process fake server."""

import json
import socket
import threading

import numpy as np

from dm_control_tpu.robot import engine


def _fake_server(sock, state):
  conn, _ = sock.accept()
  while True:
    data = conn.recv(2048).decode()
    if not data:
      break
    assert data.startswith('<|') and data.endswith('|>')
    cmd = data[2:].split('**')[0]
    if cmd == 'END':
      conn.sendall(b'<|ACK**done|>')
      break
    body = '\n'.join([
        'success: True', "msg: 'ok'", 'names: []', 'n: 3',
        'timediff: ' + json.dumps([0.01, 0.02]),
        'pos: ' + json.dumps(state['pos']),
        'vel: ' + json.dumps(state['vel']),
        'effort: ' + json.dumps(state['effort']),
        'tool: ' + json.dumps(state['tool']),
    ])
    conn.sendall(f'<|ACKSTEP**{body}|>'.encode())
  conn.close()


def test_robot_client_protocol():
  state = dict(pos=[0.1] * 13, vel=[0.0] * 13, effort=[1.5] * 13,
               tool=[0.2, 0.2, 0.5, 0, 0, 0, 1])
  srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
  srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
  srv.bind(('127.0.0.1', 0))
  srv.listen(1)
  port = srv.getsockname()[1]
  t = threading.Thread(target=_fake_server, args=(srv, state), daemon=True)
  t.start()

  phys = engine.Physics('127.0.0.1', port)
  phys.initialize()
  assert np.allclose(phys.get_joint_angles_radians(), 0.1)
  phys.step('ANGLE', [0.2] * 7)
  assert np.allclose(phys.get_actuator_force(), 1.5)
  assert phys.get_timestep() == 0.02
  phys._client.end()
  t.join(timeout=5)
