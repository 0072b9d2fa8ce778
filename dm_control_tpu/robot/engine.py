"""Real-robot TCP backend (reference: dm_control/robot/engine.py:50-350).

Host-side adapter speaking the fork's `<|CMD**payload|>` framed text
protocol to a robot server, exposing the same joint-state surface the
jaco task consumes.  This sits entirely outside the jit graph — the
TPU-native stack simulates; this module lets the SAME task definitions
drive the physical arm (sim2real), mirroring the reference's dual
MujocoPhysics/RobotPhysics design (suite/jaco.py:81-85)."""

from __future__ import annotations

import json
import socket
from typing import Sequence

import numpy as np

_START, _MID, _END = '<|', '**', '|>'


class RobotClient:
  """Blocking request/response client (reference robot/engine.py:50-129)."""

  def __init__(self, robot_ip: str = '127.0.0.1', port: int = 9030):
    self.robot_ip = robot_ip
    self.port = port
    self.connected = False
    self.n_state_updates = 0

  def connect(self):
    self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    self._sock.connect((self.robot_ip, self.port))
    self.connected = True

  def send(self, cmd: str, msg: str = 'XX') -> str:
    packet = _START + cmd + _MID + msg + _END
    self._sock.sendall(packet.encode())
    return self._sock.recv(2048).decode()

  def decode_state(self, robot_response: str):
    """Parse the server's ACK frame into joint state (reference :71-93)."""
    ackmsg, resp = robot_response.split(_MID)
    assert ackmsg[:5] == '<|ACK', f'bad ack: {ackmsg!r}'
    assert resp[-2:] == _END, 'missing frame end'
    vals = [x.split(': ')[1] for x in resp[:-2].split('\n')]
    self.n_state_updates = int(vals[3])
    timediff = json.loads(vals[4])[-1]
    joint_position = json.loads(vals[5])
    joint_velocity = json.loads(vals[6])
    joint_effort = json.loads(vals[7])
    tool_pose = json.loads(vals[8])
    return timediff, joint_position, joint_velocity, joint_effort, tool_pose

  def home(self):
    return self.send('HOME')

  def reset(self):
    return self.decode_state(self.send('RESET'))

  def get_state(self):
    return self.decode_state(self.send('GET_STATE'))

  def initialize(self, minx, maxx, miny, maxy, minz, maxz):
    data = f'{minx},{maxx},{miny},{maxy},{minz},{maxz}'
    return self.decode_state(self.send('INIT', data))

  def step(self, command_type: str, relative: bool, unit: str,
           data: Sequence[float]):
    assert command_type in ('VEL', 'ANGLE', 'TOOL')
    datastr = ','.join('%.4f' % x for x in data)
    payload = f'{command_type},{0},{unit},{datastr}'
    return self.decode_state(self.send('STEP', payload))

  def end(self):
    self.send('END')
    self._sock.close()
    self.connected = False


class Physics:
  """Joint-state facade over RobotClient with the MujocoPhysics surface
  the jaco task reads (reference robot/engine.py:131-350)."""

  def __init__(self, robot_ip: str = '127.0.0.1', port: int = 9030,
               fence=None):
    self._client = RobotClient(robot_ip, port)
    self._fence = fence or {'x': (-1, 1), 'y': (-1, 1), 'z': (0.05, 1.2)}
    self._state = None

  def initialize(self):
    self._client.connect()
    f = self._fence
    self._update(self._client.initialize(
        min(f['x']), max(f['x']), min(f['y']), max(f['y']),
        min(f['z']), max(f['z'])))

  def _update(self, decoded):
    (self._timediff, pos, vel, effort, tool) = decoded
    self._state = dict(
        joint_position=np.asarray(pos), joint_velocity=np.asarray(vel),
        joint_effort=np.asarray(effort), tool_pose=np.asarray(tool))

  def reset(self):
    self._update(self._client.reset())

  def set_robot_position_home(self):
    self._client.home()
    self._update(self._client.get_state())

  def step(self, command_type: str, data, unit: str = 'rad'):
    self._update(self._client.step(command_type, False, unit, data))

  def get_joint_angles_radians(self):
    return self._state['joint_position'].copy()

  def get_actuator_velocity(self):
    return self._state['joint_velocity'].copy()

  def get_actuator_force(self):
    return self._state['joint_effort'].copy()

  def get_tool_pose(self):
    return self._state['tool_pose'].copy()

  def get_timestep(self):
    return np.asarray(self._timediff)
