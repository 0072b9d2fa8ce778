"""Real-robot backend (fork feature): TCP adapter for a Kinova Jaco."""

from dm_control_tpu.robot.engine import Physics, RobotClient  # noqa: F401
