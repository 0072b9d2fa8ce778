"""Testing infrastructure (reference: dm_control/mujoco/testing/)."""
