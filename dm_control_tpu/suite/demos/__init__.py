"""Demos (reference: dm_control/suite/demos/)."""
