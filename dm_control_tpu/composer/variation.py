"""Composable random-variation DSL (reference: composer/variation/).

Re-expresses the reference's operator-overloaded Variation classes
(variation/base.py:31-131, distributions.py:32-190, noises.py:26-65,
rotations.py) as PURE functions of a PRNG key: `evaluate(v, key,
initial_value, current_value)` — jit/vmap-safe, so per-episode
randomization runs in-graph and batched environments draw independent
variations per lane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def evaluate(value, key, initial_value=None, current_value=None):
  """Resolve nested Variations / containers to concrete arrays."""
  if isinstance(value, Variation):
    return value(key, initial_value, current_value)
  if isinstance(value, (tuple, list)):
    keys = jax.random.split(key, len(value))
    return type(value)(
        evaluate(v, k, initial_value, current_value)
        for v, k in zip(value, keys))
  return value


class Variation:
  """Base: callable (key, initial_value, current_value) -> value, with
  arithmetic composition mirroring the reference's operator overloads."""

  def __call__(self, key, initial_value=None, current_value=None):
    raise NotImplementedError

  def _binary(self, other, op, swap=False):
    return _BinaryOp(self, other, op, swap)

  def __add__(self, o): return self._binary(o, jnp.add)
  def __radd__(self, o): return self._binary(o, jnp.add, True)
  def __sub__(self, o): return self._binary(o, jnp.subtract)
  def __rsub__(self, o): return self._binary(o, jnp.subtract, True)
  def __mul__(self, o): return self._binary(o, jnp.multiply)
  def __rmul__(self, o): return self._binary(o, jnp.multiply, True)
  def __truediv__(self, o): return self._binary(o, jnp.divide)
  def __rtruediv__(self, o): return self._binary(o, jnp.divide, True)
  def __pow__(self, o): return self._binary(o, jnp.power)
  def __neg__(self): return _UnaryOp(self, jnp.negative)
  def __abs__(self): return _UnaryOp(self, jnp.abs)


class _BinaryOp(Variation):
  def __init__(self, a, b, op, swap=False):
    self._a, self._b, self._op, self._swap = a, b, op, swap

  def __call__(self, key, initial_value=None, current_value=None):
    k1, k2 = jax.random.split(key)
    a = evaluate(self._a, k1, initial_value, current_value)
    b = evaluate(self._b, k2, initial_value, current_value)
    return self._op(b, a) if self._swap else self._op(a, b)


class _UnaryOp(Variation):
  def __init__(self, a, op):
    self._a, self._op = a, op

  def __call__(self, key, initial_value=None, current_value=None):
    return self._op(evaluate(self._a, key, initial_value, current_value))


class _Distribution(Variation):
  """Wraps a jax.random sampler; args may themselves be Variations
  (reference distributions.py:32-64 semantics).  single_sample draws a
  scalar even when args are arrays (matching the reference flag)."""

  def __init__(self, *args, single_sample=False, shape=(), **kwargs):
    self._args = args
    self._kwargs = kwargs
    self._single = single_sample
    self._shape = shape

  def _sample(self, key, *args, **kwargs):
    raise NotImplementedError

  def __call__(self, key, initial_value=None, current_value=None):
    ks = jax.random.split(key, len(self._args) + len(self._kwargs) + 1)
    args = [evaluate(a, k, initial_value, current_value)
            for a, k in zip(self._args, ks[1:])]
    kwargs = {n: evaluate(v, k, initial_value, current_value)
              for (n, v), k in zip(self._kwargs.items(),
                                   ks[1 + len(args):])}
    return self._sample(ks[0], *args, **kwargs)


class Uniform(_Distribution):
  def __init__(self, low=0.0, high=1.0, **kw):
    super().__init__(low, high, **kw)

  def _sample(self, key, low, high):
    shape = self._shape or (() if self._single else np.broadcast(
        np.empty(np.shape(low)), np.empty(np.shape(high))).shape)
    return jax.random.uniform(
        key, shape, minval=jnp.asarray(low, jnp.float64 if jax.config.x64_enabled else jnp.float32),
        maxval=jnp.asarray(high))


class Normal(_Distribution):
  def __init__(self, loc=0.0, scale=1.0, **kw):
    super().__init__(loc, scale, **kw)

  def _sample(self, key, loc, scale):
    shape = self._shape or (() if self._single else np.shape(loc))
    return loc + scale * jax.random.normal(key, shape)


class LogNormal(_Distribution):
  def __init__(self, mean=0.0, sigma=1.0, **kw):
    super().__init__(mean, sigma, **kw)

  def _sample(self, key, mean, sigma):
    shape = self._shape or (() if self._single else np.shape(mean))
    return jnp.exp(mean + sigma * jax.random.normal(key, shape))


class Exponential(_Distribution):
  def __init__(self, scale=1.0, **kw):
    super().__init__(scale, **kw)

  def _sample(self, key, scale):
    shape = self._shape or (() if self._single else np.shape(scale))
    return scale * jax.random.exponential(key, shape)


class Bernoulli(_Distribution):
  def __init__(self, prob=0.5, **kw):
    super().__init__(prob, **kw)

  def _sample(self, key, prob):
    shape = self._shape or (() if self._single else np.shape(prob))
    return jax.random.bernoulli(key, prob, shape)


class Poisson(_Distribution):
  """Poisson counts (reference distributions.py:150-158)."""

  def __init__(self, lam=1.0, **kw):
    super().__init__(lam, **kw)

  def _sample(self, key, lam):
    shape = self._shape or (() if self._single else np.shape(lam))
    return jax.random.poisson(key, lam, shape)


class UniformChoice(_Distribution):
  def __init__(self, choices, **kw):
    super().__init__(**kw)
    self._choices = jnp.asarray(choices)

  def _sample(self, key):
    i = jax.random.randint(key, (), 0, len(self._choices))
    return self._choices[i]


class UniformPointOnSphere(Variation):
  """Uniform direction in R^3 (reference distributions.py:150-160)."""

  def __call__(self, key, initial_value=None, current_value=None):
    v = jax.random.normal(key, (3,))
    return v / jnp.linalg.norm(v)


class BiasedRandomWalk(Variation):
  """OU-style random walk (reference distributions.py:163-190).  The
  reference mutates internal state; here the walk reads `current_value`
  and returns the next value — pure, so batched lanes stay independent."""

  def __init__(self, stdev=0.1, timescale=10.0):
    self._stdev = stdev
    self._timescale = timescale

  def __call__(self, key, initial_value=None, current_value=None):
    cur = 0.0 if current_value is None else current_value
    retention = jnp.exp(-1.0 / self._timescale)
    scale = self._stdev * jnp.sqrt(1 - retention ** 2)
    return retention * cur + scale * jax.random.normal(key)


# -- noises (reference noises.py:26-65) --------------------------------------


class Additive(Variation):
  def __init__(self, distribution):
    self._d = distribution

  def __call__(self, key, initial_value=None, current_value=None):
    cur = initial_value if current_value is None else current_value
    return cur + evaluate(self._d, key, initial_value, current_value)


class Multiplicative(Variation):
  def __init__(self, distribution):
    self._d = distribution

  def __call__(self, key, initial_value=None, current_value=None):
    cur = initial_value if current_value is None else current_value
    return cur * evaluate(self._d, key, initial_value, current_value)


# -- rotations (reference rotations.py) ---------------------------------------


class UniformQuaternion(Variation):
  def __call__(self, key, initial_value=None, current_value=None):
    q = jax.random.normal(key, (4,))
    return q / jnp.linalg.norm(q)


class QuaternionFromAxisAngle(Variation):
  def __init__(self, axis, angle):
    self._axis, self._angle = axis, angle

  def __call__(self, key, initial_value=None, current_value=None):
    k1, k2 = jax.random.split(key)
    axis = evaluate(self._axis, k1, initial_value, current_value)
    angle = evaluate(self._angle, k2, initial_value, current_value)
    axis = axis / jnp.linalg.norm(axis)
    half = angle / 2
    return jnp.concatenate(
        [jnp.cos(half)[None], axis * jnp.sin(half)])
