"""Round-5 parity-tail items: Poisson/colors variations, TextOverlay,
suite.explore (VERDICT r4 missing #4/#5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_poisson_variation():
  from dm_control_tpu.composer import variation
  p = variation.Poisson(lam=4.0)
  key = jax.random.PRNGKey(0)
  samples = jnp.stack([
      variation.evaluate(p, jax.random.fold_in(key, i))
      for i in range(200)])
  assert float(samples.mean()) == pytest.approx(4.0, rel=0.2)
  assert (samples >= 0).all()
  assert samples.dtype in (jnp.int32, jnp.int64)


def test_rgb_variation():
  from dm_control_tpu.composer import colors, variation
  v = colors.RgbVariation(r=variation.Uniform(0.2, 0.4), g=0.5, b=0.75)
  rgba = v(jax.random.PRNGKey(1))
  assert rgba.shape == (4,)
  assert 0.2 <= float(rgba[0]) <= 0.4
  assert float(rgba[1]) == pytest.approx(0.5)
  assert float(rgba[3]) == pytest.approx(1.0)


@pytest.mark.parametrize('hsv,rgb', [
    ((0.0, 1.0, 1.0), (1, 0, 0)),
    ((1 / 3, 1.0, 1.0), (0, 1, 0)),
    ((2 / 3, 1.0, 1.0), (0, 0, 1)),
    ((0.0, 0.0, 0.5), (0.5, 0.5, 0.5)),
])
def test_hsv_matches_colorsys(hsv, rgb):
  import colorsys
  from dm_control_tpu.composer import colors
  got = colors.hsv_to_rgb(*hsv)
  want = colorsys.hsv_to_rgb(*hsv)
  np.testing.assert_allclose([float(x) for x in got], want, atol=1e-6)
  assert want == pytest.approx(rgb)


def test_gray_variation():
  from dm_control_tpu.composer import colors
  rgba = colors.GrayVariation(0.3)(jax.random.PRNGKey(0))
  np.testing.assert_allclose(np.asarray(rgba), [0.3, 0.3, 0.3, 1.0],
                             atol=1e-6)


def test_text_overlay_draws_pixels():
  from dm_control_tpu.overlay import TextOverlay
  frame = np.zeros((64, 128, 3), np.uint8)
  ov = TextOverlay(title='FPS 60', body='paused', position='top left')
  out = ov.draw(frame)
  assert out.sum() > 0
  assert frame.sum() == 0  # input untouched
  # text lands in the requested corner
  assert out[:20, :60].sum() > 0
  assert out[40:, :, :].sum() == 0

  br = TextOverlay(title='X', position='bottom right').draw(frame)
  assert br[-12:, -12:].sum() > 0
  assert br[:30, :30].sum() == 0


def test_text_overlay_styles_and_validation():
  from dm_control_tpu.overlay import TextOverlay
  frame = np.zeros((64, 128, 3), np.float32)
  big = TextOverlay(title='A', style='big').draw(frame)
  normal = TextOverlay(title='A').draw(frame)
  assert big.sum() > normal.sum()  # 2x scale lights more pixels
  TextOverlay(style='shadow').draw(frame)
  with pytest.raises(ValueError):
    TextOverlay(style='bold')
  with pytest.raises(ValueError):
    TextOverlay(position='center')


def test_explore_loads_env_without_serving():
  from dm_control_tpu.suite import explore
  assert 'cartpole.swingup' in explore.ALL_NAMES
  viewer = explore.explore('cartpole.balance', serve=False)
  assert viewer.env is not None
  with pytest.raises(ValueError):
    explore.explore('not.a_task', serve=False)
