"""Text overlays drawn onto rendered frames (host-side numpy).

Analog of the reference's `TextOverlay` (dm_control/mujoco/engine.py:
920-952, drawn natively by mjr_overlay): a title/body pair anchored to a
corner of the frame.  Here the renderer is the in-graph raytracer, so
overlays are rasterized onto the returned numpy image with a built-in
5x7 bitmap font — no GL, works on any (H, W, 3) uint8/float frame.
"""

from __future__ import annotations

import numpy as np

# 5x7 font: 5 column bytes per glyph, LSB = top row.  Lowercase maps to
# uppercase; unknown glyphs render as a filled box.
_F = {
    ' ': (0, 0, 0, 0, 0),
    '!': (0, 0, 0x5f, 0, 0),
    '"': (0, 7, 0, 7, 0),
    '%': (0x23, 0x13, 0x08, 0x64, 0x62),
    "'": (0, 5, 3, 0, 0),
    '(': (0, 0x1c, 0x22, 0x41, 0),
    ')': (0, 0x41, 0x22, 0x1c, 0),
    '*': (0x14, 0x08, 0x3e, 0x08, 0x14),
    '+': (0x08, 0x08, 0x3e, 0x08, 0x08),
    ',': (0, 0x50, 0x30, 0, 0),
    '-': (0x08, 0x08, 0x08, 0x08, 0x08),
    '.': (0, 0x60, 0x60, 0, 0),
    '/': (0x20, 0x10, 0x08, 0x04, 0x02),
    '0': (0x3e, 0x51, 0x49, 0x45, 0x3e),
    '1': (0, 0x42, 0x7f, 0x40, 0),
    '2': (0x42, 0x61, 0x51, 0x49, 0x46),
    '3': (0x21, 0x41, 0x45, 0x4b, 0x31),
    '4': (0x18, 0x14, 0x12, 0x7f, 0x10),
    '5': (0x27, 0x45, 0x45, 0x45, 0x39),
    '6': (0x3c, 0x4a, 0x49, 0x49, 0x30),
    '7': (0x01, 0x71, 0x09, 0x05, 0x03),
    '8': (0x36, 0x49, 0x49, 0x49, 0x36),
    '9': (0x06, 0x49, 0x49, 0x29, 0x1e),
    ':': (0, 0x36, 0x36, 0, 0),
    ';': (0, 0x56, 0x36, 0, 0),
    '<': (0x08, 0x14, 0x22, 0x41, 0),
    '=': (0x14, 0x14, 0x14, 0x14, 0x14),
    '>': (0, 0x41, 0x22, 0x14, 0x08),
    '?': (0x02, 0x01, 0x51, 0x09, 0x06),
    'A': (0x7e, 0x11, 0x11, 0x11, 0x7e),
    'B': (0x7f, 0x49, 0x49, 0x49, 0x36),
    'C': (0x3e, 0x41, 0x41, 0x41, 0x22),
    'D': (0x7f, 0x41, 0x41, 0x22, 0x1c),
    'E': (0x7f, 0x49, 0x49, 0x49, 0x41),
    'F': (0x7f, 0x09, 0x09, 0x09, 0x01),
    'G': (0x3e, 0x41, 0x49, 0x49, 0x7a),
    'H': (0x7f, 0x08, 0x08, 0x08, 0x7f),
    'I': (0, 0x41, 0x7f, 0x41, 0),
    'J': (0x20, 0x40, 0x41, 0x3f, 0x01),
    'K': (0x7f, 0x08, 0x14, 0x22, 0x41),
    'L': (0x7f, 0x40, 0x40, 0x40, 0x40),
    'M': (0x7f, 0x02, 0x0c, 0x02, 0x7f),
    'N': (0x7f, 0x04, 0x08, 0x10, 0x7f),
    'O': (0x3e, 0x41, 0x41, 0x41, 0x3e),
    'P': (0x7f, 0x09, 0x09, 0x09, 0x06),
    'Q': (0x3e, 0x41, 0x51, 0x21, 0x5e),
    'R': (0x7f, 0x09, 0x19, 0x29, 0x46),
    'S': (0x46, 0x49, 0x49, 0x49, 0x31),
    'T': (0x01, 0x01, 0x7f, 0x01, 0x01),
    'U': (0x3f, 0x40, 0x40, 0x40, 0x3f),
    'V': (0x1f, 0x20, 0x40, 0x20, 0x1f),
    'W': (0x3f, 0x40, 0x38, 0x40, 0x3f),
    'X': (0x63, 0x14, 0x08, 0x14, 0x63),
    'Y': (0x07, 0x08, 0x70, 0x08, 0x07),
    'Z': (0x61, 0x51, 0x49, 0x45, 0x43),
    '[': (0, 0x7f, 0x41, 0x41, 0),
    ']': (0, 0x41, 0x41, 0x7f, 0),
    '_': (0x40, 0x40, 0x40, 0x40, 0x40),
}
_UNKNOWN = (0x7f, 0x7f, 0x7f, 0x7f, 0x7f)

_GRID_POSITIONS = ('top left', 'top right', 'bottom left', 'bottom right')
_FONT_STYLES = ('normal', 'shadow', 'big')


def _glyph(ch: str) -> np.ndarray:
  cols = _F.get(ch) or _F.get(ch.upper()) or _UNKNOWN
  g = np.zeros((7, 5), bool)
  for c, byte in enumerate(cols):
    for r in range(7):
      g[r, c] = bool(byte >> r & 1)
  return g


def _rasterize(text: str, scale: int = 1) -> np.ndarray:
  """(7*scale, 6*len*scale) boolean mask for one line of text."""
  if not text:
    return np.zeros((7 * scale, 0), bool)
  rows = []
  for ch in text:
    g = _glyph(ch)
    rows.append(np.pad(g, ((0, 0), (0, 1))))
  mask = np.concatenate(rows, axis=1)
  if scale > 1:
    mask = np.repeat(np.repeat(mask, scale, 0), scale, 1)
  return mask


class TextOverlay:
  """Title/body text anchored to a frame corner (reference
  engine.py:920-952 semantics; styles: normal/shadow/big)."""

  __slots__ = ('title', 'body', 'style', 'position')

  def __init__(self, title: str = '', body: str = '',
               style: str = 'normal', position: str = 'top left'):
    if style not in _FONT_STYLES:
      raise ValueError(f'style must be one of {_FONT_STYLES}')
    if position not in _GRID_POSITIONS:
      raise ValueError(f'position must be one of {_GRID_POSITIONS}')
    self.title, self.body = title, body
    self.style, self.position = style, position

  def draw(self, frame: np.ndarray) -> np.ndarray:
    """Return a copy of `frame` ((H, W, 3) uint8 or float) with the
    overlay rasterized at its grid position."""
    frame = np.array(frame)
    is_float = np.issubdtype(frame.dtype, np.floating)
    fg = 1.0 if is_float else 255
    scale = 2 if self.style == 'big' else 1
    lines = [ln for ln in (self.title, self.body) if ln]
    masks = [_rasterize(ln, scale) for ln in lines]
    h, w = frame.shape[:2]
    pad = 2
    y = pad if 'top' in self.position else None
    for i, mask in enumerate(masks):
      mh, mw = mask.shape
      if y is None:  # bottom: stack upward
        yy = h - pad - (len(masks) - i) * (mh + pad)
      else:
        yy = y + i * (mh + pad)
      xx = pad if 'left' in self.position else max(0, w - pad - mw)
      mh = min(mh, h - yy)
      mw = min(mw, w - xx)
      if mh <= 0 or mw <= 0:
        continue
      sub = frame[yy:yy + mh, xx:xx + mw]
      m = mask[:mh, :mw]
      if self.style == 'shadow':
        sh = np.zeros_like(m)
        sh[1:, 1:] = m[:-1, :-1]
        sub[sh & ~m] = 0
      sub[m] = fg
      frame[yy:yy + mh, xx:xx + mw] = sub
    return frame


def draw_overlays(frame: np.ndarray, overlays) -> np.ndarray:
  for ov in overlays:
    frame = ov.draw(frame)
  return frame
