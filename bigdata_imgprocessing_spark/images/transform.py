"""Geometric transforms on decoded images — pure numpy (no cv2).

Letterbox resize re-expresses YOLOX's ``preproc``
(yolox.zip!yolox/data/data_augment.py:142-158,213-243 in the reference):
scale by min(target_h/h, target_w/w), nearest-neighbor resize, pad the
rest with 114. Nearest-neighbor keeps the arithmetic integer-exact so
downstream stats are oracle-checkable; a real deployment swaps in
cv2.resize bilinear behind the same signature.
"""

from __future__ import annotations

import numpy as np

PAD_VALUE = 114  # YOLOX letterbox padding constant


def letterbox(img: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """uint8 HxWxC → uint8 target_h x target_w x C, aspect preserved,
    114-padded bottom/right (the reference pads bottom-right too)."""
    h, w, c = img.shape
    scale = min(target_h / h, target_w / w)
    nh, nw = int(h * scale), int(w * scale)
    ys = (np.arange(nh) / scale).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(nw) / scale).astype(np.int64).clip(0, w - 1)
    resized = img[ys][:, xs]
    out = np.full((target_h, target_w, c), PAD_VALUE, dtype=np.uint8)
    out[:nh, :nw] = resized
    return out
