"""Box cropping — K7 get_rotate_crop_image semantics for our quads.

The reference perspective-warps an arbitrary quad to an upright rect and
rotates 90° CCW when the crop is tall (h/w >= 1.5)
(/root/reference/python/rapidocr_onnxruntime/rapid_ocr_api.py:121-150).
Our detector emits axis-aligned quads (synthetic prob maps have no skew),
for which the warp degenerates to a slice — same output, no cv2.
"""

from __future__ import annotations

import numpy as np


def crop_quad(img: np.ndarray, quad: np.ndarray) -> np.ndarray:
    """Crop an axis-aligned [tl,tr,br,bl] quad; rot90 if h/w >= 1.5."""
    w = int(max(np.linalg.norm(quad[0] - quad[1]), np.linalg.norm(quad[2] - quad[3])))
    h = int(max(np.linalg.norm(quad[0] - quad[3]), np.linalg.norm(quad[1] - quad[2])))
    x0 = int(round(float(quad[0][0])))
    y0 = int(round(float(quad[0][1])))
    ih, iw = img.shape[:2]
    # BORDER_REPLICATE analog: clamp the sample window inside the image
    ys = np.clip(np.arange(y0, y0 + max(h, 1)), 0, ih - 1)
    xs = np.clip(np.arange(x0, x0 + max(w, 1)), 0, iw - 1)
    dst = img[np.ix_(ys, xs)]
    if dst.shape[0] * 1.0 / dst.shape[1] >= 1.5:
        dst = np.rot90(dst)
    return dst


def whole_image_box(img: np.ndarray) -> np.ndarray:
    """The F1 skip-det substitute box [[0,0],[w,0],[w,h],[0,h]]
    (rapid_ocr_api.py:114-119)."""
    h, w = img.shape[:2]
    return np.array([[0, 0], [w, 0], [w, h], [0, h]], dtype=np.float32)
