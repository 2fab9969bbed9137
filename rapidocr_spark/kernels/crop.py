"""Box cropping — K7 get_rotate_crop_image semantics.

The reference perspective-warps an arbitrary quad to an upright rect and
rotates 90° CCW when the crop is tall (h/w >= 1.5)
(/root/reference/python/rapidocr_onnxruntime/rapid_ocr_api.py:121-150).

Two paths, same contract:
- axis-aligned quads (the overwhelmingly common case) take an exact slice
  — the warp degenerates to a translation, so slicing is the same output
  with zero resampling cost;
- rotated quads run a true 4-point perspective warp (DLT homography +
  inverse-map nearest sampling, kernels/geometry.py) — the cv2
  getPerspectiveTransform/warpPerspective analog.
"""

from __future__ import annotations

import numpy as np

from .geometry import warp_quad


def _is_axis_aligned(quad: np.ndarray) -> bool:
    return (
        float(quad[0][1]) == float(quad[1][1])
        and float(quad[2][1]) == float(quad[3][1])
        and float(quad[0][0]) == float(quad[3][0])
        and float(quad[1][0]) == float(quad[2][0])
    )


def _slice_bbox(img: np.ndarray, quad: np.ndarray, w: int, h: int) -> np.ndarray:
    """Exact w×h slice anchored at the quad's top-left, clamped inside the
    image (BORDER_REPLICATE analog)."""
    x0 = int(round(float(quad[0][0])))
    y0 = int(round(float(quad[0][1])))
    ih, iw = img.shape[:2]
    ys = np.clip(np.arange(y0, y0 + h), 0, ih - 1)
    xs = np.clip(np.arange(x0, x0 + w), 0, iw - 1)
    return img[np.ix_(ys, xs)]


def crop_quad(img: np.ndarray, quad: np.ndarray) -> np.ndarray:
    """Crop a [tl,tr,br,bl] quad to an upright patch; rot90 if h/w >= 1.5
    (rapid_ocr_api.py:121-150 control flow)."""
    w = int(max(np.linalg.norm(quad[0] - quad[1]), np.linalg.norm(quad[2] - quad[3])))
    h = int(max(np.linalg.norm(quad[0] - quad[3]), np.linalg.norm(quad[1] - quad[2])))
    w, h = max(w, 1), max(h, 1)
    if _is_axis_aligned(quad):
        dst = _slice_bbox(img, quad, w, h)
    else:
        try:
            dst = warp_quad(img, quad, w, h)
        except np.linalg.LinAlgError:
            # degenerate (near-collinear) quad that slipped past F6: the DLT
            # system is singular — degrade to the axis-aligned bbox slice
            # instead of killing the executor task (ADVICE r02 item 5)
            dst = _slice_bbox(img, quad, w, h)
    if dst.shape[0] * 1.0 / dst.shape[1] >= 1.5:
        dst = np.rot90(dst)
    return dst


def whole_image_box(img: np.ndarray) -> np.ndarray:
    """The F1 skip-det substitute box [[0,0],[w,0],[w,h],[0,h]]
    (rapid_ocr_api.py:114-119)."""
    h, w = img.shape[:2]
    return np.array([[0, 0], [w, 0], [w, h], [0, h]], dtype=np.float32)
