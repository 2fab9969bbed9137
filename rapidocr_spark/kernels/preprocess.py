"""Neural-input preprocessing kernels (K2/K3/K8/K9).

The deterministic test kernels (det.prob_map, rec template matcher) do not
need these, but a real broadcast ONNX session does — they are the exact
tensor-preparation semantics of the reference, implemented and unit-tested
so swapping a real model in is a config change, not a code change.

- K2 NormalizeImage: (img*scale - mean) / std, ImageNet stats, HWC order
    /root/reference/python/rapidocr_onnxruntime/ch_ppocr_v3_det/utils.py:59-76
- K3 ToCHWImage / KeepKeys: HWC→CHW transpose; key projection
    .../ch_ppocr_v3_det/utils.py:79-98 (op chain built without eval)
- K8 cls resize_norm: resize to h=48, pad-right to w=192, x/255−.5 ÷ .5
    .../ch_ppocr_v2_cls/text_cls.py:76-97; shape config config.yaml:33
- K9 rec resize_norm: per-batch dynamic width int(48*max_wh_ratio),
    pad-right, same normalisation
    .../ch_ppocr_v3_rec/text_recognize.py:79-101
"""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)
SCALE = 1.0 / 255.0

CLS_IMAGE_SHAPE = (3, 48, 192)  # c, h, w (config.yaml:33)
REC_IMG_HEIGHT = 48


def normalize_image(img: np.ndarray) -> np.ndarray:
    """K2: uint8 HWC (or HW grayscale, promoted to 3ch) → float32 HWC."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return (img.astype(np.float32) * SCALE - IMAGENET_MEAN) / IMAGENET_STD


def to_chw(img: np.ndarray) -> np.ndarray:
    """K3: HWC → CHW."""
    return img.transpose((2, 0, 1))


def keep_keys(data: dict, keys: list[str]) -> list:
    """K3 KeepKeys: ordered key projection of the op-chain dict."""
    return [data[k] for k in keys]


def _resize_nn(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Deterministic nearest-neighbour resize (cv2-free)."""
    sh, sw = img.shape[:2]
    ys = np.minimum((np.arange(h) * sh / h).astype(np.int64), sh - 1)
    xs = np.minimum((np.arange(w) * sw / w).astype(np.int64), sw - 1)
    return img[np.ix_(ys, xs)]


def _norm_pm_half(resized: np.ndarray) -> np.ndarray:
    """shared cls/rec normalisation: x/255 − .5 over .5, CHW float32."""
    if resized.ndim == 2:
        resized = np.stack([resized] * 3, axis=-1)
    x = resized.astype(np.float32) / 255.0
    x = (x - 0.5) / 0.5
    return x.transpose((2, 0, 1))


def cls_resize_norm(img: np.ndarray) -> np.ndarray:
    """K8: (3, 48, 192) float32, content resized to h=48 preserving aspect,
    right-padded with zeros."""
    _, img_h, img_w = CLS_IMAGE_SHAPE
    h, w = img.shape[:2]
    ratio = w / float(h)
    resized_w = img_w if int(np.ceil(img_h * ratio)) > img_w else int(np.ceil(img_h * ratio))
    resized = _resize_nn(img, img_h, resized_w)
    out = np.zeros(CLS_IMAGE_SHAPE, dtype=np.float32)
    out[:, :, :resized_w] = _norm_pm_half(resized)
    return out


def rec_resize_norm(img: np.ndarray, max_wh_ratio: float) -> np.ndarray:
    """K9: (3, 48, int(48*max_wh_ratio)) float32 — the per-mini-batch
    dynamic width (A3), content right-padded."""
    img_h = REC_IMG_HEIGHT
    img_w = int(img_h * max_wh_ratio)
    h, w = img.shape[:2]
    ratio = w / float(h)
    resized_w = img_w if int(np.ceil(img_h * ratio)) > img_w else int(np.ceil(img_h * ratio))
    resized = _resize_nn(img, img_h, resized_w)
    out = np.zeros((3, img_h, img_w), dtype=np.float32)
    out[:, :, :resized_w] = _norm_pm_half(resized)
    return out
