"""K2/K3/K8/K9 tensor-preparation kernels vs hand-computed goldens."""

from __future__ import annotations

import numpy as np
import pytest

from rapidocr_spark.kernels import preprocess as pp


def test_normalize_image_imagenet_stats():
    img = np.full((2, 2, 3), 255, dtype=np.uint8)
    out = pp.normalize_image(img)
    want = (1.0 - pp.IMAGENET_MEAN) / pp.IMAGENET_STD
    assert out.dtype == np.float32
    assert np.allclose(out[0, 0], want, atol=1e-6)


def test_normalize_promotes_grayscale():
    img = np.zeros((4, 5), dtype=np.uint8)
    out = pp.normalize_image(img)
    assert out.shape == (4, 5, 3)
    assert np.allclose(out[0, 0], (0.0 - pp.IMAGENET_MEAN) / pp.IMAGENET_STD, atol=1e-6)


def test_to_chw_and_keep_keys():
    img = np.arange(24, dtype=np.float32).reshape(2, 4, 3)
    chw = pp.to_chw(img)
    assert chw.shape == (3, 2, 4)
    assert chw[1, 0, 2] == img[0, 2, 1]
    assert pp.keep_keys({"image": 1, "shape": 2}, ["shape", "image"]) == [2, 1]


def test_cls_resize_norm_shape_and_padding():
    img = np.full((24, 48), 255, dtype=np.uint8)  # ratio 2 → resized_w = 96
    out = pp.cls_resize_norm(img)
    assert out.shape == pp.CLS_IMAGE_SHAPE
    assert np.allclose(out[:, :, :96], 1.0)   # (255/255 - .5)/.5
    assert np.allclose(out[:, :, 96:], 0.0)   # right pad


def test_cls_resize_norm_wide_clamps_to_192():
    img = np.zeros((10, 2000), dtype=np.uint8)
    out = pp.cls_resize_norm(img)
    assert out.shape == pp.CLS_IMAGE_SHAPE
    assert np.allclose(out, -1.0)  # zeros → (0-.5)/.5 across full width


@pytest.mark.parametrize("max_wh_ratio,exp_w", [(4.0, 192), (10.0, 480)])
def test_rec_resize_norm_dynamic_width(max_wh_ratio, exp_w):
    img = np.full((24, 96, 3), 255, dtype=np.uint8)  # ratio 4 → resized_w=192
    out = pp.rec_resize_norm(img, max_wh_ratio)
    assert out.shape == (3, 48, exp_w)
    assert np.allclose(out[:, :, :192], 1.0)
    if exp_w > 192:
        assert np.allclose(out[:, :, 192:], 0.0)
