"""Preprocessing parity tests: matrix-bicubic path vs PIL (the reference's
torchvision pipeline calls into PIL, so PIL is ground truth)."""

import numpy as np
import pytest
from PIL import Image

from aiic_tpu.data.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    center_crop_bounds,
    preprocess_numpy,
    preprocess_pil,
    resize_bicubic_numpy,
    resize_matrix,
    resize_target,
)


def _rand_img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_resize_matrix_rows_sum_to_one():
    for pair in [(640, 224), (100, 224), (224, 224), (479, 224)]:
        k = resize_matrix(*pair)
        np.testing.assert_allclose(k.sum(axis=1), 1.0, atol=2e-5)


@pytest.mark.parametrize("w,h", [(640, 479), (200, 300), (224, 224), (256, 256), (1000, 50)])
def test_matrix_resize_matches_pil(w, h):
    img = _rand_img(w, h)
    new_w, new_h = resize_target(w, h, 224)
    ours = resize_bicubic_numpy(img, new_w, new_h)
    pil = np.asarray(
        Image.fromarray(img).resize((new_w, new_h), Image.BICUBIC), dtype=np.float32
    )
    diff = np.abs(ours - pil)
    # fp32 matmul vs PIL's int fixed point: allow one uint8 level on a tiny
    # fraction of pixels, never more.
    assert diff.max() <= 1.0, diff.max()
    assert (diff > 0.5).mean() < 1e-3


def test_preprocess_pipeline_close_to_pil(ref_root):
    img = Image.open(f"{ref_root}/interior_sample.jpg").convert("RGB")
    a = preprocess_pil(img)
    b = preprocess_numpy(np.asarray(img))
    assert a.shape == b.shape == (224, 224, 3)
    # one uint8 level in normalized units
    tol = (1.0 / 255.0) / CLIP_STD.min() + 1e-6
    assert np.abs(a - b).max() <= tol


def test_preprocess_real_dataset_images(ref_root):
    import glob

    paths = sorted(glob.glob(f"{ref_root}/dataset_images/*.jpg"))[:5]
    assert paths
    for p in paths:
        img = Image.open(p).convert("RGB")
        a = preprocess_pil(img)
        b = preprocess_numpy(np.asarray(img))
        mismatch = (np.abs(a - b) > (1.5 / 255.0) / CLIP_STD.min()).mean()
        assert mismatch < 1e-3, (p, mismatch)


def test_center_crop_is_torchvision_center():
    assert center_crop_bounds(299, 224, 224) == (0, 38)
    assert center_crop_bounds(224, 300, 224) == (38, 0)


def test_resize_target_shorter_side():
    assert resize_target(640, 479, 224) == (299, 224)
    assert resize_target(479, 640, 224) == (224, 299)
    assert resize_target(224, 224, 224) == (224, 224)
    # torchvision truncates the long side (int(), not round): 640x480 -> 298,
    # where rounding would give 299 and shift the center crop.
    assert resize_target(640, 480, 224) == (298, 224)
    assert resize_target(480, 640, 224) == (224, 298)


def test_normalization_constants():
    img = np.zeros((224, 224, 3), np.uint8)
    out = preprocess_numpy(img)
    np.testing.assert_allclose(out[0, 0], -CLIP_MEAN / CLIP_STD, rtol=1e-5)
