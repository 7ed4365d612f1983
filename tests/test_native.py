"""Native C++ host kernels vs cv2 oracles and the device ops."""

import cv2 as cv
import numpy as np
import pytest

from tpu_unet import native
from tpu_unet.data.ingest import _preprocess_gt_py


pytestmark = pytest.mark.skipif(not native.has_native(),
                                reason="native library not built")


def _blobs(h, w, n, seed=0):
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n):
        cy, cx, r = rng.randint(8, h - 8), rng.randint(8, w - 8), rng.randint(3, 9)
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1
    return img


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_edt_matches_cv(seed):
    mask = _blobs(96, 128, 6, seed)
    expected = cv.distanceTransform((mask - 1).astype(np.uint8), cv.DIST_L2,
                                    maskSize=0)
    got = native.edt(mask.astype(bool))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)


def test_native_edt_empty_and_full():
    assert np.isinf(native.edt(np.zeros((8, 8), bool))).all()
    np.testing.assert_array_equal(native.edt(np.ones((8, 8), bool)), 0.0)


@pytest.mark.parametrize("seed", [0, 3])
def test_native_cc_matches_cv_exactly(seed):
    mask = _blobs(80, 80, 7, seed)
    n_cv, lab_cv = cv.connectedComponents(mask, connectivity=4)
    k, lab = native.connected_components(mask.astype(bool))
    assert k == n_cv - 1
    np.testing.assert_array_equal(lab, lab_cv)


def test_native_cc_snake():
    mask = np.zeros((16, 16), np.uint8)
    mask[0, :] = 1
    mask[:, -1] = 1
    mask[-1, :] = 1
    k, lab = native.connected_components(mask.astype(bool))
    assert k == 1


def test_native_dilate_matches_cv():
    img = (_blobs(48, 48, 4, 1) * 255).astype(np.float32)
    kernel = cv.getStructuringElement(cv.MORPH_RECT, (5, 5))
    expected = cv.dilate(img.astype(np.float64), kernel, iterations=2)
    got = native.dilate(img, 5, 2)
    np.testing.assert_allclose(got, expected)


def test_native_preprocess_gt_matches_python():
    rng = np.random.RandomState(2)
    inst = np.zeros((64, 64), np.int32)
    inst[4:24, 4:24] = 1
    inst[24:44, 24:44] = 2
    inst[50:60, 10:30] = 3
    g_n, e_n = native.preprocess_gt(inst)
    g_p, e_p = _preprocess_gt_py(inst)
    np.testing.assert_allclose(g_n, g_p)
    np.testing.assert_allclose(e_n, e_p)
