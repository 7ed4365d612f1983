"""Device ops vs host oracles (cv2 / scipy / numpy) — the golden-value
strategy of SURVEY.md §4: validate every TPU-native replacement of §2.13
against the exact library call the reference makes."""

import cv2 as cv
import numpy as np
import pytest
import scipy.ndimage as ndi

import jax
import jax.numpy as jnp

from tpu_unet.ops import (
    binary_threshold,
    component_planes,
    connected_components,
    dilate,
    edt,
    elastic_fields,
    fold_reflect,
    gaussian_filter,
    gaussian_kernel1d,
    map_coordinates_bilinear,
    reflect_pad,
    rotate_about_center,
)
from tpu_unet.ops.warp import elastic_warp


def _random_blobs(h, w, n_blobs, seed=0):
    """Synthetic instance mask: n_blobs random discs."""
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n_blobs):
        cy, cx = rng.randint(10, h - 10), rng.randint(10, w - 10)
        r = rng.randint(4, 12)
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1
    return img


# ---------------------------------------------------------------- EDT


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_edt_matches_cv_distance_transform(seed):
    mask = _random_blobs(64, 80, 5, seed=seed).astype(bool)
    # Reference encoding (functions.py:58): object pixels are the zero set.
    cv_in = (mask.astype(np.uint8) - 1).astype(np.uint8)  # obj -> 0, bg -> 255
    expected = cv.distanceTransform(cv_in, cv.DIST_L2, maskSize=0)
    got = np.asarray(edt(jnp.asarray(mask)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)


def test_edt_empty_mask_is_inf():
    got = np.asarray(edt(jnp.zeros((16, 16), bool)))
    assert np.all(np.isinf(got))


def test_edt_full_mask_is_zero():
    got = np.asarray(edt(jnp.ones((16, 16), bool)))
    np.testing.assert_array_equal(got, 0.0)


def test_edt_nonsquare():
    mask = np.zeros((20, 50), bool)
    mask[3, 40] = True
    got = np.asarray(edt(jnp.asarray(mask)))
    yy, xx = np.mgrid[0:20, 0:50]
    expected = np.sqrt((yy - 3.0) ** 2 + (xx - 40.0) ** 2)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)


# ----------------------------------------------------- connected components


@pytest.mark.parametrize("seed", [0, 3, 7])
def test_connected_components_partition_matches_cv(seed):
    mask = _random_blobs(64, 64, 6, seed=seed)
    n_cv, lab_cv = cv.connectedComponents(mask, connectivity=4)
    lab = np.asarray(connected_components(jnp.asarray(mask.astype(bool))))
    # Same component count (cv counts background as label 0).
    ours = np.unique(lab[mask.astype(bool)])
    assert len(ours) == n_cv - 1
    # Same partition: our label must be constant exactly on each cv component.
    for cv_id in range(1, n_cv):
        sel = lab_cv == cv_id
        assert len(np.unique(lab[sel])) == 1
        # and that value must not appear outside the component
        val = lab[sel][0]
        assert not np.any(lab[~sel] == val)


def test_component_planes_static_bound():
    mask = _random_blobs(48, 48, 4, seed=1).astype(bool)
    n_cv, lab_cv = cv.connectedComponents(mask.astype(np.uint8), connectivity=4)
    planes, num = component_planes(jnp.asarray(mask), max_objects=8)
    assert int(num) == n_cv - 1
    planes = np.asarray(planes)
    # Union of planes == mask; planes disjoint.
    assert np.array_equal(planes.any(0), mask)
    assert planes.sum(0).max() <= 1
    # Unused planes empty.
    assert not planes[int(num):].any()


def test_component_planes_spiral():
    # Long geodesic: a spiral strip exercises the propagation loop depth.
    mask = np.zeros((32, 32), bool)
    mask[0, :] = True
    mask[:, -1] = True
    mask[-1, :] = True
    mask[2:, 0] = True
    mask[2, 1:-2] = True
    planes, num = component_planes(jnp.asarray(mask), max_objects=4)
    assert int(num) == 1
    assert np.array_equal(np.asarray(planes)[0], mask)


# ---------------------------------------------------------------- morphology


def test_dilate_matches_cv():
    mask = (_random_blobs(40, 40, 3, seed=2) * 255).astype(np.float64)
    kernel = cv.getStructuringElement(cv.MORPH_RECT, (5, 5))
    expected = cv.dilate(mask, kernel, iterations=2)
    got = np.asarray(dilate(jnp.asarray(mask), ksize=5, iterations=2))
    np.testing.assert_allclose(got, expected)


def test_binary_threshold_matches_cv():
    img = np.arange(0, 256, dtype=np.uint8).reshape(16, 16)
    _, expected = cv.threshold(img, 127, 255, cv.THRESH_BINARY)
    got = np.asarray(binary_threshold(jnp.asarray(img), 127, 255))
    np.testing.assert_array_equal(got, expected)


# ---------------------------------------------------------------- padding


@pytest.mark.parametrize("pad", [1, 5, 30, 94])
def test_reflect_pad_matches_numpy(pad):
    img = np.random.RandomState(0).rand(32, 40)
    expected = np.pad(img, pad, mode="reflect")
    got = np.asarray(reflect_pad(jnp.asarray(img), pad))
    np.testing.assert_allclose(got, expected)


def test_reflect_pad_multibounce_matches_numpy():
    # Pad wider than the image (reference data.py:111 pads by input_size > crop).
    img = np.random.RandomState(1).rand(8, 8)
    expected = np.pad(img, 20, mode="reflect")
    got = np.asarray(reflect_pad(jnp.asarray(img), 20))
    np.testing.assert_allclose(got, expected)


def test_reflect_pad_asymmetric():
    img = np.random.RandomState(2).rand(10, 12)
    expected = np.pad(img, ((3, 7), (2, 5)), mode="reflect")
    got = np.asarray(reflect_pad(jnp.asarray(img), ((3, 7), (2, 5))))
    np.testing.assert_allclose(got, expected)


def test_reflect_pad_matches_reference_mirror_transform():
    # Re-derive the reference's nine-slice mirror fill (data.py:249-277) and
    # check our gather-based pad reproduces it (single-bounce regime).
    from tpu_unet.core import input_size_compute

    n = 64
    img = np.random.RandomState(3).rand(n, n)
    _, input_size, _ = input_size_compute(n)
    pad = (input_size - n) // 2
    expected = np.pad(img, pad, mode="reflect")  # numpy-equivalent per SURVEY §2.7
    got = np.asarray(reflect_pad(jnp.asarray(img), pad))
    assert got.shape == (input_size, input_size)
    np.testing.assert_allclose(got, expected)


def test_fold_reflect_floats():
    n = 10
    coords = jnp.asarray([-0.5, -1.0, 0.0, 9.0, 9.5, 18.0, 18.5, 27.0])
    got = np.asarray(fold_reflect(coords, n))
    np.testing.assert_allclose(got, [0.5, 1.0, 0.0, 9.0, 8.5, 0.0, 0.5, 9.0])


# ---------------------------------------------------------------- warps


@pytest.mark.parametrize("sigma", [1.0, 4.0, 10.0])
def test_gaussian_filter_matches_scipy(sigma):
    img = np.random.RandomState(0).rand(64, 64).astype(np.float32)
    expected = ndi.gaussian_filter(img, sigma, mode="constant", cval=0.0)
    got = np.asarray(gaussian_filter(jnp.asarray(img), sigma))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_gaussian_kernel_radius():
    assert gaussian_kernel1d(10.0).shape[0] == 2 * 40 + 1  # truncate=4


def test_map_coordinates_matches_scipy():
    img = np.random.RandomState(1).rand(32, 32).astype(np.float32)
    rng = np.random.RandomState(2)
    ci = rng.uniform(-2, 34, (20, 20)).astype(np.float32)
    cj = rng.uniform(-2, 34, (20, 20)).astype(np.float32)
    expected = ndi.map_coordinates(img, [ci, cj], order=1, mode="constant", cval=0.0)
    got = np.asarray(map_coordinates_bilinear(jnp.asarray(img), (jnp.asarray(ci), jnp.asarray(cj))))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_rotate_identity():
    img = np.random.RandomState(0).rand(40, 40).astype(np.float32)
    got = np.asarray(rotate_about_center(jnp.asarray(img), jnp.float32(0.0), 20))
    np.testing.assert_allclose(got, img[10:30, 10:30], atol=1e-5)


def test_rotate_90_exact():
    img = np.random.RandomState(0).rand(41, 41).astype(np.float32)
    got = np.asarray(rotate_about_center(jnp.asarray(img), jnp.float32(90.0), 41))
    expected = np.rot90(img)  # scipy rotate(+90) == np.rot90 counterclockwise
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_rotate_matches_scipy_bilinear_interior():
    # Compare against scipy's order-1 rotate on the interior (our reflect
    # folding differs from scipy's constant fill only near corners).
    img = np.random.RandomState(4).rand(80, 80).astype(np.float32)
    expected_full = ndi.rotate(img, 30.0, reshape=False, order=1, mode="constant")
    got = np.asarray(rotate_about_center(jnp.asarray(img), jnp.float32(30.0), 80))
    c = 25  # interior margin untouched by boundary handling
    np.testing.assert_allclose(got[c:-c, c:-c], expected_full[c:-c, c:-c],
                               rtol=1e-3, atol=1e-3)


def test_elastic_zero_alpha_is_identity():
    img = np.random.RandomState(0).rand(48, 48).astype(np.float32)
    key = jax.random.PRNGKey(0)
    dx, dy = elastic_fields(key, (48, 48), alpha=0.0, sigma=10.0)
    out = np.asarray(elastic_warp(jnp.asarray(img), dx, dy))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_elastic_warp_matches_scipy_map_coordinates():
    img = np.random.RandomState(5).rand(48, 48).astype(np.float32)
    key = jax.random.PRNGKey(1)
    dx, dy = elastic_fields(key, (48, 48), alpha=50.0, sigma=6.0)
    dx_np, dy_np = np.asarray(dx), np.asarray(dy)
    x, y = np.meshgrid(np.arange(48), np.arange(48), indexing="ij")
    expected = ndi.map_coordinates(
        img, [(x + dx_np).reshape(-1, 1), (y + dy_np).reshape(-1, 1)], order=1
    ).reshape(48, 48)
    got = np.asarray(elastic_warp(jnp.asarray(img), dx, dy))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_elastic_field_statistics():
    # Smoothed U(-1,1) * alpha: field magnitude should scale with alpha.
    key = jax.random.PRNGKey(2)
    dx, _ = elastic_fields(key, (128, 128), alpha=200.0, sigma=10.0)
    mag = float(jnp.std(dx))
    assert 1.0 < mag < 40.0  # smoothing shrinks variance far below alpha


def test_cubic_map_coordinates_matches_scipy_order3():
    # interior-coordinate parity with scipy order-3 (the 'constant'-mode
    # prefilter in scipy is mirror-boundary, same as ours; border semantics
    # differ only within 1 knot of the edge, which the augmentation never
    # samples — it reflect-pads generously first, data.py:109-112)
    from scipy.ndimage import map_coordinates as scipy_mc

    from tpu_unet.ops.warp import map_coordinates_cubic

    rng = np.random.RandomState(0)
    img = rng.rand(40, 37).astype(np.float32) * 255
    ci = rng.uniform(2.0, 37.0, (25, 25)).astype(np.float32)
    cj = rng.uniform(2.0, 34.0, (25, 25)).astype(np.float32)

    got = np.asarray(map_coordinates_cubic(jnp.asarray(img),
                                           (jnp.asarray(ci), jnp.asarray(cj))))
    exp = scipy_mc(img, [ci, cj], order=3, mode="constant")
    np.testing.assert_allclose(got, exp, rtol=2e-4, atol=2e-3)


def test_cubic_rotate_matches_scipy_rotate():
    # full rotate path vs the reference chain: generous reflect pad ->
    # scipy.ndimage.rotate(order=3, reshape=True) -> center crop
    # (data.py:109-124); compare the central window
    from scipy.ndimage import rotate as scipy_rotate

    from tpu_unet.ops.warp import rotate_about_center

    rng = np.random.RandomState(1)
    img = rng.rand(60, 60).astype(np.float32)
    out_size, angle = 40, 30.0

    got = np.asarray(rotate_about_center(jnp.asarray(img),
                                         jnp.asarray(angle), out_size,
                                         order=3))

    padded = np.pad(img, 60, mode="reflect")
    rot = scipy_rotate(padded, angle, reshape=True, order=3)
    c = (np.array(rot.shape) - out_size) // 2
    exp = rot[c[0]:c[0] + out_size, c[1]:c[1] + out_size]
    np.testing.assert_allclose(got, exp, rtol=5e-3, atol=5e-3)


def test_fused_cubic_augment_shapes_and_binarization():
    # the fused single-gather path with rotate_order=3 produces the same
    # shapes/contract as bilinear and a near-identical binarized target
    from tpu_unet.config import AugmentConfig
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.data.augment import AugmentPipeline

    data = synthetic_dataset(n_images=2, h=64, w=64, n_cells=3, crop=20, seed=0)
    for order in (1, 3):
        pipe = AugmentPipeline(AugmentConfig(crop=20, rotate_order=order))
        inp, gt = pipe(jnp.asarray(data.images), jnp.asarray(data.targets),
                       jnp.asarray(data.crop_log_probs),
                       jnp.asarray(data.crop_pairs),
                       np.array([0, 1]), jax.random.PRNGKey(3))
        # input_size_compute floors the bottleneck at 20 -> 380-in for crop 20
        assert inp.shape == (2, 380, 380, 1) and gt.shape == (2, 20, 20)
        assert set(np.unique(np.asarray(gt))) <= {0, 1}
        assert np.isfinite(np.asarray(inp)).all()
