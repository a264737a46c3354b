"""Goldens for image ops vs scipy (the reference's actual backends)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from camouflage_multimodal_tpu.ops.image import (
    gaussian_blur,
    imagenet_denormalize,
    imagenet_normalize,
    rgb_to_gray,
    rgb_to_lab,
    sobel_h,
    sobel_v,
)
from camouflage_multimodal_tpu.ops.morphology import (
    binary_dilation_cross,
    binary_dilation_full,
)


@pytest.mark.parametrize("sigma", [1.0, 2.0])
@pytest.mark.parametrize("mode", ["reflect", "constant", "nearest"])
def test_gaussian_blur_matches_scipy(rng, sigma, mode):
    img = rng.random((41, 37)).astype(np.float32)
    ref = ndi.gaussian_filter(img.astype(np.float64), sigma, mode=mode)
    got = np.asarray(gaussian_blur(jnp.asarray(img), sigma, mode=mode))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_sobel_matches_scipy(rng):
    img = rng.random((32, 48)).astype(np.float32)
    ref_h = ndi.sobel(img.astype(np.float64), axis=0, mode="reflect")
    ref_v = ndi.sobel(img.astype(np.float64), axis=1, mode="reflect")
    np.testing.assert_allclose(np.asarray(sobel_h(jnp.asarray(img))), ref_h, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sobel_v(jnp.asarray(img))), ref_v, atol=2e-5)


@pytest.mark.parametrize("iterations", [1, 2, 3])
def test_binary_dilation_cross_matches_scipy(rng, iterations):
    mask = rng.random((40, 40)) > 0.85
    ref = ndi.binary_dilation(mask, iterations=iterations)
    got = np.asarray(binary_dilation_cross(jnp.asarray(mask), iterations=iterations))
    np.testing.assert_array_equal(got, ref)


def test_binary_dilation_full_matches_scipy(rng):
    mask = rng.random((30, 30)) > 0.9
    struct = np.ones((3, 3), dtype=bool)
    ref = ndi.binary_dilation(mask, structure=struct)
    got = np.asarray(binary_dilation_full(jnp.asarray(mask)))
    np.testing.assert_array_equal(got, ref)


def test_normalize_roundtrip(rng):
    img = rng.random((16, 16, 3)).astype(np.float32)
    norm = imagenet_normalize(jnp.asarray(img))
    back = imagenet_denormalize(norm)
    np.testing.assert_allclose(np.asarray(back), img, atol=1e-6)


def test_rgb_to_gray_weights(rng):
    img = rng.random((8, 8, 3)).astype(np.float32)
    ref = img @ np.array([0.2989, 0.5870, 0.1140], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(rgb_to_gray(jnp.asarray(img))), ref, atol=1e-6)


def test_rgb_to_lab_known_values():
    # White → L=100, a≈0, b≈0 ; black → 0,0,0 ; sRGB red → ≈(53.24, 80.09, 67.20)
    rgb = jnp.asarray([[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]])
    lab = np.asarray(rgb_to_lab(rgb))[0]
    np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.1)
    np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=0.1)
    np.testing.assert_allclose(lab[2], [53.24, 80.09, 67.20], atol=0.35)
