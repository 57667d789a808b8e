import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from waldboost_tpu.ops import image as imops


def rand_image(shape, dtype, seed=0):
    rng = np.random.RandomState(seed)
    if np.issubdtype(np.dtype(dtype), np.integer):
        return rng.randint(0, 256, shape).astype(dtype)
    return rng.rand(*shape).astype(dtype) * 255


def test_gradients_match_scipy():
    img = rand_image((33, 41), np.float32)
    gx, gy = imops.gradients(jnp.asarray(img))
    ogx, ogy = oracle.gradients(img)
    np.testing.assert_allclose(np.asarray(gx), ogx, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy), ogy, rtol=1e-5, atol=1e-3)


def test_triangle_filter_matches_scipy():
    img = rand_image((24, 31), np.float32)
    k = imops.triangle_kernel(5)
    out = imops.separable_filter_reflect(jnp.asarray(img), k)
    ref = oracle.separable_convolve(img, oracle.triangle_kernel(5))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
@pytest.mark.parametrize("shape", [(16, 16), (17, 19)])
def test_avg_pool_2(dtype, shape):
    # uint8 path must reproduce the reference's wraparound addition exactly;
    # the float path may differ by reduce-window summation order (1 ulp)
    img = rand_image(shape, dtype, seed=3)
    out = imops.avg_pool_2(jnp.asarray(img))
    ref = oracle.avg_pool_2(img)
    if dtype == np.uint8:
        np.testing.assert_array_equal(np.asarray(out), ref)
    else:
        np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-7)


def test_avg_pool_2_uint8_wraps():
    img = np.full((2, 2), 200, np.uint8)  # sum 800 wraps to 32 -> 8
    out = np.asarray(imops.avg_pool_2(jnp.asarray(img)))
    assert out[0, 0] == np.uint8((200 * 4) % 256 // 4)


@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
def test_max_pool_2(dtype):
    img = rand_image((21, 18), dtype, seed=4)
    out = imops.max_pool_2(jnp.asarray(img))
    ref = oracle.max_pool_2(img)
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
def test_smooth_3x3_zero_border(dtype):
    img = rand_image((3, 12, 10), dtype, seed=5)  # CHW
    out = np.asarray(imops.smooth_3x3(jnp.asarray(img)))
    ref = oracle.smooth_image_3d(np.transpose(img, (1, 2, 0)))
    ref = np.transpose(ref, (2, 0, 1))
    assert (out[:, 0, :] == 0).all() and (out[:, -1, :] == 0).all()
    assert (out[:, :, 0] == 0).all() and (out[:, :, -1] == 0).all()
    if dtype == np.uint8:
        # truncation boundaries can differ by 1 ulp of the float sum
        assert (np.abs(out.astype(int) - ref.astype(int)) <= 1).all()
    else:
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
@pytest.mark.parametrize("size", [((37, 53), (24, 36)), ((16, 16), (16, 16)),
                                  ((40, 60), (20, 30))])
def test_resize_bilinear(dtype, size):
    (h, w), (nh, nw) = size
    img = rand_image((h, w), dtype, seed=6)
    out = np.asarray(imops.resize_bilinear(jnp.asarray(img), nh, nw))
    ref = oracle.resize_bilinear(img, nh, nw)
    if dtype == np.uint8:
        assert (np.abs(out.astype(int) - ref.astype(int)) <= 1).all()
        # trunc-rounding edge cases must be rare
        assert (out != ref).mean() < 0.02
    else:
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-3)
