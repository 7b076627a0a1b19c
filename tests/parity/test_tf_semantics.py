"""Bit-compatibility parity vs TF (SURVEY.md §7 'Bit-compatibility vs TF1'):
resize half-pixel rules, SAME-padding conv/pool asymmetry. TF 2.21 (CPU)
generates the goldens."""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from dan_tpu.models.layers import conv2d, max_pool
from dan_tpu.ops.preprocess import CropParams, crop_and_resize, resize_image


class TestResizeParity:
    @pytest.mark.parametrize("src,dst", [(31, 64), (64, 31), (100, 640), (640, 100)])
    def test_full_image_resize_matches_tf(self, rng, src, dst):
        img = rng.uniform(0, 255, (src, src, 3)).astype(np.float32)
        want = tf.image.resize(
            img, (dst, dst), method="bilinear", antialias=False
        ).numpy()
        got = np.asarray(resize_image(jnp.asarray(img), dst, dst))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)

    @pytest.mark.parametrize("src_h,src_w,out", [(100, 77, 640), (480, 640, 128), (31, 31, 64)])
    def test_squash_resample_matches_tf(self, rng, src_h, src_w, out):
        """The eval squash path (matmul resample of a canvas sub-region)
        must bit-match tf.image.resize of the bare region, including the
        edge-clamp rows/cols."""
        import jax.numpy as jnp

        from dan_tpu.ops.squash import squash_resize

        img = rng.uniform(0, 255, (src_h, src_w, 3)).astype(np.float32)
        c = max(src_h, src_w) + 37  # asymmetric canvas padding
        canvas = np.zeros((c, c, 3), np.float32)
        canvas[:src_h, :src_w] = img
        got = np.asarray(
            squash_resize(
                jnp.asarray(canvas),
                jnp.float32(src_h),
                jnp.float32(src_w),
                out,
                out,
            )
        )
        want = tf.image.resize(img, (out, out), "bilinear", antialias=False).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-2)

    def test_tf1_legacy_resize_semantics(self, rng):
        """resize_semantics='tf1_legacy' must reproduce TF1's
        resize_images default (align_corners=False, half_pixel_centers=
        False: src = dst*scale) — the rule a stock-TF1 reference would
        have trained under [?]."""
        from dan_tpu.ops.squash import squash_resize

        for src_h, src_w, out in [(48, 64, 96), (100, 80, 40), (33, 57, 64)]:
            img = rng.uniform(0, 255, (src_h, src_w, 3)).astype(np.float32)
            got = np.asarray(
                squash_resize(
                    jnp.asarray(img),
                    jnp.float32(src_h),
                    jnp.float32(src_w),
                    out,
                    out,
                    semantics="tf1_legacy",
                )
            )
            want = (
                tf.compat.v1.image.resize_images(
                    img[None], (out, out), align_corners=False
                )
                .numpy()[0]
            )
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-2)

    def test_crop_resize_identity_region(self, rng):
        # crop window == whole image -> plain resize.
        img = rng.uniform(0, 255, (48, 48, 3)).astype(np.float32)
        crop = CropParams(jnp.float32(0), jnp.float32(0), jnp.float32(48))
        got = np.asarray(crop_and_resize(jnp.asarray(img), crop, 96))
        want = tf.image.resize(img, (96, 96), "bilinear", antialias=False).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


class TestConvParity:
    @pytest.mark.parametrize("size,stride,dilation", [(17, 1, 1), (17, 2, 1), (20, 2, 1), (16, 1, 6)])
    def test_same_padding_conv(self, rng, size, stride, dilation):
        """'SAME' asymmetric padding on stride-2 / dilated convs — the
        classic TF1-parity trap (conv6_2/conv7_2 and dilated fc6)."""
        x = rng.normal(size=(1, size, size, 8)).astype(np.float32)
        k = rng.normal(size=(3, 3, 8, 4)).astype(np.float32)
        want = tf.nn.conv2d(
            x, k, strides=stride, padding="SAME", dilations=dilation
        ).numpy()
        params = {"kernel": jnp.asarray(k), "bias": jnp.zeros((4,))}
        got = np.asarray(
            conv2d(params, jnp.asarray(x), stride=stride, dilation=dilation, activation=False)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("size", [16, 17])
    def test_same_max_pool(self, rng, size):
        x = rng.normal(size=(1, size, size, 8)).astype(np.float32)
        want = tf.nn.max_pool2d(x, ksize=2, strides=2, padding="SAME").numpy()
        got = np.asarray(max_pool(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
