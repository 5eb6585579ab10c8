"""Native C++ image-op tests: PIL parity and pipeline integration."""

import numpy as np
import pytest
from PIL import Image

from multimodal_content_moderation_tpu.data import native
from multimodal_content_moderation_tpu.data.images import ImagePreprocessor

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _rand_img(seed, h, w):
    g = np.random.default_rng(seed)
    return g.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestResizeParity:
    @pytest.mark.parametrize(
        "in_shape,out_shape",
        [
            ((300, 470), (224, 351)),  # downscale
            ((100, 80), (224, 179)),   # upscale
            ((224, 224), (112, 112)),  # exact halving
            ((37, 53), (64, 96)),      # ragged
        ],
    )
    def test_matches_pil_bilinear(self, in_shape, out_shape):
        src = _rand_img(0, *in_shape)
        oh, ow = out_shape
        ref = np.asarray(
            Image.fromarray(src).resize((ow, oh), Image.BILINEAR), np.uint8
        )
        got = native.resize_bilinear(src, oh, ow)
        diff = np.abs(ref.astype(int) - got.astype(int))
        # float vs PIL's fixed-point coefficients: within 1 level nearly
        # everywhere, never more than 2
        assert diff.max() <= 2, diff.max()
        assert (diff > 1).mean() < 0.01
        assert diff.mean() < 0.3

    def test_center_crop_path_matches_python(self):
        src = _rand_img(1, 300, 470)
        got = native.resize_center_crop(src, 224)

        from multimodal_content_moderation_tpu.data.images import (
            center_crop,
            resize_shortest_edge,
        )

        ref_im = resize_shortest_edge(Image.fromarray(src), 224)
        ref = center_crop(np.asarray(ref_im, np.uint8), 224, 224)
        assert got.shape == ref.shape == (224, 224, 3)
        diff = np.abs(ref.astype(int) - got.astype(int))
        assert diff.max() <= 2
        assert diff.mean() < 0.3

    def test_small_image_zero_padded(self):
        # 20x30 -> shortest edge 64 => 64x96 resized, crop 64x64: no padding
        # needed; also probe a genuinely-smaller crop via direct resize
        src = _rand_img(2, 20, 30)
        out = native.resize_center_crop(src, 64)
        assert out.shape == (64, 64, 3)


class TestPreprocessorIntegration:
    def test_native_backend_close_to_pil(self, tmp_path):
        src = _rand_img(3, 250, 320)
        p = tmp_path / "x.png"
        Image.fromarray(src).save(p)
        a, _ = ImagePreprocessor(64, 64, backend="pil").load(str(p))
        b, _ = ImagePreprocessor(64, 64, backend="native").load(str(p))
        # normalized float space: |u8 diff of 2| / 255 / std(~0.26) ~ 0.03
        assert np.abs(a - b).max() < 0.05
        assert np.abs(a - b).mean() < 0.005

    def test_native_backend_uint8_output(self, tmp_path):
        src = _rand_img(4, 100, 100)
        p = tmp_path / "y.png"
        Image.fromarray(src).save(p)
        arr, present = ImagePreprocessor(
            32, 32, output="uint8_hwc", backend="native"
        ).load(str(p))
        assert arr.shape == (32, 32, 3) and arr.dtype == np.uint8 and present == 1.0
