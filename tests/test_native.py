"""Native decode core: parity with the Python path, errors, integration."""

import numpy as np
import pytest

from bvc_tpu import native
from bvc_tpu.data.datasets import ClipDataset
from bvc_tpu.data.indexing import get_fpathlist
from bvc_tpu.data.transforms import (
    FrameTransform,
    center_crop,
    decode_jpeg,
    normalize,
    resize_shorter,
)

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


class TestNativeDecode:
    def test_matches_python_path(self, frame_corpus):
        fps = get_fpathlist(frame_corpus, "008MS")[:8]
        out = native.decode_frames(fps, 16, dct_scale=False)
        py = np.stack(
            [normalize(center_crop(resize_shorter(decode_jpeg(p), 16), 16)) for p in fps]
        )
        assert out.shape == (8, 16, 16, 3)
        assert np.abs(out - py).mean() < 0.02

    def test_bad_path_raises_with_name(self):
        with pytest.raises(IOError, match="nope.jpg"):
            native.decode_frames(["/nope.jpg"], 16)

    def test_clip_dataset_uses_native_for_plain_transform(self, frame_corpus):
        fps = get_fpathlist(frame_corpus, "008MS")
        plain = ClipDataset(
            [fps[:4]], FrameTransform(image_size=16, dct_scale=False)
        )
        aug = ClipDataset([fps[:4]], FrameTransform(image_size=16, augs="c", crop_size=16))
        rng = np.random.default_rng(0)
        a = plain[(0, rng)]
        assert a.shape == (4, 16, 16, 3)
        # python per-frame path for the same clip matches closely
        py = np.stack([plain.transform(decode_jpeg(p), rng) for p in fps[:4]])
        assert np.abs(a - py).mean() < 0.02
        assert aug[(0, np.random.default_rng(0))].shape == (4, 16, 16, 3)

    def test_single_thread_matches_multi(self, frame_corpus):
        fps = get_fpathlist(frame_corpus, "008MS")[:6]
        a = native.decode_frames(fps, 16, n_threads=1)
        b = native.decode_frames(fps, 16, n_threads=4)
        np.testing.assert_array_equal(a, b)

    def test_dct_scaled_decode_close_on_smooth_images(self, tmp_path):
        import cv2
        from PIL import Image

        rng = np.random.default_rng(0)
        paths = []
        for i in range(4):
            arr = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
            arr = cv2.GaussianBlur(arr, (15, 15), 5)
            p = str(tmp_path / f"{i}.jpg")
            Image.fromarray(arr).save(p, quality=92)
            paths.append(p)
        fast = native.decode_frames(paths, 16, uint8=True, dct_scale=True)
        exact = native.decode_frames(paths, 16, uint8=True, dct_scale=False)
        diff = np.abs(fast.astype(np.float32) - exact.astype(np.float32)).mean()
        assert diff < 4.0  # /255 units; DCT low-pass vs aliased resize
