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
        out = native.decode_frames(fps, 16)
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
        plain = ClipDataset([fps[:4]], FrameTransform(image_size=16))
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
