"""Packed-corpus ingestion (bvc_tpu/data/packed.py, VERDICT r4 task 3).

The packed path must be a pure IO substitution: a dataset reading
memmap rows must produce byte-identical samples to the decode path it
replaces, fall back to decoding when the pack does not cover a frame or
the transform needs full-resolution sources, and compose with the
factory/loader plumbing via ``DataConfig.pack_root``.
"""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from bvc_tpu.data.datasets import ClipDataset, PairDataset
from bvc_tpu.data.packed import PackedCorpus, pack_corpus, pack_subject
from bvc_tpu.data.transforms import FrameTransform

S = 32  # packed image size for these tests


@pytest.fixture(scope="module")
def jpg_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("packsrc")
    rng = np.random.default_rng(0)
    for subj in ("008MS", "009SS"):
        d = root / subj
        d.mkdir()
        for i in range(24):
            # smooth (natural-image-like) content: low-freq noise
            # upsampled — pure noise would exaggerate resampler
            # differences the decode-contract tolerances assume away
            low = rng.integers(0, 255, (6, 8, 3), dtype=np.uint8)
            img = np.asarray(Image.fromarray(low).resize(
                (64, 48), Image.BILINEAR))
            Image.fromarray(img).save(d / f"{i:05d}.jpg", quality=92)
    return str(root)


@pytest.fixture(scope="module")
def packed_root(jpg_corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("packout")
    counts = pack_corpus(jpg_corpus, str(out), image_size=S)
    assert counts == {"008MS": 24, "009SS": 24}
    return str(out)


class TestPackFormat:
    def test_shard_and_index_layout(self, packed_root):
        d = Path(packed_root) / "008MS"
        meta = json.loads((d / f"frames_{S}.json").read_text())
        assert meta["image_size"] == S and meta["dct_scale"] is True
        assert meta["names"] == [f"{i:05d}.jpg" for i in range(24)]
        shard = np.memmap(d / f"frames_{S}.u8", dtype=np.uint8, mode="r",
                          shape=(24, S, S, 3))
        assert int(shard.max()) > 0

    def test_pack_is_idempotent(self, jpg_corpus, packed_root):
        d = Path(packed_root) / "008MS" / f"frames_{S}.u8"
        mtime = d.stat().st_mtime_ns
        assert pack_subject(jpg_corpus, "008MS", packed_root, S) == 24
        assert d.stat().st_mtime_ns == mtime  # untouched re-pack

    def test_rows_match_plain_decode(self, jpg_corpus, packed_root):
        from bvc_tpu.data.packed import _plain_decode

        fp = str(Path(jpg_corpus) / "009SS" / "00003.jpg")
        want = _plain_decode([fp], S, dct_scale=True)[0]
        got = PackedCorpus(packed_root, S).get(fp)
        np.testing.assert_array_equal(got, want)


class TestReaderFallbacks:
    def test_unpacked_subject_returns_none(self, packed_root):
        r = PackedCorpus(packed_root, S)
        assert r.get("/x/zzz/00000.jpg") is None

    def test_unknown_frame_returns_none(self, jpg_corpus, packed_root):
        r = PackedCorpus(packed_root, S)
        assert r.get(str(Path(jpg_corpus) / "008MS" / "99999.jpg")) is None

    def test_size_mismatch_is_a_miss(self, jpg_corpus, packed_root):
        r = PackedCorpus(packed_root, image_size=64)
        assert r.get(str(Path(jpg_corpus) / "008MS" / "00000.jpg")) is None

    def test_dct_scale_mismatch_is_a_miss(self, jpg_corpus, packed_root):
        r = PackedCorpus(packed_root, S, dct_scale=False)
        assert r.get(str(Path(jpg_corpus) / "008MS" / "00000.jpg")) is None

    def test_mixed_seq_falls_back_wholesale(self, jpg_corpus, packed_root):
        r = PackedCorpus(packed_root, S)
        good = str(Path(jpg_corpus) / "008MS" / "00001.jpg")
        assert r.get_seq([good, "/x/zzz/0.jpg"]) is None


class TestDatasetParity:
    def _seqs(self, jpg_corpus, subj="008MS", t=4, n=3):
        base = Path(jpg_corpus) / subj
        return [[str(base / f"{i + j:05d}.jpg") for j in range(t)]
                for i in range(n)]

    def test_clip_dataset_uint8_bit_identical_with_reader(
            self, jpg_corpus, packed_root):
        """The hot path (feed_uint8=True): packed rows come from the
        same ``_plain_decode`` the sequence loader runs -> bitwise."""
        tfm = FrameTransform(image_size=S, output_uint8=True)
        seqs = self._seqs(jpg_corpus)
        plain = ClipDataset(seqs, tfm)
        packed = ClipDataset(seqs, tfm)
        packed.reader = PackedCorpus(packed_root, S)
        for i in range(len(seqs)):
            a = plain[(i, np.random.default_rng(0))]
            b = packed[(i, np.random.default_rng(0))]
            assert a.dtype == b.dtype and a.shape == b.shape
            np.testing.assert_array_equal(a, b)

    def test_clip_dataset_float_matches_within_decode_contract(
            self, jpg_corpus, packed_root):
        """Float path: packed returns normalize(u8) while the native
        C path normalizes without the u8 round-trip -- same tolerance
        contract as native vs python (tests/test_native.py: mean<0.02
        normalized units)."""
        tfm = FrameTransform(image_size=S, output_uint8=False)
        seqs = self._seqs(jpg_corpus)
        plain = ClipDataset(seqs, tfm)
        packed = ClipDataset(seqs, tfm)
        packed.reader = PackedCorpus(packed_root, S)
        a = plain[(0, np.random.default_rng(0))]
        b = packed[(0, np.random.default_rng(0))]
        assert a.dtype == b.dtype == np.float32
        assert np.abs(a - b).mean() < 0.02

    def test_pair_dataset_identical_with_reader(self, jpg_corpus,
                                                packed_root):
        tfm = FrameTransform(image_size=S, output_uint8=True)
        base = Path(jpg_corpus) / "009SS"
        pairs = [[str(base / "00000.jpg"), str(base / "00005.jpg")]]
        plain = PairDataset(pairs, tfm)
        packed = PairDataset(pairs, tfm)
        packed.reader = PackedCorpus(packed_root, S)
        # single-frame loads take the python decode when unpacked, the
        # shared _plain_decode rows when packed -- the same tolerance
        # contract as the native-vs-python decoders (tests/test_native.py)
        a = plain[(0, np.random.default_rng(0))].astype(np.float32) / 255.0
        b = packed[(0, np.random.default_rng(0))].astype(np.float32) / 255.0
        assert np.abs(a - b).mean() < 0.02

    def test_augmented_transform_bypasses_reader(self, jpg_corpus,
                                                 packed_root):
        """'c' needs the full-res source; the reader must not be used
        (packed rows are already cropped)."""
        tfm = FrameTransform(image_size=S, augs="c", crop_size=S,
                             output_uint8=True)
        seqs = self._seqs(jpg_corpus, n=1)
        ds = ClipDataset(seqs, tfm)
        ds.reader = PackedCorpus(packed_root, S)
        assert not ds._packed_ok()
        # and the sample still loads (decode path)
        out = ds[(0, np.random.default_rng(0))]
        assert out.shape == (4, S, S, 3)


class TestFactoryIntegration:
    def test_pack_root_attaches_reader_and_keeps_samples_equal(
            self, jpg_corpus, packed_root):
        from bvc_tpu.data.factory import make_dataset
        from bvc_tpu.utils.config import DataConfig

        kw = dict(jpg_root=jpg_corpus, train_group="g0", num_frames=4,
                  n_trainsamples=4, segment_minutes=0.005,
                  image_size=S, seed=0)
        plain = make_dataset("videomae", DataConfig(**kw))["train"]
        packed = make_dataset(
            "videomae", DataConfig(**kw, pack_root=packed_root))["train"]
        assert packed.reader is not None and plain.reader is None
        for i in range(len(packed)):
            np.testing.assert_array_equal(
                plain[(i, np.random.default_rng(0))],
                packed[(i, np.random.default_rng(0))])


class TestPackCli:
    def test_cli_packs_group_subset(self, jpg_corpus, tmp_path):
        from bvc_tpu.cli.pack_corpus import main

        out = tmp_path / "packed"
        main(["-jpg_root", jpg_corpus, "-pack_root", str(out),
              "--image_size", str(S), "--group", "g0"])
        # both fixture subjects are g0 members
        assert (out / "008MS" / f"frames_{S}.u8").exists()
        assert (out / "009SS" / f"frames_{S}.json").exists()
        r = PackedCorpus(str(out), S)
        got = r.get(str(Path(jpg_corpus) / "008MS" / "00000.jpg"))
        assert got is not None and got.shape == (S, S, 3)

    def test_cli_rejects_unknown_group(self, jpg_corpus, tmp_path):
        from bvc_tpu.cli.pack_corpus import main

        with pytest.raises(SystemExit):
            main(["-jpg_root", jpg_corpus, "-pack_root", str(tmp_path),
                  "--group", "zz"])
