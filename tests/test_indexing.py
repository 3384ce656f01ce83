"""Golden tests for the pure data-layer index math.

The expected values are computed from the reference's documented semantics
(pretraining/generative/homeview.py:92-193); several are hand-derived
worked examples so a regression is unambiguous.
"""

import random

import pytest

from bvc_tpu.data import (
    AGE_GROUPS,
    get_fold,
    get_fpath2framelist,
    get_fpathlist,
    get_fpathseqlist,
    get_group,
    get_train_val_split,
)


class TestGroups:
    def test_group_sizes(self):
        assert len(AGE_GROUPS["g0"]) == 10
        assert len(AGE_GROUPS["g1"]) == 10
        assert len(AGE_GROUPS["g2"]) == 9
        assert len(AGE_GROUPS["g3"]) == 9

    def test_named_groups_stable(self):
        assert get_group("g0")[:2] == ["008MS", "009SS"]
        assert get_group("g3") == list(AGE_GROUPS["g3"])
        assert get_group("nope") is None

    def test_gr_samples_three_per_group(self):
        rng = random.Random(0)
        gr = get_group("gr", rng)
        assert len(gr) == 12
        for key in AGE_GROUPS:
            assert sum(s in AGE_GROUPS[key] for s in gr) == 3

    def test_gr_deterministic_under_seed(self):
        assert get_group("gr", random.Random(7)) == get_group("gr", random.Random(7))


class TestFold:
    def test_round_robin_segments(self):
        # 10 items, segment_size 2 → segments [0,1],[2,3],[4,5],[6,7],[8,9]
        # fold0 gets segments 0 and 3 → items 0,1,6,7
        items = list(range(10))
        assert get_fold(items, 0, 3, segment_size=2) == [0, 1, 6, 7]
        assert get_fold(items, 1, 3, segment_size=2) == [2, 3, 8, 9]
        assert get_fold(items, 2, 3, segment_size=2) == [4, 5]

    def test_folds_partition_corpus(self):
        items = list(range(1000))
        folds = [get_fold(items, f, 3, segment_size=7) for f in range(3)]
        assert sorted(sum(folds, [])) == items

    def test_default_segment_size_formula(self):
        # int(30*60*30/ds_rate) frames (homeview.py:158)
        items = list(range(200000))
        out = get_fold(items, 0, 3, ds_rate=1)
        # first segment is items[0:54000]
        assert out[:54000] == items[:54000]
        assert out[54000] == 162000  # second kept segment starts at 3*54000


class TestTrainValSplit:
    def test_middle_slice_is_val(self):
        items = list(range(100))
        train, val = get_train_val_split(items, val_ratio=0.1)
        assert val == list(range(45, 55))
        assert train == list(range(45)) + list(range(55, 100))

    def test_empty_val(self):
        items = list(range(10))
        train, val = get_train_val_split(items, val_ratio=0.0)
        assert train == items and val == []

    def test_odd_sizes_match_reference_int_math(self):
        # n=101, ratio .1 → val_size 10, split1 = int(91/2)=45, split2=int(111/2)=55
        items = list(range(101))
        train, val = get_train_val_split(items, 0.1)
        assert val == list(range(45, 55))
        assert len(train) == 91


class TestSeqList:
    def test_default_stride_no_overlap(self):
        items = list(range(32))
        seqs = get_fpathseqlist(items, seq_len=8)
        assert len(seqs) == 4
        assert seqs[0] == list(range(8))
        assert seqs[-1] == list(range(24, 32))

    def test_oversampling_overlaps(self):
        # 100 frames, 10 samples of len 16 → stride 10: windows overlap.
        items = list(range(100))
        seqs = get_fpathseqlist(items, seq_len=16, n_samples=10)
        assert len(seqs) == 10
        assert seqs[0] == list(range(16))
        assert seqs[1] == list(range(10, 26))
        # final windows are clamped to fit (the reference's slicing would
        # produce a short ragged clip here and crash its collate)
        assert seqs[-1] == list(range(84, 100))
        assert all(len(s) == 16 for s in seqs)

    def test_ds_rate_subsamples_within_window(self):
        items = list(range(64))
        seqs = get_fpathseqlist(items, seq_len=4, ds_rate=2)
        assert seqs[0] == [0, 2, 4, 6]
        assert seqs[1] == [8, 10, 12, 14]

    def test_requires_more_frames_than_samples(self):
        with pytest.raises(ValueError):
            get_fpathseqlist(list(range(10)), seq_len=2, n_samples=10)


class TestPairList:
    def test_pairs_at_interval(self):
        items = list(range(50))
        pairs = get_fpath2framelist(items, interval=10, n_samples=5)
        # stride = int((50-10-1)/5) = 7
        assert pairs == [[0, 10], [7, 17], [14, 24], [21, 31], [28, 38]]

    def test_default_covers_all_anchors(self):
        items = list(range(20))
        pairs = get_fpath2framelist(items, interval=3)
        assert len(pairs) == 16
        assert pairs[0] == [0, 3] and pairs[-1] == [15, 18]


class TestFpathlist:
    def test_sorted_filtered_strided(self, frame_corpus):
        fps = get_fpathlist(frame_corpus, "008MS", ds_rate=1)
        assert len(fps) == 60
        assert fps == sorted(fps)
        assert all(fp.endswith(".jpg") for fp in fps)
        fps3 = get_fpathlist(frame_corpus, "008MS", ds_rate=3)
        assert len(fps3) == 20
        assert fps3 == fps[::3]
