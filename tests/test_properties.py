"""Property-based tests (hypothesis) for the pure index/mask math.

These are the invariants SURVEY.md §4 calls out as the natural test
surface for code the reference never tested: fold partitioning, split
complementarity, clip geometry, mask counts.
"""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from bvc_tpu.data.indexing import (  # noqa: E402
    get_fold,
    get_fpath2framelist,
    get_fpathseqlist,
    get_train_val_split,
)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(3, 500),
    seg=st.integers(1, 60),
    folds=st.integers(2, 5),
)
def test_folds_partition_and_preserve_order(n, seg, folds):
    items = list(range(n))
    parts = [get_fold(items, f, folds, segment_size=seg) for f in range(folds)]
    merged = sorted(x for p in parts for x in p)
    assert merged == items  # disjoint cover
    for p in parts:  # order preserved within a fold
        assert p == sorted(p)


@settings(max_examples=50, deadline=None)
@given(n=st.integers(2, 400), ratio=st.floats(0.0, 0.5))
def test_train_val_split_complementary_and_contiguous(n, ratio):
    items = list(range(n))
    train, val = get_train_val_split(items, ratio)
    assert sorted(train + val) == items
    assert val == sorted(val)
    if val:
        # val is one contiguous middle run
        assert val[-1] - val[0] + 1 == len(val)
    assert len(val) == int(n * ratio)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(20, 500),
    seq_len=st.integers(1, 8),
    data=st.data(),
)
def test_fpathseqlist_full_length_windows(n, seq_len, data):
    ds_rate = data.draw(st.integers(1, 3))
    if seq_len * ds_rate > n:
        with pytest.raises(ValueError):
            get_fpathseqlist(list(range(n)), seq_len, ds_rate, 1)
        return
    max_samples = max(1, n // (seq_len * ds_rate) - 1)
    n_samples = data.draw(st.integers(1, min(max_samples, n - 1)))
    items = list(range(n))
    seqs = get_fpathseqlist(items, seq_len, ds_rate, n_samples)
    assert len(seqs) == n_samples
    for s in seqs:
        assert len(s) == seq_len  # clamped, never ragged
        assert all(b - a == ds_rate for a, b in zip(s, s[1:]))  # stride
        assert 0 <= s[0] and s[-1] < n


@settings(max_examples=50, deadline=None)
@given(n=st.integers(10, 400), data=st.data())
def test_fpath2framelist_interval_is_exact(n, data):
    interval = data.draw(st.integers(1, n - 2))
    max_samples = max(1, n - interval - 1)
    n_samples = data.draw(st.integers(1, min(max_samples, n)))
    items = list(range(n))
    pairs = get_fpath2framelist(items, interval, n_samples)
    for a, b in pairs:
        assert b - a == interval
        assert 0 <= a and b < n


@settings(max_examples=20, deadline=None)
@given(
    hw=st.integers(2, 8),
    t=st.integers(1, 4),
    ratio=st.floats(0.1, 0.95),
    seed=st.integers(0, 100),
)
def test_tube_mask_invariants(hw, t, ratio, seed):
    import jax

    from bvc_tpu.masks.tube import tube_mask

    mask = np.asarray(tube_mask(jax.random.PRNGKey(seed), 2, (t, hw, hw), ratio))
    n_space = hw * hw
    per_frame = mask.reshape(2, t, n_space)
    assert (per_frame.sum(-1) == int(ratio * n_space)).all()
    assert (per_frame == per_frame[:, :1]).all()  # tube tiling


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 50), batch=st.integers(1, 4))
def test_multiblock_collator_invariants(seed, batch):
    from bvc_tpu.masks.multiblock import MultiBlockMaskCollator

    c = MultiBlockMaskCollator(
        input_size=64, patch_size=8, enc_mask_scale=(0.85, 1.0),
        pred_mask_scale=(0.15, 0.2), npred=3, min_keep=4, seed=seed,
    )
    enc, pred = c(batch, step=seed)
    # equal valid lengths across the batch (batch-min truncation)
    for arr in (enc, pred):
        lens = {int((arr[m, b] >= 0).sum())
                for m in range(arr.shape[0]) for b in range(arr.shape[1])}
        assert len(lens) == 1
        assert lens.pop() > 0
    # valid indices in range, strictly increasing (block row-major order)
    for m in range(pred.shape[0]):
        for b in range(batch):
            v = pred[m, b][pred[m, b] >= 0]
            assert (np.diff(v) > 0).all()
            assert v.min() >= 0 and v.max() < 64
    # no enc/pred overlap (allow_overlap=False)
    for b in range(batch):
        pv = set(pred[:, b][pred[:, b] >= 0].tolist())
        ev = set(enc[0, b][enc[0, b] >= 0].tolist())
        assert not (pv & ev)
