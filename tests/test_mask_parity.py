"""Statistical parity of the multi-block mask distribution vs the
reference torch ``MaskCollator`` (``pretraining/predictive/mask.py:69-219``).

The repo's ``MultiBlockMaskCollator`` reimplements the sampler with a
numpy Generator and static caps; invariant tests (test_jepa.py) check
structure, but RNG-semantics drift (e.g. a misread of the single-u
scale+AR draw or the 20-try rejection loop) would only show up in the
*distribution* of block sizes / valid lengths.  Here both collators run
hundreds of independent steps and the per-step valid-length and
block-size distributions are compared with two-sample KS tests.

Skipped when the reference tree isn't present (the test imports the
reference module by file path; no reference code is vendored).
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

from bvc_tpu.masks.multiblock import MultiBlockMaskCollator

REF_MASK = Path("/root/reference/pretraining/predictive/mask.py")

pytestmark = [
    pytest.mark.parity,
    pytest.mark.skipif(not REF_MASK.exists(),
                       reason="reference tree not available"),
]


@pytest.fixture(scope="module")
def ref_collator_cls():
    spec = importlib.util.spec_from_file_location("_ref_mask", REF_MASK)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_mask"] = mod
    spec.loader.exec_module(mod)
    return mod.MaskCollator


# JEPA preset at the reference's 224/16 grid (slurmscripts predictive env)
PARAMS = dict(
    input_size=224, patch_size=16,
    enc_mask_scale=(0.85, 1.0), pred_mask_scale=(0.15, 0.2),
    aspect_ratio=(0.75, 1.5), nenc=1, npred=4, min_keep=10,
    allow_overlap=False,
)
N_STEPS = 300
BATCH = 8


def _ref_lengths(ref_cls):
    import torch

    c = ref_cls(**PARAMS)
    dummy = [torch.zeros(1) for _ in range(BATCH)]
    enc_L, pred_L = [], []
    for _ in range(N_STEPS):
        _, masks_enc, masks_pred = c(dummy)
        enc_L.append(masks_enc[0].shape[-1])
        pred_L.append(masks_pred[0].shape[-1])
    return np.array(enc_L), np.array(pred_L)


def _our_lengths():
    c = MultiBlockMaskCollator(seed=0, **PARAMS)
    enc_L, pred_L = [], []
    for s in range(N_STEPS):
        enc, pred = c(BATCH, step=s)
        enc_L.append(int((enc[0, 0] >= 0).sum()))
        pred_L.append(int((pred[0, 0] >= 0).sum()))
    return np.array(enc_L), np.array(pred_L)


class TestMaskDistributionParity:
    def test_valid_length_distributions_match(self, ref_collator_cls):
        from scipy.stats import ks_2samp

        ref_enc, ref_pred = _ref_lengths(ref_collator_cls)
        our_enc, our_pred = _our_lengths()
        # per-step batch-min truncated lengths: the quantity the model
        # actually consumes
        ks_e = ks_2samp(ref_enc, our_enc)
        ks_p = ks_2samp(ref_pred, our_pred)
        assert ks_e.pvalue > 0.01, (
            f"enc length dist drift: KS p={ks_e.pvalue:.4f} "
            f"ref mean={ref_enc.mean():.1f} ours={our_enc.mean():.1f}"
        )
        assert ks_p.pvalue > 0.01, (
            f"pred length dist drift: KS p={ks_p.pvalue:.4f} "
            f"ref mean={ref_pred.mean():.1f} ours={our_pred.mean():.1f}"
        )

    def test_block_size_histograms_match(self, ref_collator_cls):
        """The per-step (h, w) block-size draw is a deterministic map of
        one uniform u (reference ``_sample_block_size``): compare the
        joint histogram over independent seeds with a chi-square test."""
        import torch
        from scipy.stats import chisquare

        ref_c = ref_collator_cls(**PARAMS)
        ref_sizes = []
        for s in range(2000):
            g = torch.Generator()
            g.manual_seed(s)
            ref_sizes.append(ref_c._sample_block_size(
                g, PARAMS["pred_mask_scale"], PARAMS["aspect_ratio"]))
        from bvc_tpu.masks.multiblock import _block_size_from_u

        rng = np.random.default_rng(123)
        our_sizes = [
            _block_size_from_u(rng.random(), 14, 14,
                               PARAMS["pred_mask_scale"], PARAMS["aspect_ratio"])
            for _ in range(2000)
        ]
        cats = sorted(set(ref_sizes) | set(our_sizes))
        ref_h = np.array([ref_sizes.count(c) for c in cats], dtype=np.float64)
        our_h = np.array([our_sizes.count(c) for c in cats], dtype=np.float64)
        # drop near-empty bins for chi-square validity
        keep = ref_h >= 5
        assert keep.sum() >= 3
        ref_k, our_k = ref_h[keep], our_h[keep]
        stat = chisquare(our_k, ref_k * our_k.sum() / ref_k.sum())
        assert stat.pvalue > 0.01, (
            f"block-size dist drift: chi2 p={stat.pvalue:.4f}\n"
            f"cats={np.array(cats)[keep]}\nref={ref_k}\nours={our_k}"
        )

    def test_no_overlap_invariant_matches_reference(self, ref_collator_cls):
        """allow_overlap=False: enc tokens never intersect pred tokens in
        either implementation."""
        import torch

        c = ref_collator_cls(**PARAMS)
        dummy = [torch.zeros(1) for _ in range(4)]
        for _ in range(5):
            _, masks_enc, masks_pred = c(dummy)
            enc = masks_enc[0].numpy()
            pred = np.stack([m.numpy() for m in masks_pred])
            for b in range(4):
                e = set(enc[b].tolist())
                p = set(pred[:, b].reshape(-1).tolist())
                assert not (e & p)
        ours = MultiBlockMaskCollator(seed=0, **PARAMS)
        for s in range(5):
            enc, pred = ours(4, step=s)
            for b in range(4):
                e = set(enc[0, b][enc[0, b] >= 0].tolist())
                p = set(pred[:, b][pred[:, b] >= 0].reshape(-1).tolist())
                assert not (e & p)
