"""Benchmark dataset readers: SSv2 (frame folders), Toybox (mp4), UCF101
(avi + split lists), CIFAR-10 (pickled batches).

Re-implements ``benchmarks/dsdatasets.py`` sampling policies without
torch/torchvision: every reader yields ``(clip [T, H, W, 3] float32
normalized, fname)`` and returns ``(None, None)`` for undecodable videos
(the reference's warn-and-skip behavior, ``dsdatasets.py:159-162``),
which the loader-side ``drop_none_collate`` filters like ``my_collate``
(``compute_embeddings_jepa.py:42-44``).
"""

from __future__ import annotations

import os
import pickle
import warnings
from pathlib import Path

import numpy as np

from bvc_tpu.data.transforms import center_crop, normalize, resize_shorter

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def _transform_frames(frames: list[np.ndarray], image_size: int = 224) -> np.ndarray:
    """Resize→CenterCrop→normalize each frame (``dsdatasets._get_transform``)."""
    out = [normalize(center_crop(resize_shorter(f, image_size), image_size)) for f in frames]
    return np.stack(out)


def _read_image(path: str) -> np.ndarray:
    from bvc_tpu.data.transforms import decode_jpeg

    return decode_jpeg(path)


class SSv2Dataset:
    """Something-Something-v2 as frame folders: ``root/{train,val}/<id>/<n>.jpg``.

    Frame selection (``dsdatasets.py:50-105``): native fps 12, stride
    ``round(12/frame_rate)``, start at 1/4 of the clip; fall back to the
    beginning, then to denser sampling, then pad by repeating the last
    frame.
    """

    def __init__(self, root_dir: str, frame_rate: int = 12, sample_len: int = 16,
                 train: bool = True, image_size: int = 224,
                 use_native: bool = True, dct_scale: bool = True):
        self.root_dir = os.path.join(root_dir, "train/" if train else "val/")
        self.sample_len = sample_len
        self.image_size = image_size
        self.ds_rate = max(1, round(12 / frame_rate))
        self.samples = sorted(os.listdir(self.root_dir), key=int)
        # use_native=False (or dct_scale=False) pins the decode to one
        # resampling everywhere: the DCT-scaled native decode is a
        # slightly different resample than decode-then-resize, so runs
        # comparing embeddings across hosts with/without the built core
        # should disable it (native/__init__.py docstring)
        self.use_native = use_native
        self.dct_scale = dct_scale
        self._warned_fallback = False

    def __len__(self):
        return len(self.samples)

    def _frame_names(self, sample_dir: str) -> list[str]:
        names = sorted(
            os.listdir(os.path.join(self.root_dir, sample_dir)),
            key=lambda x: int(x.split(".")[0]),
        )
        n, step, slen = len(names), self.ds_rate, self.sample_len
        loc = n // 4
        if n // step < slen:
            while len(names) // step < slen:
                names.append(names[-1])
            return names[::step][:slen]
        if (n - loc) // step < slen:
            return names[::step][:slen]
        return names[loc : loc + slen * step : step][:slen]

    def __getitem__(self, index: int):
        sample = self.samples[index]
        names = self._frame_names(sample)
        paths = [str(Path(self.root_dir, sample, fn)) for fn in names]
        # fused native decode (libjpeg + resize/crop/normalize) when
        # built: the SSv2 sweep is host-decode-bound (16 JPEGs/clip,
        # PERFORMANCE.md host sizing).  n_threads=1 — extraction already
        # fans samples out over its own pool; nested threads thrash
        from bvc_tpu import native

        if self.use_native and native.available():
            try:
                return native.decode_frames(
                    paths, self.image_size, n_threads=1,
                    dct_scale=self.dct_scale,
                ), sample
            except IOError:
                # fall through to the per-frame path for the error —
                # loudly, since the fallback resamples differently and a
                # run that mixes the two paths is not reproducible
                if not self._warned_fallback:
                    self._warned_fallback = True
                    import warnings

                    warnings.warn(
                        f"native decode failed for clip {sample}; falling "
                        "back to the Python decode path (different "
                        "resampling) for the failing clip(s)",
                        stacklevel=2,
                    )
        frames = [_read_image(p) for p in paths]
        return _transform_frames(frames, self.image_size), sample


class ToyboxDataset:
    """Toybox mp4 corpus: ``root/<supercategory>/<object>/<view>.mp4``.

    Sampling (``dsdatasets.py:107-217``): per-video fps-derived stride,
    start at 1/5 of the clip, pad with the last frame when short.
    """

    def __init__(self, root_dir: str, frame_rate: int = 10, sample_len: int = 16,
                 image_size: int = 224):
        self.root_dir = root_dir
        self.frame_rate = frame_rate
        self.sample_len = sample_len
        self.image_size = image_size
        self.samples: list[str] = []
        for supercat in sorted(os.listdir(root_dir)):
            for obj in sorted(os.listdir(os.path.join(root_dir, supercat))):
                obj_dir = os.path.join(root_dir, supercat, obj)
                for view in sorted(os.listdir(obj_dir)):
                    self.samples.append(os.path.join(obj_dir, view))

    def __len__(self):
        return len(self.samples)

    def _pad(self, frames: list[np.ndarray]) -> list[np.ndarray]:
        while len(frames) < self.sample_len:
            frames.append(frames[-1])
        return frames

    def __getitem__(self, index: int):
        vid_path = self.samples[index]
        fname = Path(vid_path).name
        if not _HAS_CV2:
            raise RuntimeError("cv2 required for Toybox decoding")
        cap = cv2.VideoCapture(vid_path)
        if cap is None or not cap.isOpened():
            warnings.warn(f"unable to open video source: {vid_path}")
            return None, None
        fps = cap.get(cv2.CAP_PROP_FPS) or self.frame_rate
        ds_rate = max(1, round(fps / self.frame_rate))
        num_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        scope = self.sample_len * ds_rate

        frames: list[np.ndarray] = []
        if num_frames >= scope:
            start = int(num_frames / 5)
            if num_frames - start < scope:
                start = num_frames - scope
            cap.set(cv2.CAP_PROP_POS_FRAMES, start)
        count = 0
        while len(frames) < self.sample_len:
            ret, frame = cap.read()
            if not ret:
                break
            if num_frames < scope or count % ds_rate == 0:
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            count += 1
        cap.release()
        if not frames:
            warnings.warn(f"no frames decoded from {vid_path}")
            return None, None
        frames = self._pad(frames)
        return _transform_frames(frames, self.image_size), fname


def resampled_length(n_frames: int, original_fps: float, new_fps: float) -> int:
    """Length of the resampled timeline under torchvision ``VideoClips``:
    the integer-step fast path returns ``slice(None, None, step)`` over
    the full pts list → ``ceil(n/step)`` frames; the float path floors
    ``n * new_fps / fps``."""
    step = float(original_fps) / float(new_fps)
    if step.is_integer():
        s = int(step)
        return (n_frames + s - 1) // s
    return int(n_frames * float(new_fps) / float(original_fps))


def resample_video_idx(positions: np.ndarray, original_fps: float,
                       new_fps: float) -> np.ndarray:
    """Original-frame index for each resampled position — torchvision's
    ``VideoClips._resample_video_idx``: position i maps to ``i * step``
    (integer step) or ``floor(i * step)`` (float step)."""
    step = float(original_fps) / float(new_fps)
    if step.is_integer():
        return np.asarray(positions, np.int64) * int(step)
    return np.floor(np.asarray(positions, np.float64) * step).astype(np.int64)


class UCF101Dataset:
    """UCF-101 avi corpus + official train/test split lists.

    Replaces the torchvision ``UCF101`` subclass + ``make_ucf101dataset``
    (``dsdatasets.py:234-282``) with torchvision's ``VideoClips``
    enumeration semantics: each video's timeline is resampled to
    ``frame_rate`` (``floor(n * fr / fps)`` positions, each mapping to
    original frame ``floor(i * fps / fr)``), then full ``sample_len``
    windows are taken every ``step_between_clips`` resampled frames —
    videos too short for one window contribute zero clips, exactly like
    ``VideoClips.compute_clips`` (so CSV row membership matches the
    reference sweep).

    Per-video metadata (frame count + fps) is probed once with cv2 and
    persisted to ``bvc_ucf_meta.json`` next to the split lists: a warm
    cache makes ``__init__`` do ZERO VideoCapture opens (the reference
    pays torchvision's full corpus scan per instantiation; with ~13k
    videos that dominated sweep startup).
    """

    META_CACHE = "bvc_ucf_meta.json"

    def __init__(self, root: str, annotation_path: str, fold: int = 1,
                 train: bool = True, sample_len: int = 16,
                 frame_rate: int | None = None, step_between_clips: int = 300,
                 image_size: int = 224):
        import json

        self.root = root
        self.sample_len = sample_len
        self.frame_rate = frame_rate
        self.step = step_between_clips
        self.image_size = image_size
        name = f"{'train' if train else 'test'}list{fold:02d}.txt"
        entries = []
        with open(os.path.join(annotation_path, name)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rel = line.split()[0]
                label = rel.split("/")[0]
                entries.append((rel, label))

        cache_path = Path(annotation_path) / self.META_CACHE
        meta: dict[str, list] = {}
        if cache_path.exists():
            try:
                meta = json.loads(cache_path.read_text())
            except Exception:
                warnings.warn(f"unreadable clip-index cache {cache_path}; reprobing")
        probed = 0
        present: set[str] = set()
        for rel, _ in entries:
            path = os.path.join(root, rel)
            try:
                st = os.stat(path)
            except OSError:
                meta.pop(rel, None)  # deleted since the cache was written
                continue
            present.add(rel)
            cached = meta.get(rel)
            # cache entries carry (mtime, size) so re-encoded videos get
            # reprobed; legacy 2-element entries are treated as stale
            if cached and len(cached) == 4 and cached[2] == st.st_mtime and \
                    cached[3] == st.st_size:
                continue
            cap = cv2.VideoCapture(path)
            n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
            cap.release()
            meta[rel] = [n, float(fps), st.st_mtime, st.st_size]
            probed += 1
        if probed:
            try:
                tmp = cache_path.with_suffix(".tmp")
                tmp.write_text(json.dumps(meta))
                tmp.replace(cache_path)
            except OSError as e:  # read-only annotation dir: still works, just slow
                warnings.warn(f"could not persist clip-index cache: {e}")
        self.meta = meta

        self.clips: list[tuple[str, str, int]] = []  # (relpath, label, resampled start)
        dropped = 0
        for rel, label in entries:
            if rel not in present:
                continue
            n, fps = meta[rel][:2]
            if frame_rate and fps > 0:
                n_res = resampled_length(n, fps, frame_rate)
            else:
                n_res = n
            if n_res < sample_len:
                dropped += 1
                continue
            for s in range(0, n_res - sample_len + 1, self.step):
                self.clips.append((rel, label, s))
        if dropped:
            warnings.warn(
                f"{dropped} videos shorter than {sample_len} resampled frames "
                "contribute no clips (torchvision VideoClips semantics)"
            )

    def __len__(self):
        return len(self.clips)

    def __getitem__(self, index: int):
        rel, label, rstart = self.clips[index]
        path = os.path.join(self.root, rel)
        n, fps = self.meta[rel][:2]
        if self.frame_rate and fps > 0:
            orig = resample_video_idx(rstart + np.arange(self.sample_len),
                                      fps, self.frame_rate)
        else:
            orig = rstart + np.arange(self.sample_len)
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            warnings.warn(f"unable to open {path}")
            return None, None
        # sequential decode from frame 0: CAP_PROP_POS_FRAMES seeking is
        # codec-dependent (inter-frame codecs can land off-by-several vs
        # torchvision's pts-based reads), so the start offset is reached
        # by grab()-skipping — decode-without-convert, correct by
        # construction.  Cheap for the real workload: UCF101's
        # step_between_clips=300 puts almost every clip at frame 0
        # (pixel-fidelity pinned by tests/test_evalbench.py
        # test_ucf_clip_pixels_match_sequential_decode).
        for _ in range(int(orig[0])):
            if not cap.grab():
                break
        wanted = set(int(i) for i in orig)
        frames_by_idx: dict[int, np.ndarray] = {}
        pos = int(orig[0])
        while pos <= int(orig[-1]):
            ret, frame = cap.read()
            if not ret:
                break
            if pos in wanted:
                frames_by_idx[pos] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            pos += 1
        cap.release()
        if not frames_by_idx:
            return None, None
        frames: list[np.ndarray] = []
        last = None
        for i in orig:
            f = frames_by_idx.get(int(i), last)
            if f is None:
                f = next(iter(frames_by_idx.values()))
            frames.append(f)
            last = f
        # fname doubles as the label carrier for UCF101Eval (the notebook
        # uses df['fnames'] directly as the category)
        return _transform_frames(frames, self.image_size), label


class Cifar10Dataset:
    """CIFAR-10 from the standard ``cifar-10-batches-py`` pickles; each
    image repeated ``sample_len`` times as a still clip
    (``Cifar10Transform``, ``dsdatasets.py:286-325``)."""

    LABELS = ("airplane automobile bird cat deer dog frog horse ship truck").split()

    def __init__(self, root: str, sample_len: int = 16, train: bool = False,
                 image_size: int = 224):
        base = Path(root) / "cifar-10-batches-py"
        files = (
            [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
        )
        xs, ys = [], []
        for fn in files:
            with open(base / fn, "rb") as f:
                d = pickle.load(f, encoding="bytes")
            xs.append(d[b"data"])
            ys += list(d[b"labels"])
        self.images = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.labels = ys
        self.sample_len = sample_len
        self.image_size = image_size

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, index: int):
        img = self.images[index]
        frame = normalize(center_crop(resize_shorter(img, self.image_size), self.image_size))
        clip = np.broadcast_to(
            frame, (self.sample_len,) + frame.shape
        ).copy()
        return clip, self.LABELS[self.labels[index]]


def drop_none_collate(samples: list[tuple]) -> tuple[np.ndarray, list[str]]:
    """Stack (clip, fname) pairs, dropping failed decodes
    (``my_collate`` / ``ucf_collate``)."""
    kept = [(c, f) for c, f in samples if c is not None]
    if not kept:
        return np.zeros((0,)), []
    clips = np.stack([c for c, _ in kept])
    names = [f for _, f in kept]
    return clips, names
