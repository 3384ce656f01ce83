"""Fixed (non-learned) positional encodings.

Two distinct families are load-bearing for checkpoint/embedding fidelity
(SURVEY.md §7 "hard parts"):

1. ``positional_encoding_3d`` — the JEPA video-ViT tables.  Replicates the
   channel-*partition* quirk of the reference's ``PositionalEncoding3D``
   (``pretraining/predictive/vision_transformer.py:29-78``, itself vendored
   from tatp22/multidim-positional-encoding): the channel budget is split
   into three equal blocks of ``ceil(C/6)*2`` channels for t, y, x; each
   block holds interleaved (sin, cos) pairs; the final slice back to C
   truncates the x block.

2. ``sinusoid_table_1d`` — the VideoMAE tables.  HF VideoMAE uses a plain
   1-D index sinusoid over all patch positions with sin on even channels /
   cos on odd channels of a shared angle vector
   (transformers ``modeling_videomae.get_sinusoid_encoding_table``).

3. ``sincos_2d`` — the image-ViT variant (concatenated h/w 1-D sin‖cos
   halves, ``vision_transformer_image.py`` / ``:82-142`` in the video
   file).

All are computed in float64-free numpy at model-build time and baked in as
constants — they are not parameters (the reference stores them in frozen
buffers).
"""

from __future__ import annotations

import numpy as np


def _interleaved_sincos(pos: np.ndarray, inv_freq: np.ndarray) -> np.ndarray:
    """``[len(pos), 2*len(inv_freq)]`` with channels (sin0, cos0, sin1, ...)."""
    angles = np.einsum("i,j->ij", pos, inv_freq)
    out = np.stack([np.sin(angles), np.cos(angles)], axis=-1)
    return out.reshape(len(pos), -1)


def positional_encoding_3d(t: int, h: int, w: int, channels: int) -> np.ndarray:
    """``[t*h*w, channels]`` table matching the reference's
    ``PositionalEncoding3D`` evaluated on a ``(t, h, w)`` grid then
    flattened row-major (t slowest, w fastest) — exactly how
    ``VisionTransformer.__init__`` bakes ``pos_embed``
    (``predictive/vision_transformer.py:333-343``)."""
    block = int(np.ceil(channels / 6) * 2)
    if block % 2:
        block += 1
    inv_freq = 1.0 / (10000 ** (np.arange(0, block, 2, dtype=np.float64) / block))

    emb_t = _interleaved_sincos(np.arange(t, dtype=np.float64), inv_freq)
    emb_y = _interleaved_sincos(np.arange(h, dtype=np.float64), inv_freq)
    emb_x = _interleaved_sincos(np.arange(w, dtype=np.float64), inv_freq)

    table = np.zeros((t, h, w, block * 3), dtype=np.float64)
    table[..., :block] = emb_t[:, None, None, :]
    table[..., block : 2 * block] = emb_y[None, :, None, :]
    table[..., 2 * block :] = emb_x[None, None, :, :]
    return table[..., :channels].reshape(t * h * w, channels).astype(np.float32)


def sinusoid_table_1d(n_position: int, d_hid: int) -> np.ndarray:
    """``[n_position, d_hid]`` HF-VideoMAE sinusoid table: shared angle
    vector ``pos / 10000^(2*(j//2)/d)``, sin on even j, cos on odd j."""
    j = np.arange(d_hid)
    angle_rates = 1.0 / np.power(10000.0, 2 * (j // 2) / d_hid)
    table = np.arange(n_position, dtype=np.float64)[:, None] * angle_rates[None, :]
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table.astype(np.float32)


def _sincos_1d_halves(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """``[len(pos), embed_dim]`` with first half all-sin, second half
    all-cos (``get_1d_sincos_pos_embed_from_grid``,
    ``predictive/vision_transformer.py:124-142``)."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_2d(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    """``[grid^2 (+1), embed_dim]`` image-ViT table
    (``get_2d_sincos_pos_embed``, ``:82-108``): positions flattened
    row-major (h slow, w fast); the first half of the channels encodes the
    w coordinate — the reference's ``meshgrid(grid_w, grid_h)`` puts the
    w-grid in ``grid[0]``, which its (misleadingly named) ``emb_h`` then
    consumes."""
    coords = np.arange(grid_size, dtype=np.float64)
    grid_w, grid_h = np.meshgrid(coords, coords)  # h slow, w fast
    emb_first = _sincos_1d_halves(embed_dim // 2, grid_w)
    emb_second = _sincos_1d_halves(embed_dim // 2, grid_h)
    table = np.concatenate([emb_first, emb_second], axis=1)
    if cls_token:
        table = np.concatenate([np.zeros((1, embed_dim)), table], axis=0)
    return table.astype(np.float32)
