"""Device-side preprocessing ops (BASELINE.json config #3).

The reference preprocesses on the host with PIL/torchvision per image
(main.py:437-438). Here the host only decodes JPEG to raw uint8; everything
after — bicubic resize, center crop, normalize — runs on the TPU inside the
same XLA program as the encoder:

- **resize as two matmuls**: PIL-exact separable bicubic weights become dense
  (out, in) matrices (see data/preprocess.resize_matrix), so the resample is
  MXU work: ``einsum('oh,bhwc->bowc') -> einsum('ow,bhwc->bhoc')``. For a
  fixed input geometry this is one compiled program; serving buckets inputs
  by decoded size.
- **normalize_u8**: uint8 -> (x/255 - mean)/std fused into the encoder
  program, so the host->device transfer is uint8 (4x smaller than fp32 —
  the transfer link, not the MXU, is the bottleneck at inference batch
  sizes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aiic_tpu.data.preprocess import CLIP_MEAN, CLIP_STD, center_crop_bounds, resize_matrix, resize_target


def normalize_u8(pixels_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 (B, H, W, 3) -> normalized (B, H, W, 3) in ``dtype``."""
    mean = jnp.asarray(CLIP_MEAN * 255.0, jnp.float32)
    # fold /255 and /std into one multiplier: (x - 255*mean) * (1/(255*std))
    inv = jnp.asarray(1.0 / (CLIP_STD * 255.0), jnp.float32)
    x = pixels_u8.astype(jnp.float32)
    return ((x - mean) * inv).astype(dtype)


@functools.lru_cache(maxsize=8)
def patch_norm_constants(patch: int) -> Tuple[np.ndarray, np.ndarray]:
    """Normalization constants folded for the patch-major uint8 wire format.

    With patches flattened channel-major (models.clip.patchify's order: flat
    index ``k = c*p*p + py*p + px``), per-channel normalization distributes
    over the embed matmul:

        ((x - 255*mean)/(255*std)) @ W  ==  x @ (s[:,None] * W) - (m*s) @ W

    Returns ``(s, ms)`` with ``s[k] = 1/(255*std[k // p^2])`` and
    ``ms[k] = 255*mean[k // p^2] * s[k]`` — so the embed head becomes ONE
    matmul straight from uint8 patches, with no normalize pass and no
    patchify reshape/transposes on device (measured 9.3 -> 5.5 ms at B=1024
    bf16, tools/embed_patchmajor_probe.py).
    """
    chan = np.arange(3 * patch * patch) // (patch * patch)
    s = (1.0 / (CLIP_STD * 255.0))[chan].astype(np.float32)
    ms = (CLIP_MEAN * 255.0)[chan].astype(np.float32) * s
    return s, ms


def quantize_patch_embed(w) -> dict:
    """int8 patch-embed for the patch-major uint8 wire.

    The wire is EXACT uint8, so unlike the MLP/QKV int8 kernels only the
    WEIGHTS quantize — there is no activation-quantization error. Folding
    normalization (patch_norm_constants) and the uint8->int8 offset
    (x_s8 = x_u8 - 128, a bitwise xor 0x80) into the weight:

        normalize(x_u8) @ W == (x_s8 @ Wq) * wsc + c2
        W'  = s[:,None] * W                 (folded normalize)
        Wq  = round(W' / wsc), wsc[j] = max|W'[:,j]| / 127
        c2  = ((128 - 255*mean) * s) @ W

    int8 MACs run at 2x the bf16 rate on v5e and the uint8->bf16 convert
    pass over (B, N, 3p^2) disappears: measured 6.54 -> 5.56 ms at B=1024
    (tools/embed_patchmajor_probe.py), embed-output cosine 0.999966 vs the
    fp32 folded embed. Returns {'wq' int8 (3p^2, D), 'wsc' f32 (D,),
    'c2' f32 (D,)} — attached as params['visual']['patch_embed_q'] by
    ops.quant.quantize_model; models.clip.encode_image picks it up on
    rank-3 (patch-major uint8) inputs."""
    w32 = np.asarray(w, np.float32)
    k = w32.shape[0]
    chan = np.arange(k) // (k // 3)
    s = (1.0 / (CLIP_STD * 255.0))[chan].astype(np.float32)
    m = (CLIP_MEAN * 255.0)[chan].astype(np.float32)
    wf = w32 * s[:, None]
    wsc = np.abs(wf).max(axis=0) / 127.0
    wsc = np.where(wsc == 0.0, 1.0, wsc).astype(np.float32)
    wq = np.clip(np.round(wf / wsc), -127, 127).astype(np.int8)
    c2 = (((128.0 - m) * s) @ w32).astype(np.float32)
    return {"wq": jnp.asarray(wq), "wsc": jnp.asarray(wsc),
            "c2": jnp.asarray(c2)}


def to_patch_major(pixels_u8: np.ndarray, patch: int) -> np.ndarray:
    """Host-side repack: uint8 (B, S, S, 3) -> (B, N, 3*p*p) patch-major.

    Flatten order matches models.clip.patchify (channel-major within a
    patch, torch Conv2d (out, C, kh, kw) weight layout), so the folded embed
    of the patch-major wire format consumes it directly. ~150 us/img on one
    core; production decoders can emit this layout at decode time.
    """
    b, h, w, c = pixels_u8.shape
    gh, gw = h // patch, w // patch
    x = pixels_u8.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return np.ascontiguousarray(x.reshape(b, gh * gw, c * patch * patch))


@functools.lru_cache(maxsize=64)
def make_resize_mats(in_h: int, in_w: int, size: int = 224) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """(Ky, Kx, top, left) for resize-shorter-side + center-crop of a fixed
    input geometry. Ky: (new_h, in_h), Kx: (new_w, in_w)."""
    new_w, new_h = resize_target(in_w, in_h, size)
    ky = resize_matrix(in_h, new_h)
    kx = resize_matrix(in_w, new_w)
    top, left = center_crop_bounds(new_w, new_h, size)
    return ky, kx, max(top, 0), max(left, 0)


def device_preprocess_fixed(
    pixels_u8: jnp.ndarray,
    ky: jnp.ndarray,
    kx: jnp.ndarray,
    top: int,
    left: int,
    size: int = 224,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """uint8 (B, H, W, 3) of one fixed geometry -> normalized (B, size, size, 3).

    Two-pass resample matching PIL's pass structure (horizontal then
    vertical, uint8 re-quantization between passes — data/preprocess._clip8),
    then crop + normalize. All matmul work; accumulation in fp32.
    """
    x = pixels_u8.astype(jnp.float32)
    # horizontal: contract W
    x = jnp.einsum("bhwc,ow->bhoc", x, kx.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    x = jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)
    # vertical: contract H
    x = jnp.einsum("bhwc,oh->bowc", x, ky.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    x = jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)
    x = jax.lax.dynamic_slice_in_dim(x, top, size, axis=1)
    x = jax.lax.dynamic_slice_in_dim(x, left, size, axis=2)
    mean = jnp.asarray(CLIP_MEAN * 255.0, jnp.float32)
    inv = jnp.asarray(1.0 / (CLIP_STD * 255.0), jnp.float32)
    return ((x - mean) * inv).astype(dtype)
