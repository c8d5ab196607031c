"""Probe: patch-major uint8 wire format for the embed head.

The embed head costs 2.3-4.3 ms at B=256 against a ~0.9 ms matmul floor
(docs/PERF_NOTES.md): the gap is the normalize pass plus the patchify
reshape/transpose lane shuffles over (B,224,224,3). If the WIRE format is
patch-major uint8 (B, 196, 768) — a host-side repack, or the C++ decoder
emitting patches directly — the normalization folds algebraically into the
embed weight:

    ((x - 255*mean)/(255*std)) @ W  ==  x_u8 @ (W * s) - c
    s[k] = 1/(255*std[k // p^2])        (channel-major patch layout)
    c    = (255*mean*s) @ W             (a (width,) constant)

so the embed becomes ONE matmul straight from uint8 — no normalize pass, no
transposes. This probe measures (amplified in-jit, same method as
profile_amplified.py):

    (a) current embed: normalize_u8 + patchify + matmul + cls/pos/ln_pre
    (b) patch-major:   cast + folded matmul + cls/pos/ln_pre
    (c) FULL classify program both ways

plus an fp32 numerics check (b) vs (a).

    python tools/embed_patchmajor_probe.py [batch] [iters] [inner]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from aiic_tpu.engine.programs import analyze_topk, detect_logits
    from aiic_tpu.models import VIT_B_16, init_clip_params
    from aiic_tpu.models.clip import (
        layer_norm, normalize_features, patchify, run_tower,
    )
    from aiic_tpu.ops.preprocess import (
        normalize_u8, patch_norm_constants, quantize_patch_embed,
        to_patch_major,
    )
    from aiic_tpu.ops.quant import quantize_model

    config = VIT_B_16
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    inner = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    dtype = jnp.bfloat16
    p = config.patch_size

    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    params = quantize_model(params)
    v = params["visual"]

    rng = np.random.default_rng(0)
    pixels_np = rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8)
    pixels = jnp.asarray(pixels_np)
    # host repack to patch-major via the shipped library repack (matches
    # patchify()'s flatten order / torch Conv2d (out, C, kh, kw) layout)
    patches_np = to_patch_major(pixels_np, p)
    patches = jnp.asarray(patches_np)

    det_text = rng.standard_normal((40, config.embed_dim)).astype(np.float32)
    det_text /= np.linalg.norm(det_text, axis=-1, keepdims=True)
    det_text = jnp.asarray(det_text)
    cat_text = jnp.asarray(rng.standard_normal((5, 304, config.embed_dim)).astype(np.float32))
    cat_mask = jnp.asarray(np.ones((5, 304), bool))

    # folded constants from the shipped library fold
    s_np, ms_np = patch_norm_constants(p)
    s_vec = jnp.asarray(s_np)
    ms_vec = jnp.asarray(ms_np)

    def embed_current(px_u8, xor):
        x = patchify(normalize_u8(jnp.bitwise_xor(px_u8, xor)).astype(dtype), p)
        x = jnp.dot(x, v["patch_embed"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        cls = jnp.broadcast_to(v["cls"].astype(dtype), (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1) + v["pos"].astype(dtype)
        return layer_norm(x, v["ln_pre"])

    def embed_patchmajor(pm_u8, xor):
        w = v["patch_embed"].astype(dtype) * s_vec[:, None].astype(dtype)
        c = jnp.dot(ms_vec.astype(dtype), v["patch_embed"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        x = jnp.dot(jnp.bitwise_xor(pm_u8, xor).astype(dtype), w,
                    preferred_element_type=jnp.float32).astype(dtype) - c
        cls = jnp.broadcast_to(v["cls"].astype(dtype), (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1) + v["pos"].astype(dtype)
        return layer_norm(x, v["ln_pre"])

    # (e) int8 embed: the wire is EXACT uint8, so only the weights quantize.
    # x_s8 = x_u8 - 128 (xor 0x80 bitcast to int8 — one cheap lane op), and
    #   y = x_s8 @ W'_q * wsc + c2,  W' = s[:,None]*W,  c2 = ((128-255m)*s)@W
    # int8 x int8 MACs run at 2x the bf16 rate on v5e and the uint8->bf16
    # convert pass over (B, N, 3p^2) disappears.
    q = quantize_patch_embed(v["patch_embed"])
    wq, wsc, c2 = q["wq"], q["wsc"], q["c2"]

    def embed_patchmajor_int8(pm_u8, xor):
        xs8 = jax.lax.bitcast_convert_type(
            jnp.bitwise_xor(jnp.bitwise_xor(pm_u8, xor), jnp.uint8(0x80)),
            jnp.int8)
        y = jax.lax.dot_general(
            xs8, wq, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        x = (y.astype(jnp.float32) * wsc + c2).astype(dtype)
        cls = jnp.broadcast_to(v["cls"].astype(dtype), (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1) + v["pos"].astype(dtype)
        return layer_norm(x, v["ln_pre"])

    def timed(fn, arg, tag, per_img=False):
        @jax.jit
        def loop(a):
            def body(i, acc):
                return acc + fn(a, i.astype(jnp.uint8)).astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

        float(loop(arg))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(loop(arg))
        dt = (time.perf_counter() - t0) / iters / inner
        extra = f"  -> {batch / dt:.0f} img/s device" if per_img else ""
        print(f"{tag:44s} {dt * 1e3:8.2f} ms/call{extra}", flush=True)
        return dt

    def tail(x):
        x = run_tower(x, v["blocks"], config.vision.heads, None,
                      config.gelu_type, attn_impl="pallas")
        x = layer_norm(x[:, 0], v["ln_post"])
        feats = normalize_features(
            jnp.dot(x, v["proj"].astype(dtype), preferred_element_type=jnp.float32))
        out = detect_logits(feats, det_text, interior_count=11)
        vals, _ = analyze_topk(feats, cat_text, cat_mask)
        return out["interior_mass"].sum() + vals.sum()

    def full_current(px_u8, xor):
        return tail(embed_current(px_u8, xor))[None, None]

    def full_patchmajor(pm_u8, xor):
        return tail(embed_patchmajor(pm_u8, xor))[None, None]

    print(f"batch={batch} iters={iters} inner={inner} "
          f"backend={jax.default_backend()}", flush=True)

    # numerics check (fp32, single pass)
    a32 = np.asarray(
        jax.jit(lambda px: patchify(normalize_u8(px), p) @ v["patch_embed"].astype(jnp.float32))(pixels)
    )
    w32 = v["patch_embed"].astype(jnp.float32) * s_vec[:, None]
    c32 = ms_vec @ np.asarray(v["patch_embed"].astype(jnp.float32))
    b32 = np.asarray(
        jax.jit(lambda pm: pm.astype(jnp.float32) @ w32 - c32)(patches)
    )
    denom = np.abs(a32).max() + 1e-9
    print(f"fp32 fold check: max |a-b| / max|a| = {np.abs(a32 - b32).max() / denom:.2e}",
          flush=True)

    # int8-embed numerics vs the exact folded fp32 embed
    e32 = np.asarray(jax.jit(
        lambda pm: (jax.lax.dot_general(
            jax.lax.bitcast_convert_type(pm ^ np.uint8(0x80), jnp.int8),
            wq, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32) * wsc + c2))(patches))
    cos = (e32.ravel() @ b32.ravel()) / (
        np.linalg.norm(e32) * np.linalg.norm(b32) + 1e-9)
    print(f"int8 embed vs fp32 folded: cosine {cos:.6f}, "
          f"max rel {np.abs(e32 - b32).max() / denom:.2e}", flush=True)

    timed(embed_current, pixels, "(a) embed current (norm+patchify+mm)")
    timed(embed_patchmajor, patches, "(b) embed patch-major u8 (folded mm)")
    timed(embed_patchmajor_int8, patches, "(e) embed patch-major INT8 mm")
    timed(full_current, pixels, "(c) FULL classify, current wire", per_img=True)
    timed(full_patchmajor, patches, "(d) FULL classify, patch-major wire", per_img=True)

    # host repack cost (what production would pay per image on CPU)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        to_patch_major(pixels_np, p)
    dt = (time.perf_counter() - t0) / reps
    print(f"host repack (numpy, 1 core): {dt / batch * 1e6:.0f} us/img "
          f"({batch / dt:.0f} img/s/core)", flush=True)


if __name__ == "__main__":
    main()
