"""Fifth experiment batch: cutting the per-dot overhead in the attention
core. kernel_experiments4 attributed ~12.2 ms/stack to the per-head loop
(48 small dots per grid step at G=2×H=12) of which only ~1.9 ms is MAC work
and ~2.6 ms softmax — the rest smells like per-dot pipeline drain plus
slice/concat traffic.

Variants (REAL candidates, cosine-checked):
  gbatch   per head, batch the two images' (S, D) slices into one
           (G, S, D) batched dot (reshape of the (G·S, D) lane slice —
           halves the dot count; the reshape re-tiles 197-row images)
  hstack   per image, stack all H heads' (S, D) q/k/v lane-slices into one
           (H, S, D) operand (explicit stack = lane-shifted copies) and run
           ONE batched QK^T + ONE batched p@v per image (48 dots -> 4)
  hg       hstack across BOTH images: (G·H, S, D) operands, 2 batched dots
           per grid step total

    python tools/kernel_experiments5.py [iters] [inner] [variants]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG2E = 1.4426950408889634


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from aiic_tpu.models import VIT_B_16, init_clip_params
    from aiic_tpu.ops.quant import _row_quant, int8_ln_qkv_attention, quantize_model

    config = VIT_B_16
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtype = jnp.bfloat16
    H = config.vision.heads
    W = config.vision.width
    SEQ = (224 // config.patch_size) ** 2 + 1

    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    qparams = quantize_model(params)
    v = qparams["visual"]
    rng = np.random.default_rng(0)

    def make_kernel(variant):
        def kernel(x_ref, ln_s_ref, ln_b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                   wo_ref, bo_ref, o_ref, *, heads, dim, scale, eps):
            width = heads * dim
            group, seq, _ = x_ref.shape
            x = x_ref[:].reshape(group * seq, width)
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            h = (xf - mean) * jax.lax.rsqrt(var + eps)
            h = h * ln_s_ref[:].astype(jnp.float32) + ln_b_ref[:].astype(jnp.float32)

            hq, hscale = _row_quant(h)
            acc = jax.lax.dot_general(
                hq, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
            qkv = (acc.astype(jnp.float32) * hscale * sqkv_ref[:]
                   + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)  # (G*S, 3W)

            lscale = jnp.asarray(scale * LOG2E, qkv.dtype)

            if variant == "gbatch":
                outs_w = []
                for hd in range(heads):
                    q = qkv[:, hd * dim:(hd + 1) * dim].reshape(group, seq, dim)
                    k = qkv[:, width + hd * dim: width + (hd + 1) * dim].reshape(group, seq, dim)
                    vv = qkv[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim].reshape(group, seq, dim)
                    s = jax.lax.dot_general(
                        q * lscale, k,
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
                    p = jnp.exp2(jnp.minimum(s, 70.0 * LOG2E))
                    denom = jnp.sum(p, axis=-1, keepdims=True)
                    o = jax.lax.dot_general(
                        p.astype(vv.dtype), vv,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
                    outs_w.append((o * (1.0 / denom)).reshape(group * seq, dim))
                attn = jnp.concatenate(outs_w, axis=-1)  # (G*S, W)
            elif variant in ("hstack", "hg"):
                def head_stack(base):
                    return jnp.stack(
                        [qkv[:, base + hd * dim: base + (hd + 1) * dim]
                         for hd in range(heads)], axis=0)  # (H, G*S, D)

                qh = head_stack(0)
                kh = head_stack(width)
                vh = head_stack(2 * width)
                if variant == "hg":
                    # (H, G*S, D) -> (H, G, S, D) -> (H*G, S, D)
                    qh = qh.reshape(heads, group, seq, dim).reshape(heads * group, seq, dim)
                    kh = kh.reshape(heads, group, seq, dim).reshape(heads * group, seq, dim)
                    vh = vh.reshape(heads, group, seq, dim).reshape(heads * group, seq, dim)
                    s = jax.lax.dot_general(
                        qh * lscale, kh,
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
                    p = jnp.exp2(jnp.minimum(s, 70.0 * LOG2E))
                    denom = jnp.sum(p, axis=-1, keepdims=True)
                    o = jax.lax.dot_general(
                        p.astype(vh.dtype), vh,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
                    o = o * (1.0 / denom)  # (H*G, S, D)
                    o = o.reshape(heads, group * seq, dim)
                else:
                    outs_g = []
                    for g in range(group):
                        sl = slice(g * seq, (g + 1) * seq)
                        s = jax.lax.dot_general(
                            qh[:, sl] * lscale, kh[:, sl],
                            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                        p = jnp.exp2(jnp.minimum(s, 70.0 * LOG2E))
                        denom = jnp.sum(p, axis=-1, keepdims=True)
                        o = jax.lax.dot_general(
                            p.astype(vh.dtype), vh[:, sl],
                            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                        outs_g.append(o * (1.0 / denom))  # (H, S, D)
                    o = jnp.concatenate(outs_g, axis=1)  # (H, G*S, D)
                attn = jnp.concatenate(
                    [o[hd] for hd in range(heads)], axis=-1)  # (G*S, W)
            else:
                raise ValueError(variant)

            out = jax.lax.dot_general(
                attn.astype(x.dtype), wo_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            out = out + bo_ref[:].astype(jnp.float32)
            o_ref[:] = (xf + out).astype(o_ref.dtype).reshape(group, seq, width)
        return kernel

    def attn_var(x, p, variant):
        bsz, seq, width = x.shape
        dim = width // H
        group = 2
        q = p["attn_q"]
        args = (x, p["ln1"]["scale"].reshape(1, width), p["ln1"]["bias"].reshape(1, width),
                q["wqkv_q"], q["sqkv"].reshape(1, 3 * width),
                p["attn"]["bqkv"].reshape(1, 3 * width),
                p["attn"]["wo"], p["attn"]["bo"].reshape(1, width))
        return pl.pallas_call(
            functools.partial(make_kernel(variant), heads=H, dim=dim,
                              scale=dim ** -0.5, eps=1e-5),
            out_shape=jax.ShapeDtypeStruct((bsz, seq, width), x.dtype),
            grid=(bsz // group,),
            in_specs=[
                pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((width, 3 * width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((width, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        )(*args)

    def stack(x, variant):
        def body(carry, p):
            if variant == "prod":
                q = p["attn_q"]
                out = int8_ln_qkv_attention(
                    carry, p["ln1"]["scale"], p["ln1"]["bias"],
                    q["wqkv_q"], q["sqkv"], p["attn"]["bqkv"], p["attn"]["wo"],
                    p["attn"]["bo"], None, heads=H)
            else:
                out = attn_var(carry, p, variant)
            return out, None
        blocks = {k: v["blocks"][k] for k in ("ln1", "attn", "attn_q")}
        out, _ = jax.lax.scan(body, x, blocks)
        return out

    x_tok = jnp.asarray(rng.standard_normal((256, SEQ, W)).astype(np.float32), dtype)

    def timed(variant):
        try:
            @jax.jit
            def loop(x):
                return jax.lax.fori_loop(0, inner, lambda i, c: stack(c, variant),
                                         x).astype(jnp.float32).sum()
            float(loop(x_tok))
            t0 = time.perf_counter()
            for _ in range(iters):
                float(loop(x_tok))
            dt = (time.perf_counter() - t0) / iters / inner
            print(f"attn stack [{variant:7s}]  {dt * 1e3:8.2f} ms/call", flush=True)
        except Exception as e:  # noqa: BLE001 - probe tool, report and move on
            print(f"attn stack [{variant:7s}]  FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    def check(variant):
        try:
            a = np.asarray(stack(x_tok[:4], "prod").astype(jnp.float32))
            b = np.asarray(stack(x_tok[:4], variant).astype(jnp.float32))
            cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
            print(f"  cosine[{variant} vs prod] = {cos:.6f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  cosine[{variant}] FAILED: {type(e).__name__}", flush=True)

    variants = sys.argv[3].split(",") if len(sys.argv) > 3 else (
        "prod", "gbatch", "hstack", "hg")
    print(f"iters={iters} inner={inner} backend={jax.default_backend()}", flush=True)
    for variant in variants:
        timed(variant)
    for variant in variants:
        if variant != "prod":
            check(variant)


if __name__ == "__main__":
    main()
