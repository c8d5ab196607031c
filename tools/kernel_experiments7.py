"""Seventh experiment batch: int8 attention-CORE activations A/B at B=1024
(round-4 VERDICT #4 — "spend or close the last ledgered headroom").

The round-4 B/16 ledger (docs/PERF_NOTES.md) closed every term except the
attention core itself: QK^T and P@V still run bf16 on dequantized
activations while both projections are int8. The core is only
4·H·S²·D = 119.2 MMACs of the 1454 MMACs/block (~8% of block MACs), so the
theoretical ceiling from double-pumped int8 MACs is ~4% of the block — and
each int8 core needs NEW per-head VPU quant passes (row-quant q, k, p and
per-channel v) that the projections amortize over one big (G·S, W) slab.
This script measures whether the MAC savings survive the quant overhead.

Variants (REAL candidates, cosine-checked vs prod):
  prod      int8 QKV projection + bf16 core + bf16 out projection (shipping)
  coreqk    QK^T int8: row-quant q and k along D=64; int32 scores dequant by
            the qscale_i·kscale_j outer product (softmax scale folded into
            the dequant)
  corepv    P@V int8: row-quant p along S; per-output-channel quant of v;
            int32 accumulator dequant by pscale_i·vscale_d
  coreboth  both of the above

    python tools/kernel_experiments7.py [iters] [inner] [batch]
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
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    dtype = jnp.bfloat16
    H = config.vision.heads
    W = config.vision.width
    SEQ = (224 // config.patch_size) ** 2 + 1

    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    qparams = quantize_model(params)
    v = qparams["visual"]
    rng = np.random.default_rng(0)

    def core_bf16(q, k, vv, mask, scale):
        q = q * jnp.asarray(scale * LOG2E, q.dtype)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        p = jnp.exp2(s + mask)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(vv.dtype), vv, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
        return o * (1.0 / denom)

    def core_int8(q, k, vv, mask, scale, do_qk, do_pv):
        if do_qk:
            qq, qs = _row_quant(q.astype(jnp.float32))
            kq, ks = _row_quant(k.astype(jnp.float32))
            acc = jax.lax.dot_general(
                qq, kq, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
            # fold the softmax scale + log2 conversion into the dequant
            s = acc.astype(jnp.float32) * (qs * jnp.float32(scale * LOG2E)) * ks.T
        else:
            qsc = q * jnp.asarray(scale * LOG2E, q.dtype)
            s = jax.lax.dot_general(
                qsc, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        p = jnp.exp2(s + mask)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        if do_pv:
            pq, ps = _row_quant(p)
            vf = vv.astype(jnp.float32)
            vs = jnp.max(jnp.abs(vf), axis=0, keepdims=True) / 127.0 + 1e-12
            vq = jnp.round(vf / vs).astype(jnp.int8)
            acc2 = jax.lax.dot_general(
                pq, vq, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
            o = acc2.astype(jnp.float32) * ps * vs
        else:
            o = jnp.dot(p.astype(vv.dtype), vv,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
        return o * (1.0 / denom)

    def make_kernel(variant):
        do_qk = variant in ("coreqk", "coreboth")
        do_pv = variant in ("corepv", "coreboth")

        def kernel(x_ref, ln_s_ref, ln_b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                   wo_ref, bo_ref, mask_ref, o_ref, *, heads, dim, scale, eps):
            width = heads * dim
            group, seq, _ = x_ref.shape
            mask = mask_ref[:] * jnp.float32(LOG2E)
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
                   + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)
            attns = []
            for g in range(group):
                tile = qkv[g * seq:(g + 1) * seq]
                outs = []
                for hd in range(heads):
                    q = tile[:, hd * dim:(hd + 1) * dim]
                    k = tile[:, width + hd * dim: width + (hd + 1) * dim]
                    vv = tile[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
                    outs.append(core_int8(q, k, vv, mask, scale, do_qk, do_pv))
                attns.append(jnp.concatenate(outs, axis=-1))
            attn = jnp.concatenate(attns, axis=0)
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
        args = (x, p["ln1"]["scale"].reshape(1, width),
                p["ln1"]["bias"].reshape(1, width),
                q["wqkv_q"], q["sqkv"].reshape(1, 3 * width),
                p["attn"]["bqkv"].reshape(1, 3 * width),
                p["attn"]["wo"].astype(x.dtype),
                p["attn"]["bo"].reshape(1, width),
                jnp.zeros((seq, seq), jnp.float32))
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
                pl.BlockSpec((seq, seq), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((group, seq, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        )(*args)

    def stack(x, variant):
        def body(carry, p):
            if variant == "prod":
                q = p["attn_q"]
                out = int8_ln_qkv_attention(
                    carry, p["ln1"]["scale"], p["ln1"]["bias"],
                    q["wqkv_q"], q["sqkv"], p["attn"]["bqkv"],
                    p["attn"]["wo"], p["attn"]["bo"], None, heads=H)
            else:
                out = attn_var(carry, p, variant)
            return out, None
        blocks = {k: v["blocks"][k] for k in ("ln1", "attn", "attn_q")}
        out, _ = jax.lax.scan(body, x, blocks)
        return out

    x_tok = jnp.asarray(rng.standard_normal((batch, SEQ, W)).astype(np.float32), dtype)

    ref = None

    def run(variant):
        nonlocal ref
        try:
            @jax.jit
            def loop(x):
                return jax.lax.fori_loop(
                    0, inner, lambda i, c: stack(c, variant), x)

            out = np.asarray(loop(x_tok), np.float32)
            if variant == "prod":
                ref = out
                cos = 1.0
            else:
                a, b = out.ravel(), ref.ravel()
                cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

            @jax.jit
            def timed_loop(x):
                return jax.lax.fori_loop(
                    0, inner, lambda i, c: stack(c, variant),
                    x).astype(jnp.float32).sum()

            float(timed_loop(x_tok))
            t0 = time.perf_counter()
            for _ in range(iters):
                float(timed_loop(x_tok))
            dt = (time.perf_counter() - t0) / iters / inner
            print(f"attn stack B={batch} [{variant:8s}]  {dt * 1e3:8.2f} "
                  f"ms/call  cosine={cos:.6f}", flush=True)
        except Exception as e:  # noqa: BLE001 - probe tool, report and move on
            print(f"attn stack B={batch} [{variant:8s}]  FAILED: "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:140]}",
                  flush=True)

    for variant in ("prod", "coreqk", "corepv", "coreboth"):
        run(variant)


if __name__ == "__main__":
    main()
