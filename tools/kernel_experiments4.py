"""Fourth experiment batch: pass-cost breakdown of the int8 attention
half-block kernel (24.2 ms/stack at B=256 vs a ~15 ms projection-matmul
floor from PERF_NOTES).

Timing ABLATIONS (numerically wrong, cost-attribution only):
  noln     LN pass removed (raw x row-quantized)
  nosm     softmax removed (scores used directly as weights) — measures the
           exp2 + rowsum + post-scale VPU cost
  nocore   the whole per-head loop replaced by the qkv Q-slice — measures
           QK^T + softmax + p@v + concat together
  maconly  LN/quant/softmax removed; both projections on constant int8 —
           the in-kernel int8 projection MAC floor

REAL candidates (cosine-checked vs prod):
  qobf16   output projection in bf16 (skips the (rows,768) row-quant of the
           attention output; mm cost at bf16 rate)
  corebf8  p matrix cast to bf16 before p@v is already prod; here p@v and
           QK^T operands stay exactly as prod but the per-head loop runs
           over head PAIRS packed along the lane dim where legal (concat
           k/v of two heads block-diagonally) — kept only if measurably
           faster (MXU fill argument is neutral on paper).

    python tools/kernel_experiments4.py [iters] [inner]
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
    from aiic_tpu.ops.quant import (
        _row_quant, int8_ln_qkv_attention, quantize_model, quantize_weight,
    )

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
    v = dict(qparams["visual"])
    v["blocks"] = dict(v["blocks"])
    v["blocks"]["attn_bf16"] = {
        "wqkv": params["visual"]["blocks"]["attn"]["wqkv"],
        "wo": params["visual"]["blocks"]["attn"]["wo"],
    }
    rng = np.random.default_rng(0)

    def make_kernel(variant):
        def kernel(x_ref, ln_s_ref, ln_b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                   wo_ref, so_ref, bo_ref, wof_ref, o_ref,
                   *, heads, dim, scale, eps):
            width = heads * dim
            group, seq, _ = x_ref.shape
            x = x_ref[:].reshape(group * seq, width)
            xf = x.astype(jnp.float32)

            if variant == "maconly":
                hq = jnp.full((group * seq, width), 3, jnp.int8)
                acc = jax.lax.dot_general(
                    hq, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT)
                aq = jnp.clip(acc[:, :width], -127, 127).astype(jnp.int8)
                acc2 = jax.lax.dot_general(
                    aq, wo_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT)
                o_ref[:] = (xf + acc2.astype(jnp.float32)).astype(
                    o_ref.dtype).reshape(group, seq, width)
                return

            if variant == "noln":
                h = xf
            else:
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

            if variant == "nocore":
                attn = qkv[:, :width].astype(jnp.float32)
            else:
                attns = []
                for g in range(group):
                    tile = qkv[g * seq:(g + 1) * seq]
                    outs = []
                    for hd in range(heads):
                        q = tile[:, hd * dim:(hd + 1) * dim]
                        k = tile[:, width + hd * dim: width + (hd + 1) * dim]
                        vv = tile[:, 2 * width + hd * dim: 2 * width + (hd + 1) * dim]
                        q = q * jnp.asarray(scale * LOG2E, q.dtype)
                        s = jax.lax.dot_general(
                            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                        if variant == "nosm":
                            p = s
                            denom = jnp.float32(1.0)
                        else:
                            p = jnp.exp2(jnp.minimum(s, 70.0 * LOG2E))
                            denom = jnp.sum(p, axis=-1, keepdims=True)
                        o = jnp.dot(p.astype(vv.dtype), vv,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
                        outs.append(o * (1.0 / denom))
                    attns.append(jnp.concatenate(outs, axis=-1))
                attn = jnp.concatenate(attns, axis=0)

            if variant == "qobf16":
                out = jax.lax.dot_general(
                    attn.astype(x.dtype), wof_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                out = out + bo_ref[:].astype(jnp.float32)
            else:
                aq, ascale = _row_quant(attn)
                acc2 = jax.lax.dot_general(
                    aq, wo_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT)
                out = acc2.astype(jnp.float32) * ascale * so_ref[:] + bo_ref[:].astype(jnp.float32)
            o_ref[:] = (xf + out).astype(o_ref.dtype).reshape(group, seq, width)
        return kernel

    def attn_var(x, p, variant):
        bsz, seq, width = x.shape
        dim = width // H
        group = 2
        q = p["attn_q"]
        # variants keep an int8 out-projection operand for the historical
        # comparison; prod no longer carries wo_q/so, so quantize inline
        wo_q, so = quantize_weight(p["attn"]["wo"])
        args = (x, p["ln1"]["scale"].reshape(1, width), p["ln1"]["bias"].reshape(1, width),
                q["wqkv_q"], q["sqkv"].reshape(1, 3 * width),
                p["attn"]["bqkv"].reshape(1, 3 * width),
                wo_q, so.reshape(1, width), p["attn"]["bo"].reshape(1, width),
                p["attn_bf16"]["wo"])
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
                pl.BlockSpec((1, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((width, width), lambda b: (0, 0), memory_space=pltpu.VMEM),
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
        blocks = {k: v["blocks"][k] for k in ("ln1", "attn", "attn_q", "attn_bf16")}
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
            print(f"attn stack [{variant:8s}]  {dt * 1e3:8.2f} ms/call", flush=True)
        except Exception as e:  # noqa: BLE001 - probe tool, report and move on
            print(f"attn stack [{variant:8s}]  FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    def check(variant):
        try:
            a = np.asarray(stack(x_tok[:4], "prod").astype(jnp.float32))
            b = np.asarray(stack(x_tok[:4], variant).astype(jnp.float32))
            cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
            print(f"  cosine[{variant} vs prod] = {cos:.6f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  cosine[{variant}] FAILED: {type(e).__name__}", flush=True)

    print(f"iters={iters} inner={inner} backend={jax.default_backend()}", flush=True)
    for variant in ("prod", "noln", "nosm", "nocore", "maconly", "qobf16"):
        timed(variant)
    for variant in ("qobf16",):
        check(variant)


if __name__ == "__main__":
    main()
