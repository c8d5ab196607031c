"""Component breakdown of the serving step on the real chip.

Times isolated jits at the bench geometry (B=256, ViT-B/16, bf16 + int8):
embed head, attention half-blocks (12x), MLP half-blocks (12x), pooling +
detector/top-k tail, and the full classify program. Every timing fetches a
reduced scalar (block_until_ready is a no-op on this relay backend).

    python tools/step_profile.py [batch] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, args, iters, tag):
    out = fn(*args)
    s = out if not isinstance(out, tuple) else out[0]
    float(np.asarray(s).ravel()[0].astype(np.float32))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        s = out if not isinstance(out, tuple) else out[0]
        float(np.asarray(s).ravel()[0].astype(np.float32))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:34s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from aiic_tpu.models import VIT_B_16, init_clip_params
    from aiic_tpu.models.clip import layer_norm, patchify, run_tower
    from aiic_tpu.engine.programs import classify_batch
    from aiic_tpu.ops.quant import quantize_model

    config = VIT_B_16
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    dtype = jnp.bfloat16

    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    params = quantize_model(params)
    v = params["visual"]

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8))
    seq = (224 // config.patch_size) ** 2 + 1
    x_tok = jnp.asarray(
        rng.standard_normal((batch, seq, config.vision.width)).astype(np.float32), dtype
    )

    from aiic_tpu.ops.preprocess import normalize_u8

    def embed(v, px):
        x = patchify(normalize_u8(px).astype(dtype), config.patch_size)
        x = jnp.dot(x, v["patch_embed"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        cls = jnp.broadcast_to(v["cls"].astype(dtype), (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1) + v["pos"].astype(dtype)
        x = layer_norm(x, v["ln_pre"])
        return x.sum(), x

    def towers(v, x):
        out = run_tower(x, v["blocks"], config.vision.heads, None,
                        config.gelu_type, attn_impl="pallas")
        return out.sum(), out

    def attn_only(v, x):
        from aiic_tpu.ops.quant import int8_ln_qkv_attention

        def body(carry, p):
            q = p["attn_q"]
            out = int8_ln_qkv_attention(
                carry, p["ln1"]["scale"], p["ln1"]["bias"],
                q["wqkv_q"], q["sqkv"], p["attn"]["bqkv"], p["attn"]["wo"],
                p["attn"]["bo"], None, heads=config.vision.heads)
            return out, None
        out, _ = jax.lax.scan(body, x, v["blocks"])
        return out.sum(), out

    def mlp_only(v, x):
        from aiic_tpu.ops.quant import int8_ln_mlp

        def body(carry, p):
            q = p["mlp_q"]
            out = int8_ln_mlp(carry, p["ln2"]["scale"], p["ln2"]["bias"],
                              q["w1_q"], q["s1"], p["mlp"]["b1"],
                              q["w2_q"], q["s2"], p["mlp"]["b2"])
            return out, None
        out, _ = jax.lax.scan(body, x, v["blocks"])
        return out.sum(), out

    def tail(v, x):
        h = layer_norm(x[:, 0], v["ln_post"])
        feats = jnp.dot(h, v["proj"].astype(dtype), preferred_element_type=jnp.float32)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats.sum(), feats

    det_text = rng.standard_normal((40, config.embed_dim)).astype(np.float32)
    det_text /= np.linalg.norm(det_text, axis=-1, keepdims=True)
    det_text = jnp.asarray(det_text)
    cat_text = jnp.asarray(rng.standard_normal((5, 304, config.embed_dim)).astype(np.float32))
    cat_mask = jnp.asarray(np.ones((5, 304), bool))

    def full(params, px):
        out = classify_batch(params, px, det_text, cat_text, cat_mask,
                             config=config, interior_count=11, dtype=dtype,
                             attn_impl="pallas")
        return out["interior_mass"].sum() + out["topk_vals"].sum(), out

    print(f"batch={batch} iters={iters}", flush=True)
    je = jax.jit(embed)
    timed(je, (v, pixels), iters, "embed (u8 norm+patchify+pos+ln)")
    timed(jax.jit(attn_only), (v, x_tok), iters, "12x attention half-block int8")
    timed(jax.jit(mlp_only), (v, x_tok), iters, "12x MLP half-block int8")
    timed(jax.jit(towers), (v, x_tok), iters, "12x full blocks (tower scan)")
    timed(jax.jit(tail), (v, x_tok), iters, "pool+proj+norm tail")
    timed(jax.jit(full), (params, pixels), iters, "FULL classify program")


if __name__ == "__main__":
    main()
