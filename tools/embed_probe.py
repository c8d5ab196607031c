"""Probe alternative patch-embed formulations on the chip.

The embed head (u8 normalize + patchify + matmul + cls/pos + ln_pre) costs
~5 ms of the ~49 ms serving step at B=256 — almost all of it the 6-D
patchify transpose (reference equivalent: the conv16 stem inside
clip.load("ViT-B/16"), main.py:152). This probe times:

  A. current: reshape + transpose(0,1,3,5,2,4) + (B*196,768)@(768,768)
  B. dot_general contracting (r, f) dims directly (no explicit transpose;
     weight pre-permuted to (16, 48, 768))
  C. 16 slice-matmuls: sum_r X[:,:,r] @ W_r with X a pure reshape
     (B,14,16,14*48) — no activation transpose at all

    python tools/embed_probe.py [batch] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from aiic_tpu.models import VIT_B_16, init_clip_params
    from aiic_tpu.models.clip import layer_norm, patchify
    from aiic_tpu.ops.preprocess import normalize_u8

    config = VIT_B_16
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dtype = jnp.bfloat16
    P = config.patch_size            # 16
    G = 224 // P                     # 14

    params = init_clip_params(jax.random.PRNGKey(0), config)
    v = jax.tree.map(lambda x: jnp.asarray(x, dtype), params["visual"])

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8))

    w = v["patch_embed"]             # (768 = c*256 + r*16 + kw, 768)
    # permuted weight: w2[r, kw*3 + c, :] = w[c*256 + r*16 + kw, :]
    idx = np.zeros((P, P * 3), np.int32)
    for r in range(P):
        for kw in range(P):
            for c in range(3):
                idx[r, kw * 3 + c] = c * 256 + r * 16 + kw
    w2 = w[idx.reshape(-1)].reshape(P, P * 3, -1)  # (16, 48, 768)

    def head(x, v):
        cls = jnp.broadcast_to(v["cls"].astype(dtype), (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1) + v["pos"].astype(dtype)
        return layer_norm(x, v["ln_pre"])

    def embed_a(v, px):
        x = patchify(normalize_u8(px).astype(dtype), P)
        x = jnp.dot(x, v["patch_embed"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        x = head(x, v)
        return x.sum(), x

    def embed_b(v, w2, px):
        xn = normalize_u8(px).astype(dtype)              # (B,224,224,3)
        x5 = xn.reshape(batch, G, P, G, P * 3)           # pure reshape
        out = jax.lax.dot_general(
            x5, w2.astype(dtype),
            dimension_numbers=(((2, 4), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (B, 14, 14, 768)
        x = out.reshape(batch, G * G, -1).astype(dtype)
        x = head(x, v)
        return x.sum(), x

    def embed_c(v, w2, px):
        xn = normalize_u8(px).astype(dtype)
        x5 = xn.reshape(batch, G, P, G * P * 3 // 1)     # (B,14,16,672)
        x5 = x5.reshape(batch, G, P, G, P * 3)
        acc = jnp.zeros((batch, G, G, w2.shape[-1]), jnp.float32)
        for r in range(P):
            xr = x5[:, :, r, :, :]                       # (B,14,14,48)
            acc = acc + jax.lax.dot_general(
                xr, w2[r].astype(dtype),
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        x = acc.reshape(batch, G * G, -1).astype(dtype)
        x = head(x, v)
        return x.sum(), x

    INNER = 16  # in-jit repeats: dwarf the ~30 ms dispatch RTT

    def repeat(fn):
        # i-dependent input defeats CSE; accumulated sum forces each iter
        def body(i, acc):
            s, _ = fn(jnp.bitwise_xor(pixels, i.astype(jnp.uint8)))
            return acc + s.astype(jnp.float32)
        return lambda: jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

    def timed(fn, args, tag):
        s, out = fn(*args)
        float(s.astype(jnp.float32))
        rep = jax.jit(repeat(lambda px: fn(*args[:-1], px)))
        float(rep())
        t0 = time.perf_counter()
        for _ in range(iters):
            float(rep())
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag:44s} {(dt / INNER) * 1e3:8.2f} ms/call  (loop {dt*1e3:.1f} ms)",
              flush=True)
        return out

    print(f"batch={batch} iters={iters} backend={jax.default_backend()}", flush=True)
    # D: XLA native conv stem (the reference's actual Conv2d form) — TPU
    # convs lower to implicit im2col on the MXU, possibly skipping the
    # explicit relayout the reshape+transpose patchify pays.
    wc = w.reshape(3, P, P, -1)                      # (c, kh, kw, out)
    wc = jnp.transpose(wc, (1, 2, 0, 3))             # HWIO

    def embed_d(v, wc, px):
        xn = normalize_u8(px).astype(dtype)          # (B,224,224,3) NHWC
        out = jax.lax.conv_general_dilated(
            xn, wc.astype(dtype), window_strides=(P, P), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )                                            # (B,14,14,768)
        x = out.reshape(batch, G * G, -1).astype(dtype)
        x = head(x, v)
        return x.sum(), x

    oa = timed(lambda vv, px: jax.jit(embed_a)(vv, px), (v, pixels), "A current (transpose patchify)")
    ob = timed(lambda vv, ww, px: jax.jit(embed_b)(vv, ww, px), (v, w2, pixels), "B dot_general (r,f) contraction")
    oc = timed(lambda vv, ww, px: jax.jit(embed_c)(vv, ww, px), (v, w2, pixels), "C 16 slice-matmuls")
    od = timed(lambda vv, ww, px: jax.jit(embed_d)(vv, ww, px), (v, wc, pixels), "D XLA conv stem (NHWC, stride 16)")
    na = np.asarray(oa.astype(jnp.float32))
    for tag, o in (("B", ob), ("C", oc), ("D", od)):
        d = np.abs(np.asarray(o.astype(jnp.float32)) - na).max()
        print(f"max |{tag}-A| = {d:.5f}")


if __name__ == "__main__":
    main()
