"""Train-step component profile (in-jit chained repeats, B configurable).

Attributes the train step's time (169.9 ms at B=256 bf16) across:
  image-fwd      frozen image tower forward, bf16 Pallas (the serving path)
  image-int8     same with the int8 serving numerics (quantize_image)
  text-fwdbwd    text tower fwd + bwd through the LoRA adapters + optimizer
  full           the production train step
  full-int8      train step with quantize_image

    python tools/train_profile.py [batch] [iters] [inner]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from aiic_tpu.adapters import LoRAConfig
    from aiic_tpu.adapters.lora import init_text_lora
    from aiic_tpu.models import VIT_B_16, init_clip_params
    from aiic_tpu.models.clip import encode_image, encode_text, normalize_features
    from aiic_tpu.ops.quant import quantize_model
    from aiic_tpu.train.trainer import TrainConfig, contrastive_loss, make_optimizer, make_train_step

    config = VIT_B_16
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    inner = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32), jnp.bfloat16)
    tokens = jnp.asarray(rng.integers(1, 49400, (batch, 77)).astype(np.int32))

    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    qparams = quantize_model(params)
    cfg = TrainConfig(epochs=1, batch_size=batch, rank=16, alpha=32, dtype=jnp.bfloat16)
    lora = init_text_lora(jax.random.PRNGKey(1), config,
                          LoRAConfig(cfg.rank, cfg.alpha, cfg.attach))
    lora = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), lora)
    optimizer = make_optimizer(cfg, steps_per_epoch=10)
    opt_state = optimizer.init(lora)

    def timed(tag, fn, *args):
        @jax.jit
        def loop(*a):
            def body(i, c):
                return fn(*a, jnp.float32(i) * 0 + c)
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))
        out = float(loop(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = float(loop(*args))
        dt = (time.perf_counter() - t0) / iters / inner
        print(f"{tag:14s} {dt * 1e3:8.2f} ms/step   (last={out:.4f})", flush=True)
        return dt

    def image_fwd(p, x, c):
        # genuine carry dependence (c*0 would fold and let XLA hoist the body)
        f = normalize_features(
            encode_image(p, x + c.astype(x.dtype) * jnp.asarray(1e-8, x.dtype),
                         config, dtype=jnp.bfloat16, attn_impl="auto"))
        return f.astype(jnp.float32).sum()

    scaling = cfg.alpha / cfg.rank

    def text_fwdbwd(p, t, lt, os_, img_feats, c):
        lt_c = jax.tree.map(lambda l: l + c * 1e-12, lt)  # carry dependence
        def loss_fn(lora_tree):
            txt = normalize_features(
                encode_text(p, t, config, dtype=jnp.bfloat16, attn_impl="xla",
                            lora=lora_tree, lora_scaling=scaling))
            return contrastive_loss(img_feats, txt, p["logit_scale"])
        loss, grads = jax.value_and_grad(loss_fn)(lt_c)
        updates, _ = optimizer.update(grads, os_, lt_c)
        leaves = jax.tree.leaves(optax.apply_updates(lt_c, updates))
        return loss + sum(l.astype(jnp.float32).sum() * 0 for l in leaves)

    train_step, _ = make_train_step(config, cfg, optimizer)
    cfg_q = TrainConfig(epochs=1, batch_size=batch, rank=16, alpha=32,
                        dtype=jnp.bfloat16, quantize_image=True)
    train_step_q, _ = make_train_step(config, cfg_q, optimizer)

    def full(p, x, t, lt, os_, c):
        loss, lt2, _ = train_step(
            p, lt, os_, x + c.astype(x.dtype) * jnp.asarray(1e-8, x.dtype), t,
            jax.random.PRNGKey(0))
        return loss

    def full_q(p, x, t, lt, os_, c):
        loss, lt2, _ = train_step_q(
            p, lt, os_, x + c.astype(x.dtype) * jnp.asarray(1e-8, x.dtype), t,
            jax.random.PRNGKey(0))
        return loss

    img_feats = jnp.asarray(
        rng.standard_normal((batch, config.embed_dim)).astype(np.float32))
    img_feats = img_feats / jnp.linalg.norm(img_feats, axis=-1, keepdims=True)
    img_feats = img_feats.astype(jnp.bfloat16)

    print(f"batch={batch} iters={iters} inner={inner} backend={jax.default_backend()}", flush=True)
    timed("image-fwd", image_fwd, params, pixels)
    timed("image-int8", image_fwd, qparams, pixels)
    timed("text-fwdbwd", text_fwdbwd, params, tokens, lora, opt_state, img_feats)
    timed("full", full, params, pixels, tokens, lora, opt_state)
    timed("full-int8", full_q, qparams, pixels, tokens, lora, opt_state)


if __name__ == "__main__":
    main()
