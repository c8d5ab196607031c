"""Interleaved A/B of the CLS-last-block specialization (AIIC_CLS_LAST).

The back-to-back bench.py A/B runs disagreed with the original 3-rep
measurement (+2.0% vs -0.7%), which is the signature of slow chip-state
drift between processes. This probe compiles BOTH variants in one process
and interleaves timed reps, so each rep pair sees the same chip state.

Usage: python tools/cls_ab_probe.py [batch=1024] [iters=10] [reps=6]
Env: AIIC_BENCH_MODEL (default vit_b_16), AIIC_BENCH_INT8 (default 2).
Prints per-rep img/s for cls=1 / cls=0 and the median delta.
"""

import os
import statistics
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from aiic_tpu.engine.detector import DETECTOR_CATEGORIES, INTERIOR_COUNT
    from aiic_tpu.engine.programs import classify_batch
    from aiic_tpu.models import (
        VIT_B_16, VIT_B_32, VIT_L_14, VIT_L_14_336, init_clip_params,
    )
    from aiic_tpu.ops.preprocess import to_patch_major
    from aiic_tpu.ops.quant import quantize_model

    model = os.environ.get("AIIC_BENCH_MODEL", "vit_b_16")
    config = {"vit_b_16": VIT_B_16, "vit_b_32": VIT_B_32,
              "vit_l_14": VIT_L_14, "vit_l_14_336": VIT_L_14_336}[model]
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    if os.environ.get("AIIC_BENCH_INT8", "2") != "0":
        params = quantize_model(params)

    rng = np.random.default_rng(0)
    det_text = rng.standard_normal(
        (len(DETECTOR_CATEGORIES), config.embed_dim)).astype(np.float32)
    det_text /= np.linalg.norm(det_text, axis=-1, keepdims=True)
    det_text = jnp.asarray(det_text)
    cat_text = jnp.asarray(
        rng.standard_normal((5, 304, config.embed_dim)).astype(np.float32))
    cat_mask = jnp.asarray(np.ones((5, 304), bool))

    def program(params, pixels, det_text, cat_text, cat_mask):
        out = classify_batch(
            params, pixels, det_text, cat_text, cat_mask,
            config=config, interior_count=INTERIOR_COUNT,
            dtype=jnp.bfloat16, attn_impl="auto",
        )
        return out["interior_mass"].sum() + out["topk_vals"].sum()

    dev_batches = [
        jnp.asarray(to_patch_major(
            rng.integers(0, 256,
                         (batch, config.image_size, config.image_size, 3),
                         dtype=np.uint8),
            config.patch_size))
        for _ in range(4)
    ]

    fns = {}
    for flag in ("1", "0"):
        # Env is read at trace time (models/clip.py), so two jit objects
        # traced under different values coexist in one process.
        os.environ["AIIC_CLS_LAST"] = flag
        f = jax.jit(program)
        t0 = time.perf_counter()
        float(f(params, dev_batches[0], det_text, cat_text, cat_mask))
        print(f"cls={flag} compile+run {time.perf_counter() - t0:.1f}s",
              flush=True)
        fns[flag] = f

    results = {"1": [], "0": []}
    for rep in range(reps):
        for flag in ("1", "0") if rep % 2 == 0 else ("0", "1"):
            f = fns[flag]
            # warm
            for b in dev_batches:
                float(f(params, b, det_text, cat_text, cat_mask))
            t0 = time.perf_counter()
            for i in range(iters):
                float(f(params, dev_batches[i % 4], det_text, cat_text,
                        cat_mask))
            ips = batch * iters / (time.perf_counter() - t0)
            results[flag].append(ips)
            print(f"rep {rep} cls={flag}: {ips:.1f} img/s", flush=True)

    m1 = statistics.median(results["1"])
    m0 = statistics.median(results["0"])
    print(f"median cls=1 {m1:.1f} | cls=0 {m0:.1f} | "
          f"delta {100 * (m1 / m0 - 1):+.2f}%")


if __name__ == "__main__":
    main()
