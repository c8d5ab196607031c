"""Benchmark: batched inference throughput on the real chip.

Measures the fused classify program (image encode + detector rule +
per-category top-5) — BASELINE.json config #2's hot path — bf16 compute.

Headline metric: images/sec/chip for the device-resident program (the chip's
sustained inference throughput). The host->device path in this container runs
through a loopback relay at a few hundred MB/s — two orders of magnitude below
a production PCIe/DMA host link — so the end-to-end uint8-input pipelined
number is also measured and logged to stderr for context, but the chip
metric is the headline.

NOTE on timing: on this backend ``block_until_ready`` returns before remote
execution completes; every timed step therefore fetches a reduced scalar,
which forces full execution + result readback.

Prints exactly ONE JSON line:
  {"metric": "images_per_sec_per_chip", "value": N, "unit": "img/s",
   "vs_baseline": N / 5000.0}
(baseline bar: >=5,000 img/s/chip on v5e, BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from aiic_tpu.engine.detector import DETECTOR_CATEGORIES, INTERIOR_COUNT
    from aiic_tpu.engine.programs import classify_batch
    from aiic_tpu.models import (
        VIT_B_16, VIT_B_32, VIT_L_14, VIT_L_14_336, init_clip_params,
    )

    # AIIC_BENCH_MODEL: vit_b_16 (default; the reference's flagship and the
    # headline metric), vit_b_32, or vit_l_14 (framework-generality bench —
    # exercises the chunked int8 MLP kernel and G=1 attention at S=257).
    model = os.environ.get("AIIC_BENCH_MODEL", "vit_b_16")
    config = {"vit_b_16": VIT_B_16, "vit_b_32": VIT_B_32,
              "vit_l_14": VIT_L_14, "vit_l_14_336": VIT_L_14_336}[model]
    # Grid amortization: B=512 measured +2.6% over B=256 (6008 vs 5857
    # img/s pipelined), B=1024 another +0.9% (6049 vs 5996), B=2048
    # (round 4) another +2.9% (6,236/6,251/6,256 across three runs vs
    # 6,070-6,079 at B=1024), and B=4096 (round 5) 6,269-6,274 across
    # runs — above the full B=2048 band; single-image p50 is measured
    # separately and unaffected by this default.
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dtype = jnp.bfloat16

    log(f"backend={jax.default_backend()} devices={jax.devices()} "
        f"batch={batch} model={config.name}")

    params = init_clip_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    # Serving configuration: Pallas fused attention + int8 MLP weights
    # (dynamic per-row activation quant). Feature cosine vs the bf16 path is
    # 0.9999 (tested) — above the BASELINE >=0.999 agreement bar. Set
    # AIIC_BENCH_INT8=0 to bench the pure-bf16 path.
    # AIIC_BENCH_INT8: "0" = pure bf16, "1" = int8 MLP only, "2"/default =
    # int8 MLP + attention projections (the serving config; parity-gated in
    # tests/test_parity_torch.py::test_serving_config_compound_parity).
    int8_level = os.environ.get("AIIC_BENCH_INT8", "2")
    if int8_level == "1":
        from aiic_tpu.ops.quant import quantize_model_mlp

        params = quantize_model_mlp(params)
        log("int8 MLP weights active")
    elif int8_level != "0":
        from aiic_tpu.ops.quant import quantize_model

        params = quantize_model(params)
        log("int8 MLP + attention-projection weights active (AIIC_BENCH_INT8=0 bf16, =1 MLP-only)")

    # AIIC_WIRE: "patch" (default) = patch-major uint8 wire format —
    # normalization folds into the embed matmul (ops.preprocess.
    # patch_norm_constants; embed 9.3 -> 5.5 ms at B=1024, +2.3% full
    # program); "hwc" = uint8 (B,S,S,3) with the on-device normalize pass.
    # Production ingest supports both (InteriorAnalyzer(wire_format=...)).
    wire = os.environ.get("AIIC_WIRE", "patch")
    rng = np.random.default_rng(0)
    det_text = rng.standard_normal((len(DETECTOR_CATEGORIES), config.embed_dim)).astype(np.float32)
    det_text /= np.linalg.norm(det_text, axis=-1, keepdims=True)
    det_text = jnp.asarray(det_text)
    cat_text = jnp.asarray(rng.standard_normal((5, 304, config.embed_dim)).astype(np.float32))
    cat_mask = jnp.asarray(np.ones((5, 304), bool))

    def program(params, pixels, det_text, cat_text, cat_mask):
        out = classify_batch(
            params, pixels, det_text, cat_text, cat_mask,
            config=config, interior_count=INTERIOR_COUNT, dtype=dtype, attn_impl="auto",
        )
        # reduced scalar output forces full execution when fetched
        sync = out["interior_mass"].sum() + out["topk_vals"].sum()
        return out, sync

    classify = jax.jit(program)

    # --- device-resident throughput (headline: chip compute) -------------
    if wire == "patch":
        from aiic_tpu.ops.preprocess import to_patch_major

        log("patch-major uint8 wire format active (AIIC_WIRE=hwc for the HWC wire)")

        def make_batch(n):
            hwc = rng.integers(
                0, 256, (n, config.image_size, config.image_size, 3), dtype=np.uint8)
            return to_patch_major(hwc, config.patch_size)
    else:
        def make_batch(n):
            return rng.integers(
                0, 256, (n, config.image_size, config.image_size, 3), dtype=np.uint8)

    dev_batches = [jnp.asarray(make_batch(batch)) for _ in range(4)]
    _, s = classify(params, dev_batches[0], det_text, cat_text, cat_mask)
    t0 = time.perf_counter()
    float(s)
    log(f"first call (compile+run): {time.perf_counter() - t0:.1f}s")
    for b in dev_batches:
        _, s = classify(params, b, det_text, cat_text, cat_mask)
        float(s)

    t0 = time.perf_counter()
    for i in range(iters):
        _, s = classify(params, dev_batches[i % 4], det_text, cat_text, cat_mask)
        float(s)  # hard sync
    dt = time.perf_counter() - t0
    ips_synced = batch * iters / dt
    log(f"device-resident synced: {iters}x{batch} in {dt:.3f}s -> {ips_synced:.1f} img/s")

    # steady-state serving pattern: keep 3 dispatches in flight, fetch oldest
    # (amortizes the relay's fixed per-dispatch round trip)
    from collections import deque

    pend = deque()
    for i in range(3):
        _, s = classify(params, dev_batches[i % 4], det_text, cat_text, cat_mask)
        pend.append(s)
    t0 = time.perf_counter()
    for i in range(2 * iters):
        _, s = classify(params, dev_batches[i % 4], det_text, cat_text, cat_mask)
        pend.append(s)
        float(pend.popleft())
    dt = time.perf_counter() - t0
    ips_device = batch * 2 * iters / dt
    log(f"device-resident pipelined: {2*iters}x{batch} in {dt:.3f}s -> {ips_device:.1f} img/s")

    # --- end-to-end with uint8 host batches, pipelined -------------------
    # context metric only (the relay moves ~45 MB/s); scale the iteration
    # count down at large batches so this leg doesn't dominate bench wall
    # time (10x2048 uploads took ~200 s)
    h_iters = max(2, min(iters, (10 * 1024) // batch))
    host_batches = [make_batch(batch) for _ in range(4)]
    # warm the transfer path
    _, s = classify(params, jnp.asarray(host_batches[0]), det_text, cat_text, cat_mask)
    float(s)
    t0 = time.perf_counter()
    syncs = []
    for i in range(h_iters):
        _, s = classify(params, jnp.asarray(host_batches[i % 4]), det_text, cat_text, cat_mask)
        syncs.append(s)  # keep in flight: overlap transfer with compute
    for s in syncs:
        float(s)
    dt = time.perf_counter() - t0
    ips_e2e = batch * h_iters / dt
    log(f"host-uint8 pipelined: {h_iters}x{batch} in {dt:.3f}s -> {ips_e2e:.1f} img/s "
        "(loopback-relay transfer bound in this container)")

    # --- p50 single-image latency (BASELINE tracked metric) --------------
    one = jnp.asarray(make_batch(1))
    _, s = classify(params, one, det_text, cat_text, cat_mask)
    float(s)
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        _, s = classify(params, one, det_text, cat_text, cat_mask)
        float(s)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50_ms = lat[len(lat) // 2] * 1e3
    log(f"p50 single-image latency: {p50_ms:.1f} ms "
        f"(p90 {lat[int(len(lat)*0.9)]*1e3:.1f} ms)")

    # Split transport from device time (round-3 VERDICT weak #4): in this
    # container every dispatch+fetch pays a ~30 ms loopback-relay round trip
    # that swamps the device-side latency. A null program (one scalar op on a
    # resident array) measures that fixed transport cost; subtracting its p50
    # estimates the device-only single-image latency a direct-attached host
    # would see.
    null = jax.jit(lambda x: x * 2.0 + 1.0)
    tiny = jnp.zeros(())
    float(null(tiny))
    rtts = []
    for _ in range(20):
        t0 = time.perf_counter()
        float(null(tiny))
        rtts.append(time.perf_counter() - t0)
    rtts.sort()
    rtt_ms = rtts[len(rtts) // 2] * 1e3
    p50_device_ms = max(p50_ms - rtt_ms, 0.0)
    log(f"p50 split: transport-inclusive {p50_ms:.1f} ms = relay RTT "
        f"{rtt_ms:.1f} ms + device-only ~{p50_device_ms:.1f} ms")

    print(json.dumps({
        "metric": "images_per_sec_per_chip",
        "value": round(ips_device, 1),
        "unit": "img/s",
        "vs_baseline": round(ips_device / 5000.0, 4),
        "p50_ms": round(p50_ms, 1),
        "p50_device_ms": round(p50_device_ms, 1),
    }))


if __name__ == "__main__":
    main()
