"""MXU rate probe: is int8 actually double-pumping on this chip?

Times three minimal Pallas matmul kernels at the MLP geometry
((256,768) @ (768,3072), grid-repeated): bf16 operands, int8 operands
straight from VMEM, and int8 with in-kernel dynamic quantization of a bf16
activation. Prints effective TFLOP/s for each.

    python tools/mxu_probe.py [reps]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    R, W, M = 128, 768, 3072
    STEPS = 64
    INNER = 64  # dots per grid step: compute must dwarf the ~35 ms relay RTT

    rng = np.random.default_rng(0)
    x_bf = jnp.asarray(rng.standard_normal((STEPS * R, W)), jnp.bfloat16)
    x_i8 = jnp.asarray(rng.integers(-127, 127, (STEPS * R, W)), jnp.int8)
    w_bf = jnp.asarray(rng.standard_normal((W, M)) * 0.05, jnp.bfloat16)
    w_i8 = jnp.asarray(rng.integers(-127, 127, (W, M)), jnp.int8)

    def k_bf16(x_ref, w_ref, o_ref):
        # fori_loop keeps one iteration's temps live; i-dependent lhs defeats CSE
        def body(i, acc):
            x = x_ref[:] + i.astype(jnp.bfloat16)
            return acc + jax.lax.dot_general(
                x, w_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
        acc = jax.lax.fori_loop(0, INNER, body, jnp.zeros((R, M), jnp.float32))
        o_ref[:] = acc.astype(jnp.bfloat16)

    def k_i8(x_ref, w_ref, o_ref):
        def body(i, acc):
            x = x_ref[:] ^ i.astype(jnp.int8)
            return acc + jax.lax.dot_general(
                x, w_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT,
            )
        o_ref[:] = jax.lax.fori_loop(0, INNER, body, jnp.zeros((R, M), jnp.int32))

    def k_i8_quant(x_ref, w_ref, o_ref):
        def body(i, acc):
            xf = x_ref[:].astype(jnp.float32) + i.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            scale = jnp.maximum(amax, 1e-6) / 127.0
            q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
            a = jax.lax.dot_general(
                q, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT,
            )
            return acc + a.astype(jnp.float32) * scale
        acc = jax.lax.fori_loop(0, INNER, body, jnp.zeros((R, M), jnp.float32))
        o_ref[:] = acc.astype(jnp.bfloat16)

    def build(kernel, x, odtype):
        return jax.jit(lambda xx, ww: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((STEPS * R, M), odtype),
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((W, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(xx, ww))

    flops = 2 * STEPS * R * W * M * INNER

    def bench(tag, fn, x, w):
        out = fn(x, w)
        float(jnp.sum(out[0, :8].astype(jnp.float32)))  # compile+sync
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(x, w)
            float(jnp.sum(out[0, :8].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / reps
        print(f"{tag:24s} {dt * 1e3:8.2f} ms   {flops / dt / 1e12:7.1f} TFLOP/s")

    print(f"probe: ({R},{W})@({W},{M}) x {STEPS} steps, reps={reps}")
    bench("bf16 x bf16 -> f32", build(k_bf16, x_bf, jnp.bfloat16), x_bf, w_bf)
    bench("s8 x s8 -> s32", build(k_i8, x_i8, jnp.int32), x_i8, w_i8)
    bench("bf16->quant->s8 matmul", build(k_i8_quant, x_bf, jnp.bfloat16), x_bf, w_i8)


if __name__ == "__main__":
    main()
