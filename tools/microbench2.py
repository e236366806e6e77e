"""Second-round TPU microbenchmarks: ILP-rich u32 chains, dtype converts,
and in-kernel MXU matmuls — informs the MXU-offload Montgomery design.

Questions answered (v5e):
  ilp4/ilp8  — true VPU u32 multiply peak with independent streams
  conv       — cost of u32 <-> f32/bf16 conversions (the MXU on/off ramp)
  dotbf16    — sustained in-kernel bf16 matmul throughput at the skinny
               (64, 32) x (32, B) shapes a Montgomery reduction would use
  dotmix     — matmul chained with elementwise u32 work (overlap check)

Usage: python tools/microbench2.py [name ...]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 16
COLS = 512
REPS = 256


def _ilp_kernel(nstreams):
    def kern(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        xs = [a + jnp.uint32(i) for i in range(nstreams)]
        for _ in range(REPS // nstreams):
            xs = [x * b for x in xs]
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[:] = acc

    return kern, REPS  # multiplies per element


def _conv_kernel(a_ref, b_ref, o_ref):
    # u32 -> f32 -> u32 round trips
    a = a_ref[:]
    acc = jnp.zeros_like(a)
    for _ in range(REPS // 2):
        f = (a & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32)
        acc = acc + f.astype(jnp.int32).astype(jnp.uint32)
    o_ref[:] = acc


def _dot_kernel_factory(n_dots, K=32, M=64):
    def kern(a_ref, w_ref, o_ref):
        # a: (K, COLS) bf16 data, w: (M, K) bf16 const-ish
        a = a_ref[:]
        w = w_ref[:]
        acc = jnp.zeros((M, COLS), jnp.float32)
        for i in range(n_dots):
            acc += jax.lax.dot_general(
                w, a, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            a = (a + jnp.bfloat16(1.0)).astype(jnp.bfloat16)
        o_ref[:] = acc

    return kern


def bench_elem(name, kern, ops_per_elem, dtype=jnp.uint32):
    tiles = 64
    rng = np.random.default_rng(0)
    a = jnp.asarray(
        rng.integers(0, 1 << 12, size=(ROWS, COLS * tiles), dtype=np.uint32)
    ).astype(dtype)
    b = jnp.asarray(
        rng.integers(1, 1 << 12, size=(ROWS, COLS * tiles), dtype=np.uint32)
    ).astype(dtype)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ROWS, COLS * tiles), dtype),
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((ROWS, COLS), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, COLS), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(a, b)

    out = run(a, b)
    jax.device_get(out[0, :1])
    t0 = time.perf_counter()
    n_it = 20
    for _ in range(n_it):
        out = run(a, b)
    jax.device_get(out[0, :1])
    dt = (time.perf_counter() - t0) / n_it
    total = ROWS * COLS * tiles * REPS  # elem-ops of interest
    print(f"{name}: {dt*1e3:.3f} ms -> {total/dt/1e12:.3f} T elem-ops/s")


def bench_dot(name, K=32, M=64, n_dots=64):
    tiles = 64
    kern = _dot_kernel_factory(n_dots, K=K, M=M)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 256, size=(K, COLS * tiles)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(rng.integers(0, 256, size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def run(a, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, COLS * tiles), jnp.float32),
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((K, COLS), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, COLS), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(a, w)

    out = run(a, w)
    jax.device_get(out[0, :1])
    t0 = time.perf_counter()
    n_it = 20
    for _ in range(n_it):
        out = run(a, w)
    jax.device_get(out[0, :1])
    dt = (time.perf_counter() - t0) / n_it
    dots = tiles * n_dots
    macs = dots * M * K * COLS
    print(
        f"{name}: {dt*1e3:.3f} ms -> {macs/dt/1e12:.3f} T MAC/s "
        f"({dots/dt/1e6:.2f} M dots/s of ({M},{K})x({K},{COLS}))"
    )


def main():
    names = sys.argv[1:] or ["ilp4", "ilp8", "conv", "dot64x32", "dot128x128"]
    for n in names:
        if n == "ilp4":
            k, ope = _ilp_kernel(4)
            bench_elem("ilp4 u32 mul", k, ope)
        elif n == "ilp8":
            k, ope = _ilp_kernel(8)
            bench_elem("ilp8 u32 mul", k, ope)
        elif n == "conv":
            bench_elem("u32<->f32 conv", _conv_kernel, REPS)
        elif n == "dot64x32":
            bench_dot("dot (64,32)", K=32, M=64, n_dots=64)
        elif n == "dot128x128":
            bench_dot("dot (128,128)", K=128, M=128, n_dots=16)


if __name__ == "__main__":
    main()
