"""TPU VPU microbenchmarks for uint32 ops — informs the Poseidon2 kernel design.

Measures sustained throughput of elementwise u32 multiply / add / shift /
select chains inside a fused Pallas kernel, i.e. the primitive budget of
any limb-plane field-arithmetic design (SURVEY.md §7 hard part (a)).

Usage: python tools/microbench.py [mul|add|mix|montstep]
"""

from __future__ import annotations

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


ROWS = 16
COLS = 512
REPS = 512  # chained op-groups inside the kernel


def _mul_kernel(a_ref, b_ref, o_ref):
    a = a_ref[:]
    b = b_ref[:]
    for _ in range(REPS):
        a = a * b
        b = b + a  # keep values changing so nothing folds
    o_ref[:] = a + b


def _add_kernel(a_ref, b_ref, o_ref):
    a = a_ref[:]
    b = b_ref[:]
    for _ in range(REPS):
        a = a + b
        b = b ^ a
    o_ref[:] = a + b


def _mix_kernel(a_ref, b_ref, o_ref):
    # representative mont_mul step mix: 2 mults : 8 add/logic
    a = a_ref[:]
    b = b_ref[:]
    for _ in range(REPS // 4):
        t = a * b
        q = b * a
        a = (t & jnp.uint32(0xFFFF)) + (q >> 16)
        b = (b + (t >> 16)) ^ (q & jnp.uint32(0xFFFF))
        a = a + b
        b = b + t
        a = a ^ q
        b = b + a
        a = a + q
        b = b ^ t
    o_ref[:] = a + b


KERNELS = {"mul": (_mul_kernel, 2), "add": (_add_kernel, 2), "mix": (_mix_kernel, 10 / 4)}


@functools.partial(jax.jit, static_argnames=("name", "tiles"))
def run(a, b, name: str, tiles: int):
    kern = KERNELS[name][0]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS * tiles), jnp.uint32),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((ROWS, COLS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, COLS), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(a, b)


def main():
    names = sys.argv[1:] or ["mul", "add", "mix"]
    tiles = 64
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(ROWS, COLS * tiles), dtype=np.uint32))
    b = jnp.asarray(rng.integers(1, 1 << 16, size=(ROWS, COLS * tiles), dtype=np.uint32))
    for name in names:
        ops_per_group = KERNELS[name][1]
        out = run(a, b, name, tiles)
        jax.device_get(out[0, :1])  # compile+warm
        t0 = time.perf_counter()
        n_it = 20
        for _ in range(n_it):
            out = run(a, b, name, tiles)
        jax.device_get(out[0, :1])
        dt = (time.perf_counter() - t0) / n_it
        total_ops = ROWS * COLS * tiles * REPS * ops_per_group
        print(f"{name}: {dt*1e3:.3f} ms -> {total_ops/dt/1e12:.3f} Tops/s (u32)")


if __name__ == "__main__":
    main()
