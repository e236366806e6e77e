"""Limb-plane Fr arithmetic vs the python-int oracle (CPU, jitted).

First run pays one-time XLA compiles (cached persistently via
JAX_COMPILATION_CACHE_DIR set in conftest).
"""

import random

import jax
import pytest

from codex_storage_proofs_circuits_tpu.fields import bn254 as F
from codex_storage_proofs_circuits_tpu.ops import limbs as L


@pytest.fixture(scope="module")
def cases():
    random.seed(11)
    xs = [0, 1, F.P - 1, F.P - 2, 1 << 128] + [random.randrange(F.P) for _ in range(27)]
    ys = [1, 0, F.P - 1, 12345, (1 << 250) % F.P] + [
        random.randrange(F.P) for _ in range(27)
    ]
    return xs, ys


def test_pack_unpack_roundtrip(cases):
    xs, _ = cases
    assert L.unpack(L.pack(xs)) == xs


def test_add_sub_mod(cases):
    xs, ys = cases
    a, b = L.pack(xs), L.pack(ys)
    add = L.unpack(jax.jit(L.add_mod)(a, b))
    sub = L.unpack(jax.jit(L.sub_mod)(a, b))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert add[i] == (x + y) % F.P
        assert sub[i] == (x - y) % F.P


def test_mont_mul_and_conversions(cases):
    xs, ys = cases
    a = L.pack(xs)
    am, bm = L.pack([F.to_mont(x) for x in xs]), L.pack([F.to_mont(y) for y in ys])
    mul = L.unpack(jax.jit(L.mont_mul)(am, bm))
    tm = L.unpack(jax.jit(L.to_mont)(a))
    fm = L.unpack(jax.jit(L.from_mont)(am))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert mul[i] == F.to_mont(x * y % F.P)
        assert tm[i] == F.to_mont(x)
        assert fm[i] == x
