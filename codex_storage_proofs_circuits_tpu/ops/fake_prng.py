"""Device-side fake-data PRNG: bit-exact uint64 recurrence on limb planes.

The reference mock backend (reference/nim/proof_input/src/slot.nim:22-32,
== Slot.hs:87-96) steps, per byte, a uint64 state with deliberate wraparound
and a final `mod 1698428844001831`.  Sequential along the byte axis,
independent across cells — so on TPU it runs as a lax.scan over byte steps
with the whole cell batch on lanes, emitting one byte row per step.  This
keeps data generation on-chip: no host PRNG, no host->device transfer of
cell bytes (the dominant slot-build cost on tunneled hosts: measured
36 MB/s upload vs ~0.08 s/chunk fused hashing).

uint64 values are (4, B) uint32 planes of 16-bit limbs (little-endian).
All products are 16x16->32, exact in uint32; the modulo is Barrett with a
14-bit approximate quotient.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..oracle.slot import FAKE_MODULUS

U32 = jnp.uint32
MASK = 0xFFFF
NL = 4

_M = FAKE_MODULUS  # 1698428844001831 < 2^51
_MU = (1 << 101) // _M  # Barrett reciprocal, < 2^51
_M_LIMBS = [(_M >> (16 * i)) & MASK for i in range(4)]
_MU_LIMBS = [(_MU >> (16 * i)) & MASK for i in range(4)]


def _const_planes(x: int, n: int = NL) -> np.ndarray:
    return np.array([(x >> (16 * i)) & MASK for i in range(n)], np.uint32).reshape(
        n, 1
    )


def _ripple(cols, n_out: int):
    outs = []
    carry = jnp.zeros_like(cols[0])
    for i in range(n_out):
        c = (cols[i] if i < len(cols) else carry * 0) + carry
        outs.append(c & MASK)
        carry = c >> 16
    return outs


def _add64(a, b):
    """(a + b) mod 2^64 on 4-limb lists."""
    return _ripple([a[i] + b[i] for i in range(4)], 4)


def _xor64(a, b):
    return [a[i] ^ b[i] for i in range(4)]


def _mul64(a, b):
    """(a * b) mod 2^64: lower 4 limb columns of the product."""
    cols = [None] * 4
    for i in range(4):
        for j in range(4 - i):
            p = a[i] * b[j]
            k = i + j
            cols[k] = p & MASK if cols[k] is None else cols[k] + (p & MASK)
            if k + 1 < 4:
                hi = p >> 16
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    return _ripple(cols, 4)


def _mul_wide(a, b, na: int, nb: int, n_out: int):
    """Full product of na-limb x nb-limb values, n_out limb columns."""
    cols = [jnp.zeros_like(a[0]) for _ in range(n_out)]
    for i in range(na):
        for j in range(nb):
            if i + j >= n_out:
                continue
            p = a[i] * b[j]
            cols[i + j] = cols[i + j] + (p & MASK)
            if i + j + 1 < n_out:
                cols[i + j + 1] = cols[i + j + 1] + (p >> 16)
    return _ripple(cols, n_out)


def _mod_m(v):
    """v (4 limbs, < 2^64) mod _M via Barrett: q = ((v >> 50) * MU) >> 51,
    q <= floor(v/M) <= q + 2, so two conditional subtracts finish.

    q itself is a SINGLE 16-bit limb: floor(v/M) < 2^64 / 2^50.59 < 2^13.5,
    so q*M is a 1x4 product (4 multiplies), not the 4x4 the first version
    paid (~17% of the whole PRNG step)."""
    top = (v[3] >> 2) & 0x3FFF  # v >> 50 (14 bits: limb 3 bits 2..15)
    mu = [jnp.full_like(v[0], l) for l in _MU_LIMBS]
    prod = _mul_wide([top], mu, 1, 4, 5)  # top * MU, < 2^65
    # >> 51 = drop 3 limbs then >> 3; bits 51..64 live in limbs 3..4
    q = ((prod[3] >> 3) | (prod[4] << 13)) & MASK  # one limb, < 2^14
    m = [jnp.full_like(v[0], l) for l in _M_LIMBS]
    qm = _mul_wide([q], m, 1, 4, 5)  # q*M <= v < 2^64 (+ slack limb)
    # r = v - q*M, in [0, 3M): borrow-ripple subtract then 2 cond-subs
    r = []
    borrow = jnp.zeros_like(v[0])
    for i in range(4):
        d = v[i] - qm[i] - borrow
        r.append(d & MASK)
        borrow = (d >> 31) & 1
    for _ in range(2):
        r = _cond_sub_m(r)
    return r


def _cond_sub_m(a):
    """a - M where a >= M else a (a < 2^64)."""
    gt = jnp.zeros(a[0].shape, bool)
    eq = jnp.ones(a[0].shape, bool)
    for i in range(3, -1, -1):
        gt = gt | (eq & (a[i] > _M_LIMBS[i]))
        eq = eq & (a[i] == _M_LIMBS[i])
    do = (gt | eq).astype(U32)
    out = []
    borrow = jnp.zeros_like(a[0])
    for i in range(4):
        d = a[i] - do * _M_LIMBS[i] - borrow
        out.append(d & MASK)
        borrow = (d >> 31) & 1
    return out


import functools


@functools.partial(jax.jit, static_argnames=("n_steps",))
def _gen_scan(seed1_planes, seed2_planes, n_steps: int):
    """seed planes (4, B); returns (n_steps, B) uint8 byte rows.

    The byte recurrence is strictly sequential per cell, so it runs as a
    scan with the cell batch on lanes.  Each scan iteration unrolls
    several recurrence steps (the largest power of two dividing n_steps,
    capped at 8): same total arithmetic, but 8x fewer loop iterations —
    the per-step ops are tiny (4, B) planes, so loop/dispatch overhead and
    the serial dependence chain dominate at K=1."""
    s1 = [seed1_planes[i] for i in range(4)]
    s2 = [seed2_planes[i] for i in range(4)]
    xor_c = [jnp.full_like(s1[0], l) for l in [0x5A5A, 0x5A5A, 0, 0]]
    c17 = [jnp.full_like(s1[0], l) for l in [17, 0, 0, 0]]
    one = [jnp.full_like(s1[0], l) for l in [1, 0, 0, 0]]
    s2p17 = _add64(s2, c17)

    # XLA:TPU compiles the unrolled body fine; XLA:CPU compile time explodes
    # superlinearly with body size (k=4 took 94 s on a 2-core host), so the
    # portable path keeps k=1.  All k values are bit-exact (same arithmetic).
    default_k = 8 if jax.default_backend() == "tpu" else 1
    k_max = int(os.environ.get("CSPC_PRNG_UNROLL", str(default_k)))
    k = 1
    while k < k_max and n_steps % (k * 2) == 0:
        k *= 2

    def body(state, _):
        s = [state[i] for i in range(4)]
        rows = []
        for _ in range(k):
            s = _prng_step(s, s1, s2, xor_c, s2p17)
            rows.append((s[0] & 0xFF).astype(jnp.uint8))
        return jnp.stack(s), jnp.stack(rows)

    _, bytes_rows = jax.lax.scan(
        body, jnp.stack(one), None, length=n_steps // k
    )
    return bytes_rows.reshape(n_steps, -1)  # (n_steps, B) uint8


def fake_seed_planes(seed: int, start_idx: int, n: int):
    """Host-side derivation of the per-cell seed limb planes: (s1, s2),
    each (4, n) uint32, matching oracle slot.gen_fake_cell's seed1/seed2."""
    seed1 = (seed + 0xDEADCAFE) & 0xFFFFFFFFFFFFFFFF
    idx = np.arange(start_idx, start_idx + n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        seed2 = idx + np.uint64(0x98765432)
    s1 = jnp.asarray(np.broadcast_to(_const_planes(seed1), (4, n)).copy())
    s2p = np.zeros((4, n), np.uint32)
    for i in range(4):
        s2p[i] = ((seed2 >> np.uint64(16 * i)) & np.uint64(MASK)).astype(np.uint32)
    return s1, jnp.asarray(s2p)


# ---------------------------------------------------------------------------
# Pallas kernel for the byte recurrence.  The scan formulation above is
# loop-overhead bound on TPU: each of the cell_size sequential steps is ~100
# elementwise u32 ops on small (4, B) planes, and XLA:TPU schedules the scan
# body at ~1.5 GB/s of output (tools/profile_stages.py).  Here the whole
# 2048-step chain runs inside one kernel: state lives in VMEM/vregs, four
# recurrence steps are unrolled per loop iteration, and their four bytes are
# packed into one u32 output row — the u8 rows never exist on-chip.

_BT_PRNG = 2048  # lane tile; (1, 2048) rows = 16 native (8, 128) vregs


def _prng_step(s, s1l, s2l, xor_c, s2p17):
    """One recurrence step on (1, BT) limb rows; shared by scan and kernel.

    s(s+s1)(s+s2) + s(s^C) + s1*s + s2 + 17
      == s * [(s+s1)(s+s2) + (s^C) + s1] + s2 + 17   (mod 2^64), then mod M.
    """
    inner = _mul64(_add64(s, s1l), _add64(s, s2l))
    inner = _add64(inner, _xor64(s, xor_c))
    inner = _add64(inner, s1l)
    return _mod_m(_add64(_mul64(s, inner), s2p17))


_SL = 8  # sublane rows per tile: each limb plane is a native (8, BT/8) tile


def _prng_kernel(s1_ref, s2_ref, out_ref, *, n_words: int):
    from jax.experimental import pallas as pl

    # refs are (4, 1, 8, BT/8); each limb plane is a full native (8, BT/8)
    # tile — all 8 sublanes carry cells (a (1, BT) row layout wastes 7/8 of
    # the VPU, measured 1.6 GB/s vs 1.5 GB/s for the scan)
    s1l = [s1_ref[i, 0] for i in range(4)]
    s2l = [s2_ref[i, 0] for i in range(4)]
    xor_c = [jnp.full_like(s1l[0], v) for v in (0x5A5A, 0x5A5A, 0, 0)]
    s2p17 = _add64(s2l, [jnp.full_like(s1l[0], v) for v in (17, 0, 0, 0)])
    init = jnp.stack(
        [jnp.full_like(s1l[0], 1)] + [jnp.zeros_like(s1l[0])] * 3, axis=0
    )

    def body(w, state):
        s = [state[i] for i in range(4)]
        packed = jnp.zeros_like(s[0])
        for j in range(4):
            s = _prng_step(s, s1l, s2l, xor_c, s2p17)
            packed = packed | ((s[0] & 0xFF) << (8 * j))
        out_ref[pl.ds(w, 1), 0] = packed[None]
        return jnp.stack(s, axis=0)

    jax.lax.fori_loop(0, n_words, body, init)


@functools.partial(jax.jit, static_argnames=("n_steps", "interpret"))
def _gen_pallas(seed1_planes, seed2_planes, n_steps: int, interpret: bool = False):
    """(n_steps, B) uint8 byte rows via the Pallas kernel; bit-exact to
    _gen_scan (tests/test_prng_kernel.py).  Requires n_steps % 4 == 0 and
    B % _BT_PRNG == 0 (callers fall back to the scan otherwise).

    Cell i lives at (g, r, c) = (i // BT, (i % BT) // (BT/8), i % (BT/8)):
    a plain row-major reshape on both ends, so no transposes materialize."""
    from jax.experimental import pallas as pl

    B = seed1_planes.shape[1]
    n_words = n_steps // 4
    G = B // _BT_PRNG
    W = _BT_PRNG // _SL
    s1v = seed1_planes.reshape(4, G, _SL, W)
    s2v = seed2_planes.reshape(4, G, _SL, W)
    packed = pl.pallas_call(
        functools.partial(_prng_kernel, n_words=n_words),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((4, 1, _SL, W), lambda g: (0, g, 0, 0)),
            pl.BlockSpec((4, 1, _SL, W), lambda g: (0, g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n_words, 1, _SL, W), lambda g: (0, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_words, G, _SL, W), U32),
        interpret=interpret,
    )(s1v, s2v)
    # unpack word rows -> byte rows; fuses into the downstream encode
    rows = jnp.stack(
        [(packed.reshape(n_words, B) >> (8 * j)) & 0xFF for j in range(4)],
        axis=1,
    ).reshape(n_steps, B)
    return rows.astype(jnp.uint8)


def gen_rows(seed1_planes, seed2_planes, n_steps: int):
    """Byte rows (n_steps, B): Pallas kernel on TPU, scan elsewhere."""
    impl = os.environ.get("CSPC_PRNG_IMPL", "auto")
    B = seed1_planes.shape[1]
    if impl == "pallas" and (n_steps % 4 != 0 or B % _BT_PRNG != 0):
        raise ValueError(
            f"CSPC_PRNG_IMPL=pallas requires n_steps % 4 == 0 and batch % "
            f"{_BT_PRNG} == 0; got n_steps={n_steps}, batch={B}"
        )
    use_pallas = impl == "pallas" or (
        impl == "auto"
        and jax.default_backend() == "tpu"
        and n_steps % 4 == 0
        and B % _BT_PRNG == 0
    )
    if use_pallas:
        return _gen_pallas(seed1_planes, seed2_planes, n_steps)
    return _gen_scan(seed1_planes, seed2_planes, n_steps)


def fake_seed_bases(seed: int, start_idx: int):
    """Tiny (4,) uint32 limb vectors (seed1, seed2 base) for device-side
    seed-plane construction — 32 bytes of upload per chunk instead of the
    two (4, B) plane arrays (256 KB at B=8192; at the tunnel's ~36 MB/s
    that upload was most of the GL chunk wall, tools/profile_stages.py)."""
    seed1 = (seed + 0xDEADCAFE) & 0xFFFFFFFFFFFFFFFF
    base2 = (start_idx + 0x98765432) & 0xFFFFFFFFFFFFFFFF
    to4 = lambda v: np.array([(v >> (16 * i)) & MASK for i in range(4)], np.uint32)
    return jnp.asarray(to4(seed1)), jnp.asarray(to4(base2))


def seed_planes_device(seed1_base, seed2_base, n: int):
    """Device twin of fake_seed_planes: s1 broadcast from the (4,) base,
    s2 = base + iota with 64-bit wraparound on 16-bit limb planes."""
    s1 = jnp.broadcast_to(seed1_base[:, None], (4, n)).astype(U32)
    iota = jax.lax.iota(U32, n)
    cols = [
        seed2_base[0] + (iota & MASK),
        jnp.broadcast_to(seed2_base[1], (n,)) + (iota >> 16),
        jnp.broadcast_to(seed2_base[2], (n,)),
        jnp.broadcast_to(seed2_base[3], (n,)),
    ]
    s2 = jnp.stack(_ripple(cols, 4))  # mod 2^64 wraparound (drop carry-out)
    return s1, s2


def gen_fake_cells_device(cell_size: int, seed: int, start_idx: int, n: int):
    """(n, cell_size) uint8 fake cells on device, == oracle slot.gen_fake_cell."""
    s1, s2 = fake_seed_planes(seed, start_idx, n)
    rows = gen_rows(s1, s2, cell_size)  # Pallas fast path on TPU, scan elsewhere
    return rows.T  # (n, cell_size)
