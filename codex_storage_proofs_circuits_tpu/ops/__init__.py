"""Batched TPU kernels (L1-L2): Fr limb arithmetic, Poseidon2, sponges.

Layout convention: a batch of field elements is a uint32 array of shape
(NUM_LIMBS, batch) — 16 little-endian 16-bit limb *planes* with the batch on
the minor axis, so elementwise limb ops vectorize across the 128-wide VPU
lanes and limb index maps to sublanes.  Values are kept canonical (< P, limbs
< 2^16) in Montgomery form (radix 2^256) between operations.

Two interchangeable implementations of the hot permutation:
  poseidon2_jnp.py     pure jax.numpy (runs on any backend; the reference
                       semantics for the Pallas kernel)
  poseidon2_pallas.py  fused Pallas TPU kernel (production path)
"""
