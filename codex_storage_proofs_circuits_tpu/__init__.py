"""codex_storage_proofs_circuits_tpu — a TPU-native storage-proof primitive library.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
codex-storage/codex-storage-proofs-circuits reference system:

  * BN254 scalar-field (Fr) arithmetic as multi-limb integer kernels
  * batched Poseidon2 t=3 permutation / compression / sponges
  * cell -> block(depth-5) -> slot -> dataset Merkle tree construction
  * storage-proof sampling and circuit proof-input generation
  * witness generation / constraint evaluation for the sampling circuit

Layer map (mirrors reference SURVEY.md section 1, re-designed TPU-first):

  fields/    L0  field constants + scalar reference arithmetic
  oracle/    L1-L4 bit-exact pure-Python CPU oracle (the judge for kernels)
  ops/       L1-L2 batched TPU kernels (jnp limb planes + Pallas)
  models/    L3-L6 jitted pipelines: slot trees, dataset trees, sampling,
             proof inputs, circuit semantics evaluation
  parallel/  multi-chip sharding: mesh, shard_map tree builds, collectives
  utils/     config, CLI, JSON export, circom main-component writer, metrics
  native/    C host library: fast bit-exact CPU path (fake-data PRNG,
             Fr Montgomery arithmetic, Poseidon2) for large-scale parity checks
"""

__version__ = "0.1.0"
