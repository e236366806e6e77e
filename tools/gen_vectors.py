#!/usr/bin/env python
"""Regenerate the frozen BN254 test-vector suites from the CPU oracle.

The suites mirror the reference's cross-implementation vector programs
(reference/nim/testvectors/src/testvectors.nim:20-72 ==
reference/haskell/src/TestVectors.hs:28-75):

  sponge_rate1_felts : sponge1([1..n])              n = 0..8
  sponge_rate2_felts : sponge2([1..n])              n = 0..8
  hash_bytes         : hash_cell_bytes([1..n])      n = 0..80  (sweeps all
                       `10*` padding cases across 31-byte chunk boundaries)
  merkle_felts       : merkle_root([1..n])          n = 1..40  (odd/even/
                       singleton layer shapes)
  merkle_bytes       : merkle_root(felts([1..n]))   n = 0..80

The oracle itself is anchored by the permutation KAT
(reference/haskell/src/Poseidon2/Example.hs:13-19); these vectors freeze the
composition (padding, chunking, tree conventions) against regressions.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from codex_storage_proofs_circuits_tpu.oracle.poseidon2 import sponge1, sponge2
from codex_storage_proofs_circuits_tpu.oracle.merkle import merkle_root
from codex_storage_proofs_circuits_tpu.oracle.slot import (
    hash_cell_bytes,
    cell_data_to_field_elements,
)


def main() -> None:
    vectors = {
        "sponge_rate1_felts": [
            str(sponge1(range(1, n + 1))) for n in range(0, 9)
        ],
        "sponge_rate2_felts": [
            str(sponge2(range(1, n + 1))) for n in range(0, 9)
        ],
        "hash_bytes": [
            str(hash_cell_bytes(bytes(range(1, n + 1)))) for n in range(0, 81)
        ],
        "merkle_felts": [
            str(merkle_root(list(range(1, n + 1)))) for n in range(1, 41)
        ],
        "merkle_bytes": [
            str(merkle_root(cell_data_to_field_elements(bytes(range(1, n + 1)))))
            for n in range(0, 81)
        ],
    }
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "vectors", "bn254_testvectors.json"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(vectors, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
