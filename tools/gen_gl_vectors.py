#!/usr/bin/env python
"""Regenerate the frozen Goldilocks test-vector suites from the CPU oracle.

GL twin of tools/gen_vectors.py, mirroring the reference's vector program
shapes (reference/nim/testvectors/src/testvectors.nim:20-72) for both GL
hash instances:

  digest_felts   : digest([1..n])                   n = 0..17 (sweeps the
                   10* felt padding across two rate-8 blocks)
  digest_bytes   : digest_bytes([1..n])             n = 0..130 (sweeps the
                   `10*` byte padding across 62-byte chunk boundaries)
  merkle_felts   : root of [intToDigest(1..n)]      n = 1..40 (odd/even/
                   singleton layer shapes)

NOTE on provenance: the upstream `nim-goldilocks-hash` pin is not vendored
in the reference and this environment has no network access, so the GL
instance constants are the repo's own deterministic derivation
(fields/goldilocks.py); these vectors freeze composition + constants
against regressions, they are NOT cross-library anchors.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from codex_storage_proofs_circuits_tpu.oracle.goldilocks import (
    compress_fn,
    digest_bytes,
    digest_felts,
    int_to_digest,
)
from codex_storage_proofs_circuits_tpu.oracle.merkle import merkle_tree


def main() -> None:
    vectors = {}
    for hf in ("poseidon2", "monolith"):
        comp = compress_fn(hf)
        vectors[hf] = {
            "digest_felts": [
                [str(v) for v in digest_felts(hf, range(1, n + 1))]
                for n in range(0, 18)
            ],
            "digest_bytes": [
                [str(v) for v in digest_bytes(hf, bytes((i % 256) for i in range(1, n + 1)))]
                for n in range(0, 131)
            ],
            "merkle_felts": [
                [str(v) for v in merkle_tree(
                    [int_to_digest(i) for i in range(1, n + 1)], comp
                ).root]
                for n in range(1, 41)
            ],
        }
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "vectors", "gl_testvectors.json"
    )
    with open(out, "w") as f:
        json.dump(vectors, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
