"""Field definitions (L0).

The primary field is the BN254 (alt-bn128) scalar field Fr; the reference
obtains it from external native libraries (constantine / zikkurat-algebra,
see reference proof_input.nimble:11, storage-proof-ref.cabal:40).  Here the
scalar reference arithmetic is plain Python integers (bn254.py) and the
accelerated path is 16-bit limb planes (ops/limbs.py).
"""

from .bn254 import P as BN254_R  # the Fr modulus ("r" in circom docs)
