"""ark-bulletproofs-tpu: a TPU-native Bulletproofs framework.

A from-scratch reimplementation of the capabilities of
FindoraNetwork/ark-bulletproofs (Rust) designed for TPU hardware:

- host byte layer (Keccak/SHA3, ChaCha20, Merlin/STROBE transcript,
  arkworks-compatible sampling and serialization) — bit-exact;
- exact host field/group layer over the secq256k1/secp256k1 cycle, the
  zorro curve, and twisted-Edwards curve25519;
- device compute layer (`ops/`): limb-decomposed Montgomery field and
  Jacobian point kernels in JAX/XLA with Pallas fast paths, Pippenger MSM;
- multi-chip scaling (`parallel/`): MSM and batch verification sharded over
  a jax.sharding.Mesh with ICI collectives;
- the protocol stack: Pedersen/Bulletproof generators, inner-product
  argument, two-phase randomized R1CS prover/verifier, batch verification.
"""

from . import curves
from .errors import (
    MPCError,
    ProofError,
    R1CSError,
    VerificationError,
)
from .generators import BulletproofGens, BulletproofGensShare, GeneratorsChain, PedersenGens
from .ipp import InnerProductProof
from .transcript.merlin import Transcript

__version__ = "0.1.0"

__all__ = [
    "curves",
    "BulletproofGens",
    "BulletproofGensShare",
    "GeneratorsChain",
    "PedersenGens",
    "InnerProductProof",
    "Transcript",
    "ProofError",
    "VerificationError",
    "MPCError",
    "R1CSError",
]
