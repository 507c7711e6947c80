"""R1CS constraint-system proofs (reference src/r1cs/, feature "yoloproofs")."""

from .constraint_system import (
    ConstraintSystem,
    RandomizableConstraintSystem,
    RandomizedConstraintSystem,
)
from .linear_combination import LinearCombination, Variable
from .proof import R1CSProof
from .prover import Prover, prove_batch, RandomizingProver
from .verifier import RandomizingVerifier, Verifier, batch_verify

__all__ = [
    "ConstraintSystem",
    "RandomizableConstraintSystem",
    "RandomizedConstraintSystem",
    "LinearCombination",
    "Variable",
    "R1CSProof",
    "Prover",
    "prove_batch",
    "RandomizingProver",
    "Verifier",
    "RandomizingVerifier",
    "batch_verify",
]
