"""Bit-exact regression tests against the frozen golden vectors.

Recomputes generators, transcript challenges, and end-to-end proof bytes
from the live stack and requires equality with tests/golden/golden.json
(see golden_compute.py for why these are load-bearing). Any mismatch
means an arkworks-0.4 compatibility regression somewhere below: byte
layer, sampling, serialization, or protocol ordering.
"""

import json
import os

import pytest

from golden_compute import CURVES, compute_golden

_GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "golden.json")


@pytest.fixture(scope="module")
def recomputed():
    return compute_golden()


@pytest.fixture(scope="module")
def frozen():
    with open(_GOLDEN_PATH) as fh:
        return json.load(fh)


@pytest.mark.parametrize("curve", list(CURVES))
@pytest.mark.parametrize(
    "layer", ["generators", "transcript", "shuffle_k3"]
)
def test_golden_per_curve(recomputed, frozen, curve, layer):
    assert recomputed[curve][layer] == frozen[curve][layer]


@pytest.mark.parametrize("layer", ["example_gadget", "range_n10", "ipa_n32"])
def test_golden_secq256k1_extras(recomputed, frozen, layer):
    assert recomputed["secq256k1"][layer] == frozen["secq256k1"][layer]
