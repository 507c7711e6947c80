"""Device Fiat-Shamir byte layer (ops/fs.py) vs the host byte layer.

Every primitive the fused on-chip-transcript IPA prover uses must be
bit-exact with the host model: Keccak-f[1600], the STROBE/Merlin
framing, ChaCha20 + arkworks Fp::rand, the uncompressed point encoding,
and the Montgomery inverse. The heavy marker covers the fully fused
prover program end-to-end."""

import random

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from ark_bulletproofs_tpu.curves import secq256k1, zorro  # noqa: E402
from ark_bulletproofs_tpu.hashes.chacha import (  # noqa: E402
    ChaChaRng, chacha20_block_words,
)
from ark_bulletproofs_tpu.hashes.keccak import _keccak_f1600_py  # noqa: E402
from ark_bulletproofs_tpu.ops import field as df  # noqa: E402
from ark_bulletproofs_tpu.ops import fs  # noqa: E402
from ark_bulletproofs_tpu.ops.limbs import (  # noqa: E402
    int_to_limbs, limbs_to_int,
)
from ark_bulletproofs_tpu.transcript.merlin import Transcript  # noqa: E402


def test_keccak_f1600_matches_host():
    rng = np.random.default_rng(0)
    lanes = [int(x) for x in rng.integers(0, 1 << 63, size=25, dtype=np.int64)]
    want = _keccak_f1600_py(lanes)
    lo = jnp.asarray(np.array([v & 0xFFFFFFFF for v in lanes], np.uint32))
    hi = jnp.asarray(np.array([v >> 32 for v in lanes], np.uint32))
    glo, ghi = fs.keccak_f1600_dev(lo, hi)
    got = [int(a) | (int(b) << 32)
           for a, b in zip(np.asarray(glo), np.asarray(ghi))]
    assert got == want


def test_strobe_transcript_sequence_matches_host():
    """Multiple appends + challenges crossing several sponge blocks; the
    final device state must equal the host Strobe128 object's."""
    t = Transcript(b"test fs")
    t.append_message(b"L", b"\x01\x02" * 40)
    t.append_message(b"R", bytes(range(65)))
    want_u = t.challenge_bytes(b"u", 32)
    t.append_message(b"L", b"xyz" * 60)
    want_u2 = t.challenge_bytes(b"u", 32)

    t2 = Transcript(b"test fs")
    st = jnp.asarray(
        np.frombuffer(bytes(t2._strobe.state), np.uint8).astype(np.uint32))
    pos = jnp.uint32(t2._strobe.pos)
    pb = jnp.uint32(t2._strobe.pos_begin)
    st, pos, pb = fs.append_message(
        st, pos, pb, b"L", fs._const_bytes(b"\x01\x02" * 40))
    st, pos, pb = fs.append_message(
        st, pos, pb, b"R", fs._const_bytes(bytes(range(65))))
    st, pos, pb, out = fs.challenge_bytes(st, pos, pb, b"u", 32)
    assert bytes(np.asarray(out).astype(np.uint8)) == want_u
    st, pos, pb = fs.append_message(
        st, pos, pb, b"L", fs._const_bytes(b"xyz" * 60))
    st, pos, pb, out2 = fs.challenge_bytes(st, pos, pb, b"u", 32)
    assert bytes(np.asarray(out2).astype(np.uint8)) == want_u2
    assert bytes(np.asarray(st).astype(np.uint8)) == bytes(t._strobe.state)
    assert int(pos) == t._strobe.pos
    assert int(pb) == t._strobe.pos_begin


def test_chacha_block_and_fr_rand():
    seed = bytes(range(32))
    key = tuple(int.from_bytes(seed[4 * i:4 * i + 4], "little")
                for i in range(8))
    want_blk = chacha20_block_words(key, 0)
    got_blk = [int(x) for x in np.asarray(
        fs.chacha20_block0(jnp.asarray(np.array(key, np.uint32))))]
    assert got_blk == want_blk

    for curve in (secq256k1, zorro):
        f = curve.fr
        frs = df.spec_for(f)
        for s in range(4):
            sd = bytes([s]) + bytes(31)
            want_sc = f.rand(ChaChaRng(sd))
            limbs, ok = fs.fr_rand_from_seed(
                frs, f.num_bits,
                jnp.asarray(np.frombuffer(sd, np.uint8).astype(np.uint32)))
            assert bool(ok)
            got_mont = limbs_to_int(np.asarray(limbs))
            assert got_mont % f.p == want_sc * f.R % f.p, (curve.name, s)


def test_point_uncompressed_bytes():
    for curve in (secq256k1, zorro):
        fqs = df.spec_for(curve.fq)
        rngc = ChaChaRng(bytes([9]) + bytes(31))
        for _ in range(4):
            P = curve.rand(rngc)
            want = curve.serialize_uncompressed(P)
            got = bytes(np.asarray(fs.point_uncompressed_bytes(
                fqs, curve.fq.num_bits,
                jnp.asarray(int_to_limbs(P[0])),
                jnp.asarray(int_to_limbs(P[1])),
                jnp.bool_(False),
            )).astype(np.uint8))
            assert got == want, curve.name


def test_mont_pow_inverse():
    f = secq256k1.fr
    frs = df.spec_for(f)
    rng = random.Random(5)
    for _ in range(3):
        x = rng.randrange(1, f.p)
        xm = jnp.asarray(int_to_limbs(x * f.R % f.p))
        inv_m = limbs_to_int(np.asarray(fs.mont_pow_pm2(frs, xm)))
        assert inv_m % f.p == pow(x, -1, f.p) * f.R % f.p


@pytest.mark.heavy
@pytest.mark.parametrize("C", [secq256k1, zorro], ids=lambda c: c.name)
def test_ipa_prove_fs_bit_exact(C):
    """The fully fused on-chip-Fiat-Shamir IPA prover must produce the
    same proof AND the same final transcript state as the host prover
    (ops/ipa.py::ipa_prove_fs) — on both SW curves (zorro's 255-bit
    fields exercise the shave/mask and serialization-width branches)."""
    from ark_bulletproofs_tpu import engine
    from ark_bulletproofs_tpu.generators import GeneratorsChain
    from ark_bulletproofs_tpu.ipp import InnerProductProof
    from ark_bulletproofs_tpu.ops.ipa import ipa_prove_fs
    from ark_bulletproofs_tpu.transcript import protocol
    from ark_bulletproofs_tpu.util import exp_vec

    n = 8
    f = C.fr
    rng = random.Random(3)
    G = GeneratorsChain(C, b"fs G").take(n)
    H = GeneratorsChain(C, b"fs H").take(n)
    Q = C.mul(C.gen, rng.randrange(f.p))
    a = [rng.randrange(f.p) for _ in range(n)]
    b = [rng.randrange(f.p) for _ in range(n)]
    Gf = [1] * n
    Hf = exp_vec(f, rng.randrange(f.p), n)

    engine.config.backend = "host"
    try:
        t = Transcript(b"fs test")
        host = InnerProductProof.create(
            t, C, Q, Gf, Hf, list(G), list(H), list(a), list(b))
        host_state = bytes(t._strobe.state)
    finally:
        engine.config.backend = "auto"

    t2 = Transcript(b"fs test")
    protocol.innerproduct_domain_sep(t2, n)
    res = ipa_prove_fs(t2, C, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    assert res is not None
    L, R, a0, b0 = res
    assert L == host.L_vec and R == host.R_vec
    assert a0 == host.a and b0 == host.b
    assert bytes(t2._strobe.state) == host_state
