"""Golden-vector tests for the byte layer (SURVEY.md §7 hard part #1).

Every generator and Fiat-Shamir challenge in the framework depends on these
being bit-exact; the vectors below are published known answers (FIPS-202,
ChaCha20, and the merlin crate's transcript test vector).
"""

from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng, chacha20_block_words
from ark_bulletproofs_tpu.hashes.keccak import sha3_256, sha3_512
from ark_bulletproofs_tpu.transcript.merlin import Transcript
from ark_bulletproofs_tpu.transcript.strobe import Strobe128


def test_sha3_512_empty():
    assert sha3_512(b"").hex() == (
        "a69f73cca23a9ac5c8b567dc185a756e97c982164fe25859e0d1dcc1475c80a6"
        "15b2123af1f5f94c11e3e9402c3ac558f500199d95b6d3e301758586281dcd26"
    )


def test_sha3_512_abc():
    assert sha3_512(b"abc").hex() == (
        "b751850b1a57168a5693cd924b6b096e08f621827444f70d884f5d0240d2712e"
        "10e116e9192af3c91a7ec57647e3934057340b4cf408d5a56592f8274eec53f0"
    )


def test_sha3_512_multiblock():
    # longer than one 72-byte rate block
    msg = b"x" * 200
    d1 = sha3_512(msg)
    d2 = sha3_512(msg)
    assert d1 == d2
    assert d1 != sha3_512(b"x" * 201)


def test_sha3_256_empty():
    assert sha3_256(b"").hex() == (
        "a7ffc6f8bf1ed76651c14756a061d662f580ff4de43b49fa82d80a4b80f8434a"
    )


def test_chacha20_zero_key_keystream():
    """djb/RFC keystream for the all-zero key, nonce, counter 0."""
    rng = ChaChaRng(bytes(32))
    ks = rng.fill_bytes(64)
    assert ks.hex() == (
        "76b8e0ada0f13d90405d6ae55386bd28bdd219b8a08ded1aa836efcc8b770dc7"
        "da41597c5157488d7724e03fb8d84a376a43b8f41518a11cc387b669b2ee6586"
    )


def test_chacha20_block_1_differs_and_is_deterministic():
    w0 = chacha20_block_words(tuple([0] * 8), 0)
    w1 = chacha20_block_words(tuple([0] * 8), 1)
    assert w0 != w1
    assert w0 == chacha20_block_words(tuple([0] * 8), 0)


def test_chacha_word_order_next_u64():
    rng = ChaChaRng(bytes(32))
    lo = chacha20_block_words(tuple([0] * 8), 0)
    assert rng.next_u64() == lo[0] | (lo[1] << 32)
    assert rng.next_u32() == lo[2]


def test_merlin_transcript_golden_vector():
    """The merlin crate's own equivalence test vector."""
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    cb = t.challenge_bytes(b"challenge", 32)
    assert cb.hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_transcript_chained():
    """State chains across operations; cloned transcripts diverge safely."""
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    _ = t.challenge_bytes(b"challenge", 32)
    c2 = t.challenge_bytes(b"challenge", 32)
    # a second squeeze must differ from the first
    assert c2.hex() != (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )
    clone = t.clone()
    assert clone.challenge_bytes(b"x", 16) == t.challenge_bytes(b"x", 16)


def test_strobe_long_inputs_cross_rate_boundary():
    s = Strobe128(b"long test")
    s.ad(b"a" * 500, False)  # > 2 rate blocks
    out1 = s.prf(32, False)
    s2 = Strobe128(b"long test")
    s2.ad(b"a" * 250, False)
    s2.ad(b"a" * 250, True)  # continuation op, same flags
    out2 = s2.prf(32, False)
    assert out1 == out2


def test_transcript_rng_witness_binding():
    t = Transcript(b"rng test")
    t.append_message(b"stmt", b"data")

    class ZeroRng:
        def fill_bytes(self, n):
            return bytes(n)

    r1 = t.build_rng().rekey_with_witness_bytes(b"w", b"witness1").finalize(ZeroRng())
    r2 = t.build_rng().rekey_with_witness_bytes(b"w", b"witness2").finalize(ZeroRng())
    r3 = t.build_rng().rekey_with_witness_bytes(b"w", b"witness1").finalize(ZeroRng())
    a, b, c = r1.fill_bytes(32), r2.fill_bytes(32), r3.fill_bytes(32)
    assert a != b
    assert a == c


def test_rand_many_bit_exact_with_per_call_path():
    """fields.rand_many == the sequential fr.rand loop, and leaves the
    TranscriptRng STROBE state identical (native bulk path vs per-call
    Python ops; reference semantics: merlin TranscriptRng fill_bytes =
    meta-AD(LE32 len) + PRF, rand_core next_u64_via_fill, ark-ff
    Fp::rand rejection loop)."""
    from ark_bulletproofs_tpu.curves import curve25519, secq256k1
    from ark_bulletproofs_tpu.rand import seeded_rng
    from ark_bulletproofs_tpu.transcript.merlin import Transcript

    def mk_rng():
        t = Transcript(b"rand_many test")
        return (
            t.build_rng()
            .rekey_with_witness_bytes(b"w", b"\x42" * 32)
            .finalize(seeded_rng(9))
        )

    for fld in (secq256k1.fr, curve25519.fr, curve25519.fq):
        r_loop, r_bulk = mk_rng(), mk_rng()
        want = [fld.rand(r_loop) for _ in range(65)]
        got = fld.rand_many(r_bulk, 65)
        assert got == want
        # STROBE states converged: the next draw agrees too.
        assert fld.rand(r_loop) == fld.rand(r_bulk)

    # Non-TranscriptRng rngs take the fallback loop and still match.
    fld = secq256k1.fr
    a, b = seeded_rng(3), seeded_rng(3)
    assert fld.rand_many(a, 10) == [fld.rand(b) for _ in range(10)]


def test_append_messages_bit_exact_with_loop():
    """Transcript.append_messages == the sequential append_message loop
    (native bulk absorb vs per-call ops), including state convergence."""
    from ark_bulletproofs_tpu.transcript.merlin import Transcript

    msgs = [bytes([i]) * 64 for i in range(33)]
    t_loop, t_bulk = Transcript(b"bulk"), Transcript(b"bulk")
    for m in msgs:
        t_loop.append_message(b"V", m)
    t_bulk.append_messages(b"V", msgs)
    assert t_loop.challenge_bytes(b"c", 32) == t_bulk.challenge_bytes(b"c", 32)

    # Mixed sizes take the fallback loop and still match.
    mixed = [b"a", b"bb" * 100, b"", b"xyz"]
    t_loop, t_bulk = Transcript(b"bulk2"), Transcript(b"bulk2")
    for m in mixed:
        t_loop.append_message(b"V", m)
    t_bulk.append_messages(b"V", mixed)
    assert t_loop.challenge_bytes(b"c", 32) == t_bulk.challenge_bytes(b"c", 32)


def test_rekey_many_bit_exact_with_loop():
    """TranscriptRngBuilder.rekey_with_witness_many == the sequential
    rekey loop (native bulk KEY ops vs per-call), pinned by the drawn
    stream."""
    from ark_bulletproofs_tpu.curves import secq256k1
    from ark_bulletproofs_tpu.rand import seeded_rng
    from ark_bulletproofs_tpu.transcript.merlin import Transcript

    fr = secq256k1.fr
    wits = [fr.to_bytes((i * 31 + 5) % fr.p) for i in range(40)]

    b_loop = Transcript(b"rekey").build_rng()
    for w in wits:
        b_loop = b_loop.rekey_with_witness_bytes(b"v_blinding", w)
    r_loop = b_loop.finalize(seeded_rng(1))

    b_bulk = Transcript(b"rekey").build_rng().rekey_with_witness_many(
        b"v_blinding", wits
    )
    r_bulk = b_bulk.finalize(seeded_rng(1))

    assert [fr.rand(r_loop) for _ in range(5)] == [
        fr.rand(r_bulk) for _ in range(5)
    ]
