"""Independent protocol oracle: straight-line transcriptions of the
reference prover and verifier for ONE fixed instance (k=2 shuffle),
checked term-by-term against the production code paths.

The byte layer (Keccak/STROBE/Merlin/ChaCha/encodings) is externally
anchored elsewhere (tests/test_byte_layer.py, test_arkworks_anchors.py);
what those anchors cannot pin is the PROTOCOL ORDERING — which values
are appended/squeezed when, and how the verifier's mega-MSM scalar
vector is assembled. The production implementations restructure both
(fused MSMs, device vector phases, compact rounds), so until now their
ordering was validated only by prover<->verifier self-consistency.

This module is a second, independent derivation: every function below
follows the reference Rust literally, line by line (citations inline),
using ONLY the anchored byte-layer primitives (merlin.Transcript,
ChaChaRng, Field.rand/to_bytes) and the host curve group law — no
imports from r1cs/prover.py, r1cs/verifier.py, or ipp.py. The tests
then assert:

  * oracle_prove == production Prover.prove, every proof field
    bit-for-bit (same witness, same blinds, same prng seed) — pins the
    prover's full operation order incl. the witness-bound rng draw
    order (prover.rs:483-530), the phase-1/phase-2 blinding folds
    (prover.rs:758-762), t_2_blinding = <wV, v_blinding>
    (prover.rs:727-733), the G/H u-factor split (prover.rs:781-789),
    and the IPA's first-round factored fold (inner_product_proof.rs:
    96-167).
  * oracle_verification_scalars == production
    Verifier.verification_scalars term-by-term — pins flattened
    constraints (verifier.rs:304-349), the challenge replay order
    (verifier.rs:394-462), the IPA verification scalars u^2/u^-2/s
    (inner_product_proof.rs:244-314), and the mega-MSM assembly order
    (verifier.rs:462-541).
  * the oracle's own mega-MSM over its own base order sums to zero —
    the oracle independently VERIFIES the production proof.
"""

import pytest

from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.gadgets import shuffle_gadget
from ark_bulletproofs_tpu.generators import BulletproofGens, PedersenGens
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.ipp import InnerProductProof
from ark_bulletproofs_tpu.r1cs import Prover, Verifier
from ark_bulletproofs_tpu.transcript.merlin import Transcript

CURVE = curves.secq256k1
SEED = bytes(range(32))
VALS = [3, 7, 7, 3]  # x0, x1, y0, y1 — y is a permutation of x
BLINDS = [1111, 2222, 3333, 4444]
LABEL = b"oracle-k2-shuffle"

# ---- byte-layer primitives (anchored; transcript.rs:45-102) -------------


def _chal(t: Transcript, fr, label: bytes) -> int:
    """challenge_scalar: squeeze 32 bytes, F::rand(ChaCha(seed))
    (reference src/transcript.rs:95-101)."""
    return fr.rand(ChaChaRng(t.challenge_bytes(label, 32)))


def _app_scalar(t: Transcript, fr, label: bytes, x: int) -> None:
    t.append_message(label, fr.to_bytes(x))


def _app_point(t: Transcript, curve, label: bytes, P) -> None:
    t.append_message(label, curve.serialize_uncompressed(P))


def _validate_app_point(t: Transcript, curve, label: bytes, P) -> None:
    assert not curve.is_zero(P), "identity point in transcript"
    _app_point(t, curve, label, P)


# ---- the fixed k=2 shuffle constraint system ----------------------------
#
# Variable tags: ('L', i) MultiplierLeft, ('R', i) MultiplierRight,
# ('O', i) MultiplierOutput, ('V', i) Committed, ('1',) One.
# shuffle gadget at k=2 (reference tests/r1cs_secq256k1.rs:16-56) with
# the multiply() constraint emission of prover.rs:103-133 /
# verifier.rs' identical trait impl:
#   multiply(x1 - z, x0 - z) -> mult 0; multiply(y1 - z, y0 - z) -> 1;
#   constrain(o0 - o1).


def _k2_constraints(p: int, z: int):
    """The five constraints, in emission order, as literal term lists."""
    return [
        [("V", 1, 1), ("1", 0, (-z) % p), ("L", 0, p - 1)],
        [("V", 0, 1), ("1", 0, (-z) % p), ("R", 0, p - 1)],
        [("V", 3, 1), ("1", 0, (-z) % p), ("L", 1, p - 1)],
        [("V", 2, 1), ("1", 0, (-z) % p), ("R", 1, p - 1)],
        [("O", 0, 1), ("O", 1, p - 1)],
    ]


def _flatten(p, constraints, n, m, z, with_c: bool):
    """flattened_constraints (verifier.rs:304-349 / prover.rs:354-397):
    w{L,R,O}[i] += z^(q+1)*coeff, wV[i] -= z^(q+1)*coeff, wc -= (verifier
    only)."""
    wL, wR, wO = [0] * n, [0] * n, [0] * n
    wV = [0] * m
    wc = 0
    exp_z = z
    for lc in constraints:
        for (kind, i, coeff) in lc:
            if kind == "L":
                wL[i] = (wL[i] + exp_z * coeff) % p
            elif kind == "R":
                wR[i] = (wR[i] + exp_z * coeff) % p
            elif kind == "O":
                wO[i] = (wO[i] + exp_z * coeff) % p
            elif kind == "V":
                wV[i] = (wV[i] - exp_z * coeff) % p
            elif kind == "1" and with_c:
                wc = (wc - exp_z * coeff) % p
        exp_z = exp_z * z % p
    return wL, wR, wO, wV, wc


# ---- oracle prover ------------------------------------------------------


def oracle_prove(curve, pc, G, H, vals, blinds, prng):
    """Literal transcription of ProverCS::prove (prover.rs:437-830) for
    the k=2 shuffle: n1 = 0, all four multipliers... (two) in phase 2,
    padded_n = n = 2, pad = 0. Returns a dict of proof fields."""
    fr = curve.fr
    p = fr.p
    t = Transcript(LABEL)
    t.append_message(b"dom-sep", b"r1cs v1")  # Prover::new (prover.rs)

    # high-level commits V_i = v*B + r*B_blinding (generators.rs:39-44),
    # appended as b"V" (prover commit flow)
    V = []
    for v, r in zip(vals, blinds):
        P = curve.add(curve.mul(pc.B, v % p), curve.mul(pc.B_blinding, r % p))
        V.append(P)
        _app_point(t, curve, b"V", P)

    # prove() preamble (prover.rs:462-494)
    t.append_u64(b"m", len(V))
    builder = t.build_rng()
    for r in blinds:
        builder = builder.rekey_with_witness_bytes(
            b"v_blinding", fr.to_bytes(r % p)
        )
    rng = builder.finalize(prng)

    # phase 1: n1 = 0 (prover.rs:496-566)
    i_blinding1 = fr.rand(rng)
    o_blinding1 = fr.rand(rng)
    s_blinding1 = fr.rand(rng)
    A_I1 = curve.mul(pc.B_blinding, i_blinding1)
    A_O1 = curve.mul(pc.B_blinding, o_blinding1)
    S1 = curve.mul(pc.B_blinding, s_blinding1)
    _app_point(t, curve, b"A_I1", A_I1)
    _app_point(t, curve, b"A_O1", A_O1)
    _app_point(t, curve, b"S1", S1)

    # phase 2 constraints (create_randomized_constraints; the gadget)
    t.append_message(b"dom-sep", b"r1cs-2phase")
    z_sh = _chal(t, fr, b"shuffle challenge")
    # multiply() witness assignments (prover.rs:103-133)
    x0, x1, y0, y1 = (v % p for v in vals)
    a_L = [(x1 - z_sh) % p, (y1 - z_sh) % p]
    a_R = [(x0 - z_sh) % p, (y0 - z_sh) % p]
    a_O = [a_L[0] * a_R[0] % p, a_L[1] * a_R[1] % p]
    constraints = _k2_constraints(p, z_sh)

    n = 2
    n1, n2 = 0, 2
    padded_n, pad = 2, 0

    # phase-2 blinding draws (prover.rs:583-602)
    i_blinding2 = fr.rand(rng)
    o_blinding2 = fr.rand(rng)
    s_blinding2 = fr.rand(rng)
    s_L2 = [fr.rand(rng) for _ in range(n2)]
    s_R2 = [fr.rand(rng) for _ in range(n2)]

    # phase-2 commitments over gens G(n).skip(n1) (prover.rs:604-650)
    def msm(bases, scalars):
        acc = curve.zero()
        for P, k in zip(bases, scalars):
            acc = curve.add(acc, curve.mul(P, k % p))
        return acc

    A_I2 = msm([pc.B_blinding] + G + H, [i_blinding2] + a_L + a_R)
    A_O2 = msm([pc.B_blinding] + G, [o_blinding2] + a_O)
    S2 = msm([pc.B_blinding] + G + H, [s_blinding2] + s_L2 + s_R2)
    _app_point(t, curve, b"A_I2", A_I2)
    _app_point(t, curve, b"A_O2", A_O2)
    _app_point(t, curve, b"S2", S2)

    y = _chal(t, fr, b"y")
    z = _chal(t, fr, b"z")
    wL, wR, wO, wV, _ = _flatten(p, constraints, n, 4, z, with_c=False)

    # l(X), r(X) coefficient vectors (prover.rs:668-701)
    y_inv = fr.inv(y)
    exp_y_inv = [fr.pow(y_inv, i) for i in range(padded_n)]
    l1 = [(a_L[i] + exp_y_inv[i] * wR[i]) % p for i in range(n)]
    l2 = list(a_O)
    l3 = list(s_L2)  # s_L = s_L1 ++ s_L2; s_L1 empty
    exp_ys = [fr.pow(y, i) for i in range(n + 1)]
    r0 = [(wO[i] - exp_ys[i]) % p for i in range(n)]
    r1 = [(exp_ys[i] * a_R[i] + wL[i]) % p for i in range(n)]
    r3 = [exp_ys[i] * s_R2[i] % p for i in range(n)]

    # t(X) = <l(X), r(X)> — NAIVE symbolic product (independent of the
    # reference's special_inner_product shortcut, util.rs:90-120; the
    # math is the plain degree-3 x degree-3 polynomial inner product)
    tc = [0] * 7
    for i in range(n):
        li = [0, l1[i], l2[i], l3[i]]
        ri = [r0[i], r1[i], 0, r3[i]]
        for ai in range(4):
            for bi in range(4):
                tc[ai + bi] = (tc[ai + bi] + li[ai] * ri[bi]) % p
    assert tc[0] == 0

    t_1_blinding = fr.rand(rng)
    t_3_blinding = fr.rand(rng)
    t_4_blinding = fr.rand(rng)
    t_5_blinding = fr.rand(rng)
    t_6_blinding = fr.rand(rng)

    def pc_commit(v, r):
        return curve.add(
            curve.mul(pc.B, v % p), curve.mul(pc.B_blinding, r % p)
        )

    T_1 = pc_commit(tc[1], t_1_blinding)
    T_3 = pc_commit(tc[3], t_3_blinding)
    T_4 = pc_commit(tc[4], t_4_blinding)
    T_5 = pc_commit(tc[5], t_5_blinding)
    T_6 = pc_commit(tc[6], t_6_blinding)
    _app_point(t, curve, b"T_1", T_1)
    _app_point(t, curve, b"T_3", T_3)
    _app_point(t, curve, b"T_4", T_4)
    _app_point(t, curve, b"T_5", T_5)
    _app_point(t, curve, b"T_6", T_6)

    u = _chal(t, fr, b"u")
    x = _chal(t, fr, b"x")

    # t_2_blinding = <wV, v_blinding> (prover.rs:727-733)
    t_2_blinding = sum(c * (r % p) for c, r in zip(wV, blinds)) % p
    tb = [0, t_1_blinding, t_2_blinding, t_3_blinding, t_4_blinding,
          t_5_blinding, t_6_blinding]

    def poly_eval(cs, x):
        acc = 0
        for c in reversed(cs):
            acc = (acc * x + c) % p
        return acc

    t_x = poly_eval(tc, x)
    t_x_blinding = poly_eval(tb, x)
    l_vec = [(l1[i] * x + l2[i] * x * x + l3[i] * x * x * x) % p
             for i in range(n)]
    r_vec = [(r0[i] + r1[i] * x + r3[i] * x * x * x) % p for i in range(n)]
    # pad = 0: no -y^i padding needed (prover.rs:753-756)

    i_blinding = (i_blinding1 + u * i_blinding2) % p
    o_blinding = (o_blinding1 + u * o_blinding2) % p
    s_blinding = (s_blinding1 + u * s_blinding2) % p
    e_blinding = x * (i_blinding + x * (o_blinding + x * s_blinding)) % p

    _app_scalar(t, fr, b"t_x", t_x)
    _app_scalar(t, fr, b"t_x_blinding", t_x_blinding)
    _app_scalar(t, fr, b"e_blinding", e_blinding)
    w = _chal(t, fr, b"w")
    Q = curve.mul(pc.B, w)

    # G/H factor split (prover.rs:781-789): ones for phase 1, u for
    # phase 2 + padding; H additionally scaled by y^-i
    G_factors = [1] * n1 + [u] * (n2 + pad)
    H_factors = [yi * gf % p for yi, gf in zip(exp_y_inv, G_factors)]

    # IPA create, n = 2: ONE first-round (factored) iteration
    # (inner_product_proof.rs:76-167), then n == 1.
    t.append_message(b"dom-sep", b"ipp v1")
    t.append_u64(b"n", padded_n)
    a, b = l_vec, r_vec
    c_L = a[0] * b[1] % p
    c_R = a[1] * b[0] % p
    L = msm([G[1], H[0], Q], [a[0] * G_factors[1], b[1] * H_factors[0], c_L])
    R = msm([G[0], H[1], Q], [a[1] * G_factors[0], b[0] * H_factors[1], c_R])
    _app_point(t, curve, b"L", L)
    _app_point(t, curve, b"R", R)
    u0 = _chal(t, fr, b"u")
    u0_inv = fr.inv(u0)
    a0 = (a[0] * u0 + u0_inv * a[1]) % p
    b0 = (b[0] * u0_inv + u0 * b[1]) % p

    return dict(
        V=V, A_I1=A_I1, A_O1=A_O1, S1=S1, A_I2=A_I2, A_O2=A_O2, S2=S2,
        T_1=T_1, T_3=T_3, T_4=T_4, T_5=T_5, T_6=T_6,
        t_x=t_x, t_x_blinding=t_x_blinding, e_blinding=e_blinding,
        L_vec=[L], R_vec=[R], a=a0, b=b0,
        G_factors=G_factors, H_factors=H_factors, Q=Q,
        l_vec=l_vec, r_vec=r_vec,
    )


# ---- oracle verifier ----------------------------------------------------


def oracle_verification_scalars(curve, proof, V, G, H, pc):
    """Literal transcription of VerifierCS::verification_scalars
    (verifier.rs:379-541) + InnerProductProof::verification_scalars
    (inner_product_proof.rs:244-314) for the k=2 shuffle instance.
    Returns (scalars, bases) in the reference's mega-MSM order."""
    fr = curve.fr
    p = fr.p
    t = Transcript(LABEL)
    t.append_message(b"dom-sep", b"r1cs v1")  # Verifier::new
    for P in V:
        _app_point(t, curve, b"V", P)
    t.append_u64(b"m", len(V))

    n1 = 0
    _validate_app_point(t, curve, b"A_I1", proof.A_I1)
    _validate_app_point(t, curve, b"A_O1", proof.A_O1)
    _validate_app_point(t, curve, b"S1", proof.S1)

    # create_randomized_constraints (verifier.rs:352-376)
    t.append_message(b"dom-sep", b"r1cs-2phase")
    z_sh = _chal(t, fr, b"shuffle challenge")
    constraints = _k2_constraints(p, z_sh)

    n = 2
    n2 = n - n1
    padded_n, pad = 2, 0

    _app_point(t, curve, b"A_I2", proof.A_I2)
    _app_point(t, curve, b"A_O2", proof.A_O2)
    _app_point(t, curve, b"S2", proof.S2)

    y = _chal(t, fr, b"y")
    z = _chal(t, fr, b"z")
    _validate_app_point(t, curve, b"T_1", proof.T_1)
    _validate_app_point(t, curve, b"T_3", proof.T_3)
    _validate_app_point(t, curve, b"T_4", proof.T_4)
    _validate_app_point(t, curve, b"T_5", proof.T_5)
    _validate_app_point(t, curve, b"T_6", proof.T_6)

    u = _chal(t, fr, b"u")
    x = _chal(t, fr, b"x")
    _app_scalar(t, fr, b"t_x", proof.t_x)
    _app_scalar(t, fr, b"t_x_blinding", proof.t_x_blinding)
    _app_scalar(t, fr, b"e_blinding", proof.e_blinding)
    w = _chal(t, fr, b"w")

    wL, wR, wO, wV, wc = _flatten(p, constraints, n, len(V), z, with_c=True)

    # InnerProductProof::verification_scalars (ipp.rs:244-314)
    lg_n = len(proof.ipp_proof.L_vec)
    assert lg_n == 1 and padded_n == 1 << lg_n
    t.append_message(b"dom-sep", b"ipp v1")
    t.append_u64(b"n", padded_n)
    challenges = []
    for L, R in zip(proof.ipp_proof.L_vec, proof.ipp_proof.R_vec):
        _validate_app_point(t, curve, b"L", L)
        _validate_app_point(t, curve, b"R", R)
        challenges.append(_chal(t, fr, b"u"))
    challenges_inv = [fr.inv(c) for c in challenges]
    allinv = 1
    for f in challenges_inv:
        if f != 0:
            allinv = allinv * f % p
    u_sq = [c * c % p for c in challenges]
    u_inv_sq = [c * c % p for c in challenges_inv]
    # s vector (ipp.rs:302-311)
    s = [allinv]
    for i in range(1, padded_n):
        lg_i = i.bit_length() - 1
        k = 1 << lg_i
        s.append(s[i - k] * u_sq[(lg_n - 1) - lg_i] % p)

    a = proof.ipp_proof.a
    b = proof.ipp_proof.b

    y_inv = fr.inv(y)
    y_inv_vec = [fr.pow(y_inv, i) for i in range(padded_n)]
    yneg_wR = [wRi * yi % p for wRi, yi in zip(wR, y_inv_vec)] + [0] * pad
    delta = sum(l * r for l, r in zip(yneg_wR[:n], wL)) % p

    u_for_g = [1] * n1 + [u] * (n2 + pad)
    u_for_h = list(u_for_g)

    g_scalars = [
        u_or_1 * (x * ywr - a * si) % p
        for (ywr, u_or_1, si) in zip(yneg_wR, u_for_g, s[:padded_n])
    ]
    s_rev = list(reversed(s))
    wL_pad = wL + [0] * pad
    wO_pad = wO + [0] * pad
    h_scalars = [
        u_or_1 * (yi * (x * wLi + wOi - b * si) - 1) % p
        for (yi, u_or_1, si, wLi, wOi) in zip(
            y_inv_vec, u_for_h, s_rev[:padded_n], wL_pad, wO_pad
        )
    ]

    # r squeezed from a transcript CLONE (verifier.rs:516-519)
    r = _chal(t.clone(), fr, b"r")

    xx = x * x % p
    rxx = r * xx % p
    xxx = x * xx % p
    T_scalars = [r * x % p, rxx * x % p, rxx * xx % p, rxx * xxx % p,
                 rxx * xx % p * xx % p]

    scalars = [
        (w * (proof.t_x - a * b) + r * (xx * (wc + delta) - proof.t_x)) % p,
        (-proof.e_blinding - r * proof.t_x_blinding) % p,
    ]
    scalars.extend(g_scalars)
    scalars.extend(h_scalars)
    scalars.extend([x, xx, xxx, u * x % p, u * xx % p, u * xxx % p])
    for wVi in wV:
        scalars.append(wVi * rxx % p)
    scalars.extend(T_scalars)
    scalars.extend(u_sq)
    scalars.extend(u_inv_sq)

    # base order (verifier.rs:379-393 comment + 560-585)
    bases = (
        [pc.B, pc.B_blinding] + G + H
        + [proof.A_I1, proof.A_O1, proof.S1,
           proof.A_I2, proof.A_O2, proof.S2]
        + V
        + [proof.T_1, proof.T_3, proof.T_4, proof.T_5, proof.T_6]
        + proof.ipp_proof.L_vec + proof.ipp_proof.R_vec
    )
    return scalars, bases


# ---- tests --------------------------------------------------------------


@pytest.fixture(scope="module")
def production():
    """Proof built by the production prover, with the IPA inputs spied."""
    pc = PedersenGens(CURVE)
    bp = BulletproofGens(CURVE, 2, 1)
    t = Transcript(LABEL)
    prover = Prover(pc, t)
    in_vars = [prover.commit(VALS[0], BLINDS[0])[1],
               prover.commit(VALS[1], BLINDS[1])[1]]
    out_vars = [prover.commit(VALS[2], BLINDS[2])[1],
                prover.commit(VALS[3], BLINDS[3])[1]]
    shuffle_gadget(prover, CURVE, in_vars, out_vars)

    spy = {}
    orig = InnerProductProof.create.__func__

    def create_spy(cls, t_, curve_, Q, Gf, Hf, Gv, Hv, av, bv):
        spy.update(Q=Q, Gf=list(Gf), Hf=list(Hf),
                   av=list(av), bv=list(bv))
        return orig(cls, t_, curve_, Q, Gf, Hf, Gv, Hv, av, bv)

    InnerProductProof.create = classmethod(create_spy)
    try:
        proof = prover.prove(ChaChaRng(SEED), bp)
    finally:
        InnerProductProof.create = classmethod(orig)

    pcommit = pc.commit
    V = [pcommit(v, r) for v, r in zip(VALS, BLINDS)]
    return dict(pc=pc, bp=bp, proof=proof, V=V, spy=spy)


def test_prover_oracle_bit_exact(production):
    pc, bp, proof = (production[k] for k in ("pc", "bp", "proof"))
    G = bp.share(0).G(2)
    H = bp.share(0).H(2)
    o = oracle_prove(CURVE, pc, G, H, VALS, BLINDS, ChaChaRng(SEED))

    eq = CURVE.eq
    for name in ("A_I1", "A_O1", "S1", "T_1", "T_3", "T_4", "T_5", "T_6"):
        assert eq(o[name], getattr(proof, name)), name
    for name in ("A_I2", "A_O2", "S2"):
        a_, b_ = o[name], getattr(proof, name)
        assert (CURVE.is_zero(a_) and CURVE.is_zero(b_)) or eq(a_, b_), name
    for name in ("t_x", "t_x_blinding", "e_blinding"):
        assert o[name] == getattr(proof, name), name
    assert len(proof.ipp_proof.L_vec) == 1
    assert eq(o["L_vec"][0], proof.ipp_proof.L_vec[0])
    assert eq(o["R_vec"][0], proof.ipp_proof.R_vec[0])
    assert o["a"] == proof.ipp_proof.a
    assert o["b"] == proof.ipp_proof.b


def test_prover_factor_split(production):
    """The exact G/H-factor split and IPA inputs the production prover
    passed to InnerProductProof.create (prover.rs:781-789) vs the
    oracle's independent derivation."""
    spy, pc, bp = (production[k] for k in ("spy", "pc", "bp"))
    G = bp.share(0).G(2)
    H = bp.share(0).H(2)
    o = oracle_prove(CURVE, pc, G, H, VALS, BLINDS, ChaChaRng(SEED))
    assert spy["Gf"] == o["G_factors"]
    assert spy["Hf"] == o["H_factors"]
    assert CURVE.eq(spy["Q"], o["Q"])
    assert spy["av"] == o["l_vec"]
    assert spy["bv"] == o["r_vec"]


def test_verifier_scalar_oracle(production):
    pc, bp, proof, V = (production[k] for k in ("pc", "bp", "proof", "V"))

    vt = Transcript(LABEL)
    verifier = Verifier(CURVE, vt)
    in_vars = [verifier.commit(V[0]), verifier.commit(V[1])]
    out_vars = [verifier.commit(V[2]), verifier.commit(V[3])]
    shuffle_gadget(verifier, CURVE, in_vars, out_vars)
    prod_scalars = verifier.verification_scalars(proof, bp)

    G = bp.share(0).G(2)
    H = bp.share(0).H(2)
    scalars, bases = oracle_verification_scalars(CURVE, proof, V, G, H, pc)

    assert len(scalars) == len(prod_scalars)
    for i, (a_, b_) in enumerate(zip(scalars, prod_scalars)):
        assert a_ == b_ % CURVE.fr.p, f"scalar {i} differs"

    # the oracle verifies the proof with its own mega-MSM
    acc = CURVE.zero()
    for P, k in zip(bases, scalars):
        acc = CURVE.add(acc, CURVE.mul(P, k))
    assert CURVE.is_zero(acc), "oracle mega-MSM check failed"

    # production base order matches the oracle's (reference order)
    prod_bases = (
        [pc.B, pc.B_blinding]
        + bp.share(0).G(2) + bp.share(0).H(2)
        + verifier._extra_bases(proof)
    )
    assert len(prod_bases) == len(bases)
    for i, (a_, b_) in enumerate(zip(bases, prod_bases)):
        za, zb = CURVE.is_zero(a_), CURVE.is_zero(b_)
        assert za == zb and (za or CURVE.eq(a_, b_)), f"base {i} differs"


def test_verifier_rejects_tamper(production):
    """The oracle's own mega-MSM rejects a tampered t_x."""
    pc, bp, proof, V = (production[k] for k in ("pc", "bp", "proof", "V"))
    import copy

    bad = copy.copy(proof)
    bad.t_x = (proof.t_x + 1) % CURVE.fr.p
    G = bp.share(0).G(2)
    H = bp.share(0).H(2)
    scalars, bases = oracle_verification_scalars(CURVE, bad, V, G, H, pc)
    acc = CURVE.zero()
    for P, k in zip(bases, scalars):
        acc = CURVE.add(acc, CURVE.mul(P, k))
    assert not CURVE.is_zero(acc)
