"""Device pipeline for the R1CS prover's vector phase.

The reference prover builds the blinded vector polynomials l(x), r(x)
and their special inner product t(x) on the CPU (reference
src/r1cs/prover.rs:671-756, src/util.rs:75-109). Here the O(n) work runs
on device in Montgomery form:

  l(x) = l1*x + l2*x^2 + l3*x^3        (l0 = 0)
  r(x) = r0 + r1*x + r3*x^3            (r2 = 0)
  l1 = aL + y^-i o wR   l2 = aO        l3 = sL
  r0 = wO - y^i         r1 = y^i o aR + wL      r3 = y^i o sR

Working on the PADDED length with zero-padded witness vectors makes the
reference's r-padding (-y^i for i >= n, prover.rs:753-756) fall out of
the formulas automatically: beyond n every term but -y^i vanishes.

The six t-coefficients (util.rs:75-93, exploiting l0 = r2 = 0):
  t1 = <l1,r0>  t2 = <l1,r1>+<l2,r0>  t3 = <l2,r1>+<l3,r0>
  t4 = <l1,r3>+<l3,r1>  t5 = <l2,r3>  t6 = <l3,r3>

Coefficient arrays stay on device between the two transcript syncs
(T-commitments, then challenge x) and the evaluated l/r feed the
device-resident IPA (ops/ipa.py) without touching the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import field as df
from .limbs import N_LIMBS, ints_to_limbs, limbs_to_ints
from .verify import _pow_vector

U32 = jnp.uint32


@partial(jax.jit, static_argnums=(0, 1, 2))
def _poly_phase(fr, padded_n: int, lg_n: int,
                aL, aR, aO, sL, sR, wL, wR, wO, y, y_inv):
    """Canonical (padded_n, 16) inputs -> (t coeffs (6,16) canonical,
    l/r coefficient arrays in Montgomery form)."""
    to_m = lambda v: df.to_mont(fr, v)
    aLm, aRm, aOm, sLm, sRm = to_m(aL), to_m(aR), to_m(aO), to_m(sL), to_m(sR)
    wLm, wRm, wOm = to_m(wL), to_m(wR), to_m(wO)
    y_m, y_inv_m = to_m(y), to_m(y_inv)

    y_vec = _pow_vector(fr, y_m, padded_n, lg_n)
    y_inv_vec = _pow_vector(fr, y_inv_m, padded_n, lg_n)

    prods = df.mont_mul(
        fr,
        jnp.stack([y_inv_vec, y_vec, y_vec]),
        jnp.stack([wRm, aRm, sRm]),
    )
    l1 = df.add(fr, aLm, prods[0])
    l2 = aOm
    l3 = sLm
    r0 = df.sub(fr, wOm, y_vec)
    r1 = df.add(fr, prods[1], wLm)
    r3 = prods[2]

    # nine inner products batched into one mul, then per-dot modular sums
    lhs = jnp.stack([l1, l1, l2, l2, l3, l3, l1, l2, l3])
    rhs = jnp.stack([r0, r1, r1, r0, r0, r1, r3, r3, r3])
    dots = df.mont_mul(fr, lhs, rhs)  # (9, padded_n, 16)
    sums = df.sum_mod(fr, dots, axis=1)  # (9, 16)
    t1 = sums[0]
    t2 = df.add(fr, sums[1], sums[3])
    t3 = df.add(fr, sums[2], sums[4])
    t4 = df.add(fr, sums[6], sums[5])
    t5 = sums[7]
    t6 = sums[8]

    t_coeffs = df.from_mont(fr, jnp.stack([t1, t2, t3, t4, t5, t6]))
    return t_coeffs, (l1, l2, l3, r0, r1, r3)


@partial(jax.jit, static_argnums=(0,))
def _eval_phase(fr, coeffs, x):
    """Evaluate l(x), r(x); returns Montgomery (padded_n, 16) vectors."""
    l1, l2, l3, r0, r1, r3 = coeffs
    x_m = df.to_mont(fr, x)
    xs = jnp.broadcast_to(x_m, l1.shape)
    # l = x*(l1 + x*(l2 + x*l3))
    t = df.mont_mul(fr, xs, l3)
    t = df.mont_mul(fr, xs, df.add(fr, l2, t))
    l_vec = df.mont_mul(fr, xs, df.add(fr, l1, t))
    # r = r0 + x*(r1 + x*(x*r3))
    u = df.mont_mul(fr, xs, r3)
    u = df.mont_mul(fr, xs, u)
    u = df.mont_mul(fr, xs, df.add(fr, r1, u))
    r_vec = df.add(fr, r0, u)
    return l_vec, r_vec


class ProverVectorPhase:
    """Device-resident l/r/t pipeline for one proof."""

    def __init__(self, curve, padded_n: int, aL, aR, aO, sL, sR,
                 wL, wR, wO, y: int, y_inv: int):
        self.curve = curve
        self.fr = df.spec_for(curve.fr)
        self.padded_n = padded_n
        lg_n = max((padded_n - 1).bit_length(), 1)

        # Mesh-sharded vector phase (SURVEY.md §5 "sharded length-n"):
        # the l/r/t pipeline is elementwise plus per-dot reductions, so
        # sharding the padded_n axis needs no restructuring — GSPMD
        # splits the elementwise work and psums the nine t-dot partials.
        from .. import engine as _engine

        mesh = _engine.active_mesh()
        shard = (
            mesh is not None
            and mesh.devices.size > 1
            and padded_n % mesh.devices.size == 0
        )
        if shard:
            from ..parallel.mesh import data_sharding

            sh = data_sharding(mesh)

        def vec(v):
            arr = ints_to_limbs(list(v) + [0] * (padded_n - len(v)))
            return jax.device_put(arr, sh) if shard else arr

        def one(v):
            return ints_to_limbs([v])[0]

        t_coeffs, self.coeffs = _poly_phase(
            self.fr, padded_n, lg_n,
            vec(aL), vec(aR), vec(aO), vec(sL), vec(sR),
            vec(wL), vec(wR), vec(wO), one(y), one(y_inv),
        )
        self.t = limbs_to_ints(np.asarray(t_coeffs))  # [t1..t6]

    def eval_lr(self, x: int):
        """Device Montgomery l(x), r(x) after challenge x."""
        return _eval_phase(
            self.fr, self.coeffs, jnp.asarray(ints_to_limbs([x])[0])
        )


# --- device fixed-base Pedersen batch commit -----------------------------
#
# pc_gens.commit_many falls back to per-point host double-and-add when no
# native backend covers the curve (the TE model / wide-field curves,
# ark_bulletproofs_tpu/native.py::set_curve_native). At shuffle k=1024
# scale that is 2048 sequential ~3 ms host muls — seconds of the TE
# prove. This path runs the whole batch as ONE device program: a cached
# 2^i * B / 2^i * B_blinding doubles table (one 256-step scan per base,
# like ops/ipa.py::_q_doubles) + per-commit masked selects + a 9-step
# binary tree reduction over the 512 combined bit-positions, then a
# vmapped unrolled-pow batch affine conversion. Replaces the same
# reference primitive as PedersenGens::commit (generators.rs:39-44).

_COMMIT_TABLES: dict = {}


@partial(jax.jit, static_argnums=(0,))
def _commit_many_prog(spec, p2cat, kv, kr):
    """p2cat: NC coord arrays (512, 16) = [2^i*B rows | 2^i*Bb rows];
    kv, kr: (P, 16) canonical scalar limbs. Returns per-coord (P, 16)
    canonical affine x, y + (P,) inf mask."""
    from . import curve as dc
    from . import fs

    fq = spec.fq
    P = kv.shape[0]
    k2 = jnp.concatenate([kv, kr], axis=1)  # (P, 32) limbs = 512 bits
    bit_idx = np.arange(512)
    limb_idx = bit_idx // 16
    shift = jnp.asarray((bit_idx % 16).astype(np.uint32))
    bits = (k2[:, limb_idx] >> shift) & 1  # (P, 512)
    zero = dc.point_zero(spec, (P, 512))
    pt = tuple(jnp.broadcast_to(c, (P, 512, N_LIMBS)) for c in p2cat)
    acc = dc.select(bits > 0, pt, zero)
    idx = jnp.arange(512, dtype=jnp.int32)

    def step(s, x):
        half = jnp.int32(512) >> (s + 1)
        part = tuple(
            jnp.take(c, jnp.minimum(idx + half, 511), axis=1) for c in x
        )
        keep = jnp.broadcast_to(idx < half, (P, 512))
        return dc.select(keep, dc.add(spec, x, part), x)

    acc = jax.lax.fori_loop(0, 9, step, acc)
    S = tuple(c[:, 0] for c in acc)  # (P,) points
    if dc.is_te(spec):
        z = S[3]
        xn, yn = S[0], S[1]
        zi = fs.mont_pow_pm2.__wrapped__(fq, z)
        xa = df.mont_mul(fq, xn, zi)
        ya = df.mont_mul(fq, yn, zi)
    else:  # Jacobian
        z = S[2]
        zi = fs.mont_pow_pm2.__wrapped__(fq, z)
        zi2 = df.mont_sqr(fq, zi)
        xa = df.mont_mul(fq, S[0], zi2)
        ya = df.mont_mul(fq, S[1], df.mont_mul(fq, zi2, zi))
    inf = df.is_zero(z)
    return (
        df.from_mont(fq, xa),
        df.from_mont(fq, ya),
        inf,
    )


def pedersen_commit_many_dev(curve, B, Bb, values, blinds,
                             chunk: int = 2048):
    """[v_i * B + r_i * B_blinding] as device batch(es); affine host
    points out (None for the SW identity). Returns None off-TPU."""
    import jax as _jax

    from . import curve as dc
    from .ipa import _q_doubles_jit
    from .limbs import int_to_limbs

    if _jax.devices()[0].platform == "cpu":
        return None
    spec = dc.spec_for(curve)
    fq, frp = curve.fq, curve.fr.p
    key = (curve.name, B, Bb)
    p2cat = _COMMIT_TABLES.get(key)
    if p2cat is None:
        tabs = []
        for P0 in (B, Bb):
            qx = jnp.asarray(int_to_limbs(P0[0] * fq.R % fq.p))
            qy = jnp.asarray(int_to_limbs(P0[1] * fq.R % fq.p))
            tabs.append(_q_doubles_jit(spec, qx, qy))
        p2cat = tuple(
            jnp.concatenate([a, b], axis=0) for a, b in zip(*tabs)
        )
        _COMMIT_TABLES[key] = p2cat
    out = []
    n = len(values)
    for s in range(0, n, chunk):
        kv = jnp.asarray(ints_to_limbs([v % frp for v in values[s:s + chunk]]))
        kr = jnp.asarray(ints_to_limbs([r % frp for r in blinds[s:s + chunk]]))
        out.append(_commit_many_prog(spec, p2cat, kv, kr))
    # one fetch per chunk: the three outputs ride one flat vector of
    # length 33*Pc (x limbs | y limbs | inf mask)
    xs_l, ys_l, inf_l = [], [], []
    for o in out:
        f = np.asarray(jnp.concatenate([
            o[0].reshape(-1), o[1].reshape(-1), o[2].astype(jnp.uint32)
        ]))
        pc = len(f) // 33
        xs_l.append(f[: pc * 16].reshape(pc, N_LIMBS))
        ys_l.append(f[pc * 16: pc * 32].reshape(pc, N_LIMBS))
        inf_l.append(f[pc * 32:].astype(bool))
    xs = np.concatenate(xs_l, axis=0)
    ys = np.concatenate(ys_l, axis=0)
    infs = np.concatenate(inf_l, axis=0)
    te = dc.is_te(spec)
    pts = []
    for i in range(n):
        if infs[i] and not te:
            pts.append(None)
        else:
            pts.append((
                limbs_to_ints(xs[i])[0],
                limbs_to_ints(ys[i])[0],
            ))
    return pts
