"""Device Jacobian group-law kernels vs the exact host curve model."""

import numpy as np
import pytest

from ark_bulletproofs_tpu import curves
from ark_bulletproofs_tpu.hashes.chacha import ChaChaRng
from ark_bulletproofs_tpu.ops import curve as dc
from ark_bulletproofs_tpu.ops import field as df

CURVES = [curves.secq256k1, curves.zorro]


def _rand_points(curve, n, seed=7):
    rng = ChaChaRng(bytes([seed]) + bytes(31))
    return [curve.rand(rng) for _ in range(n)]


def _to_jac_device(curve, points):
    """Affine host points -> device Jacobian (Z = 1 in Montgomery form)."""
    X, Y, inf = dc.affine_to_device(curve, points)
    spec = dc.spec_for(curve)
    one = df.mont_one(spec.fq, (len(points),))
    Z = np.where(np.array(inf)[:, None], 0, np.asarray(one)).astype(np.uint32)
    return (X, Y, Z)


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_add_double_vs_host(curve):
    spec = dc.spec_for(curve)
    n = 8
    P_host = _rand_points(curve, n)
    Q_host = _rand_points(curve, n, seed=8)
    P = _to_jac_device(curve, P_host)
    Q = _to_jac_device(curve, Q_host)

    S = dc.batch_add(spec, P, Q)
    D = dc.batch_double(spec, P)
    for i in range(n):
        s_i = tuple(np.asarray(c)[i] for c in S)
        d_i = tuple(np.asarray(c)[i] for c in D)
        assert dc.jacobian_to_host(curve, s_i) == curve.add(P_host[i], Q_host[i])
        assert dc.jacobian_to_host(curve, d_i) == curve.double(P_host[i])


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_add_edge_cases(curve):
    spec = dc.spec_for(curve)
    (P0,) = _rand_points(curve, 1)
    # rows: P+P (double path), P+(-P) (cancel), 0+P, P+0, 0+0
    P_host = [P0, P0, None, P0, None]
    Q_host = [P0, curve.neg(P0), P0, None, None]
    expect = [curve.add(a, b) for a, b in zip(P_host, Q_host)]

    P = _to_jac_device(curve, P_host)
    Q = _to_jac_device(curve, Q_host)
    S = dc.batch_add(spec, P, Q)
    got = [
        dc.jacobian_to_host(curve, tuple(np.asarray(c)[i] for c in S))
        for i in range(len(P_host))
    ]
    assert got == expect


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_add_mixed(curve):
    spec = dc.spec_for(curve)
    n = 6
    P_host = _rand_points(curve, n, seed=9)
    Q_host = _rand_points(curve, n, seed=10)
    # make some edge rows
    P_host[0] = None
    Q_host[1] = None
    Q_host[2] = P_host[2]
    Q_host[3] = curve.neg(P_host[3])
    expect = [curve.add(a, b) for a, b in zip(P_host, Q_host)]

    P = _to_jac_device(curve, P_host)
    Qx, Qy, q_inf = dc.affine_to_device(curve, Q_host)
    S = dc.add_mixed(spec, P, Qx, Qy, np.array(q_inf))
    got = [
        dc.jacobian_to_host(curve, tuple(np.asarray(c)[i] for c in S))
        for i in range(n)
    ]
    assert got == expect
