"""Golden-output tests mirroring /root/reference/test/testprint.jl.

Problem: min ||Ax-b|| s.t. sum(x) = sum(xbar), A = sparse 500x1000 @ 0.1
density, b = A xbar.  Asserts the exact header strings for indirect (cg
column) vs direct modes, the iteration-row prefixes, the "Found solution"
line, and 1e-8 solution quality.  Also exercises the BCOO sparse-matrix
path end to end.
"""

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental import sparse as jsparse

from fos_tpu import GAPA, solve
from fos_tpu.cones import free, soc, zero, ConeSpec
from fos_tpu.cones.spec import Cone

O_INDIRECT = " Iter | pri res | dua res | rel gap | pri obj | dua obj | kap/tau | cg  | time"
O_DIRECT = " Iter | pri res | dua res | rel gap | pri obj | dua obj | kap/tau | time"


def norm_problem(sparse=True, seed=10, n=500):
    rng = np.random.default_rng(seed)
    N = 2 * n
    A = rng.standard_normal((n, N)) * (rng.random((n, N)) < 0.1)
    xbar = rng.standard_normal(N)
    b = A @ xbar

    # min t  s.t.  (t, b - A x) in SOC,  sum(x) = sum(xbar)
    # variables (t, x); K1 = SOC(1+n) x Zero(1); K2 = Free(1+N)
    nv = 1 + N
    Ac = np.zeros((1 + n + 1, nv))
    bc = np.zeros(1 + n + 1)
    Ac[0, 0] = -1.0                      # s0 = t
    Ac[1 : 1 + n, 1:] = A                # s_1.. = b - A x
    bc[1 : 1 + n] = b
    Ac[1 + n, 1:] = 1.0                  # sum(x) = sum(xbar)
    bc[1 + n] = xbar.sum()
    c = np.zeros(nv)
    c[0] = 1.0
    K1 = ConeSpec(((Cone.SOC, 1 + n), (Cone.ZERO, 1)))
    K2 = free(nv)
    Amat = jsparse.BCOO.fromdense(jnp.asarray(Ac)) if sparse else jnp.asarray(Ac)
    return Amat, bc, c, K1, K2, A, b, xbar


def _lines(captured):
    return captured.out.splitlines()


@pytest.mark.parametrize("direct", [False, True])
def test_golden_print(capsys, direct):
    Amat, bc, c, K1, K2, A, b, xbar = norm_problem(sparse=not direct)
    sol = solve(Amat, bc, c, K1, K2,
                alg=GAPA(0.8, 0.9, direct=direct), eps=1e-8, checki=100,
                verbose=2, debug=0, max_iters=4000)
    out = _lines(capsys.readouterr())
    assert out[0].startswith("Time to initialize: ")
    assert set(out[1]) == {"-"}
    assert out[2] == (O_DIRECT if direct else O_INDIRECT)
    assert set(out[3]) == {"-"}
    assert out[4][:7] == "   100|"
    found_idx = [k for k, l in enumerate(out) if l.startswith("Found solution i=")]
    assert found_idx, f"no 'Found solution' line in {out[-4:]}"
    for k, row in enumerate(out[4 : found_idx[0]]):
        assert row[:7] == f"{(k + 1) * 100:6d}|"
    assert out[-2] == "Time for iterations: "
    assert out[-1].endswith(" s")

    # solution quality (testprint.jl:44-46)
    x = np.asarray(sol.x[1:])
    assert abs(x.sum() - xbar.sum()) < 1e-7
    assert np.max(np.abs(A @ x - b)) < 1e-6


def test_row_formats():
    from fos_tpu.utils.printing import feasibility_row, hsde_row

    r = hsde_row(100, 5.07e-2, 1.18e-2, 1.21e-4, 2.0e-1, 2.0e-1, 0.0, 0.65, cgiter=41)
    assert r == "   100| 5.07e-02  1.18e-02  1.21e-04  2.00e-01 -2.00e-01  0.00e+00   41  6.5e-01s"
    r = hsde_row(100, 5.07e-2, 1.18e-2, 1.21e-4, 2.0e-1, 2.0e-1, 0.0, 0.65)
    assert r == "   100| 5.07e-02  1.18e-02  1.21e-04  2.00e-01 -2.00e-01  0.00e+00  6.5e-01s"
    r = feasibility_row(200, 3.08e-15, 0.13)
    assert r == "   200| 3.08e-15  1.3e-01s"
