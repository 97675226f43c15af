"""The reference's 'problematic problems' tier, enabled.

/root/reference/test/testspecific.jl (disabled in runtests.jl:27-28) holds
two Convex.jl problems that stressed the reference solvers.  Here they are
expressed directly in conic form and actually asserted.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fos_tpu import DR, GAPA, solve
from fos_tpu.cones import ConeSpec, free, nonneg
from fos_tpu.cones.spec import Cone
from fos_tpu.cones.project import svec


def test_unattained_infimum_sdp():
    # testspecific.jl test 1: min x + y11 s.t. y (3x3) PSD, x >= 1, y21 = 1.
    # The infimum is 1 (x -> 1, y11 -> 0 with y22 -> inf via the Schur
    # minor y11*y22 >= y21^2 = 1) and is NOT attained — a deliberately
    # nasty instance.  The solver must drive the objective toward 1 from
    # above without diverging or crashing.
    # Variables: (x, yvec[6]) with yvec = svec(y) (lower-tri col-stacked:
    # y11, y21, y31, y22, y32, y33; sqrt2 scaling on off-diagonals).
    nv = 7
    s2 = float(np.sqrt(2.0))
    rows = []
    bs = []
    blocks = []
    # x >= 1  (s = x - 1 >= 0  ->  -x + s' = -1 form: A x + s = b with
    # s in NonNeg: row -x, b = -1)
    r = np.zeros((1, nv)); r[0, 0] = -1.0
    rows.append(r); bs.append([-1.0]); blocks.append((Cone.NONNEG, 1))
    # y21 == 1: svec entry index 1 holds sqrt2*y21
    r = np.zeros((1, nv)); r[0, 2] = 1.0
    rows.append(r); bs.append([s2]); blocks.append((Cone.ZERO, 1))
    # y PSD: slack s = yvec in PSD cone -> rows -I on yvec, b = 0
    r = np.zeros((6, nv)); r[:, 1:] = -np.eye(6)
    rows.append(r); bs.append(np.zeros(6)); blocks.append((Cone.PSD, 6))

    A = np.vstack(rows)
    b = np.concatenate([np.atleast_1d(v) for v in bs])
    c = np.zeros(nv)
    c[0] = 1.0   # x
    c[1] = 1.0   # y11 (diagonal svec entry, unscaled)
    K1 = ConeSpec(tuple(blocks))

    sol = solve(A, b, c, K1, free(nv), alg=DR(), eps=1e-6, verbose=0,
                max_iters=100000, checki=100)
    # objective approaches the infimum 1 from above; x pinned at 1
    assert 0.99 <= sol.objval <= 1.2
    assert abs(float(sol.x[0]) - 1.0) < 1e-2
    # y21 constraint held
    assert abs(float(sol.x[2]) / np.sqrt(2.0) - 1.0) < 1e-2


def test_norm2_socp_500x200():
    # testspecific.jl test 2: min ||A x + b||, A = randn(500, 200) — an
    # unconstrained least-norm SOCP; oracle = numpy least squares.
    rng = np.random.default_rng(1)
    m, n = 500, 200
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    xls, res, *_ = np.linalg.lstsq(A, -b, rcond=None)
    opt = float(np.linalg.norm(A @ xls + b))

    # conic form: variables (x, t); min t s.t. (t, A x + b) in SOC
    nv = n + 1
    soc_t = np.zeros((1, nv)); soc_t[0, n] = -1.0
    soc_x = np.concatenate([-A, np.zeros((m, 1))], axis=1)
    Ac = np.vstack([soc_t, soc_x])
    bc = np.concatenate([[0.0], b])
    c = np.zeros(nv); c[n] = 1.0

    K1 = ConeSpec(((Cone.SOC, m + 1),))
    sol = solve(Ac, bc, c, K1, free(nv), alg=GAPA(0.8, 0.9), eps=1e-8,
                verbose=0, max_iters=40000)
    assert sol.status == "Optimal"
    assert abs(sol.objval - opt) < 1e-5 * (1 + opt)
    x = np.asarray(sol.x[:n])
    assert np.linalg.norm(A @ x + b) < opt * (1 + 1e-5) + 1e-6


def _socp_500x200():
    rng = np.random.default_rng(1)
    m, n = 500, 200
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    xls, *_ = np.linalg.lstsq(A, -b, rcond=None)
    opt = float(np.linalg.norm(A @ xls + b))
    nv = n + 1
    soc_t = np.zeros((1, nv)); soc_t[0, n] = -1.0
    soc_x = np.concatenate([-A, np.zeros((m, 1))], axis=1)
    Ac = np.vstack([soc_t, soc_x])
    bc = np.concatenate([[0.0], b])
    c = np.zeros(nv); c[n] = 1.0
    return Ac, bc, c, ConeSpec(((Cone.SOC, m + 1),)), nv, opt


@pytest.mark.parametrize("nsave", [2, 5])
def test_longstep_gapa_on_hsde_socp(nsave):
    """VERDICT r2 item 7: the exact testspecific.jl wrapped configurations
    LongstepWrapper(GAPA(direct=true), longinterval=50, nsave=2/5) on the
    norm2 SOCP (testspecific.jl:23-33) — on the HSDE, not just
    feasibility problems."""
    from fos_tpu.solvers.wrappers import LongstepWrapper

    Ac, bc, c, K1, nv, opt = _socp_500x200()
    alg = LongstepWrapper(alg=GAPA(0.8, 0.9, direct=True),
                          longinterval=50, nsave=nsave)
    sol = solve(Ac, bc, c, K1, free(nv), alg=alg, eps=1e-8, verbose=0,
                max_iters=40000, checki=10)
    assert sol.status == "Optimal"
    assert abs(sol.objval - opt) < 1e-5 * (1 + opt)


def test_linesearch_gapa_on_hsde_socp():
    from fos_tpu.solvers.wrappers import LineSearchWrapper

    Ac, bc, c, K1, nv, opt = _socp_500x200()
    alg = LineSearchWrapper(alg=GAPA(0.8, 0.9), lsinterval=100)
    sol = solve(Ac, bc, c, K1, free(nv), alg=alg, eps=1e-8, verbose=0,
                max_iters=40000)
    assert sol.status == "Optimal"
    assert abs(sol.objval - opt) < 1e-5 * (1 + opt)


def test_longstep_gapa_on_unattained_sdp():
    """testspecific.jl:8 config — LongstepWrapper(GAPA(direct), 900, 4) on
    the unattained-infimum SDP: must drive the objective toward the
    infimum 1 without diverging (same contract as the plain-DR test)."""
    from fos_tpu.solvers.wrappers import LongstepWrapper

    nv = 7
    s2 = float(np.sqrt(2.0))
    r1 = np.zeros((1, nv)); r1[0, 0] = -1.0
    r2 = np.zeros((1, nv)); r2[0, 2] = 1.0
    r3 = np.zeros((6, nv)); r3[:, 1:] = -np.eye(6)
    A = np.vstack([r1, r2, r3])
    b = np.concatenate([[-1.0], [s2], np.zeros(6)])
    c = np.zeros(nv); c[0] = 1.0; c[1] = 1.0
    K1 = ConeSpec(((Cone.NONNEG, 1), (Cone.ZERO, 1), (Cone.PSD, 6)))
    alg = LongstepWrapper(alg=GAPA(1.0, 0.0, direct=True),
                          longinterval=900, nsave=4)
    sol = solve(A, b, c, K1, free(nv), alg=alg, eps=1e-6, verbose=0,
                max_iters=100000, checki=100)
    assert 0.99 <= sol.objval <= 1.2
    assert abs(float(sol.x[0]) - 1.0) < 1e-2
    assert abs(float(sol.x[2]) / s2 - 1.0) < 1e-2


def test_longstep_config_sensitivity_bounded():
    """Characterize the config sensitivity the reference inherited (its
    longstep tests are disabled): across a (longinterval, nsave) grid on
    an HSDE SOCP, every config must terminate Optimal at eps=1e-6 and
    match the oracle — i.e. the sensitivity is bounded to ITERATION COUNT,
    never correctness."""
    from fos_tpu.solvers.wrappers import LongstepWrapper

    rng = np.random.default_rng(3)
    m, n = 120, 60
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    xls, *_ = np.linalg.lstsq(A, -b, rcond=None)
    opt = float(np.linalg.norm(A @ xls + b))
    nv = n + 1
    soc_t = np.zeros((1, nv)); soc_t[0, n] = -1.0
    soc_x = np.concatenate([-A, np.zeros((m, 1))], axis=1)
    Ac = np.vstack([soc_t, soc_x])
    bc = np.concatenate([[0.0], b])
    c = np.zeros(nv); c[n] = 1.0
    K1 = ConeSpec(((Cone.SOC, m + 1),))

    iters = {}
    for longinterval in (50, 200):
        for nsave in (2, 4):
            alg = LongstepWrapper(alg=GAPA(0.8, 0.9, direct=True),
                                  longinterval=longinterval, nsave=nsave)
            sol = solve(Ac, bc, c, K1, free(nv), alg=alg, eps=1e-6,
                        verbose=0, max_iters=60000, checki=10)
            assert sol.status == "Optimal", (longinterval, nsave)
            assert abs(sol.objval - opt) < 1e-4 * (1 + opt), \
                (longinterval, nsave)
            iters[(longinterval, nsave)] = sol.iters
    # sensitivity bound: worst config within 25x of the best
    assert max(iters.values()) <= 25 * max(min(iters.values()), 1), iters
