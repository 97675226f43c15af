"""Communication-volume regression tests (VERDICT r4 item 6).

SURVEY.md §5 budgets the distributed hot path at three collective points
(the CG dots and the matvec reduction — conjugategradients.jl:35,39,46
analogue); these tests pin the exact collective COUNT in the optimized
SPMD HLO on the 8-device virtual mesh, so a refactor (or a GSPMD
behavior change) that starts inserting extra collectives fails loudly:

* ``RowShardedOp.mv`` / ``rmv``: exactly ONE tiled all-gather, nothing else;
* ``RowShardedOp.mv_pair``: ONE all-gather (y1) + ONE all-reduce (the y2
  psum) — the fused pair must not pay more than mv + a reduction;
* hierarchical ("dcn","ici") mv_pair: one all-gather per mesh axis + the
  psum, and the big tile tables never move (no other collectives);
* standard CG on sharded vectors: 2 all-reduces per iteration body + 1 in
  the prologue = 3 in the module;
* pipelined (Chronopoulos–Gear) CG: the two dots per iteration must FUSE
  into ONE all-reduce (that is its entire point — cg.py:137-145): 2 in the
  module, i.e. exactly one fewer prologue+body reduction than standard;
* dense row-sharded q_mul matvec pair: one all-reduce for the A'z
  contraction + one all-gather to replicate the row-sharded A@x.

Counting happens on compiled HLO text (``jit(...).lower().compile()``), the
artifact GSPMD actually emits, not on the jaxpr the library wrote.
"""

import re

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fos_tpu.linalg.cg import conjugate_gradient, conjugate_gradient_pipelined
from fos_tpu.parallel import make_mesh

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
               "collective-permute")


def collective_counts(fn, *args, **jit_kw):
    txt = jax.jit(fn, **jit_kw).lower(*args).compile().as_text()
    return {k: len(re.findall(rf"\b{k}(?:-start)?\(", txt))
            for k in COLLECTIVES}


def _sharded_sparse_op(mesh, axis, m=768, n=640, density=0.02, seed=3):
    import scipy.sparse as sp

    from fos_tpu.linalg.sparse_ell import BlockedEllOp, RowShardedOp

    A = sp.random(m, n, density=density, random_state=seed, format="csr")
    return RowShardedOp.create(BlockedEllOp.create(A), mesh, axis), A


def _repl(mesh, *vs):
    """Commit vectors replicated — the RowShardedOp contract (x/y stay
    replicated; only tile tables are sharded).  Left uncommitted, jit
    AUTO-shards them and pays collective-permutes to redistribute, which
    is a caller layout bug, not the op's budget."""
    return tuple(jax.device_put(v, NamedSharding(mesh, P())) for v in vs)


def test_row_sharded_mv_rmv_one_all_gather():
    mesh = make_mesh((1, 8))
    op, _ = _sharded_sparse_op(mesh, "model")
    x, y = _repl(mesh, jnp.ones(op.n), jnp.ones(op.m))
    c_mv = collective_counts(lambda o, v: o.mv(v), op, x)
    c_rmv = collective_counts(lambda o, v: o.rmv(v), op, y)
    for c in (c_mv, c_rmv):
        assert c["all-gather"] == 1, c
        assert sum(c.values()) == 1, c  # nothing but the one gather


def test_row_sharded_mv_pair_budget():
    mesh = make_mesh((1, 8))
    op, A = _sharded_sparse_op(mesh, "model")
    x, z = _repl(mesh, jnp.ones(op.n), jnp.ones(op.m))
    c = collective_counts(lambda o, a, b: o.mv_pair(a, b), op, x, z)
    assert c["all-gather"] == 1, c   # y1 reassembly
    assert c["all-reduce"] == 1, c   # the y2 psum
    assert sum(c.values()) == 2, c
    # and it is still the right answer
    y1, y2 = jax.jit(lambda o, a, b: o.mv_pair(a, b))(op, x, z)
    np.testing.assert_allclose(np.asarray(y1), A @ np.ones(op.n), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), A.T @ np.ones(op.m), atol=1e-5)


def test_row_sharded_mv_pair_hierarchical_budget():
    """("dcn","ici") axes: one all-gather per mesh axis for y1 (inner-first
    reassembly) + the psum; the tile tables must not move (no
    all-to-all/permute/reduce-scatter ever)."""
    mesh = make_mesh((2, 4), names=("dcn", "ici"))
    op, _ = _sharded_sparse_op(mesh, ("dcn", "ici"))
    x, z = _repl(mesh, jnp.ones(op.n), jnp.ones(op.m))
    c = collective_counts(lambda o, a, b: o.mv_pair(a, b), op, x, z)
    assert c["all-gather"] == 2, c
    assert c["all-reduce"] == 1, c
    assert sum(c.values()) == 3, c


def test_cg_sharded_vectors_reduction_counts():
    """Standard CG: 1 prologue + 2 per-iteration all-reduces = 3 in the
    module (the while body appears once in HLO).  No other collectives:
    the diag matvec is pointwise-local on P('model')-sharded vectors."""
    mesh = make_mesh((1, 8))
    sh = NamedSharding(mesh, P("model"))
    n = 512
    d = jnp.linspace(1.0, 4.0, n)
    b = jnp.ones(n)

    def run(dd, bb):
        return conjugate_gradient(lambda v: dd * v, bb, jnp.zeros_like(bb),
                                  tol=1e-8, max_iters=50).x

    c = collective_counts(run, d, b, in_shardings=(sh, sh), out_shardings=sh)
    assert c["all-reduce"] == 3, c
    assert sum(c.values()) == 3, c


def test_cg_pipelined_fuses_dots_into_one_reduction():
    """Chronopoulos–Gear CG exists to halve reduction latency: the stacked
    (r·r, r·Ar) pair must compile to ONE all-reduce per iteration (and one
    in the prologue) — exactly one fewer each than standard CG."""
    mesh = make_mesh((1, 8))
    sh = NamedSharding(mesh, P("model"))
    n = 512
    d = jnp.linspace(1.0, 4.0, n)
    b = jnp.ones(n)

    def run(dd, bb):
        return conjugate_gradient_pipelined(
            lambda v: dd * v, bb, jnp.zeros_like(bb), tol=1e-8,
            max_iters=50).x

    c = collective_counts(run, d, b, in_shardings=(sh, sh), out_shardings=sh)
    assert c["all-reduce"] == 2, c
    assert sum(c.values()) == 2, c


def test_dense_row_sharded_pair_budget():
    """GSPMD path (shard_problem_rows layout): A P('model', None), vectors
    replicated.  A@x is row-local (then one all-gather to replicate);
    A'@z contracts over the sharded rows (one all-reduce).  The fused
    hsde_ops.mv_pair must stay within those two collectives."""
    from fos_tpu.linalg import hsde_ops

    mesh = make_mesh((1, 8))
    m, n = 256, 320
    A = jnp.asarray(np.random.default_rng(7).standard_normal((m, n)),
                    jnp.float32)
    sh_A = NamedSharding(mesh, P("model", None))
    repl = NamedSharding(mesh, P())
    x = jnp.ones(n, jnp.float32)
    z = jnp.ones(m, jnp.float32)

    c = collective_counts(
        lambda a, u, v: hsde_ops.mv_pair(a, u, v), A, x, z,
        in_shardings=(sh_A, repl, repl), out_shardings=(repl, repl))
    assert c["all-reduce"] == 1, c
    assert c["all-gather"] == 1, c
    assert sum(c.values()) == 2, c
