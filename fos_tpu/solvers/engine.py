"""Iteration engine.

Reference counterpart: ``solve!``/``iterate`` (src/solverwrapper.jl:2-41) —
option defaults, the hot loop, status-gated early exit, the final
``getsol`` and a forced convergence check if the loop exited unchecked.

TPU-native shape: the inner ``checki`` iterations run as one jitted
``lax.fori_loop`` chunk ending in an on-device residual check — no host
synchronization between convergence checks (SURVEY.md §7 "check-interval
control flow").  The Python-level chunk loop provides the observability
channel (status table, history) exactly where the reference prints its rows.

A fully-fused single-``while_loop`` variant for batched / sharded solves
lives in :func:`solve_fused`.
"""

from __future__ import annotations

import functools
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from fos_tpu.solvers.base import init_solver_state, SolverState
from fos_tpu.solvers.status import Status


DEFAULT_OPTIONS = dict(max_iters=10000, verbose=1, debug=1, eps=1e-5, checki=100)
"""Reference defaults (solverwrapper.jl:4-9)."""


@functools.partial(jax.jit, static_argnames=("alg", "nsteps", "eps"))
def _run_chunk(alg, form, st: SolverState, nsteps: int, eps: float):
    def body(_, st):
        return alg.step(form.sets, st)

    st = jax.lax.fori_loop(0, nsteps, body, st)
    chk = form.check(st.z_check, eps, prev=st.z_check_prev)
    return st, chk


@functools.partial(jax.jit, static_argnames=("alg", "nsteps"))
def _run_steps(alg, form, st: SolverState, nsteps: int):
    def body(_, st):
        return alg.step(form.sets, st)

    return jax.lax.fori_loop(0, nsteps, body, st)


@functools.partial(jax.jit, static_argnames=("alg", "eps"))
def _final_check(alg, form, st: SolverState, eps: float):
    guess, st = alg.getsol(form.sets, st)
    chk = form.check(guess, eps, prev=st.z_check)
    return guess, st, chk


@functools.partial(jax.jit, static_argnames=("alg",))
def _getsol(alg, form, st: SolverState):
    return alg.getsol(form.sets, st)


class RunResult(NamedTuple):
    guess: jnp.ndarray
    status: int
    iters: int
    history: Any
    state: SolverState


def run(form, alg, *, initx=None, init_duration: float = 0.0, **options) -> RunResult:
    """Chunked solve with reference-equivalent check/print/exit semantics."""
    opts = dict(DEFAULT_OPTIONS)
    opts.update(options)
    max_iters = int(opts["max_iters"])
    checki = int(opts["checki"])
    eps = float(opts["eps"])
    verbose = int(opts["verbose"])
    debug = int(opts["debug"])

    x0 = initx if initx is not None else form.initial_value(form.dtype)
    st = init_solver_state(alg, form.sets, x0)

    from fos_tpu.utils.history import History

    hist = History() if debug > 0 else None
    if verbose > 0:
        print(form.header(init_duration))
    t_iter0 = time.time()
    t_init = time.time()

    status_code = Status.CONTINUE
    i = 0
    checked = False
    nchunks, rem = divmod(max_iters, checki)
    for _ in range(nchunks):
        st, chk = _run_chunk(alg, form, st, checki, eps)
        i += checki
        checked = True
        status_code = int(chk.status)
        t_elapsed = time.time() - t_init
        form.record(hist, st, chk, i, t_elapsed, debug)
        if verbose > 0:
            print(form.row(st, chk, i, t_elapsed))
            if status_code == Status.OPTIMAL:
                print(f"Found solution i={i}")
        if status_code != Status.CONTINUE:
            break
    else:
        if rem > 0:
            st = _run_steps(alg, form, st, rem)
            i += rem
            checked = False

    if status_code != Status.CONTINUE or checked:
        guess, st = _getsol(alg, form, st)
    else:
        # Loop exited without a check at the final iteration: force one on the
        # solution guess (solverwrapper.jl:32-34, override=true).
        guess, st, chk = _final_check(alg, form, st, eps)
        status_code = int(chk.status)
        t_elapsed = time.time() - t_init
        form.record(hist, st, chk, i, t_elapsed, debug)
        if verbose > 0:
            print(form.row(st, chk, i, t_elapsed))
            if status_code == Status.OPTIMAL:
                print(f"Found solution i={i}")

    if verbose > 0:
        print("Time for iterations: ")
        print(f"{time.time() - t_iter0} s")
    return RunResult(guess=guess, status=status_code, iters=i, history=hist, state=st)
