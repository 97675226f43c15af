from fos_tpu.solvers.base import (  # noqa: F401
    AP,
    Algorithm,
    ConeSet,
    DR,
    Dykstra,
    FISTA,
    GAP,
    GAPA,
    GAPP,
    SolverState,
    TwoSets,
    init_solver_state,
)
from fos_tpu.solvers.wrappers import (  # noqa: F401
    AndersonWrapper,
    LineSearchWrapper,
    LongstepWrapper,
)
from fos_tpu.solvers.status import Status  # noqa: F401
from fos_tpu.solvers import engine  # noqa: F401
