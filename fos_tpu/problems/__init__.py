from fos_tpu.problems.conic import ConicProblem, conic_problem  # noqa: F401
from fos_tpu.problems.hsde import HSDEForm, Solution, populate_solution  # noqa: F401
