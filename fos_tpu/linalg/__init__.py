from fos_tpu.linalg.cg import CGResult, CGState, conjugate_gradient  # noqa: F401
from fos_tpu.linalg import hsde_ops  # noqa: F401
from fos_tpu.linalg.affine import (  # noqa: F401
    AffinePlusLinearProjector,
    HSDEAffineProjector,
)
from fos_tpu.linalg.compensated import cdot, cnorm  # noqa: F401
from fos_tpu.linalg.sparse_ell import BlockedEllOp, bell_storage_ratio  # noqa: F401
