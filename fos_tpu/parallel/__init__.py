from fos_tpu.parallel.batched import (  # noqa: F401
    build_batched_form,
    solve_batched,
)
from fos_tpu.linalg.sparse_ell import RowShardedOp  # noqa: F401
from fos_tpu.parallel.sharding import (  # noqa: F401
    make_hybrid_mesh,
    make_mesh,
    shard_batched_form,
    shard_batched_form_rows,
    shard_problem_2d,
    shard_problem_rows,
)
