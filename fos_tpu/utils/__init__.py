from fos_tpu.utils.history import History  # noqa: F401
from fos_tpu.utils import printing  # noqa: F401
