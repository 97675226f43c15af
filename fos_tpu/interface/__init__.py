from fos_tpu.interface.api import solve  # noqa: F401
