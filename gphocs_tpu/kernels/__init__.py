from gphocs_tpu.kernels.common import Context, make_context  # noqa: F401
