from . import kernels, cells, wkb  # noqa: F401
