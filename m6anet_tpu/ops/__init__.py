from . import site_ops  # noqa: F401
