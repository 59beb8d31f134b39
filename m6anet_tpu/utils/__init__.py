from . import treeio  # noqa: F401
