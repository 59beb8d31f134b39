from . import combine, indexer, runner, windowing  # noqa: F401
from .runner import run_dataprep  # noqa: F401
