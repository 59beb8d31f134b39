from . import combine, indexer, runner, windowing  # noqa: F401
from .runner import is_successful, read_last_line, run_dataprep  # noqa: F401
