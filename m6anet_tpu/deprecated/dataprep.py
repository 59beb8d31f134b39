"""Deprecated `m6anet-dataprep` console shim
(reference: m6anet/deprecated/dataprep.py)."""
import warnings

from ..scripts.dataprep import argparser  # noqa: F401
from ..scripts.dataprep import main as _main


def main(args=None):
    warnings.warn(
        "m6anet-dataprep is deprecated and will be removed in a future version; "
        "use `m6anet_tpu dataprep` instead",
        DeprecationWarning,
    )
    if args is None:
        args = argparser().parse_args()
    _main(args)
