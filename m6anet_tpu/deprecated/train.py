"""Deprecated `m6anet-train` console shim
(reference: m6anet/deprecated/train.py)."""
import warnings

from ..scripts.train import argparser  # noqa: F401
from ..scripts.train import main as _main


def main(args=None):
    warnings.warn(
        "m6anet-train is deprecated and will be removed in a future version; "
        "use `m6anet_tpu train` instead",
        DeprecationWarning,
    )
    if args is None:
        args = argparser().parse_args()
    _main(args)
