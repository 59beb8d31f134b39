"""Deprecated `m6anet-inference` console shim
(reference: m6anet/deprecated/inference.py)."""
import warnings

from ..scripts.inference import argparser  # noqa: F401
from ..scripts.inference import main as _main


def main(args=None):
    warnings.warn(
        "m6anet-inference is deprecated and will be removed in a future version; "
        "use `m6anet_tpu inference` instead",
        DeprecationWarning,
    )
    if args is None:
        args = argparser().parse_args()
    _main(args)
