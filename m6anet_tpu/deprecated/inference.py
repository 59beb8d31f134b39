"""Deprecated `m6anet-run_inference` console shim (reference registers this exact name, setup.py:50-53)
(reference: m6anet/deprecated/inference.py)."""
import warnings

from ..scripts.inference import argparser  # noqa: F401
from ..scripts.inference import main as _main


def main(args=None):
    warnings.warn(
        "m6anet-run_inference is deprecated and will be removed in a future version; "
        "use `m6anet_tpu inference` instead",
        DeprecationWarning,
    )
    if args is None:
        args = argparser().parse_args()
    _main(args)
