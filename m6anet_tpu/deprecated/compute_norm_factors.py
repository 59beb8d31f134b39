"""Deprecated `m6anet-compute_norm_factors` console shim
(reference: m6anet/deprecated/compute_norm_factors.py)."""
import warnings

from ..scripts.compute_norm_factors import argparser  # noqa: F401
from ..scripts.compute_norm_factors import main as _main


def main(args=None):
    warnings.warn(
        "m6anet-compute_norm_factors is deprecated and will be removed in a future version; "
        "use `m6anet_tpu compute_norm_factors` instead",
        DeprecationWarning,
    )
    if args is None:
        args = argparser().parse_args()
    _main(args)
