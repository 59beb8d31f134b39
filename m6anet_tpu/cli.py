"""Single `m6anet_tpu` console entry point with subcommand registry
(reference: m6anet/__init__.py:11-30)."""
from __future__ import annotations

from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

MODULES = ["dataprep", "inference", "train", "compute_norm_factors", "convert"]


def main(argv=None):
    from . import __version__
    from .scripts import compute_norm_factors, convert, dataprep, inference, train

    modules = {
        "dataprep": dataprep,
        "inference": inference,
        "train": train,
        "compute_norm_factors": compute_norm_factors,
        "convert": convert,
    }

    parser = ArgumentParser(prog="m6anet_tpu", formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("-v", "--version", action="version", version=f"%(prog)s {__version__}")
    subparsers = parser.add_subparsers(
        title="subcommands", description="valid commands", help="additional help", dest="command"
    )
    subparsers.required = True

    for name in MODULES:
        mod = modules[name]
        p = subparsers.add_parser(name, parents=[mod.argparser()])
        p.set_defaults(func=mod.main)

    args = parser.parse_args(argv)
    args.func(args)
