"""`m6anet_tpu convert` — migrate old data.index + data.readcount to data.info
(reference: m6anet/scripts/convert.py)."""
from __future__ import annotations

import os
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

import pandas as pd


def argparser():
    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter, add_help=False)
    parser.add_argument("--input_dir", required=True,
                        help="directory containing data.readcount and data.index.")
    parser.add_argument("--out_dir", required=True, help="directory to output data.info.")
    return parser


def main(args):
    os.makedirs(args.out_dir, exist_ok=True)
    data_index = pd.read_csv(os.path.join(args.input_dir, "data.index"))
    data_readcount = pd.read_csv(os.path.join(args.input_dir, "data.readcount"))
    data_info = data_readcount.merge(data_index, on=["transcript_id", "transcript_position"])
    data_info.to_csv(os.path.join(args.out_dir, "data.info"), index=False)
