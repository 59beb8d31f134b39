"""`m6anet_tpu inference` — site/read modification probability calling.

Flag parity with the reference CLI (reference: m6anet/scripts/inference.py)
plus TPU-native knobs (--site_proba_method, --read_capacity, --site_capacity).
--n_processes sets the data.json payload-parsing thread count (the analog of
the reference DataLoader's num_workers); --batch_size and --save_per_batch
are accepted for compatibility but are no-ops: batching is capacity-based and
results are always fully flushed.
"""
from __future__ import annotations

import pathlib
import warnings
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

from ..constants import (
    DEFAULT_MIN_READS,
    DEFAULT_MODEL_CONFIG,
    DEFAULT_NORM_PATH,
    DEFAULT_PRETRAINED_MODEL,
    DEFAULT_PRETRAINED_MODELS,
    DEFAULT_READ_THRESHOLD,
    PRETRAINED_CONFIGS,
)


def argparser():
    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter, add_help=False)
    parser.add_argument("--input_dir", nargs="+", required=True,
                        help="directories containing data.info and data.json.")
    parser.add_argument("--out_dir", required=True,
                        help="directory to output inference results.")
    parser.add_argument("--pretrained_model", default=DEFAULT_PRETRAINED_MODEL, type=str,
                        help=f"pre-trained model. Options include {DEFAULT_PRETRAINED_MODELS}.")
    parser.add_argument("--model_config", default=DEFAULT_MODEL_CONFIG,
                        help="path to model config file.")
    parser.add_argument("--model_state_dict", default=None,
                        help="path to model weights (.npz native, or a reference .pt).")
    parser.add_argument("--norm_path", default=DEFAULT_NORM_PATH,
                        help="path to normalization factors file (.npz or reference .joblib).")
    parser.add_argument("--batch_size", default=16, type=int,
                        help="compatibility no-op (batching is capacity based).")
    parser.add_argument("--save_per_batch", default=2, type=int,
                        help="compatibility no-op (results are always flushed).")
    parser.add_argument("--n_processes", default=25, type=int,
                        help="host threads parsing data.json payloads (the native "
                             "parser releases the GIL; columnar input ignores this "
                             "— its feed is parse-free).")
    parser.add_argument("--num_iterations", default=1000, type=int,
                        help="number of sampling iterations (mc mode only).")
    parser.add_argument("--device", default="tpu", type=str,
                        help="jax platform to run on ('tpu' default; 'cpu' forces "
                             "the CPU backend).")
    parser.add_argument("--seed", default=0, type=int, help="random seed for mc sampling.")
    parser.add_argument("--read_proba_threshold", default=DEFAULT_READ_THRESHOLD, type=float,
                        help="probability threshold for a read to be considered modified.")
    parser.add_argument("--site_proba_method", default="exact", choices=["exact", "mc"],
                        help="exact = closed-form noisy-OR expectation; "
                             "mc = on-device emulation of the reference's sampling estimator.")
    parser.add_argument("--read_capacity", default=None, type=int,
                        help="reads per device batch (static shape); default "
                             "1048576 on TPU, 65536 on CPU (big batches "
                             "amortize per-dispatch host<->device latency).")
    parser.add_argument("--site_capacity", default=None, type=int,
                        help="sites per device batch (static shape); default "
                             "16384 on TPU, 1024 on CPU.")
    parser.add_argument("--min_reads", default=DEFAULT_MIN_READS, type=int,
                        help="minimum reads for a site to be scored.")
    parser.add_argument("--backend", default="auto",
                        choices=["auto", "xla", "pallas", "pallas_fused"],
                        help="per-read encoder backend. auto = fused Pallas "
                             "kernel on TPU for the production architecture, "
                             "XLA otherwise (pallas backends support only the "
                             "production architecture).")
    parser.add_argument("--precision", default="auto",
                        choices=["auto", "f32", "f32x3", "bf16"],
                        help="auto = f32x3 on the TPU fused path, f32 otherwise; "
                             "f32 = parity mode (6-pass HIGHEST matmuls); "
                             "f32x3 = 3-pass bf16x3 matmuls, ~f32-accurate "
                             "(within the 1e-5 per-read golden tolerance); "
                             "bf16 = fast mode (~1e-3 probability error). "
                             "f32x3/bf16 need a pallas backend.")
    parser.add_argument("--fetch_group", default=0, type=int,
                        help="batches per device->host result fetch: outputs "
                             "of this many dispatches are concatenated on "
                             "device and fetched in ONE transfer (0 = auto, "
                             "~256 MB of results, capped at 64 batches; 1 = "
                             "per-batch fetches).")
    parser.add_argument("--resume", default=False, action="store_true",
                        help="continue an interrupted run from the last "
                             "fully-written site.")
    parser.add_argument("--skip_indiv_proba", default=False, action="store_true",
                        help="write only data.site_proba.csv (per-read "
                             "probabilities are neither fetched from the "
                             "device nor rendered — ~97%% less result "
                             "transfer when only site-level calls are "
                             "needed).")
    parser.add_argument("--columnar", default=False, action="store_true",
                        help="read the columnar site store instead of data.json "
                             "(requires dataprep --format columnar).")
    parser.add_argument("--concat_shards", default=False, action="store_true",
                        help="treat multiple --input_dir directories as disjoint "
                             "dataprep shards (one logical dataset) instead of "
                             "replicates.")
    parser.add_argument("--distributed", default=False, action="store_true",
                        help="multi-host mode: jax.distributed.initialize(), shard "
                             "the site index by process index, write per-host CSV "
                             "shards (host 0 merges at the end).")
    parser.add_argument("--host_shard", nargs=2, type=int, default=None,
                        metavar=("HOST_ID", "N_HOSTS"),
                        help="manual host shard (alternative to --distributed).")
    return parser


def load_weights(model, path: str):
    """Load .npz native weights, or convert a reference torch .pt on the fly."""
    if path.endswith(".pt"):
        import torch  # conversion-time only; jax backend must already be up

        sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu").items()
              if hasattr(v, "numpy")}
        return {
            "block1": {"embedding": sd["read_level_encoder.1.embedding_layer.weight"]},
            "block3": {
                "w": sd["read_level_encoder.3.layers.0.weight"].T,
                "b": sd["read_level_encoder.3.layers.0.bias"],
                "bn_scale": sd["read_level_encoder.3.layers.1.weight"],
                "bn_bias": sd["read_level_encoder.3.layers.1.bias"],
                "bn_mean": sd["read_level_encoder.3.layers.1.running_mean"],
                "bn_var": sd["read_level_encoder.3.layers.1.running_var"],
            },
            "block4": {
                "w": sd["read_level_encoder.4.layers.0.weight"].T,
                "b": sd["read_level_encoder.4.layers.0.bias"],
            },
            "block5": {
                "w": sd["pooling_filter.probability_layer.0.weight"].T,
                "b": sd["pooling_filter.probability_layer.0.bias"],
            },
        }
    return model.load_npz(path)


def main(args):
    import tomllib

    import jax

    if getattr(args, "device", "tpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # persistent compilation cache: repeat CLI runs skip the 5-30s compile
    import os as _os

    cache_dir = _os.environ.get(
        "M6ANET_TPU_CACHE_DIR", _os.path.expanduser("~/.cache/m6anet_tpu/jax")
    )
    try:
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is best-effort

    if getattr(args, "distributed", False) and not jax.distributed.is_initialized():
        # multi-host runtime; coordinator/process env comes from the launcher
        # (a caller may also have initialized explicitly, e.g. the
        # multi-process distributed test, tests/distributed_worker.py)
        jax.distributed.initialize()

    jax.devices()  # initialise the backend before any torch import

    from ..data.dataset import build_dataset
    from ..inference.engine import run_inference
    from ..models.mil import MILModel

    if args.model_state_dict is not None:
        warnings.warn("--model_state_dict is specified, overwriting default model weights")
        norm_path = args.norm_path
        threshold = args.read_proba_threshold
    else:
        if args.pretrained_model not in PRETRAINED_CONFIGS:
            raise ValueError(
                f"Invalid pretrained model {args.pretrained_model}, must be one of {DEFAULT_PRETRAINED_MODELS}"
            )
        args.model_state_dict, threshold, norm_path = PRETRAINED_CONFIGS[args.pretrained_model]

    with open(args.model_config, "rb") as f:
        model_config = tomllib.load(f)
    model = MILModel(model_config)
    params = load_weights(model, args.model_state_dict)

    pathlib.Path(args.out_dir).mkdir(parents=True, exist_ok=True)

    input_dir = args.input_dir
    root_dir = input_dir[0] if len(input_dir) == 1 else list(input_dir)
    if getattr(args, "concat_shards", False):
        from ..data.dataset import ConcatSiteDataset

        dataset = ConcatSiteDataset(
            list(input_dir), columnar=getattr(args, "columnar", False),
            min_reads=args.min_reads, norm_path=norm_path, mode="Inference",
        )
    elif getattr(args, "columnar", False):
        if isinstance(root_dir, str):
            from ..data.columnar import ColumnarSiteDataset

            dataset = ColumnarSiteDataset(root_dir, min_reads=args.min_reads, norm_path=norm_path)
        else:  # multiple input dirs = replicates, like the data.json path
            from ..data.columnar import ReplicateColumnarDataset

            dataset = ReplicateColumnarDataset(root_dir, min_reads=args.min_reads, norm_path=norm_path)
    else:
        dataset = build_dataset(
            root_dir, min_reads=args.min_reads, norm_path=norm_path, mode="Inference"
        )

    host_shard = None
    if getattr(args, "distributed", False):
        host_shard = (jax.process_index(), jax.process_count())
    elif getattr(args, "host_shard", None):
        host_shard = tuple(args.host_shard)

    run_inference(
        model,
        params,
        dataset,
        args.out_dir,
        read_proba_threshold=threshold,
        num_iterations=args.num_iterations,
        method=args.site_proba_method,
        seed=args.seed,
        read_capacity=args.read_capacity
        or (65536 if jax.default_backend() == "cpu" else 1048576),
        site_capacity=args.site_capacity
        or (1024 if jax.default_backend() == "cpu" else 16384),
        backend=getattr(args, "backend", "auto"),
        precision=getattr(args, "precision", "auto"),
        resume=getattr(args, "resume", False),
        host_shard=host_shard,
        n_threads=getattr(args, "n_processes", 1),
        fetch_group=getattr(args, "fetch_group", 0),
        write_indiv=not getattr(args, "skip_indiv_proba", False),
    )

    if getattr(args, "distributed", False):
        # all hosts finish, then host 0 merges the CSV shards
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("m6anet_tpu_inference_done")
        if jax.process_index() == 0:
            from ..inference.engine import merge_host_shards

            merge_host_shards(
                args.out_dir, jax.process_count(),
                write_indiv=not getattr(args, "skip_indiv_proba", False),
            )
