"""`m6anet_tpu train` — train an m6A MIL model from TOML configs.

Flag parity with the reference CLI (reference: m6anet/scripts/train.py) plus
``--clip_grad`` and ``--resume_epoch`` (the reference's training engine has an
``epoch_increment`` resume hook that its CLI never exposes —
reference: m6anet/utils/training_utils.py:67).
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

from ..constants import DEFAULT_MODEL_CONFIG, TRAIN_CONFIG_TEMPLATE


def argparser():
    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter, add_help=False)
    parser.add_argument("--model_config", default=DEFAULT_MODEL_CONFIG, help="path to model config file.")
    parser.add_argument("--train_config", required=True,
                        help="path to training config file (ready-to-edit "
                             f"template packaged at {TRAIN_CONFIG_TEMPLATE}).")
    parser.add_argument("--save_dir", required=True, help="directory to output training results.")
    parser.add_argument("--device", default="tpu", type=str,
                        help="jax platform to run on ('tpu' default; 'cpu' forces "
                             "the CPU backend).")
    parser.add_argument("--lr", default=4e-4, type=float, help="training learning rate.")
    parser.add_argument("--seed", default=25, type=int, help="random seed for training.")
    parser.add_argument("--epochs", default=50, type=int, help="number of training epochs.")
    parser.add_argument("--n_processes", default=25, type=int,
                        help="number of loader threads.")
    parser.add_argument("--save_per_epoch", default=10, type=int,
                        help="number of epoch multiple to save training checkpoint.")
    parser.add_argument("--weight_decay", default=0, type=float,
                        help="weight decay (classic L2, torch-Adam semantics).")
    parser.add_argument("--num_iterations", default=5, type=int,
                        help="number of passes during evaluation step.")
    parser.add_argument("--clip_grad", default=None, type=float,
                        help="optional global-norm gradient clipping.")
    parser.add_argument("--resume_epoch", default=0, type=int,
                        help="epoch offset when resuming from a checkpoint.")
    parser.add_argument("--resume_from", default=None,
                        help="checkpoint to resume from: a params .npz, a "
                             "checkpoint directory, or 'auto' to pick the "
                             "latest under save_dir.")
    parser.add_argument("--use_mesh", default="auto", choices=["auto", "on", "off"],
                        help="data-parallel training over all local devices "
                             "(auto = when more than one device is visible).")
    parser.add_argument("--reseed_on_stall", default=False, action="store_true",
                        help="detect the saturated noisy-OR plateau (loss ~6.9, "
                             "ROC ~0.5 — a known fixed point of this model "
                             "family in BOTH stacks, PERFORMANCE.md) and "
                             "auto-restart with a derived seed.")
    parser.add_argument("--stall_patience", default=20, type=int,
                        help="consecutive plateau epochs before a restart "
                             "(with --reseed_on_stall).")
    parser.add_argument("--max_restarts", default=3, type=int,
                        help="restart budget for --reseed_on_stall.")
    parser.add_argument("--init_probability_bias", default=None, type=float,
                        help="saturation-aware init: set the probability "
                             "layer's bias to this value (e.g. -4) so a fresh "
                             "init starts outside the saturated noisy-OR "
                             "region.  Changes the init distribution vs the "
                             "reference; off by default.")
    return parser


def main(args):
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

    jax.devices()  # initialise backend first (see tests/conftest.py note)

    import numpy as np

    from ..models.mil import MILModel
    from ..train.builder import build_dataloader, build_loss_function
    from ..train.loop import make_eval_step, make_optimizer, train, validate
    from ..utils.config import dump_toml, load_toml
    from ..utils.treeio import load_tree, save_tree

    np.random.seed(args.seed)

    model_config = load_toml(args.model_config)
    train_config = load_toml(args.train_config)

    save_dir = args.save_dir
    print(f"Saving training information to {save_dir}")
    os.makedirs(save_dir, exist_ok=True)

    train_info = {
        "model_config": model_config,
        "train_config": {
            **train_config,
            "learning_rate": args.lr,
            "epochs": args.epochs,
            "save_per_epoch": args.save_per_epoch,
            "weight_decay": args.weight_decay,
            "number_of_validation_iterations": args.num_iterations,
            "seed": args.seed,
        },
    }
    dump_toml(train_info, os.path.join(save_dir, "train_info.toml"))

    model = MILModel(model_config)
    optimizer = make_optimizer(args.lr, args.weight_decay, args.clip_grad)

    opt_state = None
    if args.resume_from:
        from ..train.checkpoint import latest_checkpoint, restore_checkpoint

        target = args.resume_from
        if target == "auto":
            target = latest_checkpoint(save_dir)
            if target is None:
                raise ValueError(f"no checkpoint found under {save_dir}")
        if os.path.isdir(target):
            params, opt_state, epoch = restore_checkpoint(target, optimizer)
            if not args.resume_epoch:
                args.resume_epoch = epoch
        else:
            params = load_tree(target)
    else:
        params = model.init(jax.random.PRNGKey(args.seed))

    init_bias = getattr(args, "init_probability_bias", None)

    def init_fn(s):
        p = model.init(jax.random.PRNGKey(s))
        if init_bias is not None:
            from ..train.loop import saturation_aware_init

            p = saturation_aware_init(model, p, bias=init_bias)
        return p

    if init_bias is not None and not args.resume_from:
        from ..train.loop import saturation_aware_init

        params = saturation_aware_init(model, params, bias=init_bias)

    mesh = None
    use_mesh = getattr(args, "use_mesh", "auto")
    if use_mesh == "on" or (use_mesh == "auto" and len(jax.devices()) > 1):
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
        n_dev = len(mesh.devices.flat)
        for section in train_config["dataloader"].values():
            section["pad_to_multiple"] = n_dev
        print(f"Data-parallel training over {n_dev} devices")

    train_dl, val_dl, test_dl = build_dataloader(train_config, args.n_processes)

    loss_fn = build_loss_function(dict(train_config["loss_function"]))

    params, train_results, val_results = train(
        model,
        params,
        train_dl,
        val_dl,
        optimizer,
        args.epochs,
        loss_fn,
        save_dir=save_dir,
        save_per_epoch=args.save_per_epoch,
        epoch_increment=args.resume_epoch,
        n_iterations=args.num_iterations,
        seed=args.seed,
        opt_state=opt_state,
        mesh=mesh,
        init_fn=init_fn,
        reseed_on_stall=getattr(args, "reseed_on_stall", False),
        stall_patience=getattr(args, "stall_patience", 20),
        max_restarts=getattr(args, "max_restarts", 3),
    )

    def _dump_results(results, path):
        clean = {
            k: [v.tolist() if hasattr(v, "tolist") else v for v in vals]
            for k, vals in results.items()
            if k not in ("y_pred", "y_true")
        }
        with open(path, "w", encoding="utf-8") as f:
            json.dump(clean, f, indent=2)

    _dump_results(train_results, os.path.join(save_dir, "train_results.json"))
    _dump_results(val_results, os.path.join(save_dir, "val_results.json"))

    # Best-model selection per criterion over saved checkpoints + test eval
    # (reference: m6anet/scripts/train.py:107-131).
    eval_step = make_eval_step(model, loss_fn)
    for criterion in ("avg_loss", "roc_auc", "pr_auc"):
        series = [
            val_results[criterion][i]
            for i in range(0, len(val_results[criterion]), args.save_per_epoch)
        ]
        if criterion == "avg_loss":
            best_epoch = (int(np.argmin(series)) + 1) * args.save_per_epoch
        else:
            best_epoch = (int(np.argmax(series)) + 1) * args.save_per_epoch
        # checkpoints are saved under GLOBAL epoch numbers (epoch +
        # resume offset), so a resumed run must select with the same offset
        best_epoch += getattr(args, "resume_epoch", 0) or 0
        ckpt = os.path.join(save_dir, "model_states", str(best_epoch), "model_states.npz")
        best_params = load_tree(ckpt)
        save_tree(os.path.join(save_dir, f"{criterion}.npz"), best_params)

        test_results = validate(eval_step, best_params, test_dl, loss_fn, args.num_iterations)
        print(f"Criteria: {criterion} \tCompute time: {test_results['compute_time']:.3f}")
        print(
            f"Test Loss: {test_results['avg_loss']:.3f} \t"
            f"Test ROC AUC: {test_results['roc_auc']:.3f} \t "
            f"Test PR AUC: {test_results['pr_auc']:.3f}"
        )
        print("=====================================")
        _dump_results(
            {k: [v] for k, v in test_results.items() if k not in ("y_pred", "y_true")},
            os.path.join(save_dir, f"test_results_{criterion}.json"),
        )
