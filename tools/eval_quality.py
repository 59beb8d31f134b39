"""In-repo model-quality benchmark: a synthesized labelled evaluation set
scored through the full pipeline with every pretrained model.

The reference publishes single-molecule ROC 0.89 / PR 0.90 on the
arabidopsis curlcake dataset (reference: README.md:271,
docs/source/release_notes.rst:146); that dataset is not available in this
environment, so this tool builds the in-repo stand-in: a labelled
evaluation set synthesized by resampling read-level feature rows from the
bundled labelled demo corpus (tests/data/data.info.labelled), sequence-
matched so k-mer content cannot leak the label, written in the dataprep
columnar format, scored end to end through the real inference CLI (device
engine + CSV contract), and reduced to site-level ROC-AUC / PR-AUC per
pretrained model.

[SYNTH] composition, [REAL] feature rows: every read vector is a real demo
measurement; only the site composition (which reads, how many, what label)
is synthetic.  Labels are known by construction: a synthetic site's reads
are drawn from demo sites of exactly one modification status.

Usage:
    python tools/eval_quality.py [--out_dir DIR] [--n_sites N]
        [--device cpu|tpu] [--models A,B,...] [--out_json FILE]
"""
import argparse
import csv
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA_DIR = os.path.join(REPO, "tests", "data")
LABELLED_INFO = os.path.join(DATA_DIR, "data.info.labelled")


def load_labelled_pools(work_dir: str, min_pool_reads: int = 40):
    """Per-(sequence, label) pools of raw read feature rows from the demo.

    Returns (pools, n_positions) where pools[seq] = {0: rows, 1: rows} and
    only sequences observed under BOTH labels survive — scoring then cannot
    separate the classes from sequence content, only from signal features.
    """
    from m6anet_tpu.data.columnar import ColumnarSiteDataset
    from m6anet_tpu.dataprep.runner import run_dataprep

    demo_dir = os.path.join(work_dir, "_demo")
    if not os.path.exists(os.path.join(demo_dir, "columnar", "meta.json")):
        run_dataprep(
            os.path.join(DATA_DIR, "eventalign.txt"),
            demo_dir,
            n_processes=2,
            readcount_min=1,
            readcount_max=1000,
            min_segment_count=20,
            n_neighbors=1,
            output_format="columnar",
        )
    demo = ColumnarSiteDataset(demo_dir, min_reads=1, norm_path=None, compute_norm=False)

    labels = {}
    with open(LABELLED_INFO) as f:
        for row in csv.DictReader(f):
            labels[(row["transcript_id"], int(row["transcript_position"]))] = int(
                row["modification_status"]
            )

    raw_pools = {}
    for i in range(len(demo)):
        site = demo.get_site(i)
        y = labels.get((site.tx_id, site.tx_pos))
        if y is None:
            continue
        raw_pools.setdefault(site.sequence, {0: [], 1: []})[y].append(site.features)

    pools = {}
    for seq, by_label in raw_pools.items():
        if not by_label[0] or not by_label[1]:
            continue
        merged = {y: np.concatenate(by_label[y], axis=0) for y in (0, 1)}
        if min(len(merged[0]), len(merged[1])) < min_pool_reads:
            continue
        pools[seq] = merged
    return pools, demo.n_positions


def build_eval_set(
    out_dir: str,
    n_sites: int,
    seed: int = 0,
    pos_frac: float = 0.5,
    count_range=(20, 200),
):
    """Write a labelled columnar eval set; returns {(tx_id, pos): label}."""
    from m6anet_tpu.data.columnar import ColumnarWriter

    pools, n_positions = load_labelled_pools(out_dir)
    if not pools:
        raise RuntimeError("no sequence has labelled reads of both classes")
    seqs = sorted(pools)
    rng = np.random.default_rng(seed)
    counts = np.clip(
        rng.lognormal(4.0, 0.8, n_sites), count_range[0], count_range[1]
    ).astype(np.int64)

    data_dir = os.path.join(out_dir, "data")
    writer = ColumnarWriter(data_dir, n_positions)
    truth = {}
    read_id = 0
    for s in range(n_sites):
        seq = seqs[int(rng.integers(len(seqs)))]
        y = int(rng.random() < pos_frac)
        pool = pools[seq][y]
        n = int(counts[s])
        rows = rng.integers(0, len(pool), n)
        tx_id = f"SYNQ{s // 256}.1"
        pos = 100 + s
        writer.append_site(
            tx_id, pos, seq, pool[rows],
            np.arange(read_id, read_id + n, dtype=np.int64),
        )
        truth[(tx_id, pos)] = y
        read_id += n
    writer.finalize()
    with open(os.path.join(data_dir, "data.info"), "w") as f:
        f.write("transcript_id,transcript_position,start,end,n_reads\n")
    with open(os.path.join(out_dir, "labels.csv"), "w") as f:
        f.write("transcript_id,transcript_position,modification_status\n")
        for (tx, pos), y in truth.items():
            f.write(f"{tx},{pos},{y}\n")
    print(f"eval set: {n_sites} sites / {read_id} reads, "
          f"{len(seqs)} label-balanced sequences, pos_frac={pos_frac}")
    return truth


def build_labelled_datajson(
    out_dir: str,
    n_sites: int,
    seed: int = 0,
    pos_frac: float = 0.5,
    count_range=(20, 60),
    splits=(0.6, 0.2, 0.2),
):
    """Labelled synthetic dataset in the reference's data.json/data.info
    format, so BOTH training stacks (ours and the reference torch loop) can
    train on it (reference contract: one JSON line per site,
    ``{"tx":{"pos":{"7mer":[[9 floats, read_id], ...]}}}``, with byte
    offsets + modification_status + set_type in data.info.labelled —
    reference: m6anet/utils/data_utils.py).

    Same resampling scheme as :func:`build_eval_set` (sequence-matched
    pools, labels known by construction); Train/Val/Test assigned by
    ``splits``.  Returns the dataset directory."""
    pools, _ = load_labelled_pools(out_dir)
    if not pools:
        raise RuntimeError("no sequence has labelled reads of both classes")
    seqs = sorted(pools)
    rng = np.random.default_rng(seed)
    counts = np.clip(
        rng.lognormal(3.6, 0.6, n_sites), count_range[0], count_range[1]
    ).astype(np.int64)

    ds_dir = os.path.join(out_dir, "labelled_ds")
    os.makedirs(ds_dir, exist_ok=True)
    info_rows = []
    offset = 0
    read_id = 0
    with open(os.path.join(ds_dir, "data.json"), "wb") as f:
        for s in range(n_sites):
            seq = seqs[int(rng.integers(len(seqs)))]
            y = int(rng.random() < pos_frac)
            pool = pools[seq][y]
            n = int(counts[s])
            rows = pool[rng.integers(0, len(pool), n)]
            payload = [
                [round(float(v), 10) for v in row] + [float(read_id + i)]
                for i, row in enumerate(rows)
            ]
            tx_id = f"SYNT{s // 256}.1"
            pos = 100 + s
            line = json.dumps(
                {tx_id: {str(pos): {seq: payload}}}, separators=(",", ":")
            ).encode() + b"\n"
            f.write(line)
            u = rng.random()
            set_type = (
                "Train" if u < splits[0]
                else ("Val" if u < splits[0] + splits[1] else "Test")
            )
            info_rows.append(
                f"{tx_id},{pos},{offset},{offset + len(line)},{n},{y},{set_type}\n"
            )
            offset += len(line)
            read_id += n
    header = (
        "transcript_id,transcript_position,start,end,n_reads,"
        "modification_status,set_type\n"
    )
    with open(os.path.join(ds_dir, "data.info.labelled"), "w") as f:
        f.write(header)
        f.writelines(info_rows)
    with open(os.path.join(ds_dir, "data.info"), "w") as f:
        f.write("transcript_id,transcript_position,start,end,n_reads\n")
        f.writelines(",".join(r.split(",")[:5]) + "\n" for r in info_rows)
    return ds_dir


def score_model(out_dir: str, model: str, device: str, truth: dict):
    """Run the real inference CLI for one pretrained model; return metrics."""
    from m6anet_tpu.train.metrics import get_pr_auc, get_roc_auc

    data_dir = os.path.join(out_dir, "data")
    run_dir = os.path.join(out_dir, f"out_{model}")
    cmd = [
        sys.executable, "-m", "m6anet_tpu", "inference",
        "--input_dir", data_dir, "--out_dir", run_dir,
        "--pretrained_model", model, "--device", device, "--columnar",
    ]
    # prepend the repo, INHERIT any platform site dirs already on
    # PYTHONPATH (ADVICE r4: no hardcoded environment-specific paths)
    inherited = os.environ.get("PYTHONPATH", "")
    pythonpath = REPO + (":" + inherited if inherited else "")
    env = dict(os.environ, PYTHONPATH=pythonpath)
    t0 = time.time()
    subprocess.run(cmd, check=True, env=env)
    wall = time.time() - t0

    y_true, y_pred = [], []
    with open(os.path.join(run_dir, "data.site_proba.csv")) as f:
        for row in csv.DictReader(f):
            key = (row["transcript_id"], int(row["transcript_position"]))
            if key in truth:
                y_true.append(truth[key])
                y_pred.append(float(row["probability_modified"]))
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    return {
        "model": model,
        "n_scored": int(len(y_true)),
        "roc_auc": round(float(get_roc_auc(y_true, y_pred)), 4),
        "pr_auc": round(float(get_pr_auc(y_true, y_pred)), 4),
        "wall_s": round(wall, 1),
    }


def main():
    from m6anet_tpu.constants import DEFAULT_PRETRAINED_MODELS

    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="/tmp/eval_quality")
    ap.add_argument("--n_sites", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--models", default=",".join(DEFAULT_PRETRAINED_MODELS))
    ap.add_argument("--out_json", default=None)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    truth = build_eval_set(args.out_dir, args.n_sites, seed=args.seed)

    results = []
    for model in args.models.split(","):
        res = score_model(args.out_dir, model, args.device, truth)
        results.append(res)
        print(f"{model:24s} ROC {res['roc_auc']:.3f}  PR {res['pr_auc']:.3f}  "
              f"({res['n_scored']} sites, {res['wall_s']}s)")

    print("\n[SYNTH composition / REAL demo feature rows] — in-repo stand-in "
          "for the reference's published arabidopsis ROC 0.89 / PR 0.90 "
          "(reference README.md:271; that dataset is not in this environment)")
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump({"n_sites": args.n_sites, "seed": args.seed,
                       "results": results}, f, indent=2)


if __name__ == "__main__":
    main()
