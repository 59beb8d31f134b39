"""Replicate the reference's headline inference benchmark at full scale.

The reference reports 408.17 s for `m6anet inference` over the HEK293T
corpus — 95,030 sites / 8,019,824 reads — on 25 EPYC cores with
--num_iterations 1000 (reference: README.md:245-249,
docs/source/release_notes.rst:110-119).  This tool builds a synthetic
dataset with exactly that shape (feature rows resampled from the bundled
demo corpus so k-mer/feature joint statistics stay realistic) and times our
full inference CLI — featurize, device encoder, site probabilities, CSV
rendering — end to end on it.

Usage:
    python tools/bench_headline.py [--out_dir DIR] [--sites N] [--reads N]
                                   [--device cpu|tpu] [--mc]
"""
import argparse
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_SITES = 95_030
REF_READS = 8_019_824
REF_SECONDS = 408.17


def build_dataset(out_dir: str, n_sites: int, n_reads_total: int, seed: int = 0):
    """Columnar store with the HEK293T workload shape, sampled from the demo."""
    from m6anet_tpu.data.columnar import ColumnarSiteDataset, ColumnarWriter
    from m6anet_tpu.dataprep.runner import run_dataprep

    demo_dir = os.path.join(out_dir, "_demo")
    if not os.path.exists(os.path.join(demo_dir, "columnar", "meta.json")):
        run_dataprep(
            os.path.join(REPO, "tests", "data", "eventalign.txt"),
            demo_dir,
            n_processes=2,
            readcount_min=1,
            readcount_max=1000,
            min_segment_count=20,
            n_neighbors=1,
            output_format="columnar",
        )
    demo = ColumnarSiteDataset(demo_dir, min_reads=20, norm_path=None, compute_norm=False)
    demo_sites = [demo.get_site(i) for i in range(len(demo))]
    print(f"demo template: {len(demo_sites)} sites")

    rng = np.random.default_rng(seed)
    # Read-count profile: lognormal clipped to the reference's dataprep
    # bounds [20, 1000], scaled to the exact corpus total.
    counts = np.clip(rng.lognormal(4.0, 0.8, n_sites), 20, 1000).astype(np.int64)
    counts = np.maximum(20, counts * n_reads_total // counts.sum())
    # exact total: distribute the remainder over the largest sites
    diff = n_reads_total - int(counts.sum())
    order = np.argsort(counts)[::-1]
    bump = np.zeros(n_sites, np.int64)
    if diff >= 0:
        bump[order[: diff % n_sites]] = 1
        counts += diff // n_sites + bump
    else:
        take = -diff
        i = 0
        while take > 0:
            room = int(counts[order[i]]) - 20
            d = min(room, take)
            counts[order[i]] -= d
            take -= d
            i += 1
    assert counts.sum() == n_reads_total and counts.min() >= 20

    writer = ColumnarWriter(out_dir, demo.n_positions)
    read_id = 0
    t0 = time.time()
    for s in range(n_sites):
        tmpl = demo_sites[s % len(demo_sites)]
        feats = tmpl.features
        n = int(counts[s])
        rows = rng.integers(0, len(feats), n)
        writer.append_site(
            f"SYNTX{s // 256}.1",
            int(tmpl.tx_pos) + s,
            tmpl.sequence,
            feats[rows],
            np.arange(read_id, read_id + n, dtype=np.int64),
        )
        read_id += n
    writer.finalize()
    print(f"built {n_sites} sites / {n_reads_total} reads in {time.time()-t0:.1f}s")

    # data.info so the CLI's dataset construction can see site counts
    with open(os.path.join(out_dir, "data.info"), "w") as f:
        f.write("transcript_id,transcript_position,start,end,n_reads\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="/tmp/headline_bench")
    ap.add_argument("--sites", type=int, default=REF_SITES)
    ap.add_argument("--reads", type=int, default=REF_READS)
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--n_processes", type=int, default=os.cpu_count())
    ap.add_argument("--mc", action="store_true", help="MC site probabilities (1000 iters) instead of exact")
    ap.add_argument("--read_capacity", type=int, default=None,
                    help="override the CLI's batch read capacity (fewer, "
                         "bigger batches amortize the relay's flat per-fetch "
                         "device-to-host latency)")
    ap.add_argument("--site_capacity", type=int, default=None)
    ap.add_argument("--repeat", type=int, default=1,
                    help="time N runs and report median alongside best "
                         "(host timing on this shared VM varies ~3x)")
    args = ap.parse_args()

    data_dir = os.path.join(args.out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    if not os.path.exists(os.path.join(data_dir, "columnar", "meta.json")):
        build_dataset(data_dir, args.sites, args.reads)

    out_dir = os.path.join(args.out_dir, "out")
    cmd = [
        sys.executable, "-m", "m6anet_tpu", "inference",
        "--input_dir", data_dir, "--out_dir", out_dir,
        "--pretrained_model", "HCT116_RNA002",
        "--device", args.device, "--columnar",
        "--n_processes", str(args.n_processes),
    ]
    if args.mc:
        cmd += ["--site_proba_method", "mc", "--num_iterations", "1000"]
    if args.read_capacity is not None:
        cmd += ["--read_capacity", str(args.read_capacity)]
    if args.site_capacity is not None:
        cmd += ["--site_capacity", str(args.site_capacity)]
    # inherit platform site dirs from the caller's PYTHONPATH (no hardcoded
    # environment-specific paths)
    inherited = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, PYTHONPATH=REPO + (":" + inherited if inherited else ""))
    times = []
    for _ in range(max(1, args.repeat)):
        t0 = time.time()
        subprocess.run(cmd, check=True, env=env)
        times.append(time.time() - t0)
    best, med = min(times), float(np.median(times))

    n_rows = sum(1 for _ in open(os.path.join(out_dir, "data.site_proba.csv"))) - 1
    print(
        f"\nheadline [SYNTHETIC-REPLICA INPUTS — demo features resampled to "
        f"the HEK293T shape]: {n_rows} sites / {args.reads} reads; "
        f"median {med:.1f}s / best {best:.1f}s of {len(times)} "
        f"({n_rows/med:.0f} sites/s median) — reference: {REF_SITES} real "
        f"sites in {REF_SECONDS}s ({REF_SITES/REF_SECONDS:.0f} sites/s on "
        f"25 cores); median speedup {REF_SECONDS/med * n_rows/REF_SITES:.1f}x"
    )


if __name__ == "__main__":
    main()
