"""Benchmark: device-resident inference throughput (sites/s) on real hardware.

Workload mirrors the reference's published benchmark dataset shape (HEK293T:
95,030 sites / 8,019,824 reads => ~84 reads/site; BASELINE.md): synthetic
normalized features with a realistic read-count distribution, packed exactly
as production batches, scored by the full inference step (per-read encoder +
exact noisy-OR site aggregation + mod_ratio).

MEASUREMENT INTEGRITY: on this container's axon relay,
``jax.block_until_ready`` acknowledges on *enqueue*, not execution
(discovered 2026-08-18 — a 32-step chained scan "completed" in 0 ms).  The
timed region therefore runs the step inside a ``lax.scan`` whose iterations
are data-dependent (serialized on device) and fetches the tiny (n,) output
to the host, which provably waits for execution.  Calibration on the same
device: a dense 8192^3 matmul chain sustains ~14 TFLOP/s (f32 == bf16
throughput), so this relay's chip is far below physical v5e peak — treat
the absolute numbers as a lower bound for real hardware.

Baseline: reference v2.0.0 inference on AMD EPYC 7R32 with 25 processes,
1000 MC iterations => 95,030 sites / 408.17 s = 232.8 sites/s (BASELINE.md).

Prints ONE JSON line:
  {"metric": "inference_sites_per_sec", "value": N, "unit": "sites/s",
   "vs_baseline": N / 232.8}
"""
import functools
import json
import time

import numpy as np

BASELINE_SITES_PER_SEC = 95030 / 408.17


def build_batch(read_capacity=4194304, site_capacity=65536, seed=0):
    rng = np.random.default_rng(seed)
    features = rng.normal(size=(read_capacity, 9)).astype(np.float32)
    kmer_ids = rng.integers(0, 66, size=(read_capacity, 3)).astype(np.int32)
    site_ids = np.full(read_capacity, site_capacity, np.int32)
    offsets = np.zeros(site_capacity, np.int32)
    counts = np.zeros(site_capacity, np.int32)
    cursor = 0
    n_sites = 0
    while n_sites < site_capacity:
        # read-count distribution ~ demo/HEK293T shape: 20..1000, mean ~80
        n = int(min(max(rng.gamma(2.0, 30.0), 20), 1000))
        if cursor + n > read_capacity:
            break
        site_ids[cursor : cursor + n] = n_sites
        offsets[n_sites] = cursor
        counts[n_sites] = n
        cursor += n
        n_sites += 1
    return features, kmer_ids, site_ids, offsets, counts, n_sites


def main():
    import os

    import jax
    import jax.numpy as jnp
    import tomllib

    # persistent compilation cache (same location as the CLI): repeat bench
    # invocations skip the multi-second step compile
    cache_dir = os.environ.get(
        "M6ANET_TPU_CACHE_DIR", os.path.expanduser("~/.cache/m6anet_tpu/jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is best-effort

    from m6anet_tpu.constants import (
        DEFAULT_MODEL_CONFIG,
        DEFAULT_MODEL_WEIGHTS,
        DEFAULT_READ_THRESHOLD,
    )
    from m6anet_tpu.inference.engine import make_infer_step
    from m6anet_tpu.models import load_model

    # Big batches keep the device busy per dispatch (~160 MB inputs); on the
    # CPU backend (no TPU attached) use a small shape so the bench stays
    # quick.  Backend: the transposed fused Pallas kernel (round 4: reads on
    # lanes, banded rank-2 embedding selection, MXU hi/mid/lo site
    # reduction, one merged k=15 first layer at HIGHEST, block 16384) at
    # precision f32x3 — the fastest configuration that passes the
    # reference's golden contract (demo CLI on the TPU: indiv max|diff|
    # 6.1e-6 <= 1e-5, site 3.8e-3 <= 1e-2, mod_ratio 4.6e-8; see
    # PERFORMANCE.md).  bf16 runs ~9.8M sites/s at site-level tolerance
    # only; full-parity f32 modes: fused ~1.2M, XLA 1.157M.
    if jax.default_backend() == "cpu":
        site_capacity, read_capacity, n_chain = 1024, 65536, 2
        backend, precision = "xla", "f32"  # pallas interpret mode is slow on CPU
    else:
        # n_chain 32: one dispatch+fetch round trip through the relay costs a
        # FIXED ~26 ms regardless of chain length (measured 2026-08-21 with a
        # trivial-body chain), so short chains understate steady-state
        # throughput — at 8 steps that overhead was ~27% of the measurement
        site_capacity, read_capacity, n_chain = 65536, 4194304, 32
        backend, precision = "pallas_fused", "f32x3"

    with open(DEFAULT_MODEL_CONFIG, "rb") as f:
        config = tomllib.load(f)
    model, params = load_model(config, DEFAULT_MODEL_WEIGHTS)

    f32 = jnp.float32
    feats, kmers, site_ids, offsets, counts, n_sites = build_batch(
        read_capacity=read_capacity, site_capacity=site_capacity
    )
    dev = tuple(jnp.asarray(a) for a in (feats, kmers, site_ids, offsets, counts))
    base_key = jnp.zeros((2,), jnp.uint32)

    step = make_infer_step(
        model, site_capacity, DEFAULT_READ_THRESHOLD, backend=backend, precision=precision
    )

    @functools.partial(jax.jit, static_argnums=(7,))
    def chained(params, feats, kmers, site_ids, offsets, counts, key, n):
        """n serialized full inference steps: iteration i+1's input depends on
        iteration i's output, so enqueue-acknowledging runtimes cannot report
        completion before the work is actually done."""

        def body(carry, _):
            p, sp, mr = step(params, feats + carry, kmers, site_ids, offsets, counts, key)
            return sp[0] * f32(1e-9), f32(sp[0])

        _, outs = jax.lax.scan(body, f32(0.0), None, length=n)
        return outs

    warm = chained(params, *dev, base_key, n_chain)
    np.asarray(warm)  # device->host fetch: waits for real execution

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(params, *dev, base_key, n_chain)
        np.asarray(out)  # (n_chain,) floats — tiny, but forces completion
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))

    sites_per_sec = n_chain * n_sites / med
    print(
        json.dumps(
            {
                "metric": "inference_sites_per_sec",
                "value": round(sites_per_sec, 1),
                "unit": "sites/s",
                "vs_baseline": round(sites_per_sec / BASELINE_SITES_PER_SEC, 1),
                "config": f"{backend}/{precision}, median of 3 chains, "
                          "synthetic HEK293T-shaped batch",
                "best_value": round(n_chain * n_sites / min(times), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
