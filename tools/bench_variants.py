"""Device benchmark of inference-step variants (execution-verified timing).

Runs ONE named variant per process so a hung relay kills only that variant:

    python tools/bench_variants.py xla_f32
    python tools/bench_variants.py fused_f32_b2048
    python tools/bench_variants.py mc1000_xla

Methodology (see PERFORMANCE.md "Measurement integrity"): the step runs
inside a data-dependent ``lax.scan`` chain (iterations serialized on device)
and a tiny output is fetched to the host, which provably waits for
execution — on this container's axon relay ``block_until_ready``
acknowledges on enqueue, not execution.  Reports best AND median of N timed
chains.

Output: one JSON line per run
  {"variant": ..., "sites_per_sec": ..., "reads_per_sec": ...,
   "median_s": ..., "best_s": ..., "n_chain": ..., "n_sites": ...,
   "n_reads": ...}
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build_batch(read_capacity, site_capacity, seed=0):
    """Synthetic batch in the production pack_sites layout (HEK293T-shaped
    read-count distribution; see bench.py)."""
    rng = np.random.default_rng(seed)
    features = rng.normal(size=(read_capacity, 9)).astype(np.float32)
    kmer_ids = rng.integers(0, 66, size=(read_capacity, 3)).astype(np.int32)
    site_ids = np.full(read_capacity, site_capacity, np.int32)
    offsets = np.zeros(site_capacity, np.int32)
    counts = np.zeros(site_capacity, np.int32)
    cursor = 0
    n_sites = 0
    while n_sites < site_capacity:
        n = int(min(max(rng.gamma(2.0, 30.0), 20), 1000))
        if cursor + n > read_capacity:
            break
        site_ids[cursor : cursor + n] = n_sites
        offsets[n_sites] = cursor
        counts[n_sites] = n
        cursor += n
        n_sites += 1
    return features, kmer_ids, site_ids, offsets, counts, n_sites, cursor


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "xla_f32"
    n_timed = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import os

    import jax
    import jax.numpy as jnp
    import tomllib

    # persistent compilation cache: kernel compiles through the relay's
    # remote_compile can take 8-15 min cold (the MC kernel especially);
    # repeat invocations of the same variant skip it
    cache_dir = os.environ.get(
        "M6ANET_TPU_CACHE_DIR", os.path.expanduser("~/.cache/m6anet_tpu/jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from m6anet_tpu.constants import (
        DEFAULT_MODEL_CONFIG,
        DEFAULT_MODEL_WEIGHTS,
        DEFAULT_READ_THRESHOLD,
    )
    from m6anet_tpu.models import load_model

    site_capacity, read_capacity = 65536, 4194304
    n_chain = 8
    if variant.startswith("mc"):
        # MC-1000 resamples ~310x the real read volume; smaller batches keep
        # the per-chunk gather buffers inside this relay slice's memory.
        # n_chain 16: the relay charges a fixed ~26 ms per dispatch+fetch
        # round trip (PERFORMANCE.md round-5 correction) — short chains
        # bury the measurement in it
        site_capacity, read_capacity, n_chain = 8192, 524288, 16
    if variant.startswith("mcstep"):
        # the engine's production composition: fused encoder kernel + MC
        # kernel in one program, at the TPU-default batch capacities
        site_capacity, read_capacity, n_chain = 16384, 1048576, 16

    with open(DEFAULT_MODEL_CONFIG, "rb") as f:
        config = tomllib.load(f)
    model, params = load_model(config, DEFAULT_MODEL_WEIGHTS)
    thr = DEFAULT_READ_THRESHOLD

    feats, kmers, site_ids, offsets, counts, n_sites, n_reads = build_batch(
        read_capacity, site_capacity
    )
    dev = tuple(jnp.asarray(a) for a in (feats, kmers, site_ids, offsets, counts))
    f32 = jnp.float32

    # ---- build the single-batch step for this variant ----
    if variant.startswith("fusedt"):
        from m6anet_tpu.ops.fused_infer_kernel import fused_inference_t, prepare_fused_params_t

        if "bf16" in variant:
            dt = jnp.bfloat16
        elif "f32x3" in variant:
            dt = "f32x3"
        else:
            dt = jnp.float32
        block = 4096
        for tok in variant.split("_"):
            if tok.startswith("b") and tok[1:].isdigit():
                block = int(tok[1:])
        probe = None
        for tok in ("nosite", "noembed"):
            if tok in variant:
                probe = tok

        def step(params, feats, kmers, sids, offs, cnts):
            fpt = prepare_fused_params_t(params)
            p, sp, mr = fused_inference_t(
                fpt, feats, kmers, sids, cnts, thr, 20, block_reads=block,
                compute_dtype=dt, probe=probe,
            )
            return p, sp, mr

    elif variant.startswith("fused"):
        from m6anet_tpu.ops.encoder_kernel import prepare_fused_params
        from m6anet_tpu.ops.fused_infer_kernel import fused_inference

        if "bf16" in variant:
            dt = jnp.bfloat16
        elif "f32x3" in variant:
            dt = "f32x3"
        else:
            dt = jnp.float32
        block = 2048
        for tok in variant.split("_"):
            if tok.startswith("b") and tok[1:].isdigit():
                block = int(tok[1:])

        probe = None
        for tok in ("nosite", "noembed"):
            if tok in variant:
                probe = tok

        def step(params, feats, kmers, sids, offs, cnts):
            fp = prepare_fused_params(params)
            p, sp, mr = fused_inference(
                fp, feats, kmers, sids, cnts, thr, 20, block_reads=block,
                compute_dtype=dt, probe=probe,
            )
            return p, sp, mr

    elif variant.startswith("pallas"):
        from m6anet_tpu.ops.encoder_kernel import fused_read_probability, prepare_fused_params
        from m6anet_tpu.ops import site_ops

        dt = jnp.bfloat16 if "bf16" in variant else jnp.float32
        block = 1024
        for tok in variant.split("_"):
            if tok.startswith("b") and tok[1:].isdigit():
                block = int(tok[1:])

        def step(params, feats, kmers, sids, offs, cnts):
            fp = prepare_fused_params(params)
            p = fused_read_probability(fp, feats, kmers, block_reads=block, compute_dtype=dt)
            sp = site_ops.site_probability_exact(p, sids, cnts, site_capacity, 20)
            mr = site_ops.mod_ratio_exact(p, sids, cnts, site_capacity, thr)
            return p, sp, mr

    elif variant.startswith("mcstep"):
        from m6anet_tpu.inference.engine import make_infer_step

        step_fn = make_infer_step(
            model, site_capacity, thr, 20, "mc", 1000, "pallas_fused", "f32x3",
        )
        base_key = jnp.zeros((2,), jnp.uint32)

        def step(params, feats, kmers, sids, offs, cnts):
            return step_fn(params, feats, kmers, sids, offs, cnts, base_key)

    elif variant.startswith("mc"):
        from m6anet_tpu.ops import site_ops

        n_iters = 1000
        base_key = jnp.zeros((2,), jnp.uint32)

        if "kernel" in variant:
            from m6anet_tpu.ops.mc_kernel import site_probability_mc_pallas

            def site_mc(p, offs, cnts):
                return site_probability_mc_pallas(p, offs, cnts, base_key, n_iters=n_iters)
        else:
            def site_mc(p, offs, cnts):
                return site_ops.site_probability_mc(p, offs, cnts, base_key, n_iters=n_iters)

        def step(params, feats, kmers, sids, offs, cnts):
            p = model.per_read_probability(params, {"X": feats, "kmer": kmers})
            sp = site_mc(p, offs, cnts)
            mr = site_ops.mod_ratio_exact(p, sids, cnts, site_capacity, thr)
            return p, sp, mr

    elif variant.startswith("train"):
        # chained training steps: params of step i feed step i+1, so the
        # scan is inherently serialized on device — same integrity property
        # as the inference chains.
        import jax.random as jrandom

        from m6anet_tpu.train.loop import make_optimizer, make_train_step
        from m6anet_tpu.train.losses import binary_cross_entropy_loss

        n_train_sites = 4096
        rng = np.random.default_rng(3)
        tbatch = {
            "X": jnp.asarray(rng.normal(size=(n_train_sites, 20, 9)), jnp.float32),
            "kmer": jnp.asarray(rng.integers(0, 66, size=(n_train_sites, 20, 3)), jnp.int32),
            "y": jnp.asarray(rng.integers(0, 2, size=(n_train_sites,)), jnp.float32),
        }
        optimizer = make_optimizer(lr=1e-4, weight_decay=1e-5, clip_grad=5.0)
        tstep = make_train_step(model, binary_cross_entropy_loss, optimizer)
        opt_state = optimizer.init(params)
        n_chain = 16

        @functools.partial(jax.jit, static_argnums=(3,))
        def chained_train(params, opt_state, key, n):
            def body(carry, i):
                p, s = carry
                np_, ns_, loss, _ = tstep(p, s, tbatch, jrandom.fold_in(key, i))
                return (np_, ns_), loss

            (_, _), losses = jax.lax.scan(body, (params, opt_state), jnp.arange(n))
            return losses

        print(f"# {variant}: compiling...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        np.asarray(chained_train(params, opt_state, jax.random.PRNGKey(0), n_chain))
        compile_s = time.perf_counter() - t0
        print(f"# {variant}: warm done at {compile_s:.1f}s", file=sys.stderr, flush=True)
        times = []
        for _ in range(n_timed):
            t0 = time.perf_counter()
            np.asarray(chained_train(params, opt_state, jax.random.PRNGKey(0), n_chain))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(json.dumps({
            "variant": variant,
            "train_sites_per_sec": round(n_chain * n_train_sites / med, 1),
            "ms_per_step": round(1000 * med / n_chain, 3),
            "median_s": round(med, 4), "best_s": round(min(times), 4),
            "compile_s": round(compile_s, 1), "n_chain": n_chain,
            "n_sites": n_train_sites,
            "times": [round(t, 4) for t in times],
        }), flush=True)
        return

    elif variant.startswith("xla"):

        def step(params, feats, kmers, sids, offs, cnts):
            p = model.per_read_probability(params, {"X": feats, "kmer": kmers})
            from m6anet_tpu.ops import site_ops

            sp = site_ops.site_probability_exact(p, sids, cnts, site_capacity, 20)
            mr = site_ops.mod_ratio_exact(p, sids, cnts, site_capacity, thr)
            return p, sp, mr

    else:
        raise SystemExit(f"unknown variant {variant}")

    @functools.partial(jax.jit, static_argnums=(6,))
    def chained(params, feats, kmers, sids, offs, cnts, n):
        def body(carry, _):
            p, sp, mr = step(params, feats + carry, kmers, sids, offs, cnts)
            return sp[0] * f32(1e-9), f32(sp[0])

        _, outs = jax.lax.scan(body, f32(0.0), None, length=n)
        return outs

    print(f"# {variant}: compiling...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    warm = chained(params, *dev, n_chain)
    print(f"# {variant}: enqueued at {time.perf_counter()-t0:.1f}s, fetching...",
          file=sys.stderr, flush=True)
    np.asarray(warm)
    compile_s = time.perf_counter() - t0
    print(f"# {variant}: warm done at {compile_s:.1f}s", file=sys.stderr, flush=True)

    times = []
    for _ in range(n_timed):
        t0 = time.perf_counter()
        out = chained(params, *dev, n_chain)
        np.asarray(out)
        times.append(time.perf_counter() - t0)

    best = min(times)
    med = float(np.median(times))
    print(
        json.dumps(
            {
                "variant": variant,
                "sites_per_sec": round(n_chain * n_sites / med, 1),
                "reads_per_sec": round(n_chain * n_reads / med, 1),
                "median_s": round(med, 4),
                "best_s": round(best, 4),
                "best_sites_per_sec": round(n_chain * n_sites / best, 1),
                "compile_s": round(compile_s, 1),
                "n_chain": n_chain,
                "n_sites": n_sites,
                "n_reads": n_reads,
                "times": [round(t, 4) for t in times],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
