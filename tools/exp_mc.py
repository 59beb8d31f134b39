"""Experiment: MC site-probability variants on device (execution-verified).

Usage: python tools/exp_mc.py <variant> [n_timed]
Variants: sharedu | sharedu_log | pallasmc

Methodology identical to tools/bench_variants.py (chained data-dependent
lax.scan + tiny fetch; the relay's block_until_ready acks on enqueue).
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build_batch(read_capacity, site_capacity, seed=0):
    rng = np.random.default_rng(seed)
    offsets = np.zeros(site_capacity, np.int32)
    counts = np.zeros(site_capacity, np.int32)
    cursor = 0
    n_sites = 0
    while n_sites < site_capacity:
        n = int(min(max(rng.gamma(2.0, 30.0), 20), 1000))
        if cursor + n > read_capacity:
            break
        offsets[n_sites] = cursor
        counts[n_sites] = n
        cursor += n
        n_sites += 1
    p = rng.uniform(0, 1, size=read_capacity).astype(np.float32)
    return p, offsets, counts, n_sites, cursor


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "sharedu"
    n_timed = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax
    import jax.numpy as jnp

    site_capacity = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    read_capacity = int(sys.argv[4]) if len(sys.argv) > 4 else 524288
    n_iters, n_samples = 1000, 20
    n_chain = 2

    p, offsets, counts, n_sites, n_reads = build_batch(read_capacity, site_capacity)
    p_d, off_d, cnt_d = jnp.asarray(p), jnp.asarray(offsets), jnp.asarray(counts)
    f32 = jnp.float32

    if variant.startswith("sharedu"):
        base_key = jnp.zeros((2,), jnp.uint32)
        chunk = max(1, min(n_iters, (64 << 20) // max(1, site_capacity * n_samples * 8)))
        n_chunks, rem = divmod(n_iters, chunk)
        use_log = "log" in variant
        cntf = cnt_d.astype(jnp.float32)
        cmax = jnp.maximum(cnt_d - 1, 0)

        def sample_chunk(key, pp, size):
            u = jax.random.uniform(key, (size, n_samples))
            idx = jnp.minimum((u[:, :, None] * cntf).astype(jnp.int32), cmax)
            draws = pp[off_d[None, None, :] + idx]  # (size, ns, S)
            if use_log:
                s = jnp.sum(jnp.log1p(-draws), axis=1)
                return jnp.sum(-jnp.expm1(s), axis=0)
            prod = jnp.prod(1.0 - draws, axis=1)
            return jnp.sum(1.0 - prod, axis=0)

        def mc(pp):
            def body(acc, i):
                return acc + sample_chunk(jax.random.fold_in(base_key, i), pp, chunk), None

            total, _ = jax.lax.scan(body, jnp.zeros((site_capacity,), f32), jnp.arange(n_chunks))
            if rem:
                total = total + sample_chunk(jax.random.fold_in(base_key, n_chunks), pp, rem)
            mean = total / n_iters
            return jnp.where(cnt_d > 0, mean, 0.0)

    elif variant == "pallasmc":
        from m6anet_tpu.ops.mc_kernel import site_probability_mc_pallas

        base_key = jnp.zeros((2,), jnp.uint32)

        def mc(pp):
            return site_probability_mc_pallas(
                pp, off_d, cnt_d, base_key, n_iters=n_iters, n_samples=n_samples
            )

    else:
        raise SystemExit(f"unknown variant {variant}")

    @functools.partial(jax.jit, static_argnums=(1,))
    def chained(pp, n):
        def body(carry, _):
            sp = mc(pp + carry)
            return sp[0] * f32(1e-12), f32(sp[0])

        _, outs = jax.lax.scan(body, f32(0.0), None, length=n)
        return outs

    print(f"# {variant}: compiling...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    out = np.asarray(chained(p_d, n_chain))
    compile_s = time.perf_counter() - t0
    print(f"# warm at {compile_s:.1f}s out={out[:2]}", file=sys.stderr, flush=True)

    times = []
    for _ in range(n_timed):
        t0 = time.perf_counter()
        np.asarray(chained(p_d, n_chain))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(json.dumps({
        "variant": variant,
        "sites_per_sec": round(n_chain * n_sites / med, 1),
        "median_s": round(med, 4), "best_s": round(min(times), 4),
        "compile_s": round(compile_s, 1), "n_sites": n_sites, "n_reads": n_reads,
        "times": [round(t, 4) for t in times],
    }), flush=True)


if __name__ == "__main__":
    main()
