"""Device probe: where does the MC op's time actually go?

Times three jitted programs with the chained-scan methodology:
  full    — site_probability_mc_pallas as shipped
  gather  — ONLY the host-side XLA prep (argsort + dense_p window gather)
  kernel  — ONLY the pallas_call, fed a precomputed dense_p

Usage: python tools/probe_mc.py [n_chain]
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    n_chain = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    import jax
    import jax.numpy as jnp

    from m6anet_tpu.ops import mc_kernel as mk

    site_capacity, read_capacity = 8192, 524288
    rng = np.random.default_rng(0)
    counts = np.zeros(site_capacity, np.int32)
    offsets = np.zeros(site_capacity, np.int32)
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
    p = rng.uniform(0.01, 0.99, cursor).astype(np.float32)
    p = np.concatenate([p, np.zeros(read_capacity - cursor, np.float32)])
    key = jnp.zeros((2,), jnp.uint32)
    pd, od, cd = jnp.asarray(p), jnp.asarray(offsets), jnp.asarray(counts)
    f32 = jnp.float32

    w = 1024
    G = 128
    s_pad = -(-site_capacity // G) * G

    def prep(p, offsets, counts):
        # mirrors mc_kernel.py's shipped prep (round 5b): argsort + ROW
        # gather of covering rows + shifts.  See "gather_slice"/"gather_elem"
        # for the replaced formulations (7.3 / 67 ms per batch).
        order = jnp.argsort(counts)
        counts_s = jnp.zeros((s_pad,), jnp.int32).at[:site_capacity].set(counts[order])
        offsets_s = jnp.zeros((s_pad,), jnp.int32).at[:site_capacity].set(offsets[order])
        rows, shifts = mk.window_rows(p, offsets_s, w, G)
        return counts_s, rows, shifts

    counts_s_host, rows_host, shifts_host = jax.jit(prep)(pd, od, cd)
    counts_s_host.block_until_ready()
    runs_host = jax.jit(functools.partial(mk.run_decomposition, G=G))(counts_s_host)
    runs_host[0].block_until_ready()

    def run(tag, step):
        @functools.partial(jax.jit, static_argnums=(1,))
        def chained(args, n):
            def body(carry, _):
                out = step(*args, carry)
                return out.reshape(-1)[0] * f32(1e-12), out.reshape(-1)[0]

            _, outs = jax.lax.scan(body, f32(0.0), None, length=n)
            return outs

        warm = chained(argsets[tag], n_chain)
        np.asarray(warm)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chained(argsets[tag], n_chain))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(json.dumps({"probe": tag, "ms_per_batch": round(1000 * med / n_chain, 2),
                          "times": [round(t, 4) for t in times]}), flush=True)

    def full_step(p, offsets, counts, carry):
        return mk.site_probability_mc_pallas(p + carry, offsets, counts, key, n_iters=1000)

    def make_probed(tag):
        def step(p, offsets, counts, carry):
            # WRONG results by design — times the op with one stage disabled
            return mk.site_probability_mc_pallas(
                p + carry, offsets, counts, key, n_iters=1000, probe=tag
            )
        return step

    def gather_step(p, offsets, counts, carry):
        _, rows, shifts = prep(p + carry, offsets, counts)
        return jnp.sum(rows, axis=(1, 2)) + jnp.sum(shifts.astype(jnp.float32))

    def gather_slice_step(p, offsets, counts, carry):
        # the round-5a vmapped dynamic_slice window gather, kept for
        # comparison (per-slice-overhead-bound: ~0.9 us x s_pad)
        order = jnp.argsort(counts)
        offsets_s = jnp.zeros((s_pad,), jnp.int32).at[:site_capacity].set(offsets[order])
        p_pad = jnp.concatenate([p + carry, jnp.zeros((w,), jnp.float32)])
        dense = jax.vmap(lambda o: jax.lax.dynamic_slice(p_pad, (o,), (w,)))(offsets_s)
        return jnp.sum(dense, axis=1)

    def gather_elem_step(p, offsets, counts, carry):
        # the round-3 per-element index-matrix gather, kept for comparison
        order = jnp.argsort(counts)
        offsets_s = jnp.zeros((s_pad,), jnp.int32).at[:site_capacity].set(offsets[order])
        p_pad = jnp.concatenate([p + carry, jnp.zeros((w,), jnp.float32)])
        dense = p_pad[offsets_s[:, None] + jnp.arange(w)[None, :]]
        return jnp.sum(dense, axis=1)

    def kernel_step(counts_s, run_start, block_lo, block_hi, rows, shifts, carry):
        u = jax.random.uniform(jax.random.fold_in(key, 0), (20, 1000), jnp.float32)
        return mk.mc_chunk_call(
            counts_s, run_start, block_lo, block_hi, u, rows + carry, shifts,
            n_samples=20, w=w, t_chunk=1000, G=G,
        )

    argsets = {
        "full": (pd, od, cd),
        "full_norebuild": (pd, od, cd),
        "full_nomatvec": (pd, od, cd),
        "gather": (pd, od, cd),
        "gather_elem": (pd, od, cd),
        "gather_slice": (pd, od, cd),
        "full_noshift": (pd, od, cd),
        "kernel": (counts_s_host, *runs_host, rows_host, shifts_host),
    }
    steps = {
        "full": full_step, "gather": gather_step,
        "full_norebuild": make_probed("norebuild"),
        "full_nomatvec": make_probed("nomatvec"),
        "full_noshift": make_probed("noshift"),
        "gather_elem": gather_elem_step, "gather_slice": gather_slice_step,
        "kernel": kernel_step,
    }
    which = sys.argv[2].split(",") if len(sys.argv) > 2 else ["gather", "kernel", "full"]
    for tag in which:
        run(tag, steps[tag])


if __name__ == "__main__":
    main()
