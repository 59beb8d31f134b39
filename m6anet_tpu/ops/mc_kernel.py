"""Pallas Monte-Carlo site-probability kernel.

Replays the reference's sampling estimator — per site, ``n_iters`` iterations
of 20 reads drawn uniformly with replacement, averaged noisy-OR
(reference: m6anet/utils/inference_utils.py:74-87) — as one device kernel
that is MXU-bound instead of gather-bound.

Design (2026-08-20, round 3):

* **Shared draws.** One uniform matrix ``U (n_samples, T)`` per iteration
  chunk, derived from the run key only.  Site s draws read
  ``floor(U[j,t] * count_s)`` — exactly uniform over its reads, so the
  per-site estimator is distributed identically to the reference's; draws
  are correlated *across* sites (the reference's forked mp.Pool RNGs are
  too), and results are placement-invariant by construction: they depend
  only on (seed, count, the site's read probabilities).
* **Count-keyed draw histogram.** The per-iteration noisy-OR needs
  ``sum_j log1p(-p[draw_j])``, i.e. ``K @ l`` where ``K[t,r]`` counts how
  often read r is drawn in iteration t.  K depends only on the site's read
  COUNT, so sites are sorted by count (host-invisible: results are
  unsorted at the end) and ``KT (W, T)`` lives in VMEM scratch, rebuilt
  only when the count changes — ~hundreds of rebuilds per batch instead of
  one gather per draw.
* **Per-site MXU matvec.** ``S = l^T @ KT`` with l the site's
  ``log1p(-p)`` row, streamed as a pipelined (1, W) block from a dense
  per-site window matrix.  KT entries are small integers (exact in bfloat16),
  so a 2-pass hi/lo split of l gives ~f32 accuracy at 2 MXU passes.
  Then ``site_p = 1 - mean_t exp(S_t)``.
* **Chunked W (round 4).** Both the rebuild and the matvec walk only
  ``ceil(count/128)`` 128-row chunks of the W window, not the full
  read_cap: rebuild VPU traffic and matvec MXU k-tiles scale with each
  site's REAL read count.  At the HEK293T count distribution (mean ~84
  reads/site, cap 1024) that is ~8x less work than the round-3 kernel,
  with bit-identical semantics (rows beyond a site's ceiling chunk are
  provably zero: counts are sorted ascending, so rebuilds only ever extend
  the written prefix over the step-0 zero fill).

Cost per 8192-site batch at n_iters=1000 (round-3 full-W numbers were
~2 GFLOP of matvec + ~12 G VPU ops of K builds): both now scale by
mean(ceil(c/128)*128)/W, versus 164M random HBM gathers for the XLA
fallback (m6anet_tpu/ops/site_ops.py::site_probability_mc).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_READ_CAP = 1024  # >= dataprep's default readcount_max (1000)
LANE = 128


def _mc_kernel(
    counts_ref,  # scalar-prefetch SMEM (n_sites_pad,) — sorted read counts
    u_ref,  # (n_samples, T) f32 VMEM — shared draws
    p_ref,  # (1, G, W) f32 VMEM — G sites' read windows (from dense_p)
    out_ref,  # (1, G) f32 — this step's G per-site sum_t exp(S_t)
    kt_ref,  # (W, T) bf16 scratch — draw histogram for the current count
    lhi_ref,  # (G, W) bf16 scratch — log1p(-p) high parts, whole block
    llo_ref,  # (G, W) bf16 scratch — log1p(-p) residuals
    *, n_samples: int, W: int, T: int, G: int, probe=None,
):
    i = pl.program_id(0)
    # G sites per grid step (round 4b): the round-4a kernel ran one site per
    # step, and its measured 84 ms/batch was per-step overhead — 8192
    # sequential steps each pipelining a tiny (1,1,W)=4 KB block — not
    # compute (~5 ms).  This version DMAs G=128 site windows per step (512
    # KB, good granularity) and walks the sites in a fori_loop.
    #
    # chunked-W (round 4a, kept): both the histogram rebuild and the matvec
    # walk only ceil(count/128) 128-row chunks of the W window, so the
    # dominant costs scale with each site's REAL read count (~8x less work
    # than full-W at the HEK293T count distribution, mean ~84 reads).  Rows
    # at or above a site's ceiling chunk are never written after the step-0
    # zero fill (counts are sorted ascending, so rebuilds only ever extend
    # the written prefix), and within the last chunk rows >= c get exact
    # zeros from the compare — skipping them is exact, not approximate.

    @pl.when(i == 0)
    def _zero_kt():
        kt_ref[:] = jnp.zeros_like(kt_ref)

    # whole-block log1p(-p), split hi+lo into bf16 scratch once per step;
    # clamp: p==1.0 gives log1p(-1)=-inf, and 0 * -inf would NaN through
    # the matmul for reads that are never drawn
    l = jnp.maximum(jnp.log1p(-p_ref[0]), -1e4)  # (G, W) f32
    l_hi = l.astype(jnp.bfloat16)
    lhi_ref[:] = l_hi
    llo_ref[:] = (l - l_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    rows = jax.lax.broadcasted_iota(jnp.int32, (LANE, T), 0)
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)

    def site_body(g, acc):
        s = i * G + g
        c = counts_ref[s]
        wc = (c + LANE - 1) // LANE  # chunks this site actually needs

        # rebuild the histogram only when the (sorted) count changes
        prev_c = counts_ref[jnp.maximum(s, 1) - 1]
        do_rebuild = (s == 0) | (c != prev_c)
        if probe == "norebuild":  # perf probe: stale kt (wrong results)
            do_rebuild = s == 0

        @pl.when(do_rebuild)
        def _rebuild_kt():
            cf = c.astype(jnp.float32)
            # floor(u*c) clamped to c-1 (f32 boundary rounding); c==0
            # padding sites clamp to -1, matching no row — KT stays zero,
            # exp(0)=1, and the wrapper masks them out anyway
            idx = jnp.minimum((u_ref[:] * cf).astype(jnp.int32), c - 1)

            def build_chunk(k, _):
                off = pl.multiple_of(k * LANE, LANE)
                rk = rows + off
                a = jnp.zeros((LANE, T), jnp.float32)
                for j in range(n_samples):
                    a += (rk == idx[j, :][None, :]).astype(jnp.float32)
                kt_ref[pl.ds(off, LANE), :] = a.astype(jnp.bfloat16)  # exact
                return 0

            jax.lax.fori_loop(0, wc, build_chunk, 0)

        # site g's l-row is selected with a (1, G) one-hot MXU contraction
        # against the scratch block (exact: one nonzero per product), chunk
        # by chunk, and contracted against the matching KT chunk
        onehot_g = (lane_g == g).astype(jnp.bfloat16)  # (1, G)

        def mat_chunk(k, s_acc):
            off = pl.multiple_of(k * LANE, LANE)
            row_hi = jnp.dot(onehot_g, lhi_ref[:, pl.ds(off, LANE)],
                             preferred_element_type=jnp.float32)
            row_lo = jnp.dot(onehot_g, llo_ref[:, pl.ds(off, LANE)],
                             preferred_element_type=jnp.float32)
            ktc = kt_ref[pl.ds(off, LANE), :]  # (LANE, T)
            return (
                s_acc
                + jnp.dot(row_hi.astype(jnp.bfloat16), ktc,
                          preferred_element_type=jnp.float32)
                + jnp.dot(row_lo.astype(jnp.bfloat16), ktc,
                          preferred_element_type=jnp.float32)
            )

        n_mat = jnp.int32(0) if probe == "nomatvec" else wc
        s_log = jax.lax.fori_loop(0, n_mat, mat_chunk, jnp.zeros((1, T), jnp.float32))
        sum_exp = jnp.sum(jnp.exp(s_log))
        return acc + jnp.where(lane_g == g, sum_exp, 0.0)

    out_ref[:] = jax.lax.fori_loop(
        0, G, site_body, jnp.zeros((1, G), jnp.float32)
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "n_samples", "read_cap", "interpret", "probe"),
)
def site_probability_mc_pallas(
    p: jnp.ndarray,  # (N,) f32 flat packed read probabilities
    offsets: jnp.ndarray,  # (S,) i32 first-read offset per site
    counts: jnp.ndarray,  # (S,) i32 true read counts (0 = padding site)
    base_key: jnp.ndarray,
    n_iters: int = 1000,
    n_samples: int = 20,
    read_cap: int = DEFAULT_READ_CAP,
    interpret: bool = False,
    probe: str | None = None,  # perf instrumentation: "norebuild"/"nomatvec"
) -> jnp.ndarray:
    """MC site probabilities, one value per site (0 for count-0 padding).

    ``read_cap`` (static, multiple of 128) must be >= every site's count;
    the engine validates batches against it before dispatch.
    """
    if read_cap % LANE != 0:
        raise ValueError(f"read_cap must be a multiple of {LANE}, got {read_cap}")
    n_sites = counts.shape[0]
    w = read_cap
    G = 128  # sites per grid step (DMA granularity G*w*4 = 512 KB at w=1024)
    order = jnp.argsort(counts)
    s_pad = -(-n_sites // G) * G
    counts_s = jnp.zeros((s_pad,), jnp.int32).at[:n_sites].set(counts[order])
    offsets_s = jnp.zeros((s_pad,), jnp.int32).at[:n_sites].set(offsets[order])
    p_pad = jnp.concatenate([p.astype(jnp.float32), jnp.zeros((w,), jnp.float32)])
    # dense per-site read windows: one contiguous w-slice per (sorted) site,
    # streamed into the kernel as pipelined (1, G, w) blocks (a Mosaic 1D
    # dynamic-offset DMA cannot prove tile alignment, so the slicing happens
    # here in XLA instead).  vmapped dynamic_slice, NOT p_pad[offs[:,None] +
    # arange(w)]: the latter hands XLA an (S, w) index matrix that lowers to
    # per-ELEMENT gathers (measured 67 ms/batch on device, 90% of the whole
    # MC op); contiguous slice-gathers run the same windows in 14 ms.
    dense_p = jax.vmap(
        lambda o: jax.lax.dynamic_slice(p_pad, (o,), (w,))
    )(offsets_s).reshape(s_pad // G, G, w)

    chunk = min(n_iters, 1024)
    n_chunks, rem = divmod(n_iters, chunk)
    sizes = [chunk] * n_chunks + ([rem] if rem else [])

    total = jnp.zeros((s_pad,), jnp.float32)
    for ci, t_chunk in enumerate(sizes):
        u = jax.random.uniform(
            jax.random.fold_in(base_key, ci), (n_samples, t_chunk), jnp.float32
        )
        out = pl.pallas_call(
            functools.partial(
                _mc_kernel, n_samples=n_samples, W=w, T=t_chunk, G=G, probe=probe
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(s_pad // G,),
                in_specs=[
                    pl.BlockSpec(u.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, G, w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, G), lambda i, *_: (0, i),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((w, t_chunk), jnp.bfloat16),
                    pltpu.VMEM((G, w), jnp.bfloat16),
                    pltpu.VMEM((G, w), jnp.bfloat16),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((1, s_pad), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * s_pad * w * t_chunk,
                bytes_accessed=s_pad * w * 4,
                transcendentals=s_pad * (w + t_chunk),
            ),
            interpret=interpret,
        )(counts_s, u, dense_p)
        total = total + out.reshape(-1)

    site_p_sorted = 1.0 - total / n_iters
    res = jnp.zeros((n_sites,), jnp.float32).at[order].set(site_p_sorted[:n_sites])
    return jnp.where(counts > 0, res, 0.0)
