"""Pallas Monte-Carlo site-probability kernel.

Replays the reference's sampling estimator — per site, ``n_iters`` iterations
of 20 reads drawn uniformly with replacement, averaged noisy-OR
(reference: m6anet/utils/inference_utils.py:74-87) — as one device kernel
that is MXU-bound instead of gather-bound.

Design (2026-08-20, round 3; run-batched round 5):

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
  only when the count changes.
* **Run-batched MXU matmuls (round 5).** Sites are sorted by count, so
  same-count sites form contiguous RUNS sharing one histogram.  The
  round-4 kernel walked 8,192 sites sequentially, each doing an M=1
  matvec (probes showed the op was loop-control bound: disabling the
  matvec or the rebuild changed the 24.9 ms/batch time <1 ms).  This
  kernel iterates RUNS: per run it computes a full-block
  ``(G, 128) @ (128, T)`` matmul per 128-read chunk (hi/lo bf16 split,
  f32 accumulation — bit-identical products to round 4's per-site
  matvecs) and masks the result rows onto the run's site span.  Loop
  iterations per block drop from G=128 to the number of distinct counts
  in the block (typically 4–16 at the HEK293T count distribution), and
  every MXU pass is M=128 instead of M=1.  Run boundaries are computed
  in XLA (cumsum over count-change flags, split at block boundaries) and
  fed through scalar prefetch.
* **Chunked W (round 4, kept).** Both the rebuild and the matmuls walk
  only ``ceil(count/128)`` 128-row chunks of the W window, so the
  dominant costs scale with each run's REAL read count.  Rows at or
  above a run's ceiling chunk are provably zero: counts are sorted
  ascending, so rebuilds only ever extend the written prefix over the
  step-0 zero fill.

* **In-kernel window alignment (round 5b).** The round-5a op spent 84% of
  its time in the XLA per-site window slice-gather (7.3 ms — measured
  per-slice-overhead-bound: w=128 windows cost the same as w=1024).  XLA
  ROW gathers on a ``(N/128, 128)`` view are nearly free, so the prep now
  row-gathers each (sorted) site's ``W/128 + 1`` covering rows and the
  kernel fixes the per-site lane misalignment itself: the shift
  ``s = offset % 128`` is decomposed ``s = 8q + r`` and applied as 16 + 8
  STATIC-offset masked select-adds, fully vectorized over the (G, W)
  block — no per-site loop, no dynamic lane slicing, bit-identical window
  values.
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
    counts_ref,  # scalar-prefetch SMEM (s_pad,) — sorted read counts
    run_start_ref,  # scalar-prefetch SMEM (s_pad+1,) — first site of each run
    block_lo_ref,  # scalar-prefetch SMEM (n_blocks,) — first run id per block
    block_hi_ref,  # scalar-prefetch SMEM (n_blocks,) — last run id per block +1
    u_ref,  # (n_samples, T) f32 VMEM — shared draws
    rows_ref,  # (1, G, W+128) f32 VMEM — row-aligned covering rows per site
    shift_ref,  # (1, s_pad) i32 VMEM (blocked (1, G)) — offset % 128 per site
    out_ref,  # (G, 1) f32 — this block's per-site sum_t exp(S_t)
    kt_ref,  # (W, T) bf16 scratch — draw histogram for the current count
    lhi_ref,  # (G, W) bf16 scratch — log1p(-p) high parts, whole block
    llo_ref,  # (G, W) bf16 scratch — log1p(-p) residuals
    s_ref,  # (G, T) f32 scratch — per-site log-sums, masked per run
    *, n_samples: int, W: int, T: int, G: int, probe=None,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero_kt():
        kt_ref[:] = jnp.zeros_like(kt_ref)

    # ---- in-kernel window alignment (round 5b) ----
    # rows_ref holds each site's W/128+1 covering 128-lane rows of packed p
    # flattened to one (W+128)-wide row; the site's true window starts at
    # lane s = offset % 128.  Apply the shift as two passes of STATIC-offset
    # masked select-adds (s = 8q + r, q<16, r<8) — vectorized over all G
    # sites, no per-site loop, exact value selection.
    s_col = jnp.transpose(shift_ref[:]).astype(jnp.int32)  # (G, 1)
    q_col, r_col = s_col // 8, s_col % 8
    a = rows_ref[0]  # (G, W+128)
    coarse = jnp.zeros((G, W + 8), jnp.float32)
    if probe != "noshift":
        for kappa in range(16):
            coarse = coarse + jnp.where(
                q_col == kappa, a[:, 8 * kappa : 8 * kappa + W + 8], 0.0
            )
        win = jnp.zeros((G, W), jnp.float32)
        for rho in range(8):
            win = win + jnp.where(r_col == rho, coarse[:, rho : rho + W], 0.0)
    else:  # perf probe only: skip the alignment (wrong results)
        win = a[:, :W]

    # whole-block log1p(-p), split hi+lo into bf16 scratch once per step;
    # clamp: p==1.0 gives log1p(-1)=-inf, and 0 * -inf would NaN through
    # the matmul for reads that are never drawn
    l = jnp.maximum(jnp.log1p(-win), -1e4)  # (G, W) f32
    l_hi = l.astype(jnp.bfloat16)
    lhi_ref[:] = l_hi
    llo_ref[:] = (l - l_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    rows = jax.lax.broadcasted_iota(jnp.int32, (LANE, T), 0)
    row_g = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)

    r_lo = block_lo_ref[i]
    r_hi = block_hi_ref[i]

    def run_body(r, _):
        first = run_start_ref[r]
        a = first - i * G  # local start row (>= 0: runs split at block edges)
        b = jnp.minimum(run_start_ref[r + 1] - i * G, G)
        c = counts_ref[first]
        wc = (c + LANE - 1) // LANE  # chunks this run actually needs

        # rebuild the histogram only when the count really changes: a run
        # split by a block boundary has the same count as its predecessor
        # site, and KT persists in scratch across grid steps
        prev_c = counts_ref[jnp.maximum(first, 1) - 1]
        do_rebuild = (first == 0) | (c != prev_c)
        if probe == "norebuild":  # perf probe: stale kt (wrong results)
            do_rebuild = (i == 0) & (r == r_lo)

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
                acc = jnp.zeros((LANE, T), jnp.float32)
                for j in range(n_samples):
                    acc += (rk == idx[j, :][None, :]).astype(jnp.float32)
                kt_ref[pl.ds(off, LANE), :] = acc.astype(jnp.bfloat16)  # exact
                return 0

            jax.lax.fori_loop(0, wc, build_chunk, 0)

        # one full-block (G, 128) @ (128, T) matmul pair per used chunk —
        # rows outside [a, b) see the wrong KT and are masked below
        def mat_chunk(k, acc):
            off = pl.multiple_of(k * LANE, LANE)
            ktc = kt_ref[pl.ds(off, LANE), :]  # (LANE, T)
            return (
                acc
                + jnp.dot(lhi_ref[:, pl.ds(off, LANE)], ktc,
                          preferred_element_type=jnp.float32)
                + jnp.dot(llo_ref[:, pl.ds(off, LANE)], ktc,
                          preferred_element_type=jnp.float32)
            )

        n_mat = jnp.int32(0) if probe == "nomatvec" else wc
        s_run = jax.lax.fori_loop(0, n_mat, mat_chunk, jnp.zeros((G, T), jnp.float32))
        in_run = (row_g >= a) & (row_g < b)
        s_ref[:] = jnp.where(in_run, s_run, s_ref[:])
        return 0

    s_ref[:] = jnp.zeros_like(s_ref)  # nomatvec probe / belt-and-braces
    jax.lax.fori_loop(r_lo, r_hi, run_body, 0)
    out_ref[:] = jnp.sum(jnp.exp(s_ref[:]), axis=1, keepdims=True)


def run_decomposition(counts_s: jnp.ndarray, G: int):
    """Run boundaries over count-sorted (padded) sites, split at G-blocks.

    Returns ``(run_start, block_lo, block_hi)``: the first site of each run
    (s_pad-filled past the last real run, doubling as the sentinel bound),
    and the [lo, hi) run-id range each G-block iterates."""
    s_pad = counts_s.shape[0]
    idx = jnp.arange(s_pad, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), counts_s[:-1]])
    is_start = (idx % G == 0) | (counts_s != prev)
    run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # (s_pad,)
    run_start = jnp.full((s_pad + 1,), s_pad, jnp.int32).at[run_id].min(idx)
    block_lo = run_id[0::G]
    block_hi = run_id[G - 1 :: G] + 1
    return run_start, block_lo, block_hi


def mc_chunk_call(
    counts_s, run_start, block_lo, block_hi, u, rows, shifts,
    *, n_samples: int, w: int, t_chunk: int, G: int,
    probe=None, interpret: bool = False,
):
    """One pallas_call over all site blocks for one iteration chunk.

    ``rows`` is the (n_blocks, G, w+128) row-aligned covering-rows tensor
    (from :func:`window_rows`), ``shifts`` the (1, s_pad) per-site lane
    shifts; the kernel aligns windows itself (round 5b)."""
    s_pad = counts_s.shape[0]
    return pl.pallas_call(
        functools.partial(
            _mc_kernel, n_samples=n_samples, W=w, T=t_chunk, G=G, probe=probe
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(s_pad // G,),
            in_specs=[
                pl.BlockSpec(u.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, w + LANE), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, 1), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((w, t_chunk), jnp.bfloat16),
                pltpu.VMEM((G, w), jnp.bfloat16),
                pltpu.VMEM((G, w), jnp.bfloat16),
                pltpu.VMEM((G, t_chunk), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((s_pad, 1), jnp.float32),
        # DELIBERATE UPPER BOUND (ADVICE r4): real matmul work scales by
        # mean(ceil(count/128)*128)/W occupancy (~1/8 at the HEK293T count
        # distribution) — counts are traced values, so the static estimate
        # quotes the full-W ceiling instead
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * s_pad * w * t_chunk,
            bytes_accessed=s_pad * w * 4,
            transcendentals=s_pad * (w + t_chunk),
        ),
        interpret=interpret,
    )(counts_s, run_start, block_lo, block_hi, u, rows, shifts)


def window_rows(p: jnp.ndarray, offsets_s: jnp.ndarray, w: int, G: int):
    """Row-aligned covering rows + lane shifts for every (sorted) site.

    Replaces the round-5a per-site window slice-gather (7.3 ms/batch,
    per-slice-overhead-bound) with an XLA ROW gather on a (rows, 128) view
    (measured ~free) — the kernel applies the per-site lane shift itself.
    """
    s_pad = offsets_s.shape[0]
    R = w // LANE + 1
    n = p.shape[0]
    n_rows = -(-(n + w + 2 * LANE) // LANE)
    p_pad = jnp.zeros((n_rows * LANE,), jnp.float32).at[:n].set(p.astype(jnp.float32))
    p2 = p_pad.reshape(n_rows, LANE)
    base = offsets_s // LANE  # (s_pad,)
    shifts = (offsets_s % LANE).reshape(1, s_pad)
    rows = p2[base[:, None] + jnp.arange(R, dtype=base.dtype)[None, :]]
    return rows.reshape(s_pad // G, G, R * LANE), shifts


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
    # round-5b window feed: fast ROW gather of covering rows + in-kernel
    # lane alignment (see window_rows).  Historical formulations, both
    # measured and rejected: per-element index-matrix gather 67 ms/batch,
    # vmapped dynamic_slice windows 7.3 ms (per-slice-overhead-bound).
    rows, shifts = window_rows(p, offsets_s, w, G)

    # Run decomposition: maximal spans of equal count within each G-block
    # (sites are sorted, so equal counts are contiguous).  Fed to the kernel
    # through scalar prefetch; the kernel loops over RUNS, not sites.
    run_start, block_lo, block_hi = run_decomposition(counts_s, G)

    chunk = min(n_iters, 1024)
    n_chunks, rem = divmod(n_iters, chunk)
    sizes = [chunk] * n_chunks + ([rem] if rem else [])

    total = jnp.zeros((s_pad,), jnp.float32)
    for ci, t_chunk in enumerate(sizes):
        u = jax.random.uniform(
            jax.random.fold_in(base_key, ci), (n_samples, t_chunk), jnp.float32
        )
        out = mc_chunk_call(
            counts_s, run_start, block_lo, block_hi, u, rows, shifts,
            n_samples=n_samples, w=w, t_chunk=t_chunk, G=G,
            probe=probe, interpret=interpret,
        )
        total = total + out.reshape(-1)

    site_p_sorted = 1.0 - total / n_iters
    res = jnp.zeros((n_sites,), jnp.float32).at[order].set(site_p_sorted[:n_sites])
    return jnp.where(counts > 0, res, 0.0)
