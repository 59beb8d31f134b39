"""Device-side site aggregation ops.

The reference computes site probability by Monte-Carlo resampling read
probabilities in a multiprocessing pool
(reference: m6anet/utils/inference_utils.py:74-104): draw ``n_iters`` sets of
20 reads with replacement and average the noisy-OR ``1 - prod(1 - p)``.
Because the 20 draws are i.i.d. uniform over the site's reads, that estimator
converges to the closed form

    P(site) = 1 - (mean_r (1 - p_r)) ** 20

so the TPU-native default (`exact`) evaluates the expectation directly with
masked segment reductions — deterministic, sample-free, and within the
reference's own published tolerance (its tests accept atol=1e-2 because its
MC path is scheduler-nondeterministic).  An on-device `mc` mode reproduces the
sampling estimator with counter-based per-site keys for users who want the
sampled statistic itself.

``mod_ratio`` is the exact fraction of reads with p >= threshold
(reference: m6anet/utils/inference_utils.py:53).
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp


def segment_mean_one_minus_p(
    p: jnp.ndarray, site_ids: jnp.ndarray, counts: jnp.ndarray, n_sites: int
) -> jnp.ndarray:
    """mean_r (1 - p_r) per site over a flat padded read axis.

    Padding reads must carry ``site_ids == n_sites`` (their contribution is
    masked); ``counts`` holds the true per-site read counts.
    """
    valid = site_ids < n_sites
    contrib = jnp.where(valid, 1.0 - p, 0.0)
    ids = jnp.minimum(site_ids, n_sites - 1)
    sums = jax.ops.segment_sum(contrib, ids, num_segments=n_sites)
    return sums / jnp.maximum(counts.astype(p.dtype), 1.0)


def site_probability_exact(
    p: jnp.ndarray,
    site_ids: jnp.ndarray,
    counts: jnp.ndarray,
    n_sites: int,
    n_samples: int = 20,
) -> jnp.ndarray:
    """Closed-form noisy-OR site probability (see module docstring)."""
    mean_1mp = segment_mean_one_minus_p(p, site_ids, counts, n_sites)
    return 1.0 - mean_1mp**n_samples


def mod_ratio_exact(
    p: jnp.ndarray,
    site_ids: jnp.ndarray,
    counts: jnp.ndarray,
    n_sites: int,
    threshold: float,
) -> jnp.ndarray:
    """Fraction of reads called modified at the given probability threshold."""
    valid = site_ids < n_sites
    hits = jnp.where(valid & (p >= threshold), 1.0, 0.0)
    ids = jnp.minimum(site_ids, n_sites - 1)
    sums = jax.ops.segment_sum(hits, ids, num_segments=n_sites)
    return sums / jnp.maximum(counts.astype(p.dtype), 1.0)


@partial(jax.jit, static_argnames=("n_iters", "n_samples"))
def site_probability_mc(
    p: jnp.ndarray,
    offsets: jnp.ndarray,
    counts: jnp.ndarray,
    base_key: jnp.ndarray,
    n_iters: int = 1000,
    n_samples: int = 20,
) -> jnp.ndarray:
    """Monte-Carlo emulation of the reference estimator, fully on device.

    ``offsets[s]``/``counts[s]`` delimit site s's reads in the flat ``p``;
    sites with count 0 return 0.

    Shared-draw design (2026-08-20): one uniform matrix ``U`` per iteration
    chunk is derived from ``base_key`` alone; site s's j-th draw of
    iteration t is read ``floor(U[j,t] * count_s)`` — exactly uniform over
    its reads, so the per-site estimator is distributed identically to the
    reference's 20-with-replacement resampling
    (reference: m6anet/utils/inference_utils.py:74-87).  Draws are
    correlated across sites (so are the reference's: its mp.Pool workers
    fork identical RNG states), and results are placement-invariant by
    construction — they depend only on (seed, count, the site's reads) —
    which host-shard merging relies on.  This removes the per-site threefry
    key streams, leaving a flat gather per draw; the TPU backend goes
    further and replaces the gathers with count-keyed MXU matvecs
    (m6anet_tpu/ops/mc_kernel.py).

    Iterations are processed in fixed chunks under a ``lax.scan`` so peak
    memory is O(sites * chunk * n_samples) regardless of ``n_iters``.
    """
    n_sites_cap = int(offsets.shape[0])
    chunk = max(1, min(n_iters, 64, (96 << 20) // max(1, n_sites_cap * n_samples * 8)))
    n_chunks, rem = divmod(n_iters, chunk)
    cntf = counts.astype(p.dtype)
    cmax = jnp.maximum(counts - 1, 0)

    def sample_chunk(chunk_idx, size):
        u = jax.random.uniform(
            jax.random.fold_in(base_key, chunk_idx), (n_samples, size), p.dtype
        )
        idx = jnp.minimum((u[:, :, None] * cntf).astype(jnp.int32), cmax)
        draws = p[offsets[None, None, :] + idx]  # (n_samples, size, S)
        prod = jnp.prod(1.0 - draws, axis=0)  # (size, S)
        return jnp.sum(1.0 - prod, axis=0)  # (S,)

    def scan_body(carry, chunk_idx):
        return carry + sample_chunk(chunk_idx, chunk), None

    total, _ = jax.lax.scan(
        scan_body, jnp.zeros_like(p, shape=offsets.shape), jnp.arange(n_chunks)
    )
    if rem:
        total = total + sample_chunk(n_chunks, rem)
    mean = total / n_iters
    return jnp.where(counts > 0, mean, 0.0)
