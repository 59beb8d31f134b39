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
    site_keys: jnp.ndarray,
    n_iters: int = 1000,
    n_samples: int = 20,
) -> jnp.ndarray:
    """Monte-Carlo emulation of the reference estimator, fully on device.

    ``offsets[s]``/``counts[s]`` delimit site s's reads in the flat ``p``;
    ``site_keys`` are per-site PRNG keys (derive them by folding a global
    site index into the run key so results are placement-invariant under any
    sharding).  Sites with count 0 return 0.

    Iterations are processed in fixed chunks under a ``lax.scan`` so peak
    memory is O(sites * chunk * n_samples) regardless of ``n_iters`` (at
    8192-site batches the unchunked index tensor alone would be >600 MB).
    The chunk adapts to the site count so the transient index+gather
    buffers stay near 128 MB — a 65,536-site batch at chunk 100 allocates
    >1 GB and crashed this container's relay-virtualized chip.
    """
    n_sites_cap = int(offsets.shape[0])
    chunk = max(1, min(n_iters, 100, (128 << 20) // max(1, n_sites_cap * n_samples * 8)))
    n_chunks, rem = divmod(n_iters, chunk)

    def sample_chunk(key, offset, count, size):
        idx = jax.random.randint(key, (size, n_samples), 0, jnp.maximum(count, 1))
        probs = p[offset + idx]
        return jnp.sum(1.0 - jnp.prod(1.0 - probs, axis=1))

    def scan_body(carry, chunk_idx):
        def one_site(offset, count, key):
            return sample_chunk(jax.random.fold_in(key, chunk_idx), offset, count, chunk)

        return carry + jax.vmap(one_site)(offsets, counts, site_keys), None

    total, _ = jax.lax.scan(scan_body, jnp.zeros_like(p, shape=offsets.shape), jnp.arange(n_chunks))
    if rem:
        def one_site_rem(offset, count, key):
            return sample_chunk(jax.random.fold_in(key, n_chunks), offset, count, rem)

        total = total + jax.vmap(one_site_rem)(offsets, counts, site_keys)
    mean = total / n_iters
    return jnp.where(counts > 0, mean, 0.0)


def make_site_keys(base_key: jnp.ndarray, global_site_ids: jnp.ndarray) -> jnp.ndarray:
    """Counter-based per-site keys: fold the dataset-global site index into a
    run-level key.  Deterministic for a fixed seed regardless of batch or
    shard assignment (the reference's mp.Pool sampling is not reproducible —
    SURVEY.md §4)."""
    return jax.vmap(lambda i: jax.random.fold_in(base_key, i))(global_site_ids)
