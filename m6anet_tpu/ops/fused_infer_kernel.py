"""Single-kernel inference step: encoder + site aggregation in one Pallas call.

Extends the fused read-encoder (see encoder_kernel.py) with the per-site
reductions, so one kernel launch produces per-read probabilities, closed-form
noisy-OR site probabilities AND mod_ratios:

* grid iterates over read blocks; TPU grid steps run sequentially on the
  core, so VMEM scratch accumulators persist across steps;
* the scatter-add "read -> site" is a one-hot MXU contraction
  ``(1, block) @ (block, site_capacity)`` — no gathers or scatters;
* padding reads carry ``site_id == site_capacity`` and match no one-hot
  column, so they contribute nothing;
* the final grid step turns the accumulated sums into
  ``1 - (mean(1-p))**n_samples`` and ``hits / count``.

This removes every HBM round-trip of the inference step: inputs stream in
once, outputs stream out once.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encoder_kernel import FusedEncoderParams, encoder_body, make_parity_dot

# smaller than the encoder-only kernel: the (block, site_capacity) one-hot
# site matrix dominates VMEM (512*1024*4B = 2 MB fits; 2048 blocks OOM)
DEFAULT_BLOCK_READS = 512


def _fused_infer_kernel(
    # scalar-prefetch style params come in as plain VMEM blocks
    x_ref, k_ref, sid_ref, counts_ref,
    w1x_ref, t_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, thr_ref,
    p_out, site_out,
    sums_scr, hits_scr,
    *, n_samples: int,
):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    block = x_ref.shape[0]
    site_capacity = sums_scr.shape[1]

    @pl.when(step == 0)
    def _init():
        sums_scr[:] = jnp.zeros_like(sums_scr)
        hits_scr[:] = jnp.zeros_like(hits_scr)

    # ---- encoder: shared body with the encoder-only kernel ----
    p = encoder_body(
        make_parity_dot(jnp.float32),
        x_ref, k_ref, w1x_ref, t_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    )  # (block, 1)
    p_out[:] = p

    # ---- site accumulation: one-hot scatter on the MXU ----
    sid = sid_ref[:].reshape(block, 1)  # padding == site_capacity
    site_cols = jax.lax.broadcasted_iota(jnp.int32, (block, site_capacity), 1)
    onehot_s = (site_cols == sid).astype(jnp.float32)  # (block, S)
    one_minus = (1.0 - p).reshape(1, block)
    # padding rows have all-zero one-hot -> no masking needed
    sums_scr[:] += jnp.dot(one_minus, onehot_s, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    thr = thr_ref[0, 0]
    hits = (p >= thr).astype(jnp.float32).reshape(1, block)
    hits_scr[:] += jnp.dot(hits, onehot_s, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

    @pl.when(step == n_steps - 1)
    def _finalize():
        counts = jnp.maximum(counts_ref[:].astype(jnp.float32), 1.0).reshape(1, -1)
        mean_1mp = sums_scr[:] / counts
        site_p = 1.0 - mean_1mp**n_samples
        mod_ratio = hits_scr[:] / counts
        site_out[0, :] = site_p[0, :]
        site_out[1, :] = mod_ratio[0, :]


def fused_inference(
    fp: FusedEncoderParams,
    features: jnp.ndarray,  # (N, 9) f32, N % block_reads == 0
    kmer_ids: jnp.ndarray,  # (N, P) i32
    site_ids: jnp.ndarray,  # (N,) i32, padding == site_capacity
    counts: jnp.ndarray,  # (S,) i32
    threshold: float,
    n_samples: int = 20,
    block_reads: int = DEFAULT_BLOCK_READS,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (p (N,), site_p (S,), mod_ratio (S,))."""
    import functools

    n = features.shape[0]
    site_capacity = counts.shape[0]
    # VMEM heuristic: the (block, site_capacity) one-hot site matrix is the
    # dominant transient; keep it near 2 MB (block 2048 @ S=1024 OOMs Mosaic's
    # 16 MB scoped limit once pipeline double-buffering is added).
    while block_reads > 256 and block_reads * site_capacity * 4 > (2 << 20):
        block_reads //= 2
    block_reads = min(block_reads, n)
    while n % block_reads != 0 and block_reads > 1:
        block_reads //= 2
    grid = (n // block_reads,)
    n_feat = features.shape[1]
    n_pos = kmer_ids.shape[1]
    thr = jnp.full((1, 1), threshold, jnp.float32)
    sid2d = site_ids.reshape(n, 1)

    kernel = functools.partial(_fused_infer_kernel, n_samples=n_samples)
    p, site_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_reads, n_feat), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_reads, n_pos), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_reads, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((site_capacity,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.w1x.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.t_all.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.b1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.b2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.w3.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.b3.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_reads, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, site_capacity), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((2, site_capacity), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, site_capacity), jnp.float32),
            pltpu.VMEM((1, site_capacity), jnp.float32),
        ],
        interpret=interpret,
    )(features, kmer_ids, sid2d, counts, fp.w1x, fp.t_all, fp.b1, fp.w2, fp.b2, fp.w3, fp.b3, thr)
    return p[:, 0], site_out[0], site_out[1]
