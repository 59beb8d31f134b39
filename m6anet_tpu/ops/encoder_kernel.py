"""Pallas fused read-encoder kernel for the production architecture.

The entire per-read forward of the production model
(embedding-gather -> concat -> Linear15->150+BN+ReLU -> Linear150->32+ReLU ->
Linear32->1 -> sigmoid; see m6anet_tpu/models/assets/configs/m6anet.toml) is
fused into one VMEM-resident kernel over blocks of reads:

* inference-mode BatchNorm is an affine map, so it is folded into the first
  linear layer's weights once per parameter set (host side);
* the k-mer embedding composes linearly with the first matmul, so each of the
  (2w+1) positions gets a precomputed (vocab, 150) contribution table
  ``T_j = E @ W1[kmer_cols_j]``; the kernel turns the int k-mer ids into a
  one-hot (block, (2w+1)*vocab) matrix and takes a single MXU contraction
  against the stacked tables — no gathers inside the kernel;
* all weights live in VMEM across the whole grid (~150 KB total).

This removes every HBM round-trip between the five reference ops; the op is
then purely bandwidth-bound on reading the (N, 12) inputs and writing (N,)
probabilities.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.blocks import BN_EPS, fdot

DEFAULT_BLOCK_READS = 1024


class FusedEncoderParams(NamedTuple):
    """Host-prepared, kernel-ready parameter set."""

    w1x: jnp.ndarray  # (9, 150)  signal columns of the BN-folded first linear
    t_all: jnp.ndarray  # ((2w+1)*66, 150) stacked per-position kmer tables
    b1: jnp.ndarray  # (1, 150)
    w2: jnp.ndarray  # (150, 32)
    b2: jnp.ndarray  # (1, 32)
    w3: jnp.ndarray  # (32, 1) probability head
    b3: jnp.ndarray  # (1, 1)


def prepare_fused_params(params: Dict, n_features: int = 9) -> FusedEncoderParams:
    """Fold BN + embedding into MXU-ready tables (production param layout)."""
    w1 = jnp.asarray(params["block3"]["w"], jnp.float32)  # (15, 150)
    b1 = jnp.asarray(params["block3"]["b"], jnp.float32)
    if "bn_scale" in params["block3"]:
        scale = params["block3"]["bn_scale"] / jnp.sqrt(params["block3"]["bn_var"] + BN_EPS)
        w1 = w1 * scale[None, :]
        b1 = (b1 - params["block3"]["bn_mean"]) * scale + params["block3"]["bn_bias"]
    emb = jnp.asarray(params["block1"]["embedding"], jnp.float32)  # (66, dim)
    dim = emb.shape[1]
    n_positions = (w1.shape[0] - n_features) // dim
    w1x = w1[:n_features]
    tables = [
        fdot(emb, w1[n_features + j * dim : n_features + (j + 1) * dim])
        for j in range(n_positions)
    ]
    t_all = jnp.concatenate(tables, axis=0)  # (n_positions*vocab, 150)
    return FusedEncoderParams(
        w1x=w1x,
        t_all=t_all,
        b1=b1[None, :],
        w2=jnp.asarray(params["block4"]["w"], jnp.float32),
        b2=jnp.asarray(params["block4"]["b"], jnp.float32)[None, :],
        w3=jnp.asarray(params["block5"]["w"], jnp.float32),
        b3=jnp.asarray(params["block5"]["b"], jnp.float32)[None, :],
    )


def encoder_body(dot, x_ref, k_ref, w1x_ref, t_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                 onehot_dot=None):
    """Shared kernel-body math: embedding one-hot + folded encoder + sigmoid.

    Used by both the encoder-only kernel below and the single-kernel
    inference step (fused_infer_kernel.py); ``dot`` injects the precision
    policy and ``onehot_dot`` (default: ``dot``) the cheaper policy for the
    embedding contraction, whose LHS is a 0/1 matrix and therefore exactly
    representable in bfloat16.  Returns the per-read probability block,
    shape (block, 1)."""
    if onehot_dot is None:
        onehot_dot = dot
    vocab_total = t_ref.shape[0]  # (2w+1) * 66
    n_positions = k_ref.shape[1]
    vocab = vocab_total // n_positions
    block = x_ref.shape[0]

    # one-hot over the stacked vocabulary: position j's id k -> column j*66+k
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, n_positions), 1) * vocab
    flat_ids = k_ref[:] + offs  # (block, n_positions)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block, vocab_total), 1)
    onehot = jnp.zeros((block, vocab_total), jnp.float32)
    for j in range(n_positions):
        onehot += (cols == flat_ids[:, j][:, None]).astype(jnp.float32)

    h = dot(x_ref[:], w1x_ref[:]) + onehot_dot(onehot, t_ref[:]) + b1_ref[:]
    h = jnp.maximum(h, 0.0)
    h = jnp.maximum(dot(h, w2_ref[:]) + b2_ref[:], 0.0)
    z = dot(h, w3_ref[:]) + b3_ref[:]
    return jax.nn.sigmoid(z)


def make_onehot_dot(compute_dtype):
    """Precision policy for the embedding contraction: its LHS is a 0/1
    one-hot, exact in bfloat16, so the bf16x3 scheme only needs the two
    RHS-split products (a@b_hi + a@b_lo) — 2 MXU passes with NO additional
    error versus the 3-pass version.  Other modes fall back to the general
    policy."""
    if compute_dtype != "f32x3":
        return make_parity_dot(compute_dtype)

    def dot(a, b):
        bf = jnp.bfloat16
        a16 = a.astype(bf)  # exact: entries are 0/1
        b_hi = b.astype(bf)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(bf)

        def d(x, y):
            return jnp.dot(x, y, preferred_element_type=jnp.float32)

        return d(a16, b_lo) + d(a16, b_hi)

    return dot


def make_onehot_dot_rhs(compute_dtype):
    """Like :func:`make_onehot_dot`, but for contractions whose RHS is the
    0/1 one-hot (the transposed kernel layout): split the LHS hi/lo, cast
    the one-hot to bfloat16 exactly — 2 MXU passes, no added error."""
    if compute_dtype != "f32x3":
        return make_parity_dot(compute_dtype)

    def dot(a, b):
        bf = jnp.bfloat16
        b16 = b.astype(bf)  # exact: entries are 0/1
        a_hi = a.astype(bf)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(bf)

        def d(x, y):
            return jnp.dot(x, y, preferred_element_type=jnp.float32)

        return d(a_lo, b16) + d(a_hi, b16)

    return dot


def make_parity_dot(compute_dtype):
    """Precision policy: f32 runs every matmul at HIGHEST precision (6-pass
    f32 emulation) for parity with the released CPU-f32 models; the string
    ``"f32x3"`` selects Precision.HIGH (3-pass bf16x3, ~f32-accurate —
    relative error ~1e-7 on this model's magnitudes, still inside the 1e-5
    per-read golden tolerance); bf16 casts activations/tables to bfloat16
    with f32 accumulation — one MXU pass per matmul, at ~1e-3 probability
    error (far inside the site tolerance)."""
    if compute_dtype == "f32x3":
        # Mosaic has no Precision.HIGH lowering, so build bf16x3 by hand:
        # split each operand into a bf16 high part + bf16 residual and take
        # the three significant products (the hi*hi term plus both cross
        # terms; the lo*lo term is ~2^-32 relative and dropped) — 3 MXU
        # passes instead of HIGHEST's 6, error ~2^-16 relative.
        def dot(a, b):
            bf = jnp.bfloat16
            a_hi = a.astype(bf)
            b_hi = b.astype(bf)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(bf)
            b_lo = (b - b_hi.astype(jnp.float32)).astype(bf)

            def d(x, y):
                return jnp.dot(x, y, preferred_element_type=jnp.float32)

            return (d(a_lo, b_hi) + d(a_hi, b_lo)) + d(a_hi, b_hi)

        return dot

    if compute_dtype == jnp.float32:
        precision = jax.lax.Precision.HIGHEST
        cast = None
    else:
        precision = jax.lax.Precision.DEFAULT
        cast = jnp.bfloat16

    def dot(a, b):
        if cast is not None:
            a = a.astype(cast)
            b = b.astype(cast)
        return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=precision)

    return dot


def _make_encoder_kernel(compute_dtype):
    dot = make_parity_dot(compute_dtype)
    onehot_dot = make_onehot_dot(compute_dtype)

    def kernel(x_ref, k_ref, w1x_ref, t_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref):
        out_ref[:] = encoder_body(dot, x_ref, k_ref, w1x_ref, t_ref, b1_ref, w2_ref,
                                  b2_ref, w3_ref, b3_ref, onehot_dot=onehot_dot)

    return kernel


def fused_read_probability(
    fp: FusedEncoderParams,
    features: jnp.ndarray,  # (N, 9) float32, N % block_reads == 0
    kmer_ids: jnp.ndarray,  # (N, 2w+1) int32
    block_reads: int = DEFAULT_BLOCK_READS,
    interpret: bool = False,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Per-read modification probabilities via the fused Pallas kernel."""
    n = features.shape[0]
    block_reads = min(block_reads, n)
    if n % block_reads != 0:
        raise ValueError(f"N={n} must be a multiple of block_reads={block_reads}")
    grid = (n // block_reads,)
    n_feat = features.shape[1]
    n_pos = kmer_ids.shape[1]

    out = pl.pallas_call(
        _make_encoder_kernel(compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_reads, n_feat), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_reads, n_pos), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.w1x.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.t_all.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.b1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.b2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.w3.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.b3.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_reads, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (n_feat * 150 + fp.t_all.shape[0] * 150 + 150 * 32 + 32),
            bytes_accessed=n * (n_feat * 4 + n_pos * 4 + 4),
            transcendentals=n,
        ),
        interpret=interpret,
    )(features, kmer_ids, fp.w1x, fp.t_all, fp.b1, fp.w2, fp.b2, fp.w3, fp.b3)
    return out[:, 0]
