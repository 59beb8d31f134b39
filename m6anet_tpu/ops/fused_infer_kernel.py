"""Single-kernel inference step: encoder + site aggregation in one Pallas call.

Extends the fused read-encoder (see encoder_kernel.py) with the per-site
reductions, so one kernel launch produces per-read probabilities, closed-form
noisy-OR site probabilities AND mod_ratios (the two hot boxes of the
reference's inference stack fused into one device program —
reference: m6anet/utils/inference_utils.py:35-53).

Site-scatter design (2026-08-19 rework).  ``pack_sites`` lays reads out
densely with *consecutive* site ids (m6anet_tpu/data/batching.py:86-95), so
any window of W consecutive reads spans fewer than W distinct sites.  The
kernel exploits that contiguity:

* the grid iterates over large read blocks (good DMA granularity); TPU grid
  steps run sequentially on the core, so the site-sum output block — mapped
  to the same block every step — accumulates across steps;
* each block is reduced in 512-read sub-chunks: a (512, 512+128) *local*
  one-hot over ``site_id - aligned_base`` is built on the VPU and reduced
  over the read axis, then added into the site accumulator at a 128-aligned
  dynamic lane offset.  Cost is O(reads * 640) VPU ops — independent of
  ``site_capacity`` — replacing the previous (block, site_capacity) one-hot
  MXU contraction that both capped site_capacity at 4096 (VMEM) and burned
  O(site_capacity) MXU FLOPs per read;
* padding reads carry ``site_id == site_capacity``; their local column lands
  in the padded tail of the accumulator (width site_capacity + 640) and is
  sliced off on the host, so no masking is needed anywhere;
* the final grid step turns the accumulated sums into
  ``1 - (mean(1-p))**n_samples`` and ``hits / count`` in place.

This removes every HBM round-trip of the inference step: inputs stream in
once, per-read probabilities stream out once, and the O(sites) outputs live
in VMEM until the last step.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.blocks import BN_EPS
from .encoder_kernel import (FusedEncoderParams, encoder_body, make_onehot_dot,
                             make_onehot_dot_rhs, make_parity_dot)

# 2048-read blocks exceed Mosaic's 16 MB scoped-VMEM budget once the
# pipeline double-buffers the lane-padded narrow inputs (measured 17.2 MB);
# 1024 fits with room and benches identically
DEFAULT_BLOCK_READS = 1024
# sub-chunk size for the local segment reduction.  SUB == LANE makes the
# (SUB, SUB + LANE) one-hot a slim (128, 256) tile: a 128-read window of
# consecutive site ids spans at most 128 sites, so after aligning the base
# down to a lane boundary every local id provably lands in [0, 256) — no
# assumption about reads-per-site needed — and the VPU work per read is
# O(256) instead of O(site_capacity) (the pre-2026-08-19 kernel) or O(640)
# (the first rework).
SUB = 128
LANE = 128


def _align_down(i):
    return (i // LANE) * LANE


def _fused_infer_kernel(
    x_ref, k_ref, sid_ref, base_ref, counts_ref,
    w1x_ref, t_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, thr_ref,
    p_out, site_out,
    *, n_samples: int, compute_dtype, probe=None,
):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    block = x_ref.shape[0]

    @pl.when(step == 0)
    def _init():
        site_out[:] = jnp.zeros_like(site_out)

    # ---- encoder: shared body with the encoder-only kernel ----
    if probe == "noembed":  # perf probe only: skip the one-hot embedding path
        dot = make_parity_dot(compute_dtype)
        h = dot(x_ref[:], w1x_ref[:]) + b1_ref[:]
        h = jnp.maximum(h, 0.0)
        h = jnp.maximum(dot(h, w2_ref[:]) + b2_ref[:], 0.0)
        p = jax.nn.sigmoid(dot(h, w3_ref[:]) + b3_ref[:])
    else:
        p = encoder_body(
            make_parity_dot(compute_dtype),
            x_ref, k_ref, w1x_ref, t_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            onehot_dot=make_onehot_dot(compute_dtype),
        )  # (block, 1)
    p_out[:] = p

    if probe == "nosite":  # perf probe only: skip the site reduction
        @pl.when(step == n_steps - 1)
        def _fake_finalize():
            site_out[:] = jnp.zeros_like(site_out) + p[0, 0]

        return

    # ---- site accumulation: local contiguous segment reduction (VPU) ----
    thr = thr_ref[0]
    one_minus = 1.0 - p  # (block, 1)
    hits = (p >= thr).astype(jnp.float32)  # (block, 1)
    width = SUB + LANE
    cols = jax.lax.broadcasted_iota(jnp.int32, (SUB, width), 1)
    for c in range(block // SUB):
        # 128-aligned first site id of this sub-chunk (host aligns it down;
        # pl.multiple_of lets Mosaic prove the lane-offset store is aligned)
        base = pl.multiple_of(base_ref[0, step * (block // SUB) + c], LANE)
        local = sid_ref[c * SUB : (c + 1) * SUB, :] - base  # (SUB, 1)
        eq = cols == local  # (SUB, width)
        sums = jnp.sum(
            jnp.where(eq, one_minus[c * SUB : (c + 1) * SUB], 0.0), axis=0, keepdims=True
        )
        nhit = jnp.sum(
            jnp.where(eq, hits[c * SUB : (c + 1) * SUB], 0.0), axis=0, keepdims=True
        )
        chunk = jnp.concatenate([sums, nhit], axis=0)  # (2, width)
        site_out[:, pl.ds(base, width)] += chunk

    @pl.when(step == n_steps - 1)
    def _finalize():
        counts = jnp.maximum(counts_ref[:].astype(jnp.float32), 1.0)  # (1, S_pad)
        mean_1mp = site_out[0:1, :] / counts
        site_p = 1.0 - mean_1mp**n_samples
        mod_ratio = site_out[1:2, :] / counts
        site_out[0:1, :] = site_p
        site_out[1:2, :] = mod_ratio


def fused_inference(
    fp: FusedEncoderParams,
    features: jnp.ndarray,  # (N, 9) f32
    kmer_ids: jnp.ndarray,  # (N, P) i32
    site_ids: jnp.ndarray,  # (N,) i32, consecutive per pack_sites; padding == site_capacity
    counts: jnp.ndarray,  # (S,) i32
    threshold: float,
    n_samples: int = 20,
    block_reads: int = DEFAULT_BLOCK_READS,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    probe: str | None = None,  # perf instrumentation: "nosite" / "noembed"
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (p (N,), site_p (S,), mod_ratio (S,))."""
    n = features.shape[0]
    site_capacity = counts.shape[0]
    block_reads = max(SUB, min(block_reads, n))
    while n % block_reads != 0 and block_reads > SUB:
        block_reads //= 2
    if n % block_reads != 0 or block_reads % SUB != 0:
        raise ValueError(
            f"read capacity {n} must be a multiple of a power-of-two block >= {SUB}"
        )
    grid = (n // block_reads,)
    n_feat = features.shape[1]
    n_pos = kmer_ids.shape[1]
    # the padded accumulator absorbs sub-chunk windows that start at the
    # aligned-down base of the last real site, and the padding-read column
    # at site_capacity
    s_pad = -(-(site_capacity + SUB + LANE) // LANE) * LANE
    thr = jnp.full((1,), threshold, jnp.float32)
    sid2d = site_ids.reshape(n, 1)
    # 128-aligned base site id of every 512-read sub-chunk (host-side XLA op;
    # contiguity means sites in sub-chunk c span [base[c], base[c] + SUB))
    # one flat SMEM row ((1, n/SUB) int32 = 32 KB at the production batch) —
    # SMEM rows are lane-padded to 128, so a (n_steps, n_sub) layout would
    # blow the 1 MB SMEM budget at production grid sizes
    bases = _align_down(site_ids[:: SUB].astype(jnp.int32)).reshape(1, n // SUB)
    counts_pad = jnp.zeros((1, s_pad), counts.dtype).at[0, :site_capacity].set(counts)

    kernel = functools.partial(
        _fused_infer_kernel, n_samples=n_samples, compute_dtype=compute_dtype,
        probe=probe,
    )
    p, site_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_reads, n_feat), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_reads, n_pos), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_reads, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # whole (n_steps, n_sub) base table lives in SMEM (n/SUB int32s =
            # 32 KB at the production batch); blocked SMEM would need
            # (8, 128)-aligned tiles
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.w1x.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.t_all.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.b1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.b2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.w3.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.b3.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_reads, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((2, s_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            # blocks >= 2048 exceed Mosaic's default 16 MB scoped-VMEM budget
            # (double-buffered lane-padded narrow inputs ~17.2 MB at 2048);
            # scale the budget with the block so bigger blocks — the main
            # lever against per-grid-step overhead, measured ~7 us/step —
            # can compile.  Smaller blocks keep the conservative default.
            vmem_limit_bytes=min((14 << 20) * (block_reads // 1024), 96 << 20)
            if block_reads >= 2048
            else None,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (n_feat * 150 + fp.t_all.shape[0] * 150 + 150 * 32 + 32)
            + n * 2 * (SUB + LANE),
            bytes_accessed=n * (n_feat * 4 + n_pos * 4 + 8) + s_pad * 12,
            transcendentals=n,
        ),
        interpret=interpret,
    )(
        features, kmer_ids, sid2d, bases, counts_pad,
        fp.w1x, fp.t_all, fp.b1, fp.w2, fp.b2, fp.w3, fp.b3, thr,
    )
    return p[:, 0], site_out[0, :site_capacity], site_out[1, :site_capacity]


# --------------------------------------------------------------------------
# Transposed-layout kernel (2026-08-20, round 3).
#
# Probes showed the original kernel is DMA-bound, not compute-bound: its
# narrow per-read arrays (features (B,9), kmers (B,3), site ids (B,1),
# probabilities (B,1)) each lane-pad to 128 in VMEM, so every batch moves
# ~8 GB of padded tiles — removing the entire embedding path or the site
# reduction did not change the step time (PERFORMANCE.md round-3 probes).
#
# This variant puts READS ON LANES: inputs arrive as (9, N) / (P, N) /
# (1, N) rows (one XLA transpose outside the kernel — dense both sides),
# activations are (channels, B) with only sublane padding, and the
# embedding uses the rank-2 structure of the k-mer table: a block-diagonal
# (2P, 66P) selector applied to the stacked one-hot picks embedding VALUES
# exactly (one nonzero per column — no summation, so bf16 hi/lo selection
# is exact in every precision mode), and the (2P)-wide result joins the
# signal features in ONE k=15 matmul against the BN-folded W1 — replacing
# the 198-wide contraction against premultiplied tables.
# --------------------------------------------------------------------------


class FusedEncoderParamsT(NamedTuple):
    """Transposed, rank-2-factored parameter set."""

    w1t: jnp.ndarray  # (150, 9 + 2P) BN-folded first linear, transposed
    embt: jnp.ndarray  # (dim, 66) embedding transposed — the per-position band
    b1t: jnp.ndarray  # (150, 1)
    w2t: jnp.ndarray  # (32, 150)
    b2t: jnp.ndarray  # (32, 1)
    w3t: jnp.ndarray  # (1, 32)
    b3t: jnp.ndarray  # (1, 1)


def prepare_fused_params_t(params: Dict, n_features: int = 9) -> FusedEncoderParamsT:
    w1 = jnp.asarray(params["block3"]["w"], jnp.float32)  # (9+2P, 150)
    b1 = jnp.asarray(params["block3"]["b"], jnp.float32)
    if "bn_scale" in params["block3"]:
        scale = params["block3"]["bn_scale"] / jnp.sqrt(params["block3"]["bn_var"] + BN_EPS)
        w1 = w1 * scale[None, :]
        b1 = (b1 - params["block3"]["bn_mean"]) * scale + params["block3"]["bn_bias"]
    emb = jnp.asarray(params["block1"]["embedding"], jnp.float32)  # (66, dim)
    vocab, dim = emb.shape
    if (w1.shape[0] - n_features) % dim != 0:
        raise ValueError(
            f"w1 input width {w1.shape[0]} is not {n_features} + P*{dim}"
        )
    # every position uses the SAME embedding band (the conceptual selector is
    # block-diagonal with identical emb.T blocks), so only the band ships —
    # the kernel applies it per position against that position's one-hot
    return FusedEncoderParamsT(
        w1t=w1.T,
        embt=emb.T,
        b1t=b1[:, None],
        w2t=jnp.asarray(params["block4"]["w"], jnp.float32).T,
        b2t=jnp.asarray(params["block4"]["b"], jnp.float32)[:, None],
        w3t=jnp.asarray(params["block5"]["w"], jnp.float32).T,
        b3t=jnp.asarray(params["block5"]["b"], jnp.float32)[:, None],
    )


def _fused_infer_kernel_t(
    xt_ref, kt_ref, sidt_ref, base_ref, counts_ref,
    w1t_ref, embt_ref, b1t_ref, w2t_ref, b2t_ref, w3t_ref, b3t_ref, thr_ref,
    p_out, site_out,
    *, n_samples: int, compute_dtype, probe=None,
):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    block = xt_ref.shape[1]
    n_feat = xt_ref.shape[0]
    n_pos = kt_ref.shape[0]
    vocab = embt_ref.shape[1]

    dot = make_parity_dot(compute_dtype)
    onehot_dot = make_onehot_dot_rhs(compute_dtype)

    @pl.when(step == 0)
    def _init():
        site_out[:] = jnp.zeros_like(site_out)

    # ---- encoder, reads on lanes ----
    # banded embedding build: the conceptual selector is block-diagonal with
    # identical emb.T bands, so instead of one stacked (66P, block) one-hot
    # (P full-height iota-compares + adds), build a (66, block) one-hot per
    # position and contract each against the shared (dim, 66) band.  Output
    # is bit-identical (exactly one nonzero per column per band; the stacked
    # contraction only ever added exact zeros from the other bands) at ~6x
    # less VPU build work and k=66 instead of k=198 per MXU pass.
    embT = embt_ref[:]  # (dim, vocab) == emb.T
    rows = jax.lax.broadcasted_iota(jnp.int32, (vocab, block), 0)
    # 0/1 is exact in bfloat16, so in the split-precision modes the one-hot
    # is built directly in the dot's native dtype (skips a (66, block)
    # convert per position; the dot's internal astype becomes a no-op)
    oh_dtype = jnp.float32 if compute_dtype == jnp.float32 else jnp.bfloat16
    if probe == "noembed":  # perf probe only: skip the one-hot embedding build
        et = jnp.zeros((2 * n_pos, block), jnp.float32)
    else:
        et = jnp.concatenate(
            [
                onehot_dot(embT, (rows == kt_ref[j, :][None, :]).astype(oh_dtype))
                for j in range(n_pos)
            ],
            axis=0,
        )  # (2P, block) — exact row selection
    # first layer runs at HIGHEST even in f32x3 mode: its k=15 contraction
    # costs one MXU k-tile regardless of passes, and keeping it exact holds
    # the whole-model f32x3 error inside the 1e-5 per-read golden tolerance
    # (measured: 5e-6 with this split vs 1.05e-5 with all-f32x3).
    # Signal features and selected embeddings are concatenated on sublanes
    # so the whole layer is ONE k=15 contraction (round 4): separate k=9
    # and k=6 dots each paid a full 128-wide MXU k-tile — at HIGHEST's
    # 6 passes that split was ~58% of the f32x3 step's MXU tiles.
    dot1 = make_parity_dot(jnp.float32) if compute_dtype == "f32x3" else dot
    xin = jnp.concatenate([xt_ref[:], et], axis=0)  # (9 + 2P, block)
    h = dot1(w1t_ref[:], xin) + b1t_ref[:]
    h = jnp.maximum(h, 0.0)
    h = jnp.maximum(dot(w2t_ref[:], h) + b2t_ref[:], 0.0)
    p = jax.nn.sigmoid(dot(w3t_ref[:], h) + b3t_ref[:])  # (1, block)
    p_out[:] = p

    if probe == "nosite":
        @pl.when(step == n_steps - 1)
        def _fake_finalize():
            site_out[:] = jnp.zeros_like(site_out) + p[0, 0]

        return

    # ---- site accumulation (MXU, round 4) ----
    # The round-3 VPU loop (eq one-hot + two where/sum sublane reductions)
    # cost ~170 vector ops per 128-read sub-chunk; this formulation contracts
    # the same (SUB, width) one-hot against a 4-row bf16 operand on the MXU
    # instead (~2 MXU tiles + the eq build per sub-chunk).  one_minus is
    # split hi+mid+lo into three bf16 rows — 24 recovered mantissa bits
    # ≈ f32, so site sums stay inside the f32-parity tolerance — and hits
    # are 0/1 with counts <= SUB, so every product and f32 accumulation is
    # exact: mod_ratio remains bit-identical to the XLA path.  Bonus: p is
    # consumed in row layout, removing the per-block (1,B)->(B,1) relayout.
    thr = thr_ref[0]
    one_minus = 1.0 - p  # (1, block) f32
    om_hi = one_minus.astype(jnp.bfloat16)
    r1 = one_minus - om_hi.astype(jnp.float32)
    om_mid = r1.astype(jnp.bfloat16)
    om_lo = (r1 - om_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    hits = (p >= thr).astype(jnp.bfloat16)
    a_rows = jnp.concatenate([om_hi, om_mid, om_lo, hits], axis=0)  # (4, block)
    sid_col = jnp.transpose(sidt_ref[:])  # (block, 1) i32 — the one relayout
    width = SUB + LANE
    cols = jax.lax.broadcasted_iota(jnp.int32, (SUB, width), 1)
    for c in range(block // SUB):
        base = pl.multiple_of(base_ref[0, step * (block // SUB) + c], LANE)
        local = sid_col[c * SUB : (c + 1) * SUB, :] - base  # (SUB, 1)
        eq = (cols == local).astype(jnp.bfloat16)  # (SUB, width), one hit/row
        contrib = jnp.dot(
            a_rows[:, c * SUB : (c + 1) * SUB], eq,
            preferred_element_type=jnp.float32,
        )  # (4, width) f32: [om_hi, om_mid, om_lo, hits] segment sums
        site_out[:, pl.ds(base, width)] += contrib

    @pl.when(step == n_steps - 1)
    def _finalize():
        counts = jnp.maximum(counts_ref[:].astype(jnp.float32), 1.0)
        sums = site_out[0:1, :] + site_out[1:2, :] + site_out[2:3, :]
        site_out[0:1, :] = 1.0 - (sums / counts) ** n_samples
        site_out[1:2, :] = site_out[3:4, :] / counts


def fused_inference_t(
    fp: FusedEncoderParamsT,
    features: jnp.ndarray,  # (N, 9) f32
    kmer_ids: jnp.ndarray,  # (N, P) i32
    site_ids: jnp.ndarray,  # (N,) i32, consecutive per pack_sites
    counts: jnp.ndarray,  # (S,) i32
    threshold: float,
    n_samples: int = 20,
    # 16384 benches +5.7% f32x3 / +1.8% bf16 over 8192 (fewer grid steps);
    # the round-4 MXU site reduction shrank the unrolled sub-chunk loop
    # enough that Mosaic compiles it in minutes (round 3's VPU body took
    # >10 min).  32768 would need the 96 MB clamped VMEM budget exceeded.
    block_reads: int = 16384,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    probe: str | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Transposed-layout single-kernel inference step.

    Same contract as :func:`fused_inference`; the input transposes happen
    here in XLA (dense relayouts, ~2 ms/batch at production shapes — far
    below the ~22 ms of padded-tile DMA they remove)."""
    n = features.shape[0]
    site_capacity = counts.shape[0]
    block_reads = max(SUB, min(block_reads, n))
    while n % block_reads != 0 and block_reads > SUB:
        block_reads //= 2
    if n % block_reads != 0 or block_reads % SUB != 0:
        raise ValueError(
            f"read capacity {n} must be a multiple of a power-of-two block >= {SUB}"
        )
    grid = (n // block_reads,)
    n_feat = features.shape[1]
    n_pos = kmer_ids.shape[1]
    s_pad = -(-(site_capacity + SUB + LANE) // LANE) * LANE
    thr = jnp.full((1,), threshold, jnp.float32)
    xt = features.T  # (9, N)
    kt = kmer_ids.T.astype(jnp.int32)  # (P, N)
    sidt = site_ids.reshape(1, n)
    bases = _align_down(site_ids[:: SUB].astype(jnp.int32)).reshape(1, n // SUB)
    counts_pad = jnp.zeros((1, s_pad), counts.dtype).at[0, :site_capacity].set(counts)

    kernel = functools.partial(
        _fused_infer_kernel_t, n_samples=n_samples, compute_dtype=compute_dtype,
        probe=probe,
    )
    p, site_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_feat, block_reads), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pos, block_reads), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_reads), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.w1t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.embt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.b1t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.w2t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.b2t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.w3t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fp.b3t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_reads), lambda i: (0, i), memory_space=pltpu.VMEM),
            # 4 rows: hi/mid/lo one_minus partial sums + hit counts; the
            # finalize step folds them into (site_p, mod_ratio) in rows 0-1
            pl.BlockSpec((4, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((4, s_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            # scale the scoped-VMEM budget with the block: fewer grid steps
            # amortize the ~1.4 us/step overhead, and v5e has 128 MB VMEM —
            # the transients (hi/lo splits, (66, block) one-hots) grow
            # linearly with the block
            # clamped at 96 MB: v5e has 128 MB physical VMEM and an unclamped
            # linear scale would request >128 MB at block_reads >= 16384,
            # failing compile with an opaque Mosaic error
            vmem_limit_bytes=min((24 << 20) * (block_reads // 4096), 96 << 20)
            if block_reads >= 4096
            else None,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ((n_feat + 2 * n_pos) * 150 + 150 * 32 + 32),
            bytes_accessed=n * (n_feat * 4 + n_pos * 4 + 8) + s_pad * 12,
            transcendentals=n,
        ),
        interpret=interpret,
    )(
        xt, kt, sidt, bases, counts_pad,
        fp.w1t, fp.embt, fp.b1t, fp.w2t, fp.b2t, fp.w3t, fp.b3t, thr,
    )
    return p[0, :], site_out[0, :site_capacity], site_out[1, :site_capacity]
