"""Batched device-resident inference: dataset -> per-read and per-site CSVs.

Capability parity with the reference inference engine
(reference: m6anet/utils/inference_utils.py:14-140) with the TPU-first
architecture from SURVEY.md §7: packed static-shape batches, one jitted step
computing per-read probabilities + site noisy-OR + mod_ratio with segment
reductions, async dispatch with a small in-flight pipeline, and a single
sequential CSV writer.

Output contract (reference: m6anet/scripts/inference.py:94-97):
  data.site_proba.csv:  transcript_id,transcript_position,n_reads,probability_modified,kmer,mod_ratio
  data.indiv_proba.csv: transcript_id,transcript_position,read_index,probability_modified
values at 16 decimal places.  Unlike the reference, the final buffered batch
is always flushed (the reference's ``(it+1) % save_per_batch`` flush condition
silently drops a trailing buffer when the batch count is a multiple of
save_per_batch — reference: m6anet/utils/inference_utils.py:47).
"""
from __future__ import annotations

import os
from collections import deque
from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import DEFAULT_READ_CAPACITY, DEFAULT_SITE_CAPACITY, SiteBatch, pack_sites
from ..data.dataset import SiteDataset
from ..models.mil import MILModel
from ..ops import site_ops
from ..parallel import mesh as mesh_lib

SITE_HEADER = "transcript_id,transcript_position,n_reads,probability_modified,kmer,mod_ratio\n"
INDIV_HEADER = "transcript_id,transcript_position,read_index,probability_modified\n"


def make_infer_step(
    model: MILModel,
    site_capacity: int,
    threshold: float,
    n_samples: int = 20,
    method: str = "exact",
    n_iterations: int = 1000,
    backend: str = "xla",
):
    """Build the jitted per-batch device function.

    ``backend='pallas'`` routes the per-read encoder through the fused Pallas
    kernel (production architecture only — BN folded, embedding folded into
    per-position tables; see m6anet_tpu/ops/encoder_kernel.py).
    """
    if method not in ("exact", "mc"):
        raise ValueError(f"site_proba method must be 'exact' or 'mc', got {method!r}")
    if backend not in ("xla", "pallas"):
        raise ValueError(f"backend must be 'xla' or 'pallas', got {backend!r}")

    if backend == "pallas":
        from ..ops.encoder_kernel import fused_read_probability, prepare_fused_params

        def per_read_prob(params, features, kmer_ids):
            return fused_read_probability(prepare_fused_params(params), features, kmer_ids)

    else:

        def per_read_prob(params, features, kmer_ids):
            return model.per_read_probability(params, {"X": features, "kmer": kmer_ids})

    @partial(jax.jit, donate_argnums=())
    def step(params, features, kmer_ids, site_ids, offsets, counts, site_keys):
        p = per_read_prob(params, features, kmer_ids)
        if method == "exact":
            site_p = site_ops.site_probability_exact(p, site_ids, counts, site_capacity, n_samples)
        else:
            site_p = site_ops.site_probability_mc(
                p, offsets, counts, site_keys, n_iters=n_iterations, n_samples=n_samples
            )
        mod_ratio = site_ops.mod_ratio_exact(p, site_ids, counts, site_capacity, threshold)
        return p, site_p, mod_ratio

    return step


def _write_batch(batch: SiteBatch, p, site_p, mod_ratio, f_site, f_indiv):
    p = np.asarray(p)
    site_p = np.asarray(site_p)
    mod_ratio = np.asarray(mod_ratio)
    for i, site in enumerate(batch.sites):
        start = batch.offsets[i]
        n = batch.counts[i]
        f_site.write(
            "%s,%d,%s,%.16f,%s,%.16f\n"
            % (site.tx_id, site.tx_pos, n, site_p[i], site.center_kmer, mod_ratio[i])
        )
        reads = site.read_ids
        for r in range(n):
            f_indiv.write("%s,%d,%s,%.16f\n" % (site.tx_id, site.tx_pos, reads[r], p[start + r]))


def run_inference(
    model: MILModel,
    params,
    dataset: SiteDataset,
    out_dir: str,
    read_proba_threshold: float,
    num_iterations: int = 1000,
    method: str = "exact",
    seed: int = 0,
    n_samples: int = 20,
    read_capacity: int = DEFAULT_READ_CAPACITY,
    site_capacity: int = DEFAULT_SITE_CAPACITY,
    use_mesh: bool = True,
    pipeline_depth: int = 2,
    backend: str = "xla",
) -> None:
    """Run inference over every site of the dataset and write both CSVs."""
    os.makedirs(out_dir, exist_ok=True)

    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        mesh = mesh_lib.make_mesh()
        # pad capacities to device-divisible sizes
        n_dev = len(mesh.devices.flat)
        read_capacity = -(-read_capacity // n_dev) * n_dev
        params = mesh_lib.shard_params(mesh, params)
        read_shard = mesh_lib.read_sharding(mesh)
        repl = mesh_lib.replicated(mesh)

    step = make_infer_step(
        model, site_capacity, read_proba_threshold, n_samples, method, num_iterations, backend
    )
    base_key = jax.random.PRNGKey(seed)

    site_path = os.path.join(out_dir, "data.site_proba.csv")
    indiv_path = os.path.join(out_dir, "data.indiv_proba.csv")

    with open(site_path, "w", encoding="utf-8") as f_site, open(
        indiv_path, "w", encoding="utf-8"
    ) as f_indiv:
        f_site.write(SITE_HEADER)
        f_indiv.write(INDIV_HEADER)

        inflight: deque = deque()

        def drain_one():
            batch, fut = inflight.popleft()
            _write_batch(batch, *fut, f_site=f_site, f_indiv=f_indiv)

        for batch in pack_sites(
            dataset.iter_sites(), read_capacity=read_capacity, site_capacity=site_capacity
        ):
            site_keys = site_ops.make_site_keys(base_key, jnp.asarray(batch.global_ids))
            args = (batch.features, batch.kmer_ids, batch.site_ids, batch.offsets, batch.counts)
            if mesh is not None:
                features, kmer_ids, site_ids = (
                    jax.device_put(batch.features, read_shard),
                    jax.device_put(batch.kmer_ids, read_shard),
                    jax.device_put(batch.site_ids, read_shard),
                )
                offsets = jax.device_put(batch.offsets, repl)
                counts = jax.device_put(batch.counts, repl)
                args = (features, kmer_ids, site_ids, offsets, counts)
            result = step(params, *args, site_keys)
            inflight.append((batch, result))
            if len(inflight) >= pipeline_depth:
                drain_one()
        while inflight:
            drain_one()
