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
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Optional, Tuple

import jax
import numpy as np

from ..data.batching import DEFAULT_READ_CAPACITY, DEFAULT_SITE_CAPACITY, SiteBatch, pack_sites
from ..data.dataset import SiteDataset
from ..models.mil import MILModel
from ..ops import site_ops
from ..parallel import mesh as mesh_lib
from ..utils.logging import get_logger
from ..utils.profiling import StageTimer

SITE_HEADER = "transcript_id,transcript_position,n_reads,probability_modified,kmer,mod_ratio\n"
INDIV_HEADER = "transcript_id,transcript_position,read_index,probability_modified\n"


def fused_backend_supported(model: MILModel) -> bool:
    """True when the loaded architecture matches the fused kernels' layout:
    Deaggregate -> KmerMultipleEmbedding -> Concat -> Linear(relu, BN
    optional) -> Linear(relu, no BN) -> SigmoidProdPooling — the production
    MILModel all four released models share (SURVEY.md §3.4; reference
    config m6anet/model/configs/model_configs/m6anet.toml).  Any other
    config TOML must run on the XLA backend."""
    import jax.nn

    names = [type(blk).__name__ for _, blk in model.blocks]
    if names != [
        "DeaggregateNanopolish", "KmerMultipleEmbedding", "ConcatenateFeatures",
        "Linear", "Linear", "SigmoidProdPooling",
    ]:
        return False
    l1, l2 = model.blocks[3][1], model.blocks[4][1]
    return (
        l1.activation is jax.nn.relu
        and l2.activation is jax.nn.relu
        and not l2.batch_norm
    )


def resolve_backend(
    model: MILModel, backend: str, precision: str, log=None
) -> Tuple[str, str]:
    """Resolve 'auto' backend/precision to the fastest configuration that
    passes the golden contract on the current platform.

    On a TPU with a production-architecture model that is the fused Pallas
    kernel at f32x3 (3-pass bf16x3 matmuls, within the 1e-5 per-read golden
    tolerance — PERFORMANCE.md device table); anywhere else, XLA at full
    f32 parity.  Explicit non-XLA choices are validated here so users get a
    CLI-time error instead of a kernel-prep KeyError.
    """
    fused_ok = fused_backend_supported(model)
    on_tpu = jax.default_backend() != "cpu"
    if backend == "auto":
        backend = "pallas_fused" if (on_tpu and fused_ok) else "xla"
    elif backend != "xla" and not fused_ok:
        raise ValueError(
            f"backend {backend!r} supports only the production architecture "
            "(the packaged m6anet.toml config); this model config requires "
            "--backend xla"
        )
    if precision == "auto":
        precision = "f32x3" if (backend != "xla" and on_tpu) else "f32"
    if log is not None:
        log.info("inference path: backend=%s precision=%s", backend, precision)
    return backend, precision


def derive_site_ids(offsets, counts, n_reads: int, site_capacity: int):
    """In-graph reconstruction of the packed per-read site-id vector.

    pack_sites lays reads out densely — site i occupies
    [offsets[i], offsets[i]+counts[i]) with no gaps and padding at the tail —
    so site_ids is fully determined by (offsets, counts): scatter a mark at
    every real site's first read, prefix-sum, and send the padding tail to
    ``site_capacity``.  Computing it on device instead of shipping it saves
    4 MB of host->device transfer per 1M-read batch (the relay moves
    ~20 MB/s — PERFORMANCE.md round-5 h2d probe)."""
    import jax.numpy as jnp

    idx = jnp.where(counts > 0, offsets, n_reads)  # padding sites dropped
    marks = jnp.zeros((n_reads + 1,), jnp.int32).at[idx].add(1)
    ids = jnp.cumsum(marks[:n_reads]) - 1
    total = jnp.sum(counts)
    return jnp.where(jnp.arange(n_reads) < total, ids, site_capacity)


def make_infer_step(
    model: MILModel,
    site_capacity: int,
    threshold: float,
    n_samples: int = 20,
    method: str = "exact",
    n_iterations: int = 1000,
    backend: str = "xla",
    precision: str = "f32",
    mc_read_cap: int = 1024,
):
    """Build the jitted per-batch device function.

    ``backend='pallas'`` routes the per-read encoder through the fused Pallas
    kernel (production architecture only — BN folded, embedding folded into
    per-position tables; see m6anet_tpu/ops/encoder_kernel.py).

    ``precision='bf16'`` (pallas backend only) runs the encoder matmuls in
    bfloat16 with f32 accumulation: one MXU pass instead of ~6, at ~1e-3
    probability error — outside the per-read parity tolerance but well inside
    the site-level one.  f32 (default) is bit-stable parity mode.

    Transfer-lean input contract (round 5): ``kmer_ids`` may arrive in any
    integer dtype (the engine ships int8 — the vocabulary is 66) and
    ``site_ids`` may be ``None``, in which case it is derived in-graph from
    (offsets, counts) via :func:`derive_site_ids`.
    """
    if method not in ("exact", "mc"):
        raise ValueError(f"site_proba method must be 'exact' or 'mc', got {method!r}")
    if backend not in ("xla", "pallas", "pallas_fused"):
        raise ValueError(
            f"backend must be 'xla', 'pallas' or 'pallas_fused', got {backend!r}"
        )
    if precision not in ("f32", "f32x3", "bf16"):
        raise ValueError(f"precision must be 'f32', 'f32x3' or 'bf16', got {precision!r}")
    if precision != "f32" and backend == "xla":
        raise ValueError(f"precision {precision!r} is supported on the pallas backends")

    # pallas kernels compile for TPU; on the CPU backend they run interpreted
    interpret = jax.default_backend() == "cpu"

    if backend == "pallas_fused":
        import jax.numpy as jnp

        from ..ops.fused_infer_kernel import fused_inference_t, prepare_fused_params_t
        from ..ops.mc_kernel import site_probability_mc_pallas

        fused_dtype = {"bf16": jnp.bfloat16, "f32x3": "f32x3"}.get(precision, jnp.float32)

        @partial(jax.jit, donate_argnums=())
        def fused_step(params, features, kmer_ids, site_ids, offsets, counts, base_key):
            kmer_ids = kmer_ids.astype(jnp.int32)  # int8 over the wire
            if site_ids is None:
                site_ids = derive_site_ids(
                    offsets, counts, features.shape[0], site_capacity
                )
            fp = prepare_fused_params_t(params)
            p, site_p, mod_ratio = fused_inference_t(
                fp, features, kmer_ids, site_ids, counts, threshold, n_samples,
                interpret=interpret, compute_dtype=fused_dtype,
            )
            if method == "mc":  # replace the exact site estimate with MC
                site_p = site_probability_mc_pallas(
                    p, offsets, counts, base_key, n_iters=n_iterations,
                    n_samples=n_samples, read_cap=mc_read_cap, interpret=interpret,
                )
            return p, site_p, mod_ratio

        return fused_step

    if backend == "pallas":
        import jax.numpy as jnp

        from ..ops.encoder_kernel import fused_read_probability, prepare_fused_params

        compute_dtype = {"bf16": jnp.bfloat16, "f32x3": "f32x3"}.get(precision, jnp.float32)

        def per_read_prob(params, features, kmer_ids):
            return fused_read_probability(
                prepare_fused_params(params), features, kmer_ids,
                interpret=interpret, compute_dtype=compute_dtype,
            )

    else:

        def per_read_prob(params, features, kmer_ids):
            return model.per_read_probability(params, {"X": features, "kmer": kmer_ids})

    # One single jitted program per batch: even the MC draws are derived
    # in-graph from base_key.  Never dispatch a second eager device program
    # alongside the step — on the axon TPU platform an eager computation
    # racing a jitted dispatch can deadlock the execution queue.
    @partial(jax.jit, donate_argnums=())
    def step(params, features, kmer_ids, site_ids, offsets, counts, base_key):
        import jax.numpy as jnp

        kmer_ids = kmer_ids.astype(jnp.int32)  # int8 over the wire
        if site_ids is None:
            site_ids = derive_site_ids(
                offsets, counts, features.shape[0], site_capacity
            )
        p = per_read_prob(params, features, kmer_ids)
        if method == "exact":
            site_p = site_ops.site_probability_exact(p, site_ids, counts, site_capacity, n_samples)
        elif backend == "pallas":
            # the count-keyed MXU resampling kernel (see ops/mc_kernel.py)
            from ..ops.mc_kernel import site_probability_mc_pallas

            site_p = site_probability_mc_pallas(
                p, offsets, counts, base_key, n_iters=n_iterations,
                n_samples=n_samples, read_cap=mc_read_cap, interpret=interpret,
            )
        else:
            site_p = site_ops.site_probability_mc(
                p, offsets, counts, base_key, n_iters=n_iterations, n_samples=n_samples
            )
        mod_ratio = site_ops.mod_ratio_exact(p, site_ids, counts, site_capacity, threshold)
        return p, site_p, mod_ratio

    return step


def _env_int(name: str, default: int, apply: bool = True) -> int:
    """Integer env override with a clear CLI-time error on garbage values.

    ``apply=False`` (the caller passed an explicit non-default argument)
    leaves the argument untouched — env defaults never silently override an
    explicit choice."""
    raw = os.environ.get(name)
    if raw is None or not apply:
        return default
    try:
        return max(0, int(raw))
    except ValueError as e:
        raise ValueError(f"{name} must be an integer, got {raw!r}") from e


def _fetch_result(result):
    """Device->host transfer of one group's flat output (runs on a fetch
    thread).

    With fetch_threads > 1 the fetches of in-flight groups overlap each
    other, device compute, and CSV rendering.  NOTE the measured caveat in
    :func:`run_inference`: the axon relay SERIALIZES transfers and degrades
    ~30x under concurrent requests, so overlap is opt-in
    (M6ANET_TPU_FETCH_THREADS) for direct-attached hardware."""
    return np.asarray(result)


@jax.jit
def _concat_group_flat(parts):
    """JITTED device-side flatten+concat of a fetch group's outputs.

    One program producing one contiguous f32 buffer, so the whole group
    crosses device->host in a single transfer (the relay charges per
    transfer, not per byte — PERFORMANCE.md round-4 A/B; the training loop
    got its 15x epoch win from the same restructure).  Jitted rather than
    eager on purpose: on the axon platform an eager computation racing
    queued jitted programs can deadlock the execution queue."""
    import jax.numpy as jnp

    return jnp.concatenate([x.reshape(-1).astype(jnp.float32) for x in parts])


def _write_batch(batch: SiteBatch, p, site_p, mod_ratio, f_site, f_indiv):
    from ..native import native_render_indiv_csv_batch

    site_p = np.asarray(site_p)
    mod_ratio = np.asarray(mod_ratio)

    site_rows = []
    all_int_ids = True
    for i, site in enumerate(batch.sites):
        site_rows.append(
            "%s,%d,%s,%.16f,%s,%.16f\n"
            % (site.tx_id, site.tx_pos, batch.counts[i], site_p[i], site.center_kmer, mod_ratio[i])
        )
        all_int_ids = all_int_ids and site.read_ids.dtype == np.int64
    f_site.write("".join(site_rows))

    if f_indiv is None:  # site-only mode: p was never fetched
        return
    p = np.asarray(p)

    n_sites = len(batch.sites)
    counts = batch.counts[:n_sites]
    block = None
    if all_int_ids and n_sites:
        prefix_parts = [f"{s.tx_id},{s.tx_pos},".encode() for s in batch.sites]
        prefix_off = np.zeros(n_sites + 1, np.int64)
        np.cumsum([len(q) for q in prefix_parts], out=prefix_off[1:])
        # pack_sites lays reads out densely (site i at [offsets[i],
        # offsets[i]+counts[i]), no gaps), so the flat probability prefix
        # lines up with the concatenated read ids directly
        read_ids = np.concatenate([s.read_ids for s in batch.sites])
        block = native_render_indiv_csv_batch(
            b"".join(prefix_parts), prefix_off, counts,
            read_ids, p[: len(read_ids)],
        )
    if block is None:  # string read ids (replicates) or no native lib
        parts = []
        for i, site in enumerate(batch.sites):
            start = batch.offsets[i]
            parts.append(
                "".join(
                    "%s,%d,%s,%.16f\n"
                    % (site.tx_id, site.tx_pos, site.read_ids[r], p[start + r])
                    for r in range(batch.counts[i])
                )
            )
        block = "".join(parts).encode()
    f_indiv.write(block)


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
    backend: str = "auto",
    precision: str = "auto",
    resume: bool = False,
    host_shard: Optional[Tuple[int, int]] = None,
    n_threads: int = 1,
    fetch_threads: int = 1,
    fetch_group: int = 0,
    write_indiv: bool = True,
) -> None:
    """Run inference over every site of the dataset and write both CSVs.

    ``resume=True`` continues an interrupted run: both CSVs are truncated to
    the last fully-written site and the dataset's already-scored prefix is
    skipped.  (The reference has no inference checkpointing at all —
    SURVEY.md §5.)

    ``host_shard=(host_id, n_hosts)`` is the multi-host mode: this process
    scores its contiguous slice of the global site index and writes
    ``*.csv.shard{host_id}`` files; merge with :func:`merge_host_shards`.
    MC draws depend only on (seed, site read count, the site's reads), so
    results are invariant to the shard layout.

    ``fetch_group`` batches G dispatches' outputs into ONE device-side
    concatenated buffer fetched in a single device->host transfer (0 =
    auto-size to ~256 MB of results, capped at 64 batches).  Measured on
    the axon relay (PERFORMANCE.md round 5): per-transfer round-trip
    latency ranges 0.1-2 s with bulk bandwidth ~2-20 MB/s depending on the
    hour, so grouping saves up to G-1 round trips and is never worse than
    per-batch fetches.  CSV rows are still written strictly in site order,
    so ``--resume`` semantics are unchanged — a crash mid-group just
    re-scores that group's sites.

    ``write_indiv=False`` skips data.indiv_proba.csv entirely (an
    extension — the reference always writes both): per-read
    probabilities are then neither fetched from the device nor rendered,
    which removes ~97% of the device->host result volume (p is
    read_capacity floats/batch vs 2*site_capacity for the site arrays)
    — the measured e2e wall on relay-attached hardware.
    """
    os.makedirs(out_dir, exist_ok=True)
    timer = StageTimer()
    log = get_logger("m6anet_tpu.inference")
    backend, precision = resolve_backend(model, backend, precision, log=log)
    # Fetch overlap knobs.  MEASURED on the axon relay (2026-08-21, full
    # 95k-site workload, same dataset back-to-back): serial fetches 2.4 s
    # each (37.9 s e2e); copy_to_host_async before a serial fetch 6.7 s
    # each (61.9 s); four concurrent fetch threads 80 s each (726 s!) —
    # this relay serializes device->host transfers and punishes overlapped
    # requests, so the safe default is fully serial.  On direct-attached
    # TPU hardware overlapping fetches with compute/rendering is the right
    # call: set M6ANET_TPU_FETCH_THREADS>1 (and the async hint on) there.
    # The env vars only override arguments left at their defaults, so an
    # explicit caller choice always wins.
    fetch_threads = _env_int("M6ANET_TPU_FETCH_THREADS", fetch_threads, fetch_threads == 1)
    fetch_group = _env_int("M6ANET_TPU_FETCH_GROUP", fetch_group, fetch_group == 0)
    async_hint = os.environ.get("M6ANET_TPU_ASYNC_FETCH_HINT", "0") != "0"

    shard_suffix = ""
    global_offset = 0
    n_total_sites = None
    if host_shard is not None:
        host_id, n_hosts = host_shard
        lo, hi = mesh_lib.host_shard_bounds(len(dataset), n_hosts, host_id)
        global_offset = lo
        n_total_sites = hi - lo
        shard_suffix = f".shard{host_id}"
        log.info("host %d/%d scoring sites [%d, %d)", host_id, n_hosts, lo, hi)

    mesh = None
    if use_mesh and len(jax.local_devices()) > 1:
        # local devices only: in multi-process mode each process scores its
        # own host shard independently (each host feeds different batches, so
        # a global mesh would device_put mismatched values across processes)
        mesh = mesh_lib.make_mesh(jax.local_devices())
        # pad capacities to device-divisible sizes
        n_dev = len(mesh.devices.flat)
        read_capacity = -(-read_capacity // n_dev) * n_dev
        params = mesh_lib.shard_params(mesh, params)
        read_shard = mesh_lib.read_sharding(mesh)
        repl = mesh_lib.replicated(mesh)

    # capacity validation at run setup, not mid-run from the packer (the
    # reference streams any site size — m6anet/utils/data_utils.py:226-229 —
    # so oversized sites must fail early with the flag to change)
    max_reads = getattr(dataset, "max_site_reads", None)
    if max_reads is not None and max_reads > read_capacity:
        raise ValueError(
            f"the dataset has a site with {max_reads} reads, above "
            f"read_capacity ({read_capacity}); raise --read_capacity, or cap "
            "sites at dataprep time with --readcount_max"
        )

    # the MC kernel's per-site read window; batches are validated against it
    mc_read_cap = 1024
    if method == "mc" and backend != "xla" and max_reads is not None:
        mc_read_cap = max(mc_read_cap, -(-int(max_reads) // 128) * 128)
    step = make_infer_step(
        model, site_capacity, read_proba_threshold, n_samples, method, num_iterations,
        backend, precision, mc_read_cap=mc_read_cap,
    )
    # raw threefry key data built on host (no device program): PRNGKey(seed)
    # is (hi, lo) = (seed >> 32, seed & 0xffffffff)
    base_key = np.array([seed >> 32, seed & 0xFFFFFFFF], dtype=np.uint32)

    site_path = os.path.join(out_dir, "data.site_proba.csv" + shard_suffix)
    indiv_path = os.path.join(out_dir, "data.indiv_proba.csv" + shard_suffix)

    n_done = 0
    file_mode = "w"
    if (
        resume
        and os.path.exists(site_path)
        and (not write_indiv or os.path.exists(indiv_path))
    ):
        n_done = _prepare_resume(site_path, indiv_path if write_indiv else None)
        # nothing valid survived (e.g. the first run died before the header
        # buffers flushed): start over in "w" mode so headers are written
        file_mode = "a" if n_done > 0 else "w"
        log.info("resuming: %d sites already scored", n_done)

    def sites_to_score():
        # parse payloads on a thread pool when the dataset supports it — the
        # native data.json parser releases the GIL, so the featurize feed
        # scales with host cores (the moral equivalent of the reference's
        # DataLoader num_workers, m6anet/scripts/inference.py:104-105)
        iter_kwargs = {}
        if n_threads > 1:
            import inspect

            try:
                if "n_threads" in inspect.signature(dataset.iter_sites).parameters:
                    iter_kwargs["n_threads"] = n_threads
            except (TypeError, ValueError):
                pass
        it = dataset.iter_sites(**iter_kwargs)
        skip = global_offset + n_done
        for _ in range(skip):
            next(it)
        produced = 0
        limit = None if n_total_sites is None else n_total_sites - n_done
        for site in it:
            if limit is not None and produced >= limit:
                return
            produced += 1
            yield site

    # Auto fetch-group size: ONE transfer should cover a full run at
    # current scales (the 95k-site headline run is 8 batches) while capping
    # device-held results at ~256 MB and giving long runs periodic output.
    out_bytes_per_batch = 4 * (read_capacity + 2 * site_capacity)
    if fetch_group <= 0:
        fetch_group = max(1, min(64, (256 << 20) // out_bytes_per_batch))
    fetch_threads = max(1, fetch_threads)

    import contextlib

    # indiv file is binary: its rows are rendered natively as bytes
    with ThreadPoolExecutor(
        max_workers=fetch_threads, thread_name_prefix="m6anet-fetch"
    ) as fetch_pool, open(site_path, file_mode, encoding="utf-8") as f_site, (
        open(indiv_path, file_mode + "b")
        if write_indiv
        else contextlib.nullcontext(None)
    ) as f_indiv:
        if file_mode == "w":
            f_site.write(SITE_HEADER)
            if f_indiv is not None:
                f_indiv.write(INDIV_HEADER.encode())

        # group: dispatched batches whose (device-resident) outputs await the
        # group flush.  Device memory: outputs are O(reads) f32, ~4 MB/batch
        # at the 1M-read TPU capacity, <=256 MB/group by construction.  Host
        # memory: the packed feature/kmer feed arrays are dropped at dispatch
        # (only site metadata is retained for CSV rendering), so holding a
        # group costs the host ~n_sites of metadata, not ~160 MB of features.
        group: list = []
        group_sizes: list = []
        inflight: deque = deque()
        # in-flight GROUPS bound how many d2h fetches can overlap (serial by
        # default; see the relay measurements above)
        max_inflight = max(1, fetch_threads)

        def flush_group():
            if not group:
                return
            metas = [b for b, _ in group]
            # site-only mode never moves p across the link (the per-read
            # probabilities are ~97% of the result volume)
            take = (lambda res: res) if write_indiv else (lambda res: res[1:])
            parts = tuple(r for _, res in group for r in take(res))
            if not group_sizes:
                group_sizes.extend(int(np.prod(r.shape)) for r in take(group[0][1]))
            # one jitted concat -> one contiguous f32 buffer -> one transfer
            flat = _concat_group_flat(parts)
            if async_hint:
                try:
                    flat.copy_to_host_async()
                except Exception:
                    pass
            inflight.append((metas, fetch_pool.submit(_fetch_result, flat)))
            group.clear()

        def drain_group():
            metas, fut = inflight.popleft()
            with timer.stage("write"):
                flat = fut.result()
                pos = 0
                for b in metas:
                    views = []
                    for sz in group_sizes:
                        views.append(flat[pos : pos + sz])
                        pos += sz
                    if not write_indiv:
                        views = [None] + views
                    _write_batch(b, *views, f_site=f_site, f_indiv=f_indiv)

        from ..data.prefetch import threaded_iter

        if hasattr(dataset, "iter_packed"):
            # columnar fast path: vectorized block packing straight off the
            # memory map (no per-site Python in the feed)
            limit = None if n_total_sites is None else n_total_sites - n_done
            packed = dataset.iter_packed(
                global_offset + n_done, limit, read_capacity, site_capacity
            )
        else:
            packed = pack_sites(
                sites_to_score(), read_capacity=read_capacity, site_capacity=site_capacity
            )
        batches = threaded_iter(packed, depth=pipeline_depth + 1)
        for batch in _timed_iter(timer, "featurize+pack", batches):
            with timer.stage("dispatch"):
                if method == "mc" and backend != "xla" and batch.counts.max(initial=0) > mc_read_cap:
                    big = int(batch.counts.max())
                    raise ValueError(
                        f"a site has {big} reads, above the MC kernel's "
                        f"read window ({mc_read_cap}); rerun dataprep with "
                        "--readcount_max <= the window, or use --backend xla"
                    )
                # transfer-lean inputs: kmer ids ship int8 (vocab 66) and
                # site_ids ship NOT AT ALL (derived in-graph from
                # offsets+counts) — 16 MB less h2d per 1M-read batch on a
                # ~20 MB/s relay link
                kmer_wire = batch.kmer_ids
                if kmer_wire is not None and kmer_wire.dtype != np.int8:
                    kmer_wire = kmer_wire.astype(np.int8)
                args = (
                    batch.features, kmer_wire, None,
                    batch.offsets, batch.counts,
                )
                if mesh is not None:
                    args = (
                        jax.device_put(batch.features, read_shard),
                        jax.device_put(kmer_wire, read_shard),
                        None,
                        jax.device_put(batch.offsets, repl),
                        jax.device_put(batch.counts, repl),
                    )
                result = step(params, *args, base_key)
                # free the host-side packed feed arrays now — CSV rendering
                # needs only sites/offsets/counts, and the device dispatch
                # holds its own references to the transferred inputs
                batch.features = batch.kmer_ids = batch.site_ids = None
                group.append((batch, result))
                if len(group) >= fetch_group:
                    flush_group()
            if len(inflight) > max_inflight:
                drain_group()
        with timer.stage("dispatch"):
            flush_group()
        while inflight:
            drain_group()
    log.info("inference stages: %s", timer.summary())


def _timed_iter(timer: "StageTimer", name: str, it):
    """Attribute generator-side (host featurization) time to a stage."""
    it = iter(it)
    while True:
        with timer.stage(name):
            try:
                item = next(it)
            except StopIteration:
                return
        yield item


def _prepare_resume(site_path: str, indiv_path: Optional[str]) -> int:
    """Truncate both CSVs to the last complete site; return its count.
    ``indiv_path=None`` (site-only mode) truncates the site CSV alone.

    The site CSV is the source of truth: any site row after the last newline
    is dropped, then the indiv CSV is truncated to exactly the rows of the
    surviving sites (rows are written grouped per site, in order).  Both
    files are processed in fixed-size chunks — resuming a giant run must not
    materialize gigabytes or loop Python once per read row.
    """
    CHUNK = 1 << 24
    n_done = 0
    expected_reads = 0
    with open(site_path, "rb+") as f:
        offset = len(f.readline())  # header (0 for an empty file)
        tail = b""
        while True:
            chunk = f.read(CHUNK)
            if not chunk:
                break
            chunk = tail + chunk
            lines = chunk.split(b"\n")
            tail = lines.pop()  # partial last line (possibly b"")
            for ln in lines:
                offset += len(ln) + 1
                n_done += 1
                try:
                    expected_reads += int(ln.split(b",")[2])
                except (IndexError, ValueError) as e:
                    raise RuntimeError(
                        f"site_proba.csv row {n_done} is malformed "
                        f"({ln[:80]!r}); cannot resume — rerun without "
                        "--resume"
                    ) from e
        f.truncate(offset)  # drops any torn trailing row

    if indiv_path is None:
        return n_done

    with open(indiv_path, "rb+") as f:
        offset = len(f.readline())
        remaining = expected_reads
        while remaining > 0:
            chunk = f.read(CHUNK)
            if not chunk:
                raise RuntimeError(
                    "indiv_proba.csv is shorter than site_proba.csv implies; "
                    "cannot resume — rerun without resume"
                )
            n = chunk.count(b"\n")
            if n >= remaining:
                pos = -1
                for _ in range(remaining):
                    pos = chunk.find(b"\n", pos + 1)
                offset += pos + 1
                remaining = 0
            else:
                offset += len(chunk)
                remaining -= n
        f.truncate(offset)
    return n_done


def merge_host_shards(out_dir: str, n_hosts: int, write_indiv: bool = True) -> None:
    """Concatenate per-host CSV shards into the final output files.

    Host-side merge keeps the reference's append-only CSV contract — no
    device gathers of strings (SURVEY.md §5 distributed notes).
    """
    import shutil

    names = [("data.site_proba.csv", SITE_HEADER)]
    if write_indiv:
        names.append(("data.indiv_proba.csv", INDIV_HEADER))
    for name, header in names:
        with open(os.path.join(out_dir, name), "wb") as out:
            out.write(header.encode())
            for host in range(n_hosts):
                shard = os.path.join(out_dir, f"{name}.shard{host}")
                with open(shard, "rb") as f:
                    f.readline()  # strip shard header
                    shutil.copyfileobj(f, out, 16 << 20)  # bulk binary copy
