"""Unit tests for the device-side site aggregation ops and the fused encoder
kernel (interpret mode on CPU; real-hardware parity is exercised by bench)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from m6anet_tpu.ops import site_ops


def _random_site_layout(rng, n_sites, site_capacity, read_capacity):
    counts = np.zeros(site_capacity, np.int32)
    offsets = np.zeros(site_capacity, np.int32)
    site_ids = np.full(read_capacity, site_capacity, np.int32)
    cursor = 0
    for s in range(n_sites):
        n = int(rng.integers(5, 40))
        counts[s] = n
        offsets[s] = cursor
        site_ids[cursor : cursor + n] = s
        cursor += n
    p = rng.uniform(0, 0.5, size=read_capacity).astype(np.float32)
    return p, site_ids, offsets, counts, cursor


def test_exact_site_probability_matches_bruteforce():
    rng = np.random.default_rng(0)
    site_capacity, read_capacity, n_sites = 16, 1024, 10
    p, site_ids, offsets, counts, _ = _random_site_layout(rng, n_sites, site_capacity, read_capacity)

    got = np.asarray(
        site_ops.site_probability_exact(
            jnp.asarray(p), jnp.asarray(site_ids), jnp.asarray(counts), site_capacity, 20
        )
    )
    for s in range(n_sites):
        ps = p[offsets[s] : offsets[s] + counts[s]]
        want = 1 - np.mean(1 - ps) ** 20
        assert abs(got[s] - want) < 1e-6


def test_mod_ratio_matches_bruteforce():
    rng = np.random.default_rng(1)
    site_capacity, read_capacity, n_sites = 16, 1024, 10
    p, site_ids, offsets, counts, _ = _random_site_layout(rng, n_sites, site_capacity, read_capacity)
    thr = 0.25
    got = np.asarray(
        site_ops.mod_ratio_exact(
            jnp.asarray(p), jnp.asarray(site_ids), jnp.asarray(counts), site_capacity, thr
        )
    )
    for s in range(n_sites):
        ps = p[offsets[s] : offsets[s] + counts[s]]
        assert abs(got[s] - np.mean(ps >= thr)) < 1e-6


def test_mc_converges_to_exact():
    rng = np.random.default_rng(2)
    site_capacity, read_capacity, n_sites = 8, 512, 6
    p, site_ids, offsets, counts, _ = _random_site_layout(rng, n_sites, site_capacity, read_capacity)

    mc = np.asarray(
        site_ops.site_probability_mc(
            jnp.asarray(p), jnp.asarray(offsets), jnp.asarray(counts),
            jax.random.PRNGKey(0), n_iters=4000
        )
    )
    exact = np.asarray(
        site_ops.site_probability_exact(
            jnp.asarray(p), jnp.asarray(site_ids), jnp.asarray(counts), site_capacity, 20
        )
    )
    np.testing.assert_allclose(mc[:n_sites], exact[:n_sites], atol=2e-2)


def test_mc_kernel_converges_and_is_deterministic():
    """The Pallas MC kernel (interpret mode): converges to the closed form,
    bit-deterministic for a fixed seed, count-0 padding sites return 0."""
    from m6anet_tpu.ops.mc_kernel import site_probability_mc_pallas

    rng = np.random.default_rng(5)
    site_capacity, read_capacity, n_sites = 8, 512, 6
    p, site_ids, offsets, counts, _ = _random_site_layout(rng, n_sites, site_capacity, read_capacity)

    args = (jnp.asarray(p), jnp.asarray(offsets), jnp.asarray(counts), jax.random.PRNGKey(0))
    mc = np.asarray(site_probability_mc_pallas(*args, n_iters=4000, read_cap=128, interpret=True))
    exact = np.asarray(
        site_ops.site_probability_exact(
            jnp.asarray(p), jnp.asarray(site_ids), jnp.asarray(counts), site_capacity, 20
        )
    )
    np.testing.assert_allclose(mc[:n_sites], exact[:n_sites], atol=2e-2)
    assert (mc[n_sites:] == 0).all()

    mc2 = np.asarray(site_probability_mc_pallas(*args, n_iters=4000, read_cap=128, interpret=True))
    np.testing.assert_array_equal(mc, mc2)


def test_mc_kernel_multichunk_matches_oracle():
    """Chunked-W rework (round 4): sites whose counts span multiple 128-row
    chunks (wc up to 4 at read_cap=512) must replay the shared-draw
    estimator exactly.  Oracle = a direct numpy replay of the documented
    semantics: idx[j,t] = min(floor(U[j,t]*c), c-1) with U drawn from
    fold_in(key, chunk), S_t = sum_j log1p(-p[offset+idx]), 1 - mean exp."""
    from m6anet_tpu.ops.mc_kernel import site_probability_mc_pallas

    rng = np.random.default_rng(9)
    n_sites = 12
    counts = rng.integers(150, 500, size=n_sites).astype(np.int32)
    counts[3] = 128  # exactly one chunk
    counts[4] = 129  # one read into the second chunk
    counts[5] = 0  # padding amid real sites (sorts first)
    offsets = np.zeros(n_sites, np.int32)
    cur = 0
    for i in range(n_sites):
        offsets[i] = cur
        cur += int(counts[i])
    # p bounded below 0.3 keeps exp(s_log) O(1): with p ~ U(0,1) every
    # site's value saturates within 2e-6 of 1.0 and any tolerance-based
    # assertion is vacuous — a kernel returning constant 1.0 would pass
    p = rng.uniform(0.0, 0.3, size=cur).astype(np.float32)
    key = jax.random.PRNGKey(7)
    n_iters = 300

    got = np.asarray(site_probability_mc_pallas(
        jnp.asarray(p), jnp.asarray(offsets), jnp.asarray(counts), key,
        n_iters=n_iters, read_cap=512, interpret=True))

    u = np.asarray(jax.random.uniform(jax.random.fold_in(key, 0), (20, n_iters)))
    for s in range(n_sites):
        c = int(counts[s])
        if c == 0:
            assert got[s] == 0
            continue
        idx = np.minimum((u * np.int32(c)).astype(np.int32), c - 1)  # (20, T)
        l = np.maximum(np.log1p(-p[offsets[s] : offsets[s] + c]), -1e4)
        s_log = l[idx].sum(axis=0)  # (T,)
        want = 1.0 - np.mean(np.exp(s_log))
        assert 0.05 < want < 0.999, "oracle values must not saturate"
        # both got and want are O(1) here, so this tolerance is REAL: it is
        # ~50x the kernel's bf16 hi/lo split error and ~1000x smaller than
        # the value spread (a dropped chunk shifts values by >0.1)
        np.testing.assert_allclose(got[s], want, atol=2e-4)


def test_mc_run_decomposition():
    """Round-5 run-batched kernel prep: runs are maximal equal-count spans,
    split at G-block boundaries, with the s_pad sentinel bounding the last
    real run and block [lo, hi) run ranges covering every site exactly once."""
    from m6anet_tpu.ops.mc_kernel import run_decomposition

    G = 4
    # sorted counts over 3 blocks of 4: a run inside a block, a run spanning
    # a block boundary (count 7), and a trailing constant run
    counts_s = jnp.asarray(np.array([2, 2, 7, 7, 7, 7, 9, 9, 9, 9, 9, 9], np.int32))
    run_start, block_lo, block_hi = jax.jit(
        lambda c: run_decomposition(c, G)
    )(counts_s)
    run_start, block_lo, block_hi = map(np.asarray, (run_start, block_lo, block_hi))

    s_pad = len(counts_s)
    # runs: [0,2)=2s, [2,4)=7s, [4,6)=7s (block split), [6,8)=9s (block
    # split at 8), [8,12)=9s
    np.testing.assert_array_equal(run_start[:5], [0, 2, 4, 6, 8])
    assert (run_start[5:] == s_pad).all()  # sentinel fill
    np.testing.assert_array_equal(block_lo, [0, 2, 4])
    np.testing.assert_array_equal(block_hi, [2, 4, 5])
    # coverage: every block's runs tile its [i*G, (i+1)*G) rows exactly
    for i in range(3):
        rows = []
        for r in range(block_lo[i], block_hi[i]):
            a = max(int(run_start[r]) - i * G, 0)
            b = min(int(run_start[r + 1]) - i * G, G)
            rows.extend(range(a, b))
        assert rows == list(range(G)), (i, rows)


def test_mc_is_placement_invariant():
    """A site's MC estimate depends only on (seed, its reads): moving the
    site to a different batch slot must not change its value — host-shard
    merging relies on this."""
    rng = np.random.default_rng(6)
    site_capacity, read_capacity, n_sites = 8, 512, 6
    p, _, offsets, counts, cursor = _random_site_layout(rng, n_sites, site_capacity, read_capacity)

    key = jax.random.PRNGKey(1)
    a = np.asarray(site_ops.site_probability_mc(
        jnp.asarray(p), jnp.asarray(offsets), jnp.asarray(counts), key, n_iters=200))

    # rotate the sites: site 0's reads move to the end of the packed axis
    n0 = counts[0]
    p_rot = np.concatenate([p[n0:cursor], p[:n0], p[cursor:]])
    offsets_rot = np.concatenate([offsets[1:n_sites] - n0, [cursor - n0], offsets[n_sites:]]).astype(np.int32)
    counts_rot = np.concatenate([counts[1:n_sites], [n0], counts[n_sites:]]).astype(np.int32)
    b = np.asarray(site_ops.site_probability_mc(
        jnp.asarray(p_rot), jnp.asarray(offsets_rot), jnp.asarray(counts_rot), key, n_iters=200))

    np.testing.assert_array_equal(a[0], b[n_sites - 1])
    np.testing.assert_array_equal(a[1:n_sites], b[: n_sites - 1])


def test_fused_kernel_interpret_matches_model(production_model):
    from m6anet_tpu.ops.encoder_kernel import fused_read_probability, prepare_fused_params

    model, params = production_model
    fp = prepare_fused_params(params)
    rng = np.random.default_rng(4)
    n = 512
    X = rng.normal(size=(n, 9)).astype(np.float32)
    K = rng.integers(0, 66, size=(n, 3)).astype(np.int32)
    want = np.asarray(model.per_read_probability(params, {"X": jnp.asarray(X), "kmer": jnp.asarray(K)}))
    got = np.asarray(
        fused_read_probability(fp, jnp.asarray(X), jnp.asarray(K), block_reads=256, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fused_inference_kernel_interpret(production_model):
    """Single-kernel encoder+site-aggregation == XLA reference path."""
    from m6anet_tpu.constants import DEFAULT_READ_THRESHOLD
    from m6anet_tpu.ops.encoder_kernel import prepare_fused_params
    from m6anet_tpu.ops.fused_infer_kernel import fused_inference

    model, params = production_model
    fp = prepare_fused_params(params)
    rng = np.random.default_rng(7)
    N, S = 1024, 64
    X = rng.normal(size=(N, 9)).astype(np.float32)
    K = rng.integers(0, 66, size=(N, 3)).astype(np.int32)
    site_ids = np.full(N, S, np.int32)
    counts = np.zeros(S, np.int32)
    cursor = 0
    for s in range(S):
        n = int(rng.integers(5, 20))
        if cursor + n > N:
            break
        site_ids[cursor : cursor + n] = s
        counts[s] = n
        cursor += n

    p, sp, mr = fused_inference(
        fp, jnp.asarray(X), jnp.asarray(K), jnp.asarray(site_ids), jnp.asarray(counts),
        DEFAULT_READ_THRESHOLD, block_reads=256, interpret=True,
    )
    p_ref = np.asarray(model.per_read_probability(params, {"X": jnp.asarray(X), "kmer": jnp.asarray(K)}))
    sp_ref = np.asarray(
        site_ops.site_probability_exact(jnp.asarray(p_ref), jnp.asarray(site_ids), jnp.asarray(counts), S, 20)
    )
    mr_ref = np.asarray(
        site_ops.mod_ratio_exact(jnp.asarray(p_ref), jnp.asarray(site_ids), jnp.asarray(counts), S, DEFAULT_READ_THRESHOLD)
    )
    np.testing.assert_allclose(np.asarray(p), p_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sp), sp_ref, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mr), mr_ref)


def test_engine_pallas_fused_backend_matches_xla(production_model, tmp_path):
    from m6anet_tpu.constants import DEFAULT_MIN_READS, PRETRAINED_CONFIGS
    from m6anet_tpu.data.dataset import build_dataset
    from m6anet_tpu.inference.engine import run_inference

    import pandas as pd

    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(os.path.join(os.path.dirname(__file__), "data"), min_reads=DEFAULT_MIN_READS,
                       norm_path=norm, mode="Inference")
    run_inference(model, params, ds, str(tmp_path / "x"), read_proba_threshold=thr,
                  use_mesh=False, backend="xla")
    run_inference(model, params, ds, str(tmp_path / "f"), read_proba_threshold=thr,
                  use_mesh=False, backend="pallas_fused")
    for name in ("data.site_proba.csv", "data.indiv_proba.csv"):
        a = pd.read_csv(tmp_path / "x" / name)
        b = pd.read_csv(tmp_path / "f" / name)
        np.testing.assert_allclose(a["probability_modified"], b["probability_modified"], atol=1e-5)


def test_engine_pallas_backend_matches_xla(production_model, tmp_path):
    """Encoder-kernel backend through the full engine (interpret on CPU)."""
    import pandas as pd

    from m6anet_tpu.constants import DEFAULT_MIN_READS, PRETRAINED_CONFIGS
    from m6anet_tpu.data.dataset import build_dataset
    from m6anet_tpu.inference.engine import run_inference

    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(os.path.join(os.path.dirname(__file__), "data"), min_reads=DEFAULT_MIN_READS,
                       norm_path=norm, mode="Inference")
    run_inference(model, params, ds, str(tmp_path / "x"), read_proba_threshold=thr,
                  use_mesh=False, backend="xla")
    run_inference(model, params, ds, str(tmp_path / "p"), read_proba_threshold=thr,
                  use_mesh=False, backend="pallas")
    for name in ("data.site_proba.csv", "data.indiv_proba.csv"):
        a = pd.read_csv(tmp_path / "x" / name)
        b = pd.read_csv(tmp_path / "p" / name)
        np.testing.assert_allclose(a["probability_modified"], b["probability_modified"], atol=1e-5)


def test_bf16_mode_within_site_tolerance(production_model, tmp_path):
    """bf16 fast mode stays inside the site-level golden tolerance."""
    import pandas as pd

    from m6anet_tpu.constants import DEFAULT_MIN_READS, PRETRAINED_CONFIGS
    from m6anet_tpu.data.dataset import build_dataset
    from m6anet_tpu.inference.engine import run_inference

    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(os.path.join(os.path.dirname(__file__), "data"), min_reads=DEFAULT_MIN_READS,
                       norm_path=norm, mode="Inference")
    run_inference(model, params, ds, str(tmp_path / "f32"), read_proba_threshold=thr,
                  use_mesh=False, backend="pallas")
    run_inference(model, params, ds, str(tmp_path / "bf16"), read_proba_threshold=thr,
                  use_mesh=False, backend="pallas", precision="bf16")
    a = pd.read_csv(tmp_path / "f32" / "data.site_proba.csv")
    b = pd.read_csv(tmp_path / "bf16" / "data.site_proba.csv")
    np.testing.assert_allclose(
        a["probability_modified"], b["probability_modified"], atol=1e-2
    )
    ai = pd.read_csv(tmp_path / "f32" / "data.indiv_proba.csv")
    bi = pd.read_csv(tmp_path / "bf16" / "data.indiv_proba.csv")
    np.testing.assert_allclose(
        ai["probability_modified"], bi["probability_modified"], atol=2e-2
    )


def test_f32x3_mode_matches_f32(production_model, tmp_path):
    """Precision.HIGH (bf16x3) engine mode stays within the per-read golden
    tolerance (on the CPU interpret backend HIGH == full f32; the real
    3-pass numerics are validated on device by tools/bench_variants.py)."""
    import pandas as pd

    from m6anet_tpu.constants import DEFAULT_MIN_READS, PRETRAINED_CONFIGS
    from m6anet_tpu.data.dataset import build_dataset
    from m6anet_tpu.inference.engine import run_inference

    model, params = production_model
    _, thr, norm = PRETRAINED_CONFIGS["HCT116_RNA002"]
    ds = build_dataset(os.path.join(os.path.dirname(__file__), "data"), min_reads=DEFAULT_MIN_READS,
                       norm_path=norm, mode="Inference")
    run_inference(model, params, ds, str(tmp_path / "f32"), read_proba_threshold=thr,
                  use_mesh=False, backend="pallas_fused")
    run_inference(model, params, ds, str(tmp_path / "x3"), read_proba_threshold=thr,
                  use_mesh=False, backend="pallas_fused", precision="f32x3")
    for name in ("data.site_proba.csv", "data.indiv_proba.csv"):
        a = pd.read_csv(tmp_path / "f32" / name)
        b = pd.read_csv(tmp_path / "x3" / name)
        np.testing.assert_allclose(
            a["probability_modified"], b["probability_modified"], atol=1e-5
        )


def test_fused_inference_kernel_large_site_capacity(production_model):
    """The 2026-08-19 local-segment-reduction scatter removed the old
    4096-site VMEM cap: the accumulator is O(site_capacity) instead of
    O(block * site_capacity).  Exercise a capacity above the old cap,
    including a site straddling a 512-read sub-chunk boundary."""
    from m6anet_tpu.constants import DEFAULT_READ_THRESHOLD
    from m6anet_tpu.ops.encoder_kernel import prepare_fused_params
    from m6anet_tpu.ops.fused_infer_kernel import fused_inference

    model, params = production_model
    fp = prepare_fused_params(params)
    rng = np.random.default_rng(11)
    N, S = 2048, 8192
    X = rng.normal(size=(N, 9)).astype(np.float32)
    K = rng.integers(0, 66, size=(N, 3)).astype(np.int32)
    site_ids = np.full(N, S, np.int32)
    counts = np.zeros(S, np.int32)
    cursor = 0
    s = 0
    while True:
        n = int(rng.integers(5, 60))
        if cursor + n > N - 30:  # leave a padding tail
            break
        site_ids[cursor : cursor + n] = s
        counts[s] = n
        cursor += n
        s += 1

    p, sp, mr = fused_inference(
        fp, jnp.asarray(X), jnp.asarray(K), jnp.asarray(site_ids), jnp.asarray(counts),
        DEFAULT_READ_THRESHOLD, block_reads=1024, interpret=True,
    )
    p_ref = np.asarray(model.per_read_probability(params, {"X": jnp.asarray(X), "kmer": jnp.asarray(K)}))
    sp_ref = np.asarray(
        site_ops.site_probability_exact(jnp.asarray(p_ref), jnp.asarray(site_ids), jnp.asarray(counts), S, 20)
    )
    mr_ref = np.asarray(
        site_ops.mod_ratio_exact(jnp.asarray(p_ref), jnp.asarray(site_ids), jnp.asarray(counts), S, DEFAULT_READ_THRESHOLD)
    )
    np.testing.assert_allclose(np.asarray(sp)[:s], sp_ref[:s], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mr)[:s], mr_ref[:s])


def test_fused_inference_kernel_t_interpret(production_model):
    """Transposed-layout single-kernel step == XLA reference path, in every
    precision mode (round-3 kernel: reads on lanes, rank-2 embedding
    selection; see fused_infer_kernel.py)."""
    from m6anet_tpu.constants import DEFAULT_READ_THRESHOLD
    from m6anet_tpu.ops.fused_infer_kernel import fused_inference_t, prepare_fused_params_t

    model, params = production_model
    fpt = prepare_fused_params_t(params)
    rng = np.random.default_rng(11)
    N, S = 1024, 64
    X = rng.normal(size=(N, 9)).astype(np.float32)
    K = rng.integers(0, 66, size=(N, 3)).astype(np.int32)
    site_ids = np.full(N, S, np.int32)
    counts = np.zeros(S, np.int32)
    cursor = 0
    for s in range(S):
        n = int(rng.integers(5, 20))
        if cursor + n > N:
            break
        site_ids[cursor : cursor + n] = s
        counts[s] = n
        cursor += n

    p_ref = np.asarray(model.per_read_probability(params, {"X": jnp.asarray(X), "kmer": jnp.asarray(K)}))
    sp_ref = np.asarray(
        site_ops.site_probability_exact(jnp.asarray(p_ref), jnp.asarray(site_ids), jnp.asarray(counts), S, 20)
    )
    mr_ref = np.asarray(
        site_ops.mod_ratio_exact(jnp.asarray(p_ref), jnp.asarray(site_ids), jnp.asarray(counts), S, DEFAULT_READ_THRESHOLD)
    )
    for dtype, tol in ((jnp.float32, 1e-6), ("f32x3", 2e-5)):
        p, sp, mr = fused_inference_t(
            fpt, jnp.asarray(X), jnp.asarray(K), jnp.asarray(site_ids), jnp.asarray(counts),
            DEFAULT_READ_THRESHOLD, block_reads=256, interpret=True, compute_dtype=dtype,
        )
        np.testing.assert_allclose(np.asarray(p), p_ref, atol=tol)
        np.testing.assert_allclose(np.asarray(sp), sp_ref, atol=max(tol, 1e-5))
        if dtype == jnp.float32:
            np.testing.assert_array_equal(np.asarray(mr), mr_ref)
