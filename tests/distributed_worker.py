"""Subprocess worker for the multi-process distributed inference test.

Runs one process of an N-process `m6anet_tpu inference --distributed` job on
the CPU backend: real ``jax.distributed.initialize()``, the engine's
process-indexed host shard, the cross-process barrier, and host-0's shard
merge (m6anet_tpu/scripts/inference.py) — the code path a multi-host TPU pod
runs, executed with local processes (SURVEY.md §2.2).

Usage: python distributed_worker.py <coordinator> <num_processes> <process_id>
       <input_dir> <out_dir> [backend] [site_proba_method]
       [read_capacity] [site_capacity]

``backend`` defaults to auto (xla on CPU); passing ``pallas_fused`` runs
the fused Pallas kernels in interpret mode inside the distributed path —
the combination a multi-host TPU pod runs in production.  Small explicit
capacities keep interpret-mode runs fast: Gloo collectives have a hard
~30 s participation deadline, so worker wall-time skew on a loaded host
must stay well under it.
"""
import os
import sys


def main():
    coordinator, num_processes, process_id, input_dir, out_dir = sys.argv[1:6]
    backend = sys.argv[6] if len(sys.argv) > 6 else "auto"
    method = sys.argv[7] if len(sys.argv) > 7 else "mc"
    read_capacity = sys.argv[8] if len(sys.argv) > 8 else None
    site_capacity = sys.argv[9] if len(sys.argv) > 9 else None

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes),
        process_id=int(process_id),
    )

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from m6anet_tpu.scripts import inference

    argv = [
        "--input_dir", input_dir,
        "--out_dir", out_dir,
        "--device", "cpu",
        "--n_processes", "1",
        "--site_proba_method", method,
        "--num_iterations", "50",
        "--seed", "3",
        "--backend", backend,
        "--distributed",
    ]
    if read_capacity is not None:
        argv += ["--read_capacity", read_capacity]
    if site_capacity is not None:
        argv += ["--site_capacity", site_capacity]
    args = inference.argparser().parse_args(argv)
    inference.main(args)


if __name__ == "__main__":
    main()
