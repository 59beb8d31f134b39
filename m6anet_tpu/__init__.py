"""m6anet_tpu: TPU-native m6A RNA-modification calling engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
m6anet pipeline (dataprep -> inference -> train -> compute_norm_factors ->
convert), engineered TPU-first: streaming columnar featurization on the host,
device-resident batched MIL inference with fused kernels, and data-parallel
scale-out over a `jax.sharding.Mesh`.
"""

__version__ = "0.5.0"


def main():
    from .cli import main as cli_main

    cli_main()
