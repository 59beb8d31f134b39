"""Functional (pure init/apply) feature blocks for the MIL model.

Capability parity with the reference's block registry
(reference: m6anet/model/model_blocks/blocks.py) but re-designed for JAX/XLA:
blocks carry static config on ``self`` and expose

  ``init(key) -> params``              parameter pytree (plain dicts of jnp arrays)
  ``apply(params, x, *, train, rng) -> (y, updates)``

so every model method is a pure, jit-able function of ``(params, batch)``.
BatchNorm running statistics live inside ``params`` under ``bn_mean``/``bn_var``
(non-trainable — see :func:`m6anet_tpu.train.loop.trainable_mask`); ``apply``
in train mode returns the refreshed statistics in ``updates``.

Torch-numerics compatibility notes (needed to reproduce the released weights):
linear weights are stored transposed as (in, out); BatchNorm eval uses
``(x - mean) / sqrt(var + 1e-5) * scale + bias``; train-mode BatchNorm
normalises by the biased batch variance but folds the *unbiased* variance into
the running average with momentum 0.1 (torch.nn.BatchNorm1d semantics).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def fdot(x, w):
    """float32 matmul at HIGHEST precision.

    TPU MXU default precision for f32 is bf16-pass based (~1e-3 relative
    error), which is unacceptable for probability parity with the released
    CPU-f32 reference outputs.  This model is tiny and HBM-bound, so full-f32
    passes are free in practice.
    """
    return jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST)


def get_activation(name: Optional[str]):
    """Map an activation name from a model TOML onto a jnp function.

    Same accepted names as the reference
    (reference: m6anet/model/model_blocks/blocks.py:9-31).
    """
    if name is None:
        return lambda x: x
    table = {
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
        "relu": jax.nn.relu,
        "softmax": lambda x: jax.nn.softmax(x, axis=1),
    }
    if name not in table:
        raise ValueError(f"Invalid activation {name!r}, must be one of {tuple(table)}")
    return table[name]


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key, in_dim: int, out_dim: int):
    """torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for w and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim)
    return {
        "w": _uniform(kw, (in_dim, out_dim), bound),
        "b": _uniform(kb, (out_dim,), bound),
    }


class Block:
    """Base class: a stateless block with no parameters."""

    def init(self, key) -> Dict:
        del key
        return {}

    def apply(self, params, x, *, train: bool = False, rng=None):
        raise NotImplementedError


class DeaggregateNanopolish(Block):
    """Flatten (site, read) leading axes into one read axis.

    Reshapes signal features to (n_reads, 3*(2*w+1)) and k-mer ids to
    (n_reads, 2*w+1) so downstream blocks see a flat per-read batch
    (reference: m6anet/model/model_blocks/blocks.py:89-126 — which reshapes
    kmers to (-1, 1); we keep (-1, 2w+1) since the embedding consumes whole
    rows, which is equivalent after its reshape).
    """

    def __init__(self, num_neighboring_features: int, n_features: int = 3):
        self.n_positions = 2 * num_neighboring_features + 1
        self.n_features = n_features * self.n_positions

    def apply(self, params, x, *, train=False, rng=None):
        return (
            {
                "X": x["X"].reshape(-1, self.n_features),
                "kmer": x["kmer"].reshape(-1, self.n_positions),
            },
            {},
        )


class ExtractSignal(Block):
    """Drop the k-mer channel, keep only signal features
    (reference: m6anet/model/model_blocks/blocks.py:69-86)."""

    def apply(self, params, x, *, train=False, rng=None):
        return x["X"], {}


class ConcatenateFeatures(Block):
    """Concatenate signal features and k-mer embeddings along features
    (reference: m6anet/model/model_blocks/blocks.py:48-66; dict insertion
    order is X-then-kmer, which this reproduces explicitly)."""

    def apply(self, params, x, *, train=False, rng=None):
        return jnp.concatenate([x["X"], x["kmer"]], axis=1), {}


class Flatten(Block):
    """jnp equivalent of torch.nn.Flatten(start_dim, end_dim)
    (reference: m6anet/model/model_blocks/blocks.py:129-162)."""

    def __init__(self, start_dim: int, end_dim: int):
        self.start_dim = start_dim
        self.end_dim = end_dim

    def apply(self, params, x, *, train=False, rng=None):
        shape = x.shape
        end = self.end_dim if self.end_dim >= 0 else len(shape) + self.end_dim
        new_shape = shape[: self.start_dim] + (-1,) + shape[end + 1 :]
        return x.reshape(new_shape), {}


class KmerMultipleEmbedding(Block):
    """Embed the (2w+1) 5-mer ids of each read and flatten to one vector
    (reference: m6anet/model/model_blocks/blocks.py:165-205).

    The gather from the small (vocab, dim) table is XLA's job; on TPU it
    compiles to an efficient dynamic-gather (or is folded into the fused
    encoder kernel, see m6anet_tpu/ops/encoder_kernel.py).
    """

    def __init__(self, input_channel: int, output_channel: int, num_neighboring_features: int = 1):
        self.vocab = input_channel
        self.dim = output_channel
        self.n_positions = 2 * num_neighboring_features + 1

    def init(self, key):
        # torch.nn.Embedding default init: N(0, 1)
        return {"embedding": jax.random.normal(key, (self.vocab, self.dim), jnp.float32)}

    def apply(self, params, x, *, train=False, rng=None):
        kmer = x["kmer"].reshape(-1, self.n_positions)
        emb = jnp.take(params["embedding"], kmer, axis=0)
        return {"X": x["X"], "kmer": emb.reshape(-1, self.n_positions * self.dim)}, {}


class Linear(Block):
    """Linear -> (BatchNorm1d) -> activation -> (dropout)
    (reference: m6anet/model/model_blocks/blocks.py:208-266)."""

    def __init__(
        self,
        input_channel: int,
        output_channel: int,
        activation: Optional[str] = "relu",
        batch_norm: bool = True,
        dropout: float = 0.0,
    ):
        self.in_dim = input_channel
        self.out_dim = output_channel
        self.activation = get_activation(activation)
        self.batch_norm = batch_norm
        self.dropout = dropout

    def init(self, key):
        params = linear_init(key, self.in_dim, self.out_dim)
        if self.batch_norm:
            params.update(
                bn_scale=jnp.ones((self.out_dim,), jnp.float32),
                bn_bias=jnp.zeros((self.out_dim,), jnp.float32),
                bn_mean=jnp.zeros((self.out_dim,), jnp.float32),
                bn_var=jnp.ones((self.out_dim,), jnp.float32),
            )
        return params

    def apply(self, params, x, *, train=False, rng=None):
        y = fdot(x, params["w"]) + params["b"]
        updates = {}
        if self.batch_norm:
            if train:
                mean = jnp.mean(y, axis=0)
                var = jnp.var(y, axis=0)
                n = y.shape[0]
                unbiased = var * (n / max(n - 1, 1))
                updates = {
                    "bn_mean": (1 - BN_MOMENTUM) * params["bn_mean"] + BN_MOMENTUM * mean,
                    "bn_var": (1 - BN_MOMENTUM) * params["bn_var"] + BN_MOMENTUM * unbiased,
                }
            else:
                mean, var = params["bn_mean"], params["bn_var"]
            y = (y - mean) * jax.lax.rsqrt(var + BN_EPS) * params["bn_scale"] + params["bn_bias"]
        y = self.activation(y)
        if train and self.dropout > 0.0:
            if rng is None:
                raise ValueError("dropout requires an rng in train mode")
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(rng, keep, y.shape)
            y = jnp.where(mask, y / keep, 0.0)
        return y, updates
