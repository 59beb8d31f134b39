"""Pooling filters: read-level representations -> site-level outputs.

Capability parity with the reference's pooling zoo
(reference: m6anet/model/model_blocks/pooling_blocks.py), re-expressed as pure
init/apply functions.  The production head is :class:`SigmoidProdPooling`
(noisy-OR over a fixed block of ``n_reads_per_site`` reads).

All filters assume the incoming read axis is flat (sites * reads_per_site)
with a static ``n_reads_per_site``, which is what makes the training/eval
graphs fully static-shaped for XLA.  Variable-read-count *inference* never
routes through these (2w+1)-style reshapes — it uses the segment-reduction
path in m6anet_tpu/ops/site_ops.py instead.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from .blocks import Block, fdot, get_activation, linear_init


class PoolingFilter(Block):
    """Marker base class: the model assembler splits the block list at the
    first PoolingFilter (reference: m6anet/model/model.py:40-69)."""

    def read_level_prob(self, params, x):
        y, _ = self.apply(params, x)
        return y


class InstanceBasedPooling(PoolingFilter):
    """Shared probability layer: Linear(C, 1) + sigmoid per read, viewed as
    (sites, n_reads_per_site)
    (reference: m6anet/model/model_blocks/pooling_blocks.py:26-67)."""

    def __init__(self, input_channel: int, n_reads_per_site: int = 20):
        self.input_channel = input_channel
        self.n_reads_per_site = n_reads_per_site

    def init(self, key):
        return linear_init(key, self.input_channel, 1)

    def per_read_prob(self, params, x):
        """Per-read modification probability on the flat read axis, (N,)."""
        return jax.nn.sigmoid(fdot(x, params["w"]) + params["b"]).reshape(-1)

    def read_level_prob(self, params, x):
        return self.per_read_prob(params, x).reshape(-1, self.n_reads_per_site)


class SigmoidProdPooling(InstanceBasedPooling):
    """Noisy-OR: P(site) = 1 - prod_r (1 - p_r)
    (reference: m6anet/model/model_blocks/pooling_blocks.py:101-129)."""

    def apply(self, params, x, *, train=False, rng=None):
        p = self.read_level_prob(params, x)
        return 1.0 - jnp.prod(1.0 - p, axis=1), {}


class SigmoidMeanPooling(InstanceBasedPooling):
    """Mean of read probabilities
    (reference: m6anet/model/model_blocks/pooling_blocks.py:70-98)."""

    def apply(self, params, x, *, train=False, rng=None):
        return jnp.mean(self.read_level_prob(params, x), axis=1), {}


class SigmoidMaxPooling(InstanceBasedPooling):
    """Max of read probabilities
    (reference: m6anet/model/model_blocks/pooling_blocks.py:132-160)."""

    def apply(self, params, x, *, train=False, rng=None):
        return jnp.max(self.read_level_prob(params, x), axis=1), {}


class SummaryStatsAggregator(PoolingFilter):
    """Per-site (mean, var, max, min, median) over reads
    (reference: m6anet/model/model_blocks/pooling_blocks.py:163-190).
    torch.var is unbiased; torch.median picks the lower middle element."""

    def __init__(self, input_channel: int, n_reads_per_site: int = 20):
        self.input_channel = input_channel
        self.n_reads_per_site = n_reads_per_site

    def _aggregate(self, x):
        x = x.reshape(-1, self.n_reads_per_site, self.input_channel)
        n = self.n_reads_per_site
        mean = jnp.mean(x, axis=1)
        var = jnp.var(x, axis=1) * (n / max(n - 1, 1))
        max_ = jnp.max(x, axis=1)
        min_ = jnp.min(x, axis=1)
        med = jnp.sort(x, axis=1)[:, (n - 1) // 2, :]
        return jnp.concatenate([mean, var, max_, min_, med], axis=1)

    def apply(self, params, x, *, train=False, rng=None):
        if isinstance(x, dict):
            return {"X": self._aggregate(x["X"]), "kmer": x["kmer"]}, {}
        return self._aggregate(x), {}


class MeanAggregator(PoolingFilter):
    """Per-site mean over reads
    (reference: m6anet/model/model_blocks/pooling_blocks.py:193-215)."""

    def __init__(self, input_channel: int, n_reads_per_site: int = 20):
        self.input_channel = input_channel
        self.n_reads_per_site = n_reads_per_site

    def apply(self, params, x, *, train=False, rng=None):
        def agg(v):
            return jnp.mean(v.reshape(-1, self.n_reads_per_site, self.input_channel), axis=1)

        if isinstance(x, dict):
            return {"X": agg(x["X"]), "kmer": x["kmer"]}, {}
        return agg(x), {}


def _mlp_init(key, in_dim: int, hidden: Sequence[int]):
    keys = jax.random.split(key, len(hidden))
    params = []
    prev = in_dim
    for k, h in zip(keys, hidden):
        params.append(linear_init(k, prev, h))
        prev = h
    return {"layers": params}


def _mlp_apply(params, x, activation, last_linear: bool = True):
    layers = params["layers"]
    for i, lp in enumerate(layers):
        x = fdot(x, lp["w"]) + lp["b"]
        if i < len(layers) - 1 or not last_linear:
            x = activation(x)
    return x


class Attention(PoolingFilter):
    """Softmax-over-reads attention pooling
    (reference: m6anet/model/model_blocks/pooling_blocks.py:218-261)."""

    def __init__(
        self,
        input_channel: int,
        hidden_layers: Sequence[int],
        activation: str = "relu",
        n_reads_per_site: int = 20,
    ):
        self.input_channel = input_channel
        self.hidden_layers = list(hidden_layers)
        self.output_channel = self.hidden_layers[-1]
        self.activation = get_activation(activation)
        self.n_reads_per_site = n_reads_per_site

    def init(self, key):
        return _mlp_init(key, self.input_channel, self.hidden_layers)

    def attention_weights(self, params, x):
        w = _mlp_apply(params, x, self.activation)
        w = w.reshape(-1, self.n_reads_per_site, self.output_channel)
        w = jnp.swapaxes(w, 1, 2)  # (sites, K, reads)
        return jax.nn.softmax(w, axis=2)

    def read_level_prob(self, params, x):
        return self.attention_weights(params, x)

    def apply(self, params, x, *, train=False, rng=None):
        w = self.attention_weights(params, x)
        m = jnp.einsum("skr,src->skc", w, x.reshape(-1, self.n_reads_per_site, self.input_channel), precision=jax.lax.Precision.HIGHEST)
        return m.reshape(m.shape[0], -1), {}


class GatedAttention(PoolingFilter):
    """Gated attention: tanh/sigmoid-gated features fed to Attention
    (reference: m6anet/model/model_blocks/pooling_blocks.py:313-343)."""

    def __init__(
        self,
        input_channel: int,
        hidden_layers_1: Sequence[int],
        hidden_layers_2: Sequence[int],
        activation: str = "relu",
        n_reads_per_site: int = 20,
    ):
        self.input_channel = input_channel
        self.hidden_layers_1 = list(hidden_layers_1)
        self.hidden_layers_2 = list(hidden_layers_2)
        self.activation = get_activation(activation)
        self.gate_activation = get_activation("sigmoid")
        self.attention = Attention(
            self.hidden_layers_1[-1], hidden_layers_2, activation, n_reads_per_site
        )
        self.n_reads_per_site = n_reads_per_site

    def init(self, key):
        kv, kh, ka = jax.random.split(key, 3)
        return {
            "attention_v": _mlp_init(kv, self.input_channel, self.hidden_layers_1),
            "attention_h": _mlp_init(kh, self.input_channel, self.hidden_layers_1),
            "attention": self.attention.init(ka),
        }

    def _gate(self, params, x):
        a_v = _mlp_apply(params["attention_v"], x, self.activation)
        a_h = _mlp_apply(params["attention_h"], x, self.gate_activation)
        return a_v * a_h

    def apply(self, params, x, *, train=False, rng=None):
        return self.attention.apply(params["attention"], self._gate(params, x))

    def read_level_prob(self, params, x):
        return self.attention.read_level_prob(params["attention"], self._gate(params, x))

    def attention_weights(self, params, x):
        return self.attention.attention_weights(params["attention"], self._gate(params, x))


def _kde_basis(x, n_bins: int, var: float):
    """Soft-histogram responses of x against n_bins gaussian centers on [0, 1]
    (the kernel evaluations shared by the KDE pooling family)."""
    centers = jnp.linspace(0.0, 1.0, n_bins)
    coef = 1.0 / math.sqrt(2.0 * math.pi * var)
    # x: (sites, reads, C) -> (n_bins, sites, reads, C)
    return coef * jnp.exp(-0.5 / var * jnp.square(x[None] - centers[:, None, None, None]))


class KDELayer(PoolingFilter):
    """Soft-histogram (KDE) pooling over reads
    (reference: m6anet/model/model_blocks/pooling_blocks.py:346-362)."""

    def __init__(self, input_channel: int, n_bins: int, sigma: float, n_reads_per_site: int = 20):
        self.input_channel = input_channel
        self.n_bins = n_bins
        self.var = sigma**2
        self.n_reads_per_site = n_reads_per_site

    def apply(self, params, x, *, train=False, rng=None):
        x = x.reshape(-1, self.n_reads_per_site, self.input_channel)
        k = jnp.mean(_kde_basis(x, self.n_bins, self.var), axis=2)  # (bins, sites, C)
        return jnp.moveaxis(k, 0, 1).reshape(x.shape[0], -1), {}


class KDEAttentionLayer(PoolingFilter):
    """Attention pooling applied per KDE bin
    (reference: m6anet/model/model_blocks/pooling_blocks.py:365-385)."""

    def __init__(
        self,
        input_channel: int,
        hidden_layers: Sequence[int],
        n_bins: int,
        sigma: float,
        activation: str = "relu",
        n_reads_per_site: int = 20,
    ):
        self.input_channel = input_channel
        self.n_bins = n_bins
        self.var = sigma**2
        self.n_reads_per_site = n_reads_per_site
        self.attention = Attention(input_channel, hidden_layers, activation, n_reads_per_site)

    def init(self, key):
        return {"attention": self.attention.init(key)}

    def apply(self, params, x, *, train=False, rng=None):
        x = x.reshape(-1, self.n_reads_per_site, self.input_channel)
        basis = _kde_basis(x, self.n_bins, self.var)  # (bins, sites, reads, C)
        outs = [
            self.attention.apply(params["attention"], basis[i].reshape(-1, self.input_channel))[0]
            for i in range(self.n_bins)
        ]
        return jnp.concatenate(outs, axis=1), {}

    def read_level_prob(self, params, x):
        return self.attention.read_level_prob(params["attention"], x)


class KDEGatedAttentionLayer(PoolingFilter):
    """Gated-attention pooling applied per KDE bin
    (reference: m6anet/model/model_blocks/pooling_blocks.py:387-412)."""

    def __init__(
        self,
        input_channel: int,
        hidden_layers_1: Sequence[int],
        hidden_layers_2: Sequence[int],
        n_bins: int,
        sigma: float,
        activation: str = "relu",
        n_reads_per_site: int = 20,
    ):
        self.input_channel = input_channel
        self.n_bins = n_bins
        self.var = sigma**2
        self.n_reads_per_site = n_reads_per_site
        self.gated = GatedAttention(
            input_channel, hidden_layers_1, hidden_layers_2, activation, n_reads_per_site
        )

    def init(self, key):
        return {"gated_attention": self.gated.init(key)}

    def apply(self, params, x, *, train=False, rng=None):
        x = x.reshape(-1, self.n_reads_per_site, self.input_channel)
        basis = _kde_basis(x, self.n_bins, self.var)
        outs = [
            self.gated.apply(params["gated_attention"], basis[i].reshape(-1, self.input_channel))[0]
            for i in range(self.n_bins)
        ]
        return jnp.concatenate(outs, axis=1), {}

    def read_level_prob(self, params, x):
        return self.gated.read_level_prob(params["gated_attention"], x)

    def attention_weights(self, params, x):
        return self.gated.attention_weights(params["gated_attention"], x)


_READ_CLASSIFIERS = {
    "prod_pooling": SigmoidProdPooling,
    "mean_pooling": SigmoidMeanPooling,
    "max_pooling": SigmoidMaxPooling,
}


class ProbabilityAttention(PoolingFilter):
    """KDE-gated-attention site decoder + instance-pooling read classifier
    (reference: m6anet/model/model_blocks/pooling_blocks.py:264-288)."""

    def __init__(
        self,
        input_channel: int,
        hidden_layers_1: Sequence[int],
        hidden_layers_2: Sequence[int],
        n_bins: int,
        sigma: float,
        activation: str = "relu",
        n_reads_per_site: int = 20,
        read_classifier: str = "prod_pooling",
    ):
        if read_classifier not in _READ_CLASSIFIERS:
            raise ValueError("Invalid read classifier name")
        self.site_decoder = KDEGatedAttentionLayer(
            input_channel, hidden_layers_1, hidden_layers_2, n_bins, sigma, activation, n_reads_per_site
        )
        self.read_classifier = _READ_CLASSIFIERS[read_classifier](input_channel, n_reads_per_site)
        self.n_reads_per_site = n_reads_per_site

    def init(self, key):
        kd, kr = jax.random.split(key)
        return {
            "site_decoder": self.site_decoder.init(kd),
            "read_classifier": self.read_classifier.init(kr),
        }

    def apply(self, params, x, *, train=False, rng=None):
        return self.site_decoder.apply(params["site_decoder"], x, train=train, rng=rng)

    def read_level_prob(self, params, x):
        return self.read_classifier.read_level_prob(params["read_classifier"], x)

    def per_read_prob(self, params, x):
        return self.read_classifier.per_read_prob(params["read_classifier"], x)

    def attention_weights(self, params, x):
        return self.site_decoder.attention_weights(params["site_decoder"], x)


class SummaryStatsProbability(PoolingFilter):
    """Summary-stats site decoder + instance-pooling read classifier
    (reference: m6anet/model/model_blocks/pooling_blocks.py:291-310)."""

    def __init__(
        self,
        input_channel: int,
        n_reads_per_site: int = 20,
        read_classifier: str = "prod_pooling",
    ):
        if read_classifier not in _READ_CLASSIFIERS:
            raise ValueError("Invalid read classifier name")
        self.site_decoder = SummaryStatsAggregator(input_channel, n_reads_per_site)
        self.read_classifier = _READ_CLASSIFIERS[read_classifier](input_channel, n_reads_per_site)
        self.n_reads_per_site = n_reads_per_site

    def init(self, key):
        return {"read_classifier": self.read_classifier.init(key)}

    def apply(self, params, x, *, train=False, rng=None):
        return self.site_decoder.apply({}, x, train=train, rng=rng)

    def read_level_prob(self, params, x):
        return self.read_classifier.read_level_prob(params["read_classifier"], x)

    def per_read_prob(self, params, x):
        return self.read_classifier.per_read_prob(params["read_classifier"], x)
