"""Config-driven Multiple-Instance-Learning model assembly.

Capability parity with the reference's MILModel (reference:
m6anet/model/model.py:7-164): a TOML ``[[block]]`` list is instantiated through
a name registry and partitioned at the first pooling filter into

  read_level_encoder | pooling_filter | decoder

but as a *pure-function* model: ``MILModel`` holds only static configuration,
parameters live in an explicit pytree ``{"block{i}": {...}}``, and every
forward flavour is ``f(params, batch) -> array`` and therefore directly
``jax.jit``/``pjit``-able.  The param keys match the flat npz layout produced
by tools/convert_reference_assets.py.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from . import blocks as _blocks
from . import pooling as _pooling
from .pooling import InstanceBasedPooling, PoolingFilter

# Block registry: every public block class, addressable by TOML name
# (reference resolves names via getattr on the blocks package,
# m6anet/model/model.py:81-83).
BLOCK_REGISTRY = {
    name: cls
    for mod in (_blocks, _pooling)
    for name, cls in vars(mod).items()
    if isinstance(cls, type) and issubclass(cls, _blocks.Block) and not name.startswith("_")
}


def build_block(block_type: str, **kwargs) -> _blocks.Block:
    if block_type not in BLOCK_REGISTRY:
        raise ValueError(f"Unknown block_type {block_type!r}; available: {sorted(BLOCK_REGISTRY)}")
    return BLOCK_REGISTRY[block_type](**kwargs)


class MILModel:
    """Static model description + pure apply functions."""

    def __init__(self, model_config: Dict):
        self.model_config = model_config
        self.blocks: List[Tuple[int, _blocks.Block]] = []
        for i, spec in enumerate(model_config["block"]):
            spec = dict(spec)
            block_type = spec.pop("block_type")
            self.blocks.append((i, build_block(block_type, **spec)))

        # Partition at the first PoolingFilter
        # (reference: m6anet/model/model.py:40-69).
        self.encoder: List[Tuple[int, _blocks.Block]] = []
        self.pooling: Optional[Tuple[int, PoolingFilter]] = None
        self.decoder: List[Tuple[int, _blocks.Block]] = []
        for i, blk in self.blocks:
            if self.pooling is None and isinstance(blk, PoolingFilter):
                self.pooling = (i, blk)
            elif self.pooling is None:
                self.encoder.append((i, blk))
            else:
                self.decoder.append((i, blk))

    # ------------------------------------------------------------------ params
    def init(self, key) -> Dict:
        params = {}
        keys = jax.random.split(key, len(self.blocks))
        for (i, blk), k in zip(self.blocks, keys):
            p = blk.init(k)
            if p:
                params[f"block{i}"] = p
        return params

    def load_npz(self, path: str) -> Dict:
        """Load a converted-weights npz into the nested param tree."""
        from ..utils.treeio import load_tree

        return load_tree(path)

    # ------------------------------------------------------------- apply paths
    def _run(self, stage, params, x, *, train=False, rng=None):
        updates = {}
        for i, blk in stage:
            brng = None
            if rng is not None:
                rng, brng = jax.random.split(rng)
            x, upd = blk.apply(params.get(f"block{i}", {}), x, train=train, rng=brng)
            if upd:
                updates[f"block{i}"] = upd
        return x, updates

    def read_representation(self, params, batch, *, train=False, rng=None):
        """Per-read latent representation (reference: m6anet/model/model.py:85-97)."""
        x, updates = self._run(self.encoder, params, batch, train=train, rng=rng)
        return x, updates

    def read_probability(self, params, batch):
        """(sites, n_reads_per_site) read-level modification probabilities
        (reference: m6anet/model/model.py:99-109)."""
        x, _ = self.read_representation(params, batch)
        i, pool = self.pooling
        return pool.read_level_prob(params.get(f"block{i}", {}), x)

    def per_read_probability(self, params, batch):
        """Flat per-read probabilities (N,) — the inference metric path.

        Equivalent to the reference's direct probability_layer invocation
        (reference: m6anet/utils/inference_utils.py:35-37) without assuming a
        fixed reads-per-site grouping.
        """
        x, _ = self.read_representation(params, batch)
        i, pool = self.pooling
        if not isinstance(pool, (InstanceBasedPooling,)) and not hasattr(pool, "per_read_prob"):
            raise ValueError("Pooling filter has no per-read probability layer")
        return pool.per_read_prob(params.get(f"block{i}", {}), x)

    def site_representation(self, params, batch, *, train=False, rng=None):
        """(reference: m6anet/model/model.py:111-120)."""
        x, updates = self.read_representation(params, batch, train=train, rng=rng)
        if self.pooling is None:
            # No pooling filter in config: pooling degenerates to identity
            # (reference: m6anet/model/model.py:61-64).
            return x, updates
        i, pool = self.pooling
        y, upd = pool.apply(params.get(f"block{i}", {}), x, train=train, rng=rng)
        if upd:
            updates[f"block{i}"] = upd
        return y, updates

    def site_probability(self, params, batch, *, train=False, rng=None):
        """Full forward: site-level modification probability
        (reference: m6anet/model/model.py:122-131, 155-164)."""
        y, updates = self.site_representation(params, batch, train=train, rng=rng)
        y, dec_updates = self._run(self.decoder, params, y, train=train, rng=rng)
        updates.update(dec_updates)
        return y, updates

    def forward(self, params, batch, *, train=False, rng=None):
        return self.site_probability(params, batch, train=train, rng=rng)

    def read_site_probability(self, params, batch):
        """(read probs, site probs, read representation)
        (reference: m6anet/model/model.py:133-147)."""
        x, _ = self.read_representation(params, batch)
        i, pool = self.pooling
        pool_params = params.get(f"block{i}", {})
        read_prob = pool.read_level_prob(pool_params, x)
        site, _ = pool.apply(pool_params, x)
        site, _ = self._run(self.decoder, params, site)
        return read_prob, site, x

    def attention_weights(self, params, batch):
        """(reference: m6anet/model/model.py:149-153)."""
        i, pool = self.pooling
        if not hasattr(pool, "attention_weights"):
            raise ValueError("Pooling filter does not have attention weights")
        x, _ = self.read_representation(params, batch)
        return pool.attention_weights(params.get(f"block{i}", {}), x)


def load_model(model_config: Dict, weights_path: Optional[str] = None) -> Tuple[MILModel, Optional[Dict]]:
    """Build a MILModel and (optionally) its converted pretrained params."""
    model = MILModel(model_config)
    params = model.load_npz(weights_path) if weights_path else None
    return model, params
