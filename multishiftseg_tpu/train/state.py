"""Train state + optimizer construction (two-stage fine-tuning as optax transforms).

The reference freezes parameters by substring match on names and swaps the optimizer at
``warmup_epoch`` (``train_deeplab.py:113-166``); the M2F stage-2 optimizer is AdamW
with per-module lr/weight-decay groups and full-model grad clipping
(``train_m2f.py:211-299``). Here both become pure optax transformations over the param
pytree: a trainable mask (``optax.masked``), per-leaf lr multipliers / weight-decay
masks derived from path predicates, and ``optax.clip_by_global_norm``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import optax


def path_name(path: Tuple[str, ...]) -> str:
    return ".".join(path)


def trainable_mask(params, names: Sequence[str]):
    """Pytree of bools: True where any of ``names`` is a substring of the dotted path
    (the reference's ``any(i in name for i in trainable_params_name)``)."""
    flat = flax.traverse_util.flatten_dict(params)
    mask = {k: any(n in path_name(k) for n in names) for k in flat}
    return flax.traverse_util.unflatten_dict(mask)


def torch_adam(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """torch ``Adam(weight_decay=wd)``: L2 added to the gradient *before* the moment
    update (not AdamW)."""
    steps = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    steps.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    steps.append(optax.scale(-lr))
    return optax.chain(*steps)


def _freeze_complement(tx: optax.GradientTransformation, mask) -> optax.GradientTransformation:
    """Apply ``tx`` on masked leaves and force zero updates elsewhere.

    ``optax.masked`` alone passes raw gradients through for unmasked leaves, which
    would train frozen parameters."""
    inverted = jax.tree_util.tree_map(lambda m: not m, mask)
    return optax.chain(
        optax.masked(tx, mask),
        optax.masked(optax.set_to_zero(), inverted),
    )


def build_stage_optimizer(
    params, lr: float, weight_decay: float, trainable_names: Sequence[str]
) -> Tuple[optax.GradientTransformation, Any]:
    """Adam over the trainable subset only (stage-1/stage-2 DeepLab and stage-1 M2F)."""
    mask = trainable_mask(params, trainable_names)
    tx = _freeze_complement(torch_adam(lr, weight_decay), mask)
    return tx, tx.init(params)


def _scale_by_tree(multipliers) -> optax.GradientTransformation:
    """Per-leaf learning-rate multipliers."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree_util.tree_map(lambda u, m: u * m, updates, multipliers), state

    return optax.GradientTransformation(init_fn, update_fn)


def m2f_param_rules(path: Tuple[str, ...]) -> Dict[str, float]:
    """detectron2-style hyper-parameter rules per parameter
    (``train_m2f.py:246-265``)."""
    name = path_name(path)
    rules = {"lr_mult": 1.0, "wd": None}  # None = default weight decay
    if "backbone" in name:
        rules["lr_mult"] = 0.1
    if "relative_position_bias_table" in name or "absolute_pos_embed" in name:
        rules["wd"] = 0.0
    # norm layers: flax LayerNorm/GroupNorm/BatchNorm leaves are 'scale'/'bias' under a
    # module whose name contains 'norm'/'gn'/'bn'; embeddings are the learned query /
    # level embeddings.
    leaf_module = name.lower()
    if any(t in leaf_module for t in (".bn.", "norm", "_gn.")):
        rules["wd"] = 0.0  # SOLVER.WEIGHT_DECAY_NORM = 0.0
    if any(t in leaf_module for t in ("query_feat", "query_embed", "level_embed")):
        rules["wd"] = 0.0  # SOLVER.WEIGHT_DECAY_EMBED = 0.0
    return rules


def build_m2f_official_optimizer(
    params,
    base_lr: float = 1e-5,
    weight_decay: float = 0.05,
    clip_value: float = 0.01,
    trainable_names: Sequence[str] = (".",),
) -> Tuple[optax.GradientTransformation, Any]:
    """Stage-2 AdamW with per-module groups + full-model grad clip
    (``build_m2f_optimizer``, train_m2f.py:211-299)."""
    flat = flax.traverse_util.flatten_dict(params)
    lr_mult = {}
    wd_mask = {}
    for k in flat:
        rules = m2f_param_rules(k)
        lr_mult[k] = jnp.asarray(rules["lr_mult"], jnp.float32)
        wd_mask[k] = rules["wd"] is None  # True -> apply default wd
    lr_mult = flax.traverse_util.unflatten_dict(lr_mult)
    wd_mask = flax.traverse_util.unflatten_dict(wd_mask)

    tx = optax.chain(
        optax.clip_by_global_norm(clip_value),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.masked(optax.add_decayed_weights(weight_decay), wd_mask),
        _scale_by_tree(lr_mult),
        optax.scale(-base_lr),
    )
    mask = trainable_mask(params, trainable_names)
    tx = _freeze_complement(tx, mask)
    return tx, tx.init(params)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v
