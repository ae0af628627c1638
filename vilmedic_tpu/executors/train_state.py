"""Train state + optimizer factory.

Replaces the reference's torch optimizer factory
(reference vilmedic/executors/utils.py:65-94 ``create_optimizer``: any
``torch.optim.*`` by config name): the same config surface
(``optimizer: RAdam`` + ``optim_params``) maps onto optax aliases. The learning
rate is wrapped with ``optax.inject_hyperparams`` so the host-side
TrainingScheduler can drive it without recompiling the jitted step — the
functional analog of mutating torch param groups.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any  # {} when the model has no BatchNorm


_OPTIMIZERS: Dict[str, Callable] = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "radam": optax.radam,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "adagrad": optax.adagrad,
    "adadelta": optax.adadelta,
    "adafactor": optax.adafactor,
    "lamb": optax.lamb,
    "lion": optax.lion,
}

# torch optim_params -> optax kwarg translation
_PARAM_MAP = {
    "betas": None,  # expanded to b1/b2
    "eps": "eps",
    "weight_decay": "weight_decay",
    "momentum": "momentum",
    "nesterov": "nesterov",
}


def _translate_params(name: str, params: Dict) -> Dict:
    out = {}
    for k, v in params.items():
        if k in ("lr", "learning_rate"):
            continue
        if k == "betas":
            out["b1"], out["b2"] = float(v[0]), float(v[1])
        elif k == "weight_decay":
            # optax sgd/rmsprop aliases have no weight_decay arg; additive decay
            # handled by the chain below for those.
            if name in ("adamw", "adam", "radam", "lamb", "lion", "adamax"):
                out["weight_decay"] = float(v)
            else:
                out["_additive_weight_decay"] = float(v)
        elif k in _PARAM_MAP and _PARAM_MAP[k]:
            out[_PARAM_MAP[k]] = v
        # silently drop torch-only knobs (amsgrad, foreach, ...)
    return out


def _freeze_labels(frozen_prefixes):
    """Callable(params) -> {"trainable"|"frozen"} label tree for
    optax.multi_transform. Prefixes are '/'-joined param paths
    (e.g. "vision/model" = the frozen backbone inside a VisualEncoder,
    whose visual_projection sibling stays trainable)."""
    split = [tuple(str(p).split("/")) for p in frozen_prefixes]

    def labels(params):
        def lab(path, _):
            keys = tuple(
                getattr(k, "key", getattr(k, "name", None)) for k in path
            )
            return (
                "frozen"
                if any(keys[: len(s)] == s for s in split)
                else "trainable"
            )

        return jax.tree_util.tree_map_with_path(lab, params)

    return labels


def create_optimizer(
    optimizer: str,
    optim_params: Dict,
    clip_grad_norm: Optional[float] = None,
    frozen_prefixes=(),
) -> optax.GradientTransformation:
    name = optimizer.lower()
    if name not in _OPTIMIZERS:
        raise NotImplementedError(
            f"Optimizer {optimizer!r}; available: {sorted(_OPTIMIZERS)}"
        )
    base_lr = float(optim_params.get("lr", optim_params.get("learning_rate")))
    kwargs = _translate_params(name, dict(optim_params))
    additive_wd = kwargs.pop("_additive_weight_decay", None)
    alias = _OPTIMIZERS[name]

    # `adam` with weight_decay behaves like torch Adam(weight_decay=..) -> L2
    if name == "adam" and "weight_decay" in kwargs:
        additive_wd = kwargs.pop("weight_decay")

    def factory(learning_rate):
        parts = []
        if clip_grad_norm is not None:
            parts.append(optax.clip_by_global_norm(float(clip_grad_norm)))
        if additive_wd:
            parts.append(optax.add_decayed_weights(additive_wd))
        parts.append(alias(learning_rate=learning_rate, **kwargs))
        inner = optax.chain(*parts)
        if frozen_prefixes:
            # frozen subtrees (TaskModel.frozen_prefixes) are excluded from
            # the optimizer — the TPU-native analog of torch stepping only
            # requires_grad params: no m/v slots allocated for them, updates
            # exactly zero, and clip_by_global_norm sees trainable grads only
            return optax.multi_transform(
                {"trainable": inner, "frozen": optax.set_to_zero()},
                _freeze_labels(frozen_prefixes),
            )
        return inner

    return optax.inject_hyperparams(factory)(learning_rate=base_lr)


def _prune_to(template, sd):
    """Intersect a serialized state dict with a template's key structure
    (extra keys dropped; missing keys left for from_state_dict to report).
    On structure mismatch the template wins: a frozen leaf's m/v slot is a
    ``MaskedNode`` (serialized ``{}``) in the template but a real (all-zero)
    array in a legacy checkpoint — the array is dropped, not restored."""
    if not isinstance(template, dict):
        return sd
    if not isinstance(sd, dict):
        return template
    return {k: _prune_to(v, sd[k]) for k, v in template.items() if k in sd}


def restore_opt_state(fresh_opt_state, state_dict):
    """Shape-checked restore of a serialized optimizer state onto a freshly
    ``tx.init``-ed one, migrating LEGACY layouts.

    Freeze-configured models (``TaskModel.frozen_prefixes``, e.g.
    VisionLanguage's frozen tower) wrap the optimizer in
    ``optax.multi_transform``, which moves the chain state under
    ``inner_state/inner_states/trainable/inner_state`` and drops the frozen
    leaves' m/v slots. Checkpoints saved before that change hold the chain
    state directly under ``inner_state`` — restoring them raises on every
    resumed VL / frozen-encoder run (ADVICE r4). This grafts the legacy chain
    state into the multi_transform trainable branch (frozen leaves pruned;
    their legacy m/v were all-zero anyway — the params never stepped)."""
    from flax import serialization

    fresh_sd = serialization.to_state_dict(fresh_opt_state)
    fi = fresh_sd.get("inner_state")
    si = state_dict.get("inner_state")
    legacy = (
        isinstance(fi, dict) and "inner_states" in fi
        and isinstance(si, dict) and "inner_states" not in si
    )
    if legacy:
        branches = {}
        for label, branch in fi["inner_states"].items():
            if label == "trainable" and isinstance(branch, dict):
                branches[label] = {
                    **branch,
                    "inner_state": _prune_to(branch.get("inner_state"), si),
                }
            else:
                branches[label] = branch  # frozen: keep the fresh (empty) state
        state_dict = {**state_dict, "inner_state": {"inner_states": branches}}
    return serialization.from_state_dict(fresh_opt_state, state_dict)


def gated_update(tx, params, opt_state, grads, lr, gate_loss):
    """One isfinite-gated optimizer update (shared by Trainor.train_step /
    apply_step and the SCST grad step): when ``gate_loss`` is non-finite the
    returned params AND optimizer state keep their old values — the reference
    checks the loss BEFORE optimizer.step (trainor.py:109-112), and a gate
    applied after the jit has run would be too late to stop a poisoned
    update. Returns ``(params, opt_state)``."""
    good = jnp.isfinite(gate_loss)
    opt_in = set_learning_rate(opt_state, lr)
    updates, new_opt = tx.update(grads, opt_in, params)
    new_params = optax.apply_updates(params, updates)
    new_params = jax.tree.map(
        lambda n, o: jnp.where(good, n, o), new_params, params
    )
    new_opt = jax.tree.map(lambda n, o: jnp.where(good, n, o), new_opt, opt_in)
    return new_params, new_opt


def set_learning_rate(opt_state, lr):
    """Inject a (possibly traced) learning rate into an inject_hyperparams state."""
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    replace = getattr(opt_state, "replace", None) or opt_state._replace
    return replace(hyperparams=hyperparams)
