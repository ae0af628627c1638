"""Example configs parse + protos resolve; TP sharding matches replicated math."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vilmedic_tpu import registry
from vilmedic_tpu.config import executor_config, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(REPO, "config", "*", "*.yml")))
)
def test_example_config_parses(path):
    cwd = os.getcwd()
    os.chdir(REPO)  # includes: are repo-relative
    try:
        config, _ = load_config(path)
    finally:
        os.chdir(cwd)
    assert "name" in config
    tr = executor_config(config, "trainor")
    assert tr.model.proto in registry.available("model")
    assert tr.dataset.proto in registry.available("dataset")
    assert tr.get("batch_size")
    # every executor view inherits the model/dataset sections
    for mode in ("validator", "ensemblor"):
        if mode in config:
            view = executor_config(config, mode)
            assert view.model.proto == tr.model.proto


def test_tp_sharding_matches_replicated():
    """A decoder train step sharded (data x model) must produce the same loss
    and updated params as the unsharded computation."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vilmedic_tpu.blocks.transformer import (
        TransformerConfig, TransformerDecoder, causal_lm_loss,
    )
    from vilmedic_tpu.parallel.mesh import get_mesh
    from vilmedic_tpu.parallel.sharding import param_specs, shard_params

    cfg = TransformerConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, hidden_dropout_prob=0.0,
    )
    dec = TransformerDecoder(cfg)
    rng = jax.random.key(0)
    b, t = 8, 10
    ids = jax.random.randint(rng, (b, t), 3, 64, dtype=jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)
    enc = jax.random.normal(jax.random.key(1), (b, 5, 32))
    enc_mask = jnp.ones((b, 5), jnp.int32)
    params = dec.init(rng, ids, mask, enc, enc_mask)["params"]
    tx = optax.sgd(0.1)

    def step(params, opt_state):
        def loss_fn(p):
            logits = dec.apply({"params": p}, ids, mask, enc, enc_mask)
            return causal_lm_loss(logits, ids, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    # reference: single device
    ref_params, ref_loss = jax.jit(step)(params, tx.init(params))

    # sharded: 4 data x 2 model mesh
    mesh = get_mesh(model_parallel=2)
    assert mesh.shape["model"] == 2 and mesh.shape["data"] == 4
    specs = param_specs(params)
    spec_leaves = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert any(s != P() for s in spec_leaves), "TP rules produced no sharded params"

    sharded_params = shard_params(params, mesh)
    ids_s = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    tp_params, tp_loss = jax.jit(step)(sharded_params, tx.init(sharded_params))

    np.testing.assert_allclose(float(ref_loss), float(tp_loss), rtol=1e-5)
    ref_leaf = jax.tree.leaves(ref_params)[0]
    tp_leaf = jax.tree.leaves(tp_params)[0]
    np.testing.assert_allclose(
        np.asarray(ref_leaf), np.asarray(tp_leaf), rtol=1e-4, atol=1e-5
    )


def test_process_allgather_single_host_identity():
    from vilmedic_tpu.parallel.mesh import process_allgather

    assert process_allgather([1, 2, 3]) == [1, 2, 3]
