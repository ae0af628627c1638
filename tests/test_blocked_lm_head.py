"""Fused blocked LM-head + stats kernel (interpret mode on CPU): numerics vs
the XLA route feeding _candidates_from_blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vilmedic_tpu.decoding.decode import _candidates_from_blocks
from vilmedic_tpu.ops.blocked_lm_head import (
    lm_head_blocked_stats,
    unpack_stats,
)

B, K, H, V = 4, 4, 256, 1000
N = B * K
BLK = 128
NB = -(-V // BLK)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    kb = jnp.asarray(
        np.pad(rng.normal(size=(H, V)) * 0.1, ((0, 0), (0, NB * BLK - V))),
        jnp.float32,
    )
    bb = jnp.asarray(
        np.concatenate([rng.normal(size=(V,)) * 0.1,
                        np.full((NB * BLK - V,), -1e30)]), jnp.float32
    )
    alive = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
    return h, kb, bb, alive


def test_logits_and_stats_match_xla(data):
    h, kb, bb, _ = data
    tile_v = 256
    logits3, bmax_p, bsum_p = lm_head_blocked_stats(
        h, kb, bb, tile_v=tile_v, interpret=True, force_pallas=True
    )
    bmax = unpack_stats(bmax_p, tile_v)
    bsum = unpack_stats(bsum_p, tile_v)

    want = np.asarray(
        jnp.matmul(h, kb, preferred_element_type=jnp.float32) + bb
    )
    vp = want.shape[1]
    # block-major (nb, N, 128) -> flat (N, nb*128) for comparison
    logits = np.transpose(np.asarray(logits3), (1, 0, 2)).reshape(N, -1)
    np.testing.assert_allclose(logits[:, :vp], want, rtol=1e-6)
    xp = want.reshape(N, NB, BLK)
    np.testing.assert_allclose(np.asarray(bmax)[:, :NB], xp.max(-1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bsum)[:, :NB],
        np.sum(np.exp(xp - xp.max(-1, keepdims=True)), -1), rtol=1e-5,
    )
    # pad blocks can never win: maxima at the NEG floor
    assert np.all(np.asarray(bmax)[:, NB:] <= -1e29)


def test_jnp_reference_path_matches_pallas_interpret(data):
    """The CPU production path (plain-jnp, shard_map-safe) emits the exact
    packed layout the pallas kernel writes."""
    h, kb, bb, _ = data
    tile_v = 256
    ref = lm_head_blocked_stats(h, kb, bb, tile_v=tile_v, interpret=True)
    ker = lm_head_blocked_stats(
        h, kb, bb, tile_v=tile_v, interpret=True, force_pallas=True
    )
    for r, k in zip(ref, ker):
        assert r.shape == k.shape
        np.testing.assert_allclose(np.asarray(r), np.asarray(k), rtol=1e-6)


def test_pick_tile_v_calibration():
    """Lock the VMEM-model tile choices at the calibrated row counts
    (v5e hardware points: n=1024/tile 1024 and n=1536/tile 512 both OOM the
    16 MB scoped limit; n=1024/tile 512 and n=512/tile 1024 compile)."""
    from vilmedic_tpu.ops.blocked_lm_head import pick_tile_v

    assert pick_tile_v(256, 768) == 1024   # batch 32, beam 8
    assert pick_tile_v(512, 768) == 1024   # batch 64
    assert pick_tile_v(768, 768) == 512    # batch 96 (tile 1024 OOMs: 16.45M r4)
    assert pick_tile_v(1024, 768) == 512   # batch 128 (tile 1024 OOMs)
    assert pick_tile_v(1280, 768) == 256   # batch 160 (model under-predicts
    #                                        near the boundary; stay clear)
    assert pick_tile_v(1536, 768) == 256   # batch 192 (tile 512 OOMs: 16.82M)
    assert pick_tile_v(2048, 768) <= 256


def test_pick_tile_v_portability_guard(monkeypatch):
    """On uncalibrated chips the budget falls back conservatively; an env
    override wins; and the picked tile's working set NEVER exceeds the
    budget (a simulated smaller-VMEM chip cannot scoped-OOM)."""
    from vilmedic_tpu.ops import blocked_lm_head as mod

    # kind policy: calibrated kinds + cpu keep the measured budget;
    # anything else (v4, v5p, v6e, unknown) degrades conservatively
    assert mod._budget_for_kind("TPU v5 lite") == mod._CALIBRATED_BUDGET
    assert mod._budget_for_kind("cpu") == mod._CALIBRATED_BUDGET
    for kind in ("TPU v4", "TPU v5p", "TPU v6e", "weirdchip", ""):
        assert mod._budget_for_kind(kind) == mod._CONSERVATIVE_BUDGET

    # env override is authoritative
    monkeypatch.setenv("VILMEDIC_LMHEAD_VMEM_MB", "6")
    assert mod.vmem_budget_bytes() == 6 << 20

    # safety invariant across a shape sweep and simulated budgets
    for budget in (6 << 20, mod._CONSERVATIVE_BUDGET, mod._CALIBRATED_BUDGET):
        for n in (64, 256, 512, 1024, 1536, 2048, 4096):
            tile = mod.pick_tile_v(n, 768, budget_bytes=budget)
            if tile > 128:  # 128 is the floor even when nothing fits
                assert mod.tile_working_set_bytes(n, 768, tile) <= budget
            smaller = mod.pick_tile_v(n, 768, budget_bytes=budget // 2)
            assert smaller <= tile  # monotone in the budget


def test_selection_from_kernel_stats_matches_blocks_route(data):
    """Candidate (scores, beam, token) via the kernel outputs == the
    production _candidates_from_blocks on the same logits."""
    from vilmedic_tpu.decoding.decode import _candidates_from_stats

    h, kb, bb, alive = data
    tile_v = 256
    logits3, bmax_p, bsum_p = lm_head_blocked_stats(
        h, kb, bb, tile_v=tile_v, interpret=True, force_pallas=True
    )
    assert logits3.shape[1] == N  # block-major (nb, N, 128)
    got = _candidates_from_stats(
        logits3, unpack_stats(bmax_p, tile_v), unpack_stats(bsum_p, tile_v),
        B, K, alive, 2 * K,
    )

    xp = (jnp.matmul(h, kb, preferred_element_type=jnp.float32) + bb).reshape(
        N, NB, BLK
    )
    want = _candidates_from_blocks(xp, B, K, alive, 2 * K)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)
