"""Fused LM-head matmul + per-128-block score statistics (Pallas TPU kernel).

Decode-loop candidate selection (decoding/decode.py ``_candidates_from_blocks``)
needs three things from the lm_head: the blocked f32 logits (for the final
candidate gather), the per-128-block maxima (block pre-selection), and the
per-block sum-exp (row logsumexp). The XLA route computes the matmul first and
then re-reads the full (N, V) f32 logits from HBM for the stats pass — at
bench shapes (256 x 50k) that second pass re-streams ~51 MB and XLA follows it
with a {1,0}->{0,1} relayout of the whole logits tensor to feed the candidate
gather (~40 us, ROUND2_NOTES).

This kernel emits all three in ONE pass over the weight stream: grid over
vocab tiles; per tile the (N, tile_v) logits block is produced on the MXU,
written once, and reduced to block max / sum-exp while still in VMEM — the
stats cost no extra HBM traffic at all.

Layout notes (v5e Mosaic rules, see ROUND2_NOTES):
- stats outputs cannot be written as (N, nbt) blocks (lane dim must be a
  128-multiple or the full array), so each tile writes a (N, 128) stats block
  whose first ``tile_v // 128`` lanes are real (rest NEG/0 padding);
  ``unpack_stats`` slices them back to (N, NB) — a few-MB no-op downstream.
- no reshapes into/out of the lane dim in-kernel: per-block reductions are
  taken over static 128-lane slices.

The r2 ``fused_lm_head`` negative (VPU argmax-peel per tile dominating) does
not apply here: the only in-kernel VPU work is max/exp/sum — exactly what the
XLA stats pass already pays, minus its HBM round-trip.

Exactness: the matmul is the same bf16 contraction with f32 accumulation as
``TransformerDecoder._head_blocked``, but XLA may split the K dimension
differently, so logits can differ by reduction-order ulps (measured max
4.8e-7 at bench shapes on v5e — experiments/ab_lmhead_kernel.py). Candidate
*scores* therefore differ by ulps while the selected (beam, token) pairs
matched exactly in the hardware A/B; HF-generate sequence parity is
re-asserted with the kernel path enabled (tests/test_hf_parity.py, jnp
reference path on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e30
BLK = 128


def _kernel(h_ref, w_ref, b_ref, out_ref, bmax_ref, bsum_ref, *, tile_v: int):
    n = h_ref.shape[0]
    logits = jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    logits = logits + b_ref[:]

    nbt = tile_v // BLK
    maxes, sums = [], []
    for t in range(nbt):
        sl = logits[:, t * BLK:(t + 1) * BLK]
        # block-major logits write: out slot t of this tile's (nbt, n, BLK)
        # block — lane slices at 128-aligned offsets, full (n, BLK) tiled dims
        out_ref[t] = sl
        m = jnp.max(sl, axis=-1, keepdims=True)
        maxes.append(m)
        sums.append(jnp.sum(jnp.exp(sl - m), axis=-1, keepdims=True))
    pad = BLK - nbt
    bmax_ref[:] = jnp.concatenate(
        maxes + [jnp.full((n, pad), NEG, jnp.float32)], axis=1
    )
    bsum_ref[:] = jnp.concatenate(
        sums + [jnp.zeros((n, pad), jnp.float32)], axis=1
    )


# VMEM budget calibration. The 14 MB working budget was measured against
# v5e's 16 MB scoped-vmem compiler limit (see pick_tile_v docstring). On a
# chip generation the model was never calibrated against, fall back to a
# conservative budget (tile never OOMs, worst case a narrower tile) and log
# once; VILMEDIC_LMHEAD_VMEM_MB overrides either way.
_CALIBRATED_BUDGET = int(12.5 * (1 << 20))
_CONSERVATIVE_BUDGET = 10 << 20
# v5e measured; v4/v5p/v6e share the same default 16 MiB scoped-vmem XLA
# limit but have NOT been measured — treated as uncalibrated until they are.
_CALIBRATED_KINDS = ("tpu v5 lite", "tpu v5e")
_budget_warned = False


def _budget_for_kind(kind: str) -> int:
    """Pure policy: working-set budget for a device kind (tested directly)."""
    kind = (kind or "").lower()
    if any(k in kind for k in _CALIBRATED_KINDS):
        return _CALIBRATED_BUDGET
    if "cpu" in kind:
        # interpret/jnp path: no scoped VMEM; keep v5e tile choices so CPU
        # tests lock the hardware policy
        return _CALIBRATED_BUDGET
    return _CONSERVATIVE_BUDGET


def vmem_budget_bytes() -> int:
    import logging
    import os

    env = os.environ.get("VILMEDIC_LMHEAD_VMEM_MB")
    if env:
        return int(float(env) * (1 << 20))
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = ""
    budget = _budget_for_kind(kind)
    global _budget_warned
    if budget == _CONSERVATIVE_BUDGET and not _budget_warned:
        _budget_warned = True
        logging.getLogger(__name__).warning(
            "blocked_lm_head: device kind %r not VMEM-calibrated; using a "
            "conservative %d MB tile budget (override with "
            "VILMEDIC_LMHEAD_VMEM_MB)", kind, _CONSERVATIVE_BUDGET >> 20,
        )
    return budget


def tile_working_set_bytes(n: int, hidden: int, tile: int) -> int:
    """Mosaic's double-buffered working set for one grid step (see
    pick_tile_v): every in/out block x2 — (n, tile) f32 logits out,
    (hidden, tile) bf16 weights, (n, hidden) bf16 hiddens (invariant
    index_map, still double-buffered), two (n, 128) f32 stats blocks."""
    return 2 * (n * tile * 4 + hidden * tile * 2 + n * hidden * 2
                + 2 * n * BLK * 4)


def pick_tile_v(n: int, hidden: int, budget_bytes: int = None) -> int:
    """Largest vocab tile whose double-buffered VMEM working set fits.

    Calibrated on v5e against five measured points (the model is imprecise
    in BOTH directions, so the budget is set to separate every measured
    OK from every measured OOM):
      tile 1024: n=512 compiles (model 9.96 MB); n=768 OOMs at a real
      16.45 MB scoped (model 13.4 — 3 MB under!); n=1024 OOMs (model 16.8).
      tile 512: n=1024 compiles (model 11.0); n=1536 OOMs at a real
      16.82 MB (model 15.7).
    12.5 MB sits between the largest passing model value (11.0) and the
    smallest failing one (13.4). On uncalibrated chips the budget drops to
    10 MB (``vmem_budget_bytes``).
    """
    if budget_bytes is None:
        budget_bytes = vmem_budget_bytes()
    for tile in (1024, 512, 256, 128):
        if tile_working_set_bytes(n, hidden, tile) <= budget_bytes:
            return tile
    return 128


@functools.partial(jax.jit, static_argnames=("tile_v", "interpret", "force_pallas"))
def lm_head_blocked_stats(h, kb, bb, tile_v: int = 1024, interpret: bool = False,
                          force_pallas: bool = False):
    """One fused pass: logits + per-128-block stats.

    h: (N, H) compute-dtype hidden states; kb: (H, Vp) padded head kernel and
    bb: (Vp,) f32 padded bias from ``make_blocked_head_weights`` — Vp is
    additionally padded here to a ``tile_v`` multiple (pad bias NEG, so pad
    blocks can never win selection). Returns
    ``(logits (Vp'//128, N, 128) f32 BLOCK-MAJOR, bmax (N, n_tiles*128) f32,
    bsum same)``; unpack the stats with :func:`unpack_stats`.

    Block-major logits: the candidate gather indexes whole 128-wide blocks
    by (block, row) — in the flat (N, Vp) layout the (b, k*nb, blk) view it
    needs is NOT layout-preserving on TPU (tiled minor dims), and XLA
    materialized a full relayout of the logits every decode step (198 MB,
    ~626 us/step at batch 128/vocab 50k on v5e). With (nb, N, 128) the
    gather's operand is already block-sliced; per-tile out blocks keep full
    (N, 128) tiled dims so any ``tile_v`` stays Mosaic-legal.

    ``interpret=True`` (CPU backend) computes the same outputs with plain jnp
    ops instead of pallas interpret mode: the production CPU path then works
    under ``shard_map(check_vma=True)`` (interpret-mode discharge rejects any
    in-kernel op mixing varying and replicated/literal operands), and the
    kernel algorithm itself stays interpret-tested where no shard_map is
    involved (tests/test_blocked_lm_head.py, via ``force_pallas=True``).
    Kernel-vs-XLA numerics on hardware are checked by
    experiments/ab_lmhead_kernel.py (selection-identical; logits within
    reduction-order ulps).
    """
    n, hidden = h.shape
    vp = kb.shape[1]
    pad = (-vp) % tile_v
    if pad:
        kb = jnp.pad(kb, ((0, 0), (0, pad)))
        bb = jnp.pad(bb, (0, pad), constant_values=NEG)
    vpp = vp + pad
    grid = (vpp // tile_v,)

    if interpret and not force_pallas:
        logits = jnp.matmul(h, kb, preferred_element_type=jnp.float32) + bb
        nbt = tile_v // BLK
        blocks = logits.reshape(n, vpp // BLK, BLK)
        bmax = blocks.max(-1).reshape(n, vpp // tile_v, nbt)
        bsum = jnp.sum(
            jnp.exp(blocks - blocks.max(-1, keepdims=True)), -1
        ).reshape(n, vpp // tile_v, nbt)
        # pack per-tile stats into (*, 128) lane blocks exactly as the kernel
        # writes them (first nbt lanes real, rest NEG/0)
        bmax = jnp.pad(bmax, ((0, 0), (0, 0), (0, BLK - nbt)),
                       constant_values=NEG).reshape(n, -1)
        bsum = jnp.pad(bsum, ((0, 0), (0, 0), (0, BLK - nbt))).reshape(n, -1)
        return blocks.transpose(1, 0, 2), bmax, bsum

    # under shard_map (the multi-device eval path) outputs must declare their
    # varying mesh axes; inherit them from the hidden-state operand
    try:
        vma = jax.typeof(h).vma
        _sds = functools.partial(jax.ShapeDtypeStruct, vma=vma)
    except (AttributeError, TypeError):
        _sds = jax.ShapeDtypeStruct

    nbt = tile_v // BLK
    logits, bmax, bsum = pl.pallas_call(
        functools.partial(_kernel, tile_v=tile_v),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((n, hidden), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, tile_v), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nbt, n, BLK), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, BLK), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, BLK), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _sds((vpp // BLK, n, BLK), jnp.float32),
            _sds((n, (vpp // tile_v) * BLK), jnp.float32),
            _sds((n, (vpp // tile_v) * BLK), jnp.float32),
        ],
    )(h, kb, bb.reshape(1, -1))
    return logits, bmax, bsum


def unpack_stats(stats, tile_v: int):
    """(N, n_tiles*128) padded stats -> (N, n_tiles * (tile_v // 128))."""
    n = stats.shape[0]
    nbt = tile_v // BLK
    n_tiles = stats.shape[1] // BLK
    return stats.reshape(n, n_tiles, BLK)[:, :, :nbt].reshape(n, n_tiles * nbt)
