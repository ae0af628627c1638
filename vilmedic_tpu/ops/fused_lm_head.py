"""Fused lm_head matmul + beam-search scoring statistics (Pallas TPU kernel).

The decode hot loop's largest cost is the lm_head: a (B*k, H) x (H, V) matmul
whose (B*k, V) logits round-trip through HBM only to be reduced to top-R
candidates and a logsumexp (profile: 243us matmul + ~270us of pad/reduce/
gather/top-k per step at V=50k on v5e). This kernel streams the weight once
and never materializes the logits:

grid over vocab tiles; per tile (in VMEM):
  logits_tile = h @ W_tile + b_tile                    (MXU)
  online logsumexp accumulation across tiles           (VPU)
  tile top-R per row by iterative argmax peel, merged
  into a running top-R scratch                         (VPU)

outputs: (row top-R values, top-R indices, lse) — the exact interface of the
two-stage beam-search selection, with the logits' HBM round-trip replaced by a
single weight stream.

STATUS (measured on v5e, (256, 768) x (768, 50304), R=16): numerically exact;
1.05 ms/step vs 1.23 ms for the naive unfused path — but the XLA blockwise
route used by ``decoding.decode._batch_beam_candidates`` measures ~0.54 ms for
the same work, because the R argmax-peel passes per tile are VPU-bound and
outweigh the saved HBM traffic at this hidden size. The kernel wins when the
weight stream dominates (bigger H, bigger batch); beam search keeps the XLA
route at these shapes. Retained as a building block for deeper decode fusion.

The vocab must be padded to the tile size once outside the decode loop
(pad columns get bias ``-1e30`` so they never enter the top-R and add 0 to
the expsum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e30


def _peel_topk(values, indices, r):
    """Exact top-r of (n, c) by iterative argmax peeling (r small, VPU-cheap)."""
    iota = lax.broadcasted_iota(jnp.int32, values.shape, 1)
    out_v, out_i = [], []
    work = values
    for _ in range(r):
        m = jnp.max(work, axis=-1)
        am = jnp.argmax(work, axis=-1).astype(jnp.int32)
        hit = iota == am[:, None]
        out_v.append(m)
        # mask-reduce instead of take_along_axis (gathers don't lower in Mosaic)
        out_i.append(jnp.sum(jnp.where(hit, indices, 0), axis=-1))
        work = jnp.where(hit, NEG, work)
    return jnp.stack(out_v, axis=1), jnp.stack(out_i, axis=1)


def _kernel(h_ref, w_ref, b_ref, vals_ref, idx_ref, lse_ref,
            run_vals, run_idx, run_m, run_s, *, r: int, tile_v: int):
    j = pl.program_id(0)
    n = h_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        run_vals[:] = jnp.full_like(run_vals, NEG)
        run_idx[:] = jnp.zeros_like(run_idx)
        run_m[:] = jnp.full_like(run_m, NEG)
        run_s[:] = jnp.zeros_like(run_s)

    logits = jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    logits = logits + b_ref[:]  # (n, tile_v)

    # online logsumexp across tiles
    tm = jnp.max(logits, axis=-1, keepdims=True)  # (n, 1)
    ts = jnp.sum(jnp.exp(logits - tm), axis=-1, keepdims=True)
    new_m = jnp.maximum(run_m[:], tm)
    run_s[:] = run_s[:] * jnp.exp(run_m[:] - new_m) + ts * jnp.exp(tm - new_m)
    run_m[:] = new_m

    # tile top-r, merged with the running top-r
    col0 = j * tile_v
    cols = col0 + lax.broadcasted_iota(jnp.int32, (n, tile_v), 1)
    tv, ti = _peel_topk(logits, cols, r)
    mv = jnp.concatenate([run_vals[:], tv], axis=1)  # (n, 2r)
    mi = jnp.concatenate([run_idx[:], ti], axis=1)
    run_vals[:], run_idx[:] = _peel_topk(mv, mi, r)

    @pl.when(j == pl.num_programs(0) - 1)
    def _emit():
        vals_ref[:] = run_vals[:]
        idx_ref[:] = run_idx[:]
        lse_ref[:] = jnp.log(run_s[:]) + run_m[:]


@functools.partial(jax.jit, static_argnames=("r", "tile_v", "interpret"))
def lm_head_topk_lse(h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                     r: int = 16, tile_v: int = 2048,
                     interpret: bool = False):
    """-> (row_scores (n, r) f32, row_idx (n, r) i32, lse (n,) f32).

    ``w``: (H, Vp) with Vp % tile_v == 0 (pad once, bias NEG on pad columns);
    ``b``: (Vp,) f32.
    """
    n, hidden = h.shape
    vp = w.shape[1]
    assert vp % tile_v == 0, (vp, tile_v)
    grid = (vp // tile_v,)

    vals, idx, lse = pl.pallas_call(
        functools.partial(_kernel, r=r, tile_v=tile_v),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((n, hidden), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, tile_v), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, r), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, r), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, r), jnp.float32),
            jax.ShapeDtypeStruct((n, r), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, r), jnp.float32),
            pltpu.VMEM((n, r), jnp.int32),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
        ],
    )(h, w, b.reshape(1, -1))
    return vals, idx, lse[:, 0]


def pad_lm_head_weights(kernel, bias, tile_v: int = 2048):
    """Pad (H, V) weights/bias to a tile multiple; pad columns never win."""
    v = kernel.shape[1]
    pad = (-v) % tile_v
    if pad:
        kernel = jnp.pad(kernel, ((0, 0), (0, pad)))
        bias = jnp.pad(bias.astype(jnp.float32), (0, pad), constant_values=NEG)
    return kernel, bias.astype(jnp.float32)
