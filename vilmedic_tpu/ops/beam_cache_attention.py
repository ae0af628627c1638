"""Fused reorder-free beam-decode self-attention + in-place KV-cache write.

The beam-search decode loop's dominant cost on TPU is NOT attention math — it
is cache bookkeeping: the reference reorders every KV cache on beam reindexing
(HF ``_reorder_cache``; our XLA path uses a one-hot permute matmul,
decoding/decode.py _gather_beams), which costs ~330 us/step of pure HBM
traffic + relayout copies at bench shapes (beam 8, 50k vocab, v5e). Pure-XLA
reorder-free formulations fail on *layout*: XLA assigns the loop-carried cache
a T-minor layout to suit the score fusion, which turns the one-slab
dynamic-update-slice into a full 39 MB rewrite per step (measured 280 -> 122
reports/s).

This Pallas kernel owns the whole problem:

- The K/V caches live in HBM refs laid out ``(T, N, H*D)`` and are aliased
  input->output (``input_output_aliases``), so the cache is NEVER copied: the
  only writes are two DMAs placing this step's (N, H*D) K/V at ``t = idx``
  (an integer index on the untiled leading dim; Mosaic rejects unaligned
  slices of the tiled trailing dims, which is why the XLA paths kept paying
  full-cache copies, and why the lane dim here is the 128-multiple ``H*D``).
- Slabs are DMA'd per (item-group, 128-lane head pair): a (T, rows, 128)
  block whose lane slice is 128-aligned. Per-head scores stay EXACT inside a
  head-pair contraction by lane-masking the query (the other head's lanes are
  zeroed, so the 128-lane dot equals the 64-lane per-head dot).
- Beam ancestry (which slot owns which timestep's K/V — the functional analog
  of the reorder) arrives as a pre-built dense additive bias over the joint
  (t, slot) axis; the joint softmax equals the reordered path's softmax over t
  exactly (masked lanes underflow to exp -> 0, kept lanes get +0.0).
- MXU utilization: beams attend within their batch item only (a
  block-diagonal pattern of tiny 8-row matmuls). Items are processed in
  groups of G (G*K rows = up to a full 128-row MXU tile): one dense
  (G*K, T*G*K) score matmul per head with cross-item lanes masked — G-fold
  redundant FLOPs that ride a fully-utilized MXU while the score tensor never
  leaves VMEM.
- The current step's K/V (always the slot's own projection) joins the softmax
  as one analytic extra lane, so the kernel reads only the pre-update cache
  and the in-place writes race with nothing.
- The (group, head-pair) loop is fully unrolled at trace time: every slab DMA
  and vector slice has static offsets (this toolchain's Mosaic cannot prove
  alignment of loop-carried dynamic offsets); slabs are double-buffered so
  the next iteration's K/V DMAs overlap the current compute.

``make_ancestry_bias`` builds the dense bias from the per-step ancestry
one-hot; ``fused_beam_cache_attention`` runs the kernel (interpret mode on
CPU). Exact vs the permuted XLA path in f32 (asserted in tests); bf16 differs
only by tile-order accumulation ulps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

NEG_INF = -1e9
LANE = 128


def make_ancestry_bias(ancestry, g: int):
    """(B, kj, kq, T) one-hot ancestry -> (groups, g*k, T*g*k) dense f32 bias.

    Lane order is t-major / slot-minor, matching the kernel's flattening of a
    (T, rows, lanes) slab into (T*rows, lanes) keys.
    """
    b, kj, kq, t = ancestry.shape
    k = kq
    groups = b // g
    small = jnp.where(ancestry > 0, 0.0, NEG_INF)  # (b, kj, kq, t) f32
    small = jnp.transpose(small, (0, 2, 3, 1)).reshape(groups, g, kq, t, kj)
    eye = jnp.eye(g, dtype=jnp.float32)[:, None, None, :, None]
    dense = jnp.where(
        eye > 0, small[:, :, :, :, None, :], jnp.float32(NEG_INF)
    )  # (groups, g_q, kq, T, g_j, kj)
    # bf16: the dense bias is only ever 0 / -1e9, and VMEM is the scarce
    # resource (16 MB scoped limit on v5e)
    return dense.reshape(groups, g * k, t * g * k).astype(jnp.bfloat16)


def _kernel(idx_ref, kc_hbm, vc_hbm, q_ref, knew_ref, vnew_ref, bias_ref,
            kc_out, vc_out, o_ref,
            kbuf, vbuf, load_sems, store_sems,
            *, groups: int, rows: int, t: int, d: int, hd: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    idx = idx_ref[0]
    scale = d ** -0.5
    hpb = LANE // d  # heads per 128-lane block
    n_blocks = hd // LANE

    # ---- in-place cache writes (start first; this step's lane is analytic,
    # so nothing below reads position idx) --------------------------------
    kst = pltpu.make_async_copy(knew_ref, kc_out.at[idx], store_sems.at[0])
    vst = pltpu.make_async_copy(vnew_ref, vc_out.at[idx], store_sems.at[1])
    kst.start()
    vst.start()

    steps = [(gi, hp) for gi in range(groups) for hp in range(n_blocks)]

    def _copies(it, slot):
        gi, hp = steps[it]
        r0, c0 = gi * rows, hp * LANE
        return (
            pltpu.make_async_copy(
                kc_hbm.at[:, r0:r0 + rows, c0:c0 + LANE], kbuf.at[slot],
                load_sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                vc_hbm.at[:, r0:r0 + rows, c0:c0 + LANE], vbuf.at[slot],
                load_sems.at[slot, 1],
            ),
        )

    for c in _copies(0, 0):
        c.start()
    lane_iota = lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)

    for it, (gi, hp) in enumerate(steps):
        slot = it % 2
        if it + 1 < len(steps):
            for c in _copies(it + 1, (it + 1) % 2):
                c.start()
        for c in _copies(it, slot):
            c.wait()
        r0, c0 = gi * rows, hp * LANE

        q2 = q_ref[r0:r0 + rows, c0:c0 + LANE].astype(jnp.float32) * scale
        kn2 = knew_ref[r0:r0 + rows, c0:c0 + LANE].astype(jnp.float32)
        vn2 = vnew_ref[r0:r0 + rows, c0:c0 + LANE].astype(jnp.float32)
        kh = kbuf[slot].reshape(t * rows, LANE)
        vh = vbuf[slot].reshape(t * rows, LANE)
        bias = bias_ref[gi].astype(jnp.float32)

        # Both heads of the pair ride ONE matmul as extra rows: lane-masked
        # queries keep per-head contractions exact (the other head's lanes
        # contribute exact zeros), and hpb*rows rows fill the MXU tile.
        masks = [
            (lane_iota >= hi * d) & (lane_iota < (hi + 1) * d)
            for hi in range(hpb)
        ]
        q_all = jnp.concatenate(
            [jnp.where(m_, q2, 0.0) for m_ in masks], axis=0
        )  # (hpb*rows, LANE)
        s = lax.dot_general(
            q_all.astype(kh.dtype), kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (hpb*rows, t*rows)
        s = s + jnp.concatenate([bias] * hpb, axis=0)
        kn_all = jnp.concatenate([kn2] * hpb, axis=0)
        s_cur = jnp.sum(q_all * kn_all, axis=-1, keepdims=True)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_cur)
        p = jnp.exp(s - m)
        p_cur = jnp.exp(s_cur - m)
        l = jnp.sum(p, axis=-1, keepdims=True) + p_cur
        w = (p / l).astype(vh.dtype)
        oh = lax.dot_general(
            w, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (hpb*rows, LANE)
        vn_all = jnp.concatenate([vn2] * hpb, axis=0)
        oh = oh + (p_cur / l) * vn_all
        # row block hi holds head hi's outputs — keep only its lanes
        out_pair = oh[(hpb - 1) * rows:hpb * rows]
        for hi in range(hpb - 1):
            out_pair = jnp.where(
                masks[hi], oh[hi * rows:(hi + 1) * rows], out_pair
            )
        o_ref[r0:r0 + rows, c0:c0 + LANE] = out_pair.astype(o_ref.dtype)

    pltpu.make_async_copy(knew_ref, kc_out.at[idx], store_sems.at[0]).wait()
    pltpu.make_async_copy(vnew_ref, vc_out.at[idx], store_sems.at[1]).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_beam_cache_attention(kc, vc, q, k_new, v_new, bias, index,
                               interpret: bool = False):
    """One fused decode step of reorder-free beam self-attention.

    kc/vc: (T, N, H*D) caches (aliased: returned updated in place at
    ``index``); q/k_new/v_new: (N, H, D); bias: (groups, g*K, T*g*K) dense
    additive f32 from :func:`make_ancestry_bias` (NEG_INF at non-ancestor or
    t >= index lanes); index: () int32. Returns (out (N, H, D) f32, kc, vc).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, n, hd = kc.shape
    nq, heads, d = q.shape
    groups, rows, _ = bias.shape
    assert groups * rows == n and heads * d == hd
    assert LANE % d == 0 and hd % LANE == 0, (d, hd)

    kernel = functools.partial(
        _kernel, groups=groups, rows=rows, t=t, d=d, hd=hd,
    )
    out_shape = [
        jax.ShapeDtypeStruct(kc.shape, kc.dtype),
        jax.ShapeDtypeStruct(vc.shape, vc.dtype),
        jax.ShapeDtypeStruct((n, hd), jnp.float32),
    ]
    idx_arr = jnp.reshape(index, (1,)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # kc
            pl.BlockSpec(memory_space=pltpu.ANY),  # vc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k_new
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v_new
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, t, rows, LANE), kc.dtype),  # kbuf
            pltpu.VMEM((2, t, rows, LANE), vc.dtype),  # vbuf
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kc_out, vc_out, out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={1: 0, 2: 1},  # kc->kc_out, vc->vc_out
        interpret=interpret,
    )(idx_arr, kc, vc, q.reshape(n, hd), k_new.reshape(n, hd),
      v_new.reshape(n, hd), bias)
    return out.reshape(n, heads, d), kc_out, vc_out
