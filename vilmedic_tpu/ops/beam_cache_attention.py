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
  of the reorder) arrives as a pre-built dense 0/1 mask over the joint
  (t, slot) axis (``make_ancestry_mask``); the kernel converts it to an
  additive bias in place (``(mask - 1) * 1e9``), so the joint softmax equals
  the reordered path's softmax over t exactly (masked lanes underflow to
  exp -> 0, kept lanes get +0.0).
- MXU utilization: beams attend within their batch item only (a
  block-diagonal pattern of tiny 8-row matmuls). Items are processed in
  groups of G (G*K rows = up to a full 128-row MXU tile): one dense
  (G*K, T*G*K) score matmul per head with cross-item lanes masked — G-fold
  redundant FLOPs that ride a fully-utilized MXU while the score tensor never
  leaves VMEM.
- The current step's K/V (always the slot's own projection) joins the softmax
  as one analytic extra lane, so no *live* lane ever reads position ``idx``
  from the cache. The slab loads may still copy the t-chunk containing
  ``idx`` concurrently with the in-place writes, but every lane with
  ``t >= idx`` is masked off by the ancestry mask, so whichever bytes the
  overlapping DMA observes are multiplied into exp(NEG_INF) — the overlap is
  benign by masking, not by ordering.
- Item-groups are GRID steps (one per group) with per-group VMEM blocks for
  q/k_new/v_new/bias/output — Mosaic pipelines the blocks across steps and
  VMEM residency stays batch-independent (the pre-grid form held the full
  batch + the whole flat ancestry mask in VMEM: scoped-VMEM OOM at batch 128,
  degraded slab double-buffering at batch 64). The caches are viewed as
  (T, groups, rows, H*D) — a pure bitcast for rows % 8 == 0 — so the group
  index lands on an untiled dim. Within a group the head-pair loop is fully
  unrolled at trace time: every slab DMA and vector slice has static offsets
  (this toolchain's Mosaic cannot prove alignment of loop-carried dynamic
  offsets); slabs are double-buffered so the next head-pair's K/V DMAs
  overlap the current compute.

``make_ancestry_mask`` builds the dense 0/1 mask from the per-step ancestry
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


def make_ancestry_mask(ancestry, g: int):
    """(B, kj, kq, T) one-hot ancestry -> (groups, g*k, T*g*k) flat 0/1 mask.

    Lane order is t-major / slot-minor, matching the kernel's flattening of a
    (T, rows, lanes) slab into (T*rows, lanes) keys. This densification is
    for TESTS only: the production decode loop (beam_search with
    ``ancestry_group_items``) carries the flat mask directly and never builds
    the (B, kj, kq, T) form — the conversion costs ~60 us/step at bench
    shapes (a 6-D broadcast + reshape through 16x-lane-padded tiles).
    """
    b, kj, kq, t = ancestry.shape
    k = kq
    groups = b // g
    small = jnp.transpose(ancestry, (0, 2, 3, 1)).reshape(groups, g, kq, t, kj)
    eye = jnp.eye(g, dtype=small.dtype)[:, None, None, :, None]
    dense = jnp.where(eye > 0, small[:, :, :, :, None, :], 0)
    return dense.reshape(groups, g * k, t * g * k).astype(jnp.bfloat16)


def _kernel(idx_ref, kc_hbm, vc_hbm, q_ref, knew_ref, vnew_ref, bias_ref,
            *rest, rows: int, t: int, d: int, hd: int, tchunk: int,
            return_stats: bool = False, p_pad: int = 0, pchunk: int = 0,
            p_real: int = 0, beams: int = 0, quantized: bool = False):
    has_prefix = p_pad > 0
    if quantized:
        sc_ref, rest = rest[0], rest[1:]
    if has_prefix:
        pk_hbm, pv_hbm, rest = rest[0], rest[1], rest[2:]
    kc_out, vc_out, o_ref, *maybe_stats_refs = rest
    if return_stats:
        mout_ref, lout_ref, *maybe_stats_refs = maybe_stats_refs
    if quantized:
        kq8_ref, vq8_ref, *maybe_stats_refs = maybe_stats_refs
    if has_prefix:
        (kbuf, vbuf, pkbuf, pvbuf, m_ref, l_ref, acc_ref,
         load_sems, pload_sems, store_sems) = maybe_stats_refs
    else:
        (kbuf, vbuf, m_ref, l_ref, acc_ref,
         load_sems, store_sems) = maybe_stats_refs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # One grid step per item-group: q/k_new/v_new/bias/o arrive as per-group
    # VMEM blocks (pipelined by Mosaic across grid steps), the caches stay in
    # HBM as (T, groups, rows, H*D) and are sliced here by group index. VMEM
    # residency is therefore batch-INDEPENDENT — the pre-grid version held the
    # full (N, ·) operands and the whole flat ancestry mask in VMEM, which
    # overflowed scoped VMEM at batch 128 and degraded pipelining at batch 64.
    #
    # Loop order is CHUNK-major, head-pairs inner (r5): each slab DMA moves a
    # (tchunk, rows, H*D) block — fully contiguous (rows*hd*2-byte runs)
    # instead of the per-(chunk, head-pair) (tchunk, rows, 128) slices whose
    # 128-lane stride of a 768-lane row made every HBM run 256 bytes (~45% of
    # the achievable bandwidth, r4 trace). The per-head-pair online-softmax
    # state persists across chunks in (n_blocks, rows2, ·) scratch.
    gi = pl.program_id(0)
    idx = idx_ref[0]
    scale = d ** -0.5
    hpb = LANE // d  # heads per 128-lane block
    n_blocks = hd // LANE
    n_chunks = t // tchunk
    # chunks at or beyond the decode index hold no live keys: their DMAs,
    # score matmuls, and softmax passes are all skipped (pl.when) — on
    # average half the cache is dead during a decode
    n_live = (idx + tchunk - 1) // tchunk

    # ---- in-place cache writes (start first; this step's lane is analytic,
    # so nothing below reads position idx) --------------------------------
    if quantized:
        # int8 generated cache (per-lane static scales, models/
        # vision_language.py derive_gen_kv_scales): quantize this step's K/V
        # into int8 scratch, then DMA the scratch in place of the bf16 rows.
        # Round-to-nearest with saturation; the scale rows are strictly
        # positive (floored at a tiny eps by the deriver).
        ks_lane = sc_ref[0:1, :].astype(jnp.float32)   # (1, hd)
        vs_lane = sc_ref[1:2, :].astype(jnp.float32)
        kq8_ref[...] = jnp.clip(
            jnp.round(knew_ref[...].astype(jnp.float32) / ks_lane),
            -127.0, 127.0,
        ).astype(jnp.int8)
        vq8_ref[...] = jnp.clip(
            jnp.round(vnew_ref[...].astype(jnp.float32) / vs_lane),
            -127.0, 127.0,
        ).astype(jnp.int8)
        ksrc, vsrc = kq8_ref, vq8_ref
    else:
        ksrc, vsrc = knew_ref, vnew_ref
    kst = pltpu.make_async_copy(ksrc, kc_out.at[idx, gi], store_sems.at[0])
    vst = pltpu.make_async_copy(vsrc, vc_out.at[idx, gi], store_sems.at[1])
    kst.start()
    vst.start()

    def _chunk_copies(tc, slot):
        t0 = tc * tchunk
        return (
            pltpu.make_async_copy(
                kc_hbm.at[t0:t0 + tchunk, gi],
                kbuf.at[slot], load_sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                vc_hbm.at[t0:t0 + tchunk, gi],
                vbuf.at[slot], load_sems.at[slot, 1],
            ),
        )

    def on_live(tc, fn):
        @pl.when(tc < n_live)
        def _():
            fn()

    lane_iota = lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    rows2 = hpb * rows
    ccols = tchunk * rows  # a 128-multiple — asserted in fused_beam_cache_attention
    masks = [
        (lane_iota >= hi * d) & (lane_iota < (hi + 1) * d)
        for hi in range(hpb)
    ]

    # per-head-pair packed operands + analytic current-step seeding: the
    # lane-masked queries keep per-head contractions exact (the other head's
    # lanes contribute exact zeros) and hpb*rows rows fill the MXU tile
    q_dots = []
    for hp in range(n_blocks):
        c0 = hp * LANE
        q2 = q_ref[:, c0:c0 + LANE].astype(jnp.float32) * scale
        kn2 = knew_ref[:, c0:c0 + LANE].astype(jnp.float32)
        vn2 = vnew_ref[:, c0:c0 + LANE].astype(jnp.float32)
        q_all = jnp.concatenate(
            [jnp.where(m_, q2, 0.0) for m_ in masks], axis=0
        )  # (rows2, LANE)
        kn_all = jnp.concatenate([kn2] * hpb, axis=0)
        vn_all = jnp.concatenate([vn2] * hpb, axis=0)
        s_cur = jnp.sum(q_all * kn_all, axis=-1, keepdims=True)
        # online softmax seeded with the analytic current-step lane:
        # m = s_cur, l = exp(0) = 1, acc = v_new
        m_ref[hp] = s_cur
        l_ref[hp] = jnp.ones((rows2, 1), jnp.float32)
        if quantized:
            # int8 cache: the per-lane K scale varies along the CONTRACTED
            # dim, so it must pre-multiply one matmul operand — fold it into
            # q (cheap: once per step, not per chunk). The per-lane V scale
            # varies along the OUTPUT lanes, so it factors out of the whole
            # accumulation: seed with v_new/vs and multiply acc by vs once
            # at the end — both sides then cost zero per-chunk work.
            # Matmul dtype follows q (bf16 in production, f32 in f32 tests)
            # — the same convention as the unquantized path's cache dtype.
            acc_ref[hp] = vn_all / vs_lane[:, c0:c0 + LANE]
            q_dots.append(
                (q_all * ks_lane[:, c0:c0 + LANE]).astype(
                    jnp.float32 if q_ref.dtype == jnp.float32
                    else jnp.bfloat16
                )
            )
        else:
            acc_ref[hp] = vn_all
            q_dots.append(q_all.astype(kbuf.dtype))

    if has_prefix:
        # ---- beam-shared prefix segment, streamed through the SAME online
        # softmax state (r5): the decode loop's bandwidth floor at DINOv2
        # prefix lengths is this re-read, previously a separate XLA einsum
        # pass per layer per step whose output then merged with the kernel's
        # stats. Fusing it here removes the merge, the (B, H, fold, P) f32
        # score materialization, and one XLA<->custom-call boundary per
        # layer per step. Prefix slabs are (pchunk, gB, hd) contiguous DMAs
        # of the (P_pad, groups, gB, hd) HBM layout; each query row attends
        # ONLY its own item's prefix (cross-item lanes masked), exactly the
        # beam-fold of the old einsum.
        gb = rows // beams
        n_pchunks = p_pad // pchunk
        pccols = pchunk * gb

        def _pchunk_copies(pc, slot):
            p0 = pc * pchunk
            return (
                pltpu.make_async_copy(
                    pk_hbm.at[p0:p0 + pchunk, gi],
                    pkbuf.at[slot], pload_sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    pv_hbm.at[p0:p0 + pchunk, gi],
                    pvbuf.at[slot], pload_sems.at[slot, 1],
                ),
            )

        # item-match mask, loop-invariant: col j belongs to item j % gB, row
        # r2 (head-packed) to item (r2 % rows) // beams; the final chunk
        # additionally masks the P_pad - P zero-padded key slots
        col_item = lax.broadcasted_iota(jnp.int32, (rows2, pccols), 1) % gb
        row_item = (lax.broadcasted_iota(jnp.int32, (rows2, pccols), 0)
                    % rows) // beams
        pmask = col_item == row_item
        col_p = lax.broadcasted_iota(jnp.int32, (rows2, pccols), 1) // gb

        for c in _pchunk_copies(0, 0):
            c.start()
        for pc in range(n_pchunks):
            slot = pc % 2
            if pc + 1 < n_pchunks:
                for c in _pchunk_copies(pc + 1, (pc + 1) % 2):
                    c.start()
            for c in _pchunk_copies(pc, slot):
                c.wait()
            live = pmask
            if (pc + 1) * pchunk > p_real:  # final (padded) chunk only
                live = pmask & (pc * pchunk + col_p < p_real)
            for hp in range(n_blocks):
                c0 = hp * LANE
                pk_c = pkbuf[slot, :, :, c0:c0 + LANE].reshape(pccols, LANE)
                pv_c = pvbuf[slot, :, :, c0:c0 + LANE].reshape(pccols, LANE)
                s = lax.dot_general(
                    q_dots[hp], pk_c, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (rows2, pccols)
                s = jnp.where(live, s, NEG_INF)
                m_old = m_ref[hp]
                m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
                alpha = jnp.exp(m_old - m_new)
                p = jnp.exp(s - m_new)
                l_ref[hp] = l_ref[hp] * alpha + jnp.sum(
                    p, axis=-1, keepdims=True)
                acc_ref[hp] = acc_ref[hp] * alpha + lax.dot_general(
                    p.astype(pv_c.dtype), pv_c,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m_ref[hp] = m_new

    on_live(0, lambda: [c.start() for c in _chunk_copies(0, 0)])
    for tc in range(n_chunks):
        slot = tc % 2
        if tc + 1 < n_chunks:
            on_live(tc + 1,
                    lambda tc=tc: [c.start()
                                   for c in _chunk_copies(tc + 1, (tc + 1) % 2)])

        @pl.when(tc < n_live)
        def _(tc=tc, slot=slot):
            for c in _chunk_copies(tc, slot):
                c.wait()
            # ancestry mask -> additive bias ONCE per chunk (shared by every
            # head pair); kept lanes get exactly +0.0 ((1-1)*1e9)
            b_ = (bias_ref[0, :, tc * ccols:(tc + 1) * ccols].astype(
                jnp.float32
            ) - 1.0) * (-NEG_INF)
            b2 = jnp.concatenate([b_] * hpb, axis=0)  # (rows2, ccols)
            for hp in range(n_blocks):
                c0 = hp * LANE
                kc_chunk = kbuf[slot, :, :, c0:c0 + LANE].reshape(ccols, LANE)
                vc_chunk = vbuf[slot, :, :, c0:c0 + LANE].reshape(ccols, LANE)
                if quantized:
                    # int8 slabs ride the MXU as bf16/f32 (the [-127, 127]
                    # integer range is exact in bf16's 8 mantissa bits);
                    # scales were folded into q / factored out of acc above
                    kc_chunk = kc_chunk.astype(q_dots[hp].dtype)
                    vc_chunk = vc_chunk.astype(q_dots[hp].dtype)
                s = lax.dot_general(
                    q_dots[hp], kc_chunk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (rows2, ccols)
                s = s + b2
                m_old = m_ref[hp]
                m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
                alpha = jnp.exp(m_old - m_new)
                p = jnp.exp(s - m_new)
                l_ref[hp] = l_ref[hp] * alpha + jnp.sum(
                    p, axis=-1, keepdims=True)
                acc_ref[hp] = acc_ref[hp] * alpha + lax.dot_general(
                    p.astype(vc_chunk.dtype), vc_chunk,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m_ref[hp] = m_new

    m_cols, l_cols = [], []  # per-head (rows, 1) softmax stats, lane order
    for hp in range(n_blocks):
        c0 = hp * LANE
        oh = acc_ref[hp] / l_ref[hp]
        if quantized:
            oh = oh * vs_lane[:, c0:c0 + LANE]  # factored-out V scale
        # row block hi holds head hi's outputs — keep only its lanes
        out_pair = oh[(hpb - 1) * rows:rows2]
        for hi in range(hpb - 1):
            out_pair = jnp.where(
                masks[hi], oh[hi * rows:(hi + 1) * rows], out_pair
            )
        o_ref[:, c0:c0 + LANE] = out_pair.astype(o_ref.dtype)
        if return_stats:
            for hi in range(hpb):
                m_cols.append(m_ref[hp, hi * rows:(hi + 1) * rows])
                l_cols.append(l_ref[hp, hi * rows:(hi + 1) * rows])

    if return_stats:
        # per-(row, head) softmax max / denominator, packed into one
        # (rows, 128) lane block (first `heads` lanes real; pad NEG / 0 so a
        # merge with another attention segment treats pads as empty) — the
        # same concat-into-lanes packing as the lm-head stats kernel
        heads = len(m_cols)
        pad = LANE - heads
        mout_ref[:] = jnp.concatenate(
            m_cols + [jnp.full((rows, pad), NEG_INF, jnp.float32)], axis=1
        )
        lout_ref[:] = jnp.concatenate(
            l_cols + [jnp.zeros((rows, pad), jnp.float32)], axis=1
        )

    pltpu.make_async_copy(knew_ref, kc_out.at[idx, gi], store_sems.at[0]).wait()
    pltpu.make_async_copy(vnew_ref, vc_out.at[idx, gi], store_sems.at[1]).wait()


def kernel_rows_ok(rows: int, t: int, interpret: bool = False) -> bool:
    """True iff the fused kernel accepts ``rows``-row slabs with a T=``t`` cache.

    Encodes (in one place) the legality constraints asserted inside
    :func:`fused_beam_cache_attention`:

    - ``rows <= 64``: slab + score VMEM buffers within the 16 MB scoped limit;
    - ``rows % 8 == 0``: the (T, groups, rows, H*D) cache view stays a pure
      bitcast of (T, N, H*D) (tile-aligned sublane split);
    - some t-chunk ``c`` dividing ``t`` keeps the mask lane slices 128-aligned
      (``c * rows % 128 == 0``) — depends on the divisors of ``t``, e.g. at
      t=100 only multiples of 32 qualify.

    ``interpret=True`` (the CPU test mode) mirrors the kernel's own
    ``assert interpret or ...`` relaxation: only the VMEM bound applies.
    """
    if rows <= 0 or rows > 64:
        return False
    if interpret:
        return True
    if rows % 8:
        return False
    return any(t % c == 0 and (c * rows) % LANE == 0 for c in range(1, t + 1))


def pick_ancestry_group(batch_items: int, beam_width: int, t: int,
                        interpret=None):
    """Divisor ``g`` of ``batch_items`` whose ``g * beam_width``-row slab is
    legal for the fused kernel (:func:`kernel_rows_ok`), or None when no group
    size is legal — callers must then fall back to the cache-permute
    beam-search path instead of tracing the kernel.

    Among legal sizes the policy prefers the biggest ``g`` with ``rows <= 32``
    over a full 64-row slab: the score/softmax work is quadratic in rows at
    fixed cache traffic (cross-item lanes are masked redundancy), so 32-row
    slabs halve the VPU+MXU cost per chunk while the DMA bytes are identical,
    and more grid steps pipeline better at small batch. Measured
    (experiments/ab_ancestry_group.py, v5e): VL-518 decode 66.0 -> 67.6 rep/s
    (+2.4%) at batch 16, and a dead tie (553.5 vs 553.2, spread 0.2%) at the
    RRG batch-128 point — rows 32 is never worse. Falls back to the biggest
    legal ``g`` when no ``rows <= 32`` divisor is legal (e.g. beam_width > 32).

    ``interpret`` defaults to the same backend test the kernel call sites use
    (CPU -> pallas interpret mode, where Mosaic tiling rules don't apply).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    best = None
    best_small = None
    for g in range(1, batch_items + 1):
        if batch_items % g == 0 and kernel_rows_ok(g * beam_width, t, interpret):
            best = g
            if g * beam_width <= 32:
                best_small = g
    return best_small if best_small is not None else best


def prefix_fusable(beam_width: int, group_items: int, prefix_len: int) -> bool:
    """True iff the beam-shared prefix segment can stream INSIDE the fused
    kernel (one joint online softmax, no XLA merge): the (P_pad, groups, gB,
    hd) slab view must keep gB = group_items a sublane-tile multiple, and the
    head-packed mask needs whole beams per item."""
    return group_items % 8 == 0 and beam_width > 0 and prefix_len > 0


@jax.tree_util.register_pytree_node_class
class KernelPrefix:
    """Beam-shared prefix K/V packed for in-kernel streaming.

    Wraps :func:`pack_kernel_prefix`'s (P_pad, B, H*D) tensors plus the two
    STATIC ints the kernel needs (`p_real`, `beams`) as pytree aux data, so
    the bundle can ride through ``module.apply`` inside the jitted decode
    loop without the ints becoming tracers. ``MultiHeadAttention.
    prefix_decode`` dispatches on this type: a ``KernelPrefix`` streams
    through the fused Pallas kernel's joint online softmax (no XLA merge);
    plain ``(pk, pv)`` / int8 4-tuples keep the einsum + merge path.
    """

    def __init__(self, pk, pv, p_real: int, beams: int):
        self.pk, self.pv = pk, pv
        self.p_real, self.beams = p_real, beams

    def tree_flatten(self):
        return (self.pk, self.pv), (self.p_real, self.beams)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], leaves[1], *aux)


def pack_kernel_prefix(pk, pv, group_items: int):
    """(B, P, H, D) beam-shared prefix K/V -> the fused kernel's
    (P_pad, B, H*D) layout, padded so a legal pchunk exists (one transpose at
    prefill time, amortized over the whole decode). Returns
    ``(pk_t, pv_t, p_real)``; pass to :func:`fused_beam_cache_attention` as
    ``prefix=(pk_t, pv_t, p_real)``."""
    b, p, h, d = pk.shape
    gb = group_items
    # pccols = pchunk * gB must be a 128-multiple. Padding P to a 128-multiple
    # lets the kernel stream ~128-token chunks (the VMEM sweet spot) with at
    # most 127 dead key slots; below 128 tokens the whole prefix is one chunk
    # padded to the minimal legal multiple.
    step = LANE if p >= LANE else (LANE // int(np.gcd(gb, LANE)))
    p_pad = -(-p // step) * step
    pk_t = jnp.swapaxes(pk.reshape(b, p, h * d), 0, 1)
    pv_t = jnp.swapaxes(pv.reshape(b, p, h * d), 0, 1)
    if p_pad != p:
        pad = ((0, p_pad - p), (0, 0), (0, 0))
        pk_t = jnp.pad(pk_t, pad)
        pv_t = jnp.pad(pv_t, pad)
    return pk_t, pv_t, p


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "return_stats", "p_real", "beams"),
)
def _fused_impl(kc, vc, q, k_new, v_new, bias, index, pk=None, pv=None,
                p_real: int = 0, beams: int = 0, interpret: bool = False,
                return_stats: bool = False, kv_scales=None):
    """One fused decode step of reorder-free beam self-attention.

    kc/vc: (T, N, H*D) caches (aliased: returned updated in place at
    ``index``); q/k_new/v_new: (N, H, D); bias: (groups, g*K, T*g*K) dense
    0/1 mask from :func:`make_ancestry_mask` (1 at ancestor lanes with
    t < index, 0 elsewhere; converted to an additive NEG_INF bias inside the
    kernel); index: () int32. Returns (out (N, H, D) f32, kc, vc).

    ``return_stats=True`` additionally returns the per-(row, head) online
    softmax max ``m`` and denominator ``l`` (each (N, H) f32, including the
    analytic current-step lane) so a caller can MERGE this segment's
    normalized output with another attention segment's — the prefix-LM
    decode joins the beam-shared image-prefix segment this way
    (models/vision_language.py): with M = max(m, m'),
    ``out_joint = (l*e^(m-M)*out + l'*e^(m'-M)*out') / (l*e^(m-M) + l'*e^(m'-M))``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, n, hd = kc.shape
    nq, heads, d = q.shape
    groups, rows, _ = bias.shape
    assert groups * rows == n and heads * d == hd
    assert LANE % d == 0 and hd % LANE == 0, (d, hd)

    # int8 generated cache: caller supplies (2, hd) f32 per-lane scales
    # (row 0 = K, row 1 = V; see models/vision_language.derive_gen_kv_scales)
    quantized = kv_scales is not None
    if quantized:
        assert kc.dtype == jnp.int8 and vc.dtype == jnp.int8, (
            kc.dtype, vc.dtype)
        assert kv_scales.shape == (2, hd), kv_scales.shape
        assert pk is None, "int8 generated cache + fused prefix unsupported"
    else:
        assert kc.dtype != jnp.int8, "int8 cache requires kv_scales"

    has_prefix = pk is not None
    beams = int(beams)
    if has_prefix:
        assert beams > 0 and rows % beams == 0, (rows, beams)
        gb = rows // beams
        assert interpret or gb % 8 == 0, gb  # prefix_fusable
        p_pad = pk.shape[0]
        assert pk.shape == (p_pad, groups * gb, hd), (pk.shape, groups, gb)
        # prefix chunk: largest divisor of P_pad near 128 whose (pchunk, gB,
        # hd) double-buffered k+v slabs stay within ~6.5 MB of scoped VMEM
        # and whose flattened lane slice stays 128-aligned
        pslab_unit = gb * hd * max(1, jnp.dtype(pk.dtype).itemsize) * 4
        pcap = max(1, (13 << 19) // pslab_unit)  # ~6.5 MB for the 4 slabs
        plegal = [c for c in range(1, p_pad + 1)
                  if p_pad % c == 0 and (c * gb) % LANE == 0]
        if interpret and not plegal:
            plegal = [c for c in range(1, p_pad + 1) if p_pad % c == 0]
        pcands = [c for c in plegal if c <= min(pcap, LANE)] or plegal
        pchunk = max(pcands) if pcands else p_pad
        assert interpret or (pchunk * gb) % LANE == 0, (pchunk, gb)
    else:
        p_pad = pchunk = 0

    # t-chunk: ~5 chunks when the bias lane slices stay 128-aligned
    # (tchunk * rows % 128 == 0); degenerates to one whole-slab chunk.
    # Chunk-major slabs hold (tchunk, rows, hd) per buffer — cap tchunk so
    # the four slab buffers (k/v x double-buffer) stay within ~8 MB of the
    # ~16 MB scoped VMEM (~4 MB when prefix slabs share the budget).
    slab_bytes = rows * hd * max(1, jnp.dtype(kc.dtype).itemsize) * 4
    cap = max(1, ((4 if has_prefix else 8) << 20) // slab_bytes)
    legal = [c for c in range(1, t + 1)
             if t % c == 0 and (c * rows) % LANE == 0]
    cands = [c for c in legal if c <= cap] or legal  # correctness over cap
    target = min(max(1, t // 5), cap)
    tchunk = min(cands, key=lambda c: (abs(c - target), c)) if cands else t
    # the kernel reshapes each (tchunk, rows, LANE) slab chunk to
    # (tchunk*rows, LANE) and lane-slices the mask at tchunk*rows columns —
    # Mosaic requires that to be a 128-multiple (callers control rows = g*K);
    # interpret mode (CPU tests) has no tiling constraint
    assert interpret or (tchunk * rows) % LANE == 0, (tchunk, rows)

    # rows must keep the (T, groups, rows, hd) cache view a pure bitcast of
    # (T, N, hd): the tiled minor pair (·, hd) is unchanged and the sublane
    # split N -> groups*rows is tile-aligned when rows % 8 == 0
    assert interpret or rows % 8 == 0, rows

    kernel = functools.partial(
        _kernel, rows=rows, t=t, d=d, hd=hd, tchunk=tchunk,
        return_stats=return_stats, p_pad=p_pad, pchunk=pchunk,
        p_real=int(p_real), beams=beams, quantized=quantized,
    )
    # under shard_map (the multi-device eval path) outputs must declare their
    # varying mesh axes; inherit them from the cache operand
    try:
        vma = jax.typeof(kc).vma
        _sds = lambda shape, dtype: jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    except (AttributeError, TypeError):
        _sds = jax.ShapeDtypeStruct
    kc4 = kc.reshape(t, groups, rows, hd)
    vc4 = vc.reshape(t, groups, rows, hd)
    out_shape = [
        _sds(kc4.shape, kc.dtype),
        _sds(vc4.shape, vc.dtype),
        _sds((n, hd), jnp.float32),
    ]
    idx_arr = jnp.reshape(index, (1,)).astype(jnp.int32)
    # one grid step per item-group; per-group operand/output blocks are
    # pipelined by Mosaic, so VMEM residency does not scale with batch
    _rowblk = lambda gi, idx: (gi, 0)
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((rows, hd), _rowblk),
    ]
    if return_stats:
        # m/l packed per group as (rows, 128) lane blocks, first `heads`
        # lanes real (lane dim must be a 128-multiple)
        out_shape += [_sds((n, LANE), jnp.float32)] * 2
        out_specs += [pl.BlockSpec((rows, LANE), _rowblk)] * 2
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # kc (T, G, rows, hd) in HBM
        pl.BlockSpec(memory_space=pl.ANY),  # vc
        pl.BlockSpec((rows, hd), _rowblk),  # q
        pl.BlockSpec((rows, hd), _rowblk),  # k_new
        pl.BlockSpec((rows, hd), _rowblk),  # v_new
        pl.BlockSpec((1, rows, t * rows), lambda gi, idx: (gi, 0, 0)),  # bias
    ]
    scratch_shapes = [
        # chunk-major slabs: (tchunk, rows, hd) fully-contiguous DMAs,
        # double-buffered; per-head-pair online state persists across
        # chunks in the leading n_blocks dim
        pltpu.VMEM((2, tchunk, rows, hd), kc.dtype),  # kbuf
        pltpu.VMEM((2, tchunk, rows, hd), vc.dtype),  # vbuf
    ]
    operands = [idx_arr, kc4, vc4, q.reshape(n, hd), k_new.reshape(n, hd),
                v_new.reshape(n, hd), bias]
    if quantized:
        # per-lane K/V scales, same (2, hd) block for every group; this
        # step's K/V quantize into int8 scratch before the in-place DMA
        in_specs.append(pl.BlockSpec((2, hd), lambda gi, idx: (0, 0)))
        operands.append(kv_scales.astype(jnp.float32))
        scratch_shapes[:0] = [
            pltpu.VMEM((rows, hd), jnp.int8),  # kq8
            pltpu.VMEM((rows, hd), jnp.int8),  # vq8
        ]
    if has_prefix:
        # prefix K/V stay in HBM as (P_pad, groups, gB, hd); slabs are
        # double-buffered (pchunk, gB, hd) contiguous DMAs
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
        operands += [pk.reshape(p_pad, groups, gb, hd),
                     pv.reshape(p_pad, groups, gb, hd)]
        scratch_shapes += [
            pltpu.VMEM((2, pchunk, gb, hd), pk.dtype),  # pkbuf
            pltpu.VMEM((2, pchunk, gb, hd), pv.dtype),  # pvbuf
        ]
    scratch_shapes += [
        pltpu.VMEM((hd // LANE, LANE // d * rows, 1), jnp.float32),  # m
        pltpu.VMEM((hd // LANE, LANE // d * rows, 1), jnp.float32),  # l
        pltpu.VMEM((hd // LANE, LANE // d * rows, LANE), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    if has_prefix:
        scratch_shapes += [pltpu.SemaphoreType.DMA((2, 2))]  # pload_sems
    scratch_shapes += [pltpu.SemaphoreType.DMA((2,))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(groups,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={1: 0, 2: 1},  # kc->kc_out, vc->vc_out
        interpret=interpret,
    )(*operands)
    kc_out, vc_out, out = results[:3]
    outs = (out.reshape(n, heads, d), kc_out.reshape(t, n, hd),
            vc_out.reshape(t, n, hd))
    if return_stats:
        m_out, l_out = results[3], results[4]
        outs = outs + (m_out[:, :heads], l_out[:, :heads])
    return outs


def fused_beam_cache_attention(kc, vc, q, k_new, v_new, bias, index,
                               interpret: bool = False,
                               return_stats: bool = False,
                               prefix=None, kv_scales=None):
    """Public entry — see :func:`_fused_impl` for semantics.

    ``prefix=(pk, pv, p_real, beams)`` (from :func:`pack_kernel_prefix` +
    the beam width) additionally streams a beam-SHARED prefix K/V segment
    through the same online softmax INSIDE the kernel: the returned ``out``
    (and ``m``/``l`` stats, if requested) then cover prefix + cache + current
    step jointly, so the caller needs no separate prefix pass or merge. Each
    query row attends only its own item's prefix — exactly the beam-fold of
    the prefix-LM's XLA einsum path (``MultiHeadAttention.prefix_decode``).

    ``kv_scales`` (a (2, hd) f32 array: row 0 = per-lane K scale, row 1 = V)
    switches the generated cache to int8: this step's K/V rows are quantized
    in-kernel before the in-place write, cached slabs dequantize via the
    folded scales (K into q, V out of the accumulator), halving the
    generated-segment HBM read that dominates long decodes. APPROXIMATE for
    cache reads (<= 1 quantization step per element, saturating); the
    current step's own lane stays exact. Mutually exclusive with
    ``prefix`` (the fused-prefix experiment)."""
    if prefix is None:
        return _fused_impl(kc, vc, q, k_new, v_new, bias, index,
                           interpret=interpret, return_stats=return_stats,
                           kv_scales=kv_scales)
    assert kv_scales is None, "fused prefix + int8 cache unsupported"
    pk, pv, p_real, beams = prefix
    return _fused_impl(kc, vc, q, k_new, v_new, bias, index, pk, pv,
                       p_real=int(p_real), beams=int(beams),
                       interpret=interpret, return_stats=return_stats)
