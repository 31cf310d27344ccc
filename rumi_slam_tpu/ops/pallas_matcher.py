"""Fused Pallas matcher: Hamming distance + mask + best/second-best in VMEM.

The unfused path (ops.matcher) materializes the full [F, P] float32 distance
matrix in HBM (64 MB at 1024x16384) and then runs top_k over it — two full
HBM round trips.  This kernel tiles the map descriptors through VMEM, forms
the Hamming distances on the MXU as an int8 +/-1 dot product, applies the
candidate mask, and keeps only the running (best, second, argbest) per query
row — a single pass, nothing written back but [F]-sized outputs.

Grid: one program per query-row tile; inner fori_loop walks point tiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QT = 256   # query rows per program
PT = 512   # point columns per inner step

_BIG = 1e9  # plain float: jnp constants cannot be captured by pallas kernels


def _kernel(qd_ref, pd_ref, mask_ref, best_ref, second_ref, idx_ref):
    """qd: [QT, 256] int8 (+/-1); pd: [P, 256] int8; mask: [QT, P] bool."""
    n_pt = pd_ref.shape[0]
    n_steps = n_pt // PT

    def body(step, carry):
        best, second, bidx = carry
        col0 = step * PT
        pd = pd_ref[pl.ds(col0, PT), :]
        dots = jax.lax.dot_general(
            qd_ref[:, :], pd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [QT, PT]
        dist = (256 - dots).astype(jnp.float32) * 0.5
        m = mask_ref[:, pl.ds(col0, PT)]
        dist = jnp.where(m, dist, _BIG)

        tile_best = jnp.min(dist, axis=1)
        tile_arg = jnp.argmin(dist, axis=1).astype(jnp.int32) + col0
        # second-best within tile: mask out the argmin column
        cols = jax.lax.broadcasted_iota(jnp.int32, (QT, PT), 1) + col0
        dist2 = jnp.where(cols == tile_arg[:, None], _BIG, dist)
        tile_second = jnp.min(dist2, axis=1)

        # merge running stats:
        #   second = min(old second, tile second, max(old best, tile best))
        new_best = jnp.minimum(best, tile_best)
        new_idx = jnp.where(tile_best < best, tile_arg, bidx)
        new_second = jnp.minimum(jnp.minimum(second, tile_second),
                                 jnp.maximum(best, tile_best))
        return new_best, new_second, new_idx

    init = (
        jnp.full((QT,), _BIG, jnp.float32),
        jnp.full((QT,), _BIG, jnp.float32),
        jnp.full((QT,), -1, jnp.int32),
    )
    best, second, bidx = jax.lax.fori_loop(0, n_steps, body, init)
    row = pl.program_id(0)
    best_ref[row, :] = best
    second_ref[row, :] = second
    idx_ref[row, :] = bidx


@partial(jax.jit, static_argnames=())
def fused_match(desc_q_packed, desc_p_packed, mask, valid_q, valid_p,
                *, max_dist=80.0, ratio=0.9):
    """Drop-in masked best-match (same contract as ops.matcher.match).

    Args:
      desc_q_packed: [F, 8] uint32; desc_p_packed: [P, 8] uint32.
      mask: [F, P] bool allowed pairs.
      valid_q/valid_p: validity masks.
    Returns (idx [F] int32 (-1 none), dist [F] float32 (inf none)).
    """
    from .matcher import unpack_pm1

    F = desc_q_packed.shape[0]
    P = desc_p_packed.shape[0]
    assert F % QT == 0, f"query count {F} must be a multiple of {QT}"
    assert P % PT == 0, f"point count {P} must be a multiple of {PT}"

    qd = unpack_pm1(desc_q_packed)
    pd = unpack_pm1(desc_p_packed)
    allowed = mask & valid_q[:, None] & valid_p[None, :]

    # outputs kept 2D [grid, QT] — 1D blocks trip Mosaic/XLA layout mismatch
    grid = (F // QT,)
    best, second, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QT, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QT, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # full-array blocks (tiny): each program writes its own row by
            # program_id — per-row (1, QT) blocks violate the >=8 sublane rule
            pl.BlockSpec((F // QT, QT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F // QT, QT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F // QT, QT), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F // QT, QT), jnp.float32),
            jax.ShapeDtypeStruct((F // QT, QT), jnp.float32),
            jax.ShapeDtypeStruct((F // QT, QT), jnp.int32),
        ],
    )(qd, pd, allowed)
    best = best.reshape(F)
    second = second.reshape(F)
    idx = idx.reshape(F)

    ok = (best <= max_dist) & (best < ratio * second) & valid_q & (idx >= 0)
    return jnp.where(ok, idx, -1), jnp.where(ok, best, jnp.inf)
