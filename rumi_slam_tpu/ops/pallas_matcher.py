"""Fused Pallas matcher: Hamming distance + radius window + best/second-best.

The unfused path (ops.matcher) materializes the full [F, P] float32 distance
matrix AND a [F, P] candidate mask in HBM (80 MB at 1024x16384) and then runs
top_k over them — three full HBM round trips.  This kernel keeps the map
descriptors in VMEM, forms the Hamming distances on the MXU, evaluates the
projection-radius gate ON THE FLY from the query/point pixel coordinates
(nothing [F, P]-shaped ever exists), and keeps only the running
(best, second, argbest) per query row — a single pass, outputs are [F]-sized.

Grid: one program per query-row tile; inner fori_loop walks point tiles.

Validity handling is positional: the caller moves invalid points' projected
coordinates to +1e9 and invalid queries' coordinates to -1e9, so the radius
gate rejects them without separate mask operands (see ``fused_match``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QT = 256   # query rows per program
PT = 2048  # max point columns per inner step (fewer, fatter MXU calls: the
           # [QT, PT] distance tile is 2 MB f32 in VMEM, well within budget;
           # shrinks to the largest divisor of P at call time)

_BIG = 1e9  # plain float: jnp constants cannot be captured by pallas kernels


def _kernel(r2_ref, qd_ref, pd_ref, quv_ref, puv_ref,
            best_ref, second_ref, idx_ref, *, pt: int):
    """qd: [QT, 256] i8 (+/-1); pd: [P, 256] i8; quv: [QT, 2]; puv: [P, 2];
    r2: [1, 1] f32 in SMEM (squared window radius); pt: point tile size."""
    PT = pt
    n_pt = pd_ref.shape[0]
    n_steps = n_pt // PT
    r2 = r2_ref[0, 0]
    qx = quv_ref[:, 0:1]  # [QT, 1]
    qy = quv_ref[:, 1:2]

    def body(step, carry):
        best, second, bidx = carry
        col0 = step * PT
        pd = pd_ref[pl.ds(col0, PT), :]
        # f32 matmul: +/-1 entries and the 256-length dot are exact; this
        # Mosaic version rejects i8/bf16 lhs for the transposed-rhs contract
        dots = jax.lax.dot_general(
            qd_ref[:, :].astype(jnp.float32), pd.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [QT, PT]
        dist = (256.0 - dots) * 0.5

        puv = puv_ref[pl.ds(col0, PT), :]  # [PT, 2]
        du = qx - puv[:, 0][None, :]       # [QT, PT]
        dv = qy - puv[:, 1][None, :]
        inside = du * du + dv * dv <= r2
        dist = jnp.where(inside, dist, _BIG)

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


@partial(jax.jit, static_argnames=("interpret",))
def fused_match(desc_q_packed, desc_p_packed, uv_q, uv_p, radius,
                valid_q, valid_p, *, max_dist=80.0, ratio=0.9,
                interpret: bool = False):
    """Masked best-match under a projection-radius window (the contract of
    ops.matcher.match with mask=radius_mask(uv_q, uv_p, radius)).

    Args:
      desc_q_packed: [F, 8] uint32; desc_p_packed: [P, 8] uint32.
      uv_q: [F, 2] query pixels; uv_p: [P, 2] projected point pixels.
      radius: scalar window radius in pixels.
      valid_q/valid_p: validity masks (folded into coordinates).
    Returns (idx [F] int32 (-1 none), dist [F] float32 (inf none)).
    """
    from .matcher import unpack_pm1

    F = desc_q_packed.shape[0]
    P = desc_p_packed.shape[0]
    assert F % QT == 0, f"query count {F} must be a multiple of {QT}"
    pt = next(t for t in (PT, 1024, 512, 256, 128) if P % t == 0)

    qd = unpack_pm1(desc_q_packed)
    pd = unpack_pm1(desc_p_packed)
    # positional validity: push invalid rows out of any radius window
    quv = jnp.where(valid_q[:, None], uv_q, -_BIG).astype(jnp.float32)
    puv = jnp.where(valid_p[:, None], uv_p, _BIG).astype(jnp.float32)
    r2 = jnp.asarray(radius, jnp.float32).reshape(1, 1) ** 2

    grid = (F // QT,)
    best, second, idx = pl.pallas_call(
        partial(_kernel, pt=pt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((QT, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QT, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
        interpret=interpret,
    )(r2, qd, pd, quv, puv)
    best = best.reshape(F)
    second = second.reshape(F)
    idx = idx.reshape(F)

    ok = (best <= max_dist) & (best < ratio * second) & valid_q & (idx >= 0)
    return jnp.where(ok, idx, -1), jnp.where(ok, best, jnp.inf)
