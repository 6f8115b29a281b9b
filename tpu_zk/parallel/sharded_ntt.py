"""Multi-device NTT: six-step passes sharded, all_to_all at the digit turn.

The Bailey decomposition (``ntt/sixstep.py``) transforms one digit per pass
with every other digit as batch -- which is exactly the distributed FFT
shape (SURVEY.md section 2 parallelism table, row "NTT": local butterflies
until the stride crosses the shard boundary, ``all_to_all`` transpose
between stage groups):

  - passes ``0..R-2`` keep the **last** digit axis ``n_{R-1}`` sharded; the
    transform axis ``n_i`` and the Pallas DIF sweep are entirely
    shard-local (each device runs the same VMEM-resident kernel on its
    batch-column slice, via ``shard_map``);
  - before the final pass the array reshards so the **first output digit**
    ``k_0r`` is the sharded axis -- the one collective transpose
    (``all_to_all`` over ICI on a real mesh) -- making the last transform
    axis ``n_{R-1}`` local;
  - the inter-factor twiddle blocks slice along the same sharded axes, so
    every multiply is local.

Outputs are bit-identical to the single-device ``SixStepPlan`` (identical
per-element arithmetic; only placement differs); ``tests/test_parallel.py``
asserts equality on the 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ntt.sixstep import SixStepPlan, _batched_dif


def _pass_local(plan: SixStepPlan, i: int, x: jnp.ndarray, pre) -> jnp.ndarray:
    """Pass ``i`` of the plan on a *local* digit block (same math as
    ``SixStepPlan.__call__``'s loop body; shapes are the per-device slice)."""
    ctx, ms = plan.ctx, plan.ms
    R = len(ms)
    L = ctx.L
    perm = (0, i + 1) + tuple(range(1, i + 1)) + tuple(range(i + 2, R + 1))
    x = x.transpose(perm)  # [L, n_i, batch...]
    shape = x.shape
    x = x.reshape(L, ms[i], -1)
    B = x.shape[2]
    blk = plan.bb if B % plan.bb == 0 else B
    if plan.use_mxu:
        from ..fields.mxu_mul import dft_mxu

        x = dft_mxu(ctx, x, plan.Ds[i], ms[i], blk, pre)
    else:
        scale = plan.scale if i == R - 1 else None
        x = _batched_dif(ctx, x, plan.tws[i], blk, pre, scale)
    x = x.reshape(L, ms[i], *shape[2:])
    inv = (0,) + tuple(range(2, i + 2)) + (1,) + tuple(range(i + 2, R + 1))
    return x.transpose(inv)


def sharded_sixstep(plan: SixStepPlan, table: jnp.ndarray, mesh) -> jnp.ndarray:
    """[N, L] Montgomery -> transformed [N, L], computed over the mesh."""
    ctx, ms = plan.ctx, plan.ms
    R = len(ms)
    L = ctx.L
    D = int(mesh.devices.size)
    if R == 1 or ms[-1] % D or ms[0] % D:
        return plan(table)  # too small to shard; single-device plan

    m_last = ms[-1]

    # [N, L] -> [L, n_0, ..., n_{R-1}], shard the last digit axis
    x = table.reshape(*ms, L).transpose(R, *range(R))
    shardA = NamedSharding(mesh, P(*(None,) * R, "data"))
    x = jax.device_put(x, shardA)

    specA = P(*(None,) * R, "data")
    for i in range(R - 1):
        if plan.pres[i] is None:
            run = jax.shard_map(
                functools.partial(_pass_local, plan, i, pre=None),
                mesh=mesh,
                in_specs=(specA,),
                out_specs=specA,
                check_vma=False,
            )
            x = run(x)
        else:
            pre = plan.pres[i]
            pre4 = pre.reshape(L, ms[i], -1, m_last)  # n_{R-1} fastest batch axis
            pre4 = jax.device_put(
                pre4, NamedSharding(mesh, P(None, None, None, "data"))
            )
            run = jax.shard_map(
                lambda xl, pl, _i=i: _pass_local(
                    plan, _i, xl, pl.reshape(L, ms[_i], -1)
                ),
                mesh=mesh,
                in_specs=(specA, P(None, None, None, "data")),
                out_specs=specA,
                check_vma=False,
            )
            x = run(x, pre4)

    # the collective digit transpose: reshard so k_0r is the sharded axis,
    # freeing n_{R-1} (the final transform axis) to be shard-local
    shardB = NamedSharding(mesh, P(None, "data", *(None,) * (R - 1)))
    x = jax.device_put(x, shardB)
    specB = P(None, "data", *(None,) * (R - 1))
    i = R - 1
    pre = plan.pres[i]
    pre4 = pre.reshape(L, m_last, ms[0], -1)  # k_0r slowest batch axis
    pre4 = jax.device_put(pre4, NamedSharding(mesh, P(None, None, "data", None)))
    run = jax.shard_map(
        lambda xl, pl: _pass_local(plan, R - 1, xl, pl.reshape(L, m_last, -1)),
        mesh=mesh,
        in_specs=(specB, P(None, None, "data", None)),
        out_specs=specB,
        check_vma=False,
    )
    x = run(x, pre4)

    # unpermute (bit-reverse per digit, little-endian digit flatten); runs on
    # the sharded global array -- the k_0r-axis gather is the exit collective
    idx = tuple(
        jnp.asarray(plan.revs[j]).reshape(
            tuple(len(plan.revs[j]) if t == j else 1 for t in range(R))
        )
        for j in range(R)
    )
    nat = x[(slice(None),) + idx]
    nat = nat.transpose(tuple(range(R, 0, -1)) + (0,))
    return nat.reshape(plan.N, L)
