"""Multi-device MSM: per-shard Pippenger + cross-shard point reduction.

Points and scalars shard on the element axis; **each device runs the full
Pippenger bucket kernel on its local chunk** (``curves/msm_pippenger.py`` --
the VMEM bucket-table Pallas kernel on TPU, the batched double-and-add
fallback elsewhere), then the D per-shard partial sums -- one point each --
reduce in a log-depth complete-add tree over the mesh (SURVEY.md section 2
parallelism table, row "MSM commit/open": per-shard bucket accumulation,
collective reduction of partials).

Group associativity makes the result the identical group element to the
sequential reference MSM (``multilinear_kzg/src/multilinear_kzg.rs:37-44``);
``tests/test_parallel.py`` asserts affine equality on the 8-device mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..curves.ec_device import DeviceCurve, Point, ec_identity, tree_reduce
from ..curves.msm_pippenger import msm_pippenger


def sharded_msm_points(dc: DeviceCurve, mesh, points: Point, scalar_limbs_plain):
    """points ([N,L],)*3 + plain scalar limbs [N,Lr] -> single projective point.

    Pads N to a multiple of the mesh size with identity points (zero scalars),
    which add exact zeros to the group sum.
    """
    ctx, b3 = dc.ctx, dc.b3
    D = int(mesh.devices.size)
    N = points[0].shape[0]
    pad = (-N) % D
    if pad:
        ident = ec_identity(ctx)
        points = tuple(
            jnp.concatenate([coord, jnp.broadcast_to(i, (pad,) + i.shape)])
            for coord, i in zip(points, ident)
        )
        scalar_limbs_plain = jnp.concatenate(
            [
                scalar_limbs_plain,
                jnp.zeros((pad, scalar_limbs_plain.shape[1]), jnp.uint32),
            ]
        )

    shard = NamedSharding(mesh, P("data"))
    X, Y, Z = (jax.device_put(c, shard) for c in points)
    sl = jax.device_put(scalar_limbs_plain, shard)

    # check_vma=False: the double-and-add fallback inits its loop carry from
    # constants (the identity point), which the varying-manual-axes checker
    # rejects inside shard_map; the math is still shard-local and correct.
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    def local_msm(x, y, z, s):
        pt = msm_pippenger(ctx, b3, ((x, y, z), s))
        return jnp.stack(pt)[None]  # [1, 3, L] -> gathers to [D, 3, L]

    partials = local_msm(X, Y, Z, sl)  # [D, 3, L]
    return tree_reduce(ctx, b3, (partials[:, 0], partials[:, 1], partials[:, 2]))


def sharded_msm(dc: DeviceCurve, mesh, affine_points, scalars):
    """Host-convenience sharded MSM over a mesh -> affine int pair."""
    fr = dc.fr
    P_dev = dc.points_to_device(affine_points)
    limbs = fr.array([s % fr.p for s in scalars], mont=False)
    return dc.point_to_host(sharded_msm_points(dc, mesh, P_dev, limbs))
