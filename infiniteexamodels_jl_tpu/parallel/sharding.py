"""Device-mesh sharding of SIMD model evaluation.

The genuinely new layer relative to the reference (which is single-device,
SURVEY.md §2b: no MPI/NCCL anywhere): the row axis of every family's static
index/data arrays is sharded over a named mesh axis, while the decision
vector, bounds and theta stay replicated.  Under jit, XLA GSPMD then
partitions the gathered template evaluations across devices and inserts the
psum-style collectives for the scatter-adds into replicated outputs
(gradient, Jacobian values feeding J^T v products, KKT assembly) -- data
parallelism over supports/scenarios, which is exactly the axis the
reference's SIMD abstraction batches over.

The linear algebra follows the data: scenario-structured (block-diagonal +
arrowhead) KKT systems are assembled AND factorized per-device by the
shard_map-aligned backend (solvers/scenario_shard.py) -- each device
evaluates only the rows of the scenario blocks it owns, factors only those
blocks, and the only cross-device communication is the arrowhead's
psum-reduced Schur corner, border rhs, and replicated solution vector.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="sp", devices=None):
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def shard_model(model, mesh, axis="sp"):
    """Shard each family's row axis over ``axis``; replicate flat vectors.

    With the model built with ``row_pad = mesh size`` every family's
    (padded) row count divides the mesh, so NOTHING silently stays
    replicated; an unpadded family whose row count does not divide the mesh
    is the only fallback-to-replication case left.

    Returns the model (modified in place: device buffers are re-placed)."""
    nd = mesh.devices.size
    row_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    for fam in model.con_fams + model.obj_fams:
        vidx, pidx, fdata, mask = model._fam_dev[id(fam)]
        n_dev = vidx.shape[0]           # padded row count
        sh = row_sharding if (n_dev > 0 and n_dev % nd == 0) else replicated
        model._fam_dev[id(fam)] = (
            jax.device_put(vidx, sh),
            jax.device_put(pidx, sh),
            jax.device_put(fdata, sh),
            None if mask is None else jax.device_put(mask, sh),
        )
    for attr in ("x0", "lvar", "uvar", "theta", "lcon", "ucon",
                 "jac_rows", "jac_cols", "y0"):
        setattr(model, attr, jax.device_put(getattr(model, attr),
                                            replicated))
    model.mesh = mesh
    model.mesh_axis = axis
    return model


def sharded_fraction(model, mesh):
    """Fraction of (logical) family rows that actually got sharded."""
    nd = mesh.devices.size
    total = sharded = 0
    for fam in model.con_fams + model.obj_fams:
        n_dev = model._fam_dev[id(fam)][0].shape[0]
        total += fam.n
        if n_dev > 0 and n_dev % nd == 0:
            sharded += fam.n
    return sharded / max(total, 1)
