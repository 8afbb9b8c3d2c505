"""Point-sharded shading and visibility tracing over the device mesh.

The reference handles its P-axis scaling (10^5-10^6 gaussians x 24-384
incident samples) with serial host chunk loops
(/root/reference/gaussian_renderer/neilf.py:98-113,
scene/gaussian_model.py:322-336). On TPU the same axes shard across the mesh:

  * shading (`rendering_equation`) is embarrassingly parallel per point —
    shard P, replicate the (small) environment map;
  * visibility tracing shards the RAY axis (P*S rays) while every device
    keeps the full Morton-cluster structure (the cluster AABB table is tiny;
    the per-ray work dominates).

Both run under shard_map with `check_vma=False` so they compose with pjit'd
callers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.lights import query_light
from ..ops.ray_trace import GaussianBVH, trace_visibility
from ..ops.shading import rendering_equation
from .data_parallel import DP_AXIS


def shard_points(tree, mesh: Mesh):
    """Shard leading (P) axis of every leaf over the mesh."""
    return jax.device_put(
        tree, NamedSharding(mesh, P(DP_AXIS)))


def make_sharded_shading(mesh: Mesh):
    """Point-sharded rendering equation.

    Returns fn(base_color, roughness, normals, viewdirs, incidents_shs, env,
    visibility, incident_dirs, incident_areas) -> (pbr, diffuse_light)
    with all per-point args sharded on P (divisible by mesh.size).
    """
    def inner(base_color, roughness, normals, viewdirs, incidents, env,
              vis, inc_dirs, inc_areas):
        pbr, extras = rendering_equation(
            base_color, roughness, normals, viewdirs, incidents,
            lambda d: query_light(env, d), vis, inc_dirs, inc_areas)
        return pbr, extras["diffuse_light"]

    sharded = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(DP_AXIS), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS),
                  P(DP_AXIS), P(), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS)),
        out_specs=(P(DP_AXIS), P(DP_AXIS)),
        check_vma=False)
    return jax.jit(sharded)


def make_sharded_trace(mesh: Mesh, max_clusters: int = 96,
                       ray_chunk: int = 128):
    """Ray-sharded visibility tracing.

    Returns fn(bvh, rays_o, rays_d) -> visibility [R, 1] with the ray axis
    sharded over the mesh (R divisible by mesh.size) and the cluster
    structure replicated.
    """
    def inner(sizes, xyz, cov_inv, opacity, normal, c_lo, c_hi,
              s_lo, s_hi, feat, rays_o, rays_d):
        cluster_size, super_size = sizes
        bvh = GaussianBVH(order=jnp.zeros((0,), jnp.int32), xyz=xyz,
                          cov_inv=cov_inv, opacity=opacity, normal=normal,
                          cluster_lo=c_lo, cluster_hi=c_hi,
                          super_lo=s_lo, super_hi=s_hi, feat=feat,
                          cluster_size=cluster_size, super_size=super_size)
        out = trace_visibility(bvh, rays_o, rays_d,
                               max_clusters=max_clusters,
                               ray_chunk=ray_chunk)
        return out["visibility"], out["overflow"]

    import functools

    def make(sizes):
        return jax.jit(jax.shard_map(
            functools.partial(inner, sizes), mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P(),
                      P(DP_AXIS), P(DP_AXIS)),
            out_specs=(P(DP_AXIS), P(DP_AXIS)),
            check_vma=False))

    cache: dict[tuple, object] = {}

    def fn(bvh: GaussianBVH, rays_o, rays_d, with_overflow: bool = False):
        sizes = (bvh.cluster_size, bvh.super_size)
        if sizes not in cache:
            cache[sizes] = make(sizes)
        vis, overflow = cache[sizes](
            bvh.xyz, bvh.cov_inv, bvh.opacity, bvh.normal,
            bvh.cluster_lo, bvh.cluster_hi, bvh.super_lo, bvh.super_hi,
            bvh.feat, rays_o, rays_d)
        return (vis, overflow) if with_overflow else vis

    return fn
