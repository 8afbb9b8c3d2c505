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


# Per-sample extras reduced to means by the sharded eval shading (the same
# reductions models/render_neilf._shade_points keeps on its chunked path).
_SHADE_EXTRA_KEYS = ("incident_lights", "local_incident_lights",
                     "global_incident_lights", "incident_visibility",
                     "diffuse_light", "specular")


def make_sharded_shading(mesh: Mesh, full_extras: bool = False):
    """Point-sharded rendering equation (SURVEY §2.3 item 2: the
    reference's eval shading chunk loop, neilf.py:98-113, becomes a
    shard_map over P).

    Returns fn(base_color, roughness, normals, viewdirs, incidents_shs, env,
    visibility, incident_dirs, incident_areas) with all per-point args
    sharded on P (divisible by mesh.size; `fn.mesh` is attached for callers
    that need to pad). Without `full_extras` returns (pbr, diffuse_light);
    with it, (pbr, extras) where per-sample extras are pre-reduced to their
    sample means — everything the stage-2 eval feature pack consumes.
    """
    def inner(base_color, roughness, normals, viewdirs, incidents, env,
              vis, inc_dirs, inc_areas):
        pbr, extras = rendering_equation(
            base_color, roughness, normals, viewdirs, incidents,
            lambda d: query_light(env, d), vis, inc_dirs, inc_areas)
        if not full_extras:
            return pbr, extras["diffuse_light"]
        red = {k: (extras[k] if extras[k].ndim == 2 else extras[k].mean(-2))
               for k in _SHADE_EXTRA_KEYS}
        return pbr, red

    out_extras = (P(DP_AXIS) if not full_extras
                  else {k: P(DP_AXIS) for k in _SHADE_EXTRA_KEYS})
    sharded = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(DP_AXIS), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS),
                  P(DP_AXIS), P(), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS)),
        out_specs=(P(DP_AXIS), out_extras),
        check_vma=False)
    jit_fn = jax.jit(sharded)

    def fn(*args):
        return jit_fn(*args)

    fn.mesh = mesh
    return fn


def make_sharded_trace(mesh: Mesh, max_clusters: int = 96,
                       ray_chunk: int = 128, max_supers: int = 32,
                       adaptive: bool = True, max_rounds: int = 3,
                       cap_limit: int = 1024, escalation: int = 4):
    """Ray-sharded visibility tracing with cap escalation to exactness.

    Returns fn(bvh, rays_o, rays_d, with_overflow=False, max_clusters=None,
    max_supers=None) -> visibility [R, 1] with the ray axis sharded over
    the mesh (R divisible by mesh.size) and the cluster structure
    replicated. Per-call caps override the factory defaults (e.g. from
    `ops.ray_trace.probe_trace_caps`).

    With `adaptive` (default) and concrete rays, the capped sharded pass is
    followed by the same uncertainty-driven escalation as the single-device
    `trace_visibility_adaptive` (ops/ray_trace.py): a ray can only be wrong
    when its T >= 0.9 AND it overflowed the caps, so those rays are
    gathered, re-sharded, and retraced at escalated caps until none remain
    (or the cap limit); after each concrete call `fn.last_stats` reports
    {rounds, retraced_rays}. This recovers the CUDA LBVH's per-ray exactness
    (bvh/src/trace.cu:196-287) on the multi-chip path — previously only the
    single-device tracer escalated, and a v5e-8 stage-2 run silently kept
    the biased capped pass.
    """
    import functools

    # Backend choice must follow the MESH devices, not the process default:
    # jax.default_backend() stays "tpu" even while lowering for a CPU mesh
    # (e.g. the virtual 8-device test mesh), and the Pallas kernel only
    # runs on TPU.
    mesh_is_tpu = mesh.devices.flat[0].platform == "tpu"

    def inner(static, xyz, cov_inv, opacity, normal, c_lo, c_hi,
              s_lo, s_hi, feat, rays_o, rays_d):
        cluster_size, super_size, kc, ks = static
        bvh = GaussianBVH(order=jnp.zeros((0,), jnp.int32), xyz=xyz,
                          cov_inv=cov_inv, opacity=opacity, normal=normal,
                          cluster_lo=c_lo, cluster_hi=c_hi,
                          super_lo=s_lo, super_hi=s_hi, feat=feat,
                          cluster_size=cluster_size, super_size=super_size)
        out = trace_visibility(bvh, rays_o, rays_d, max_clusters=kc,
                               ray_chunk=ray_chunk, max_supers=ks,
                               use_pallas=mesh_is_tpu)
        return out["visibility"], out["overflow"]

    def make(static):
        return jax.jit(jax.shard_map(
            functools.partial(inner, static), mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P(),
                      P(DP_AXIS), P(DP_AXIS)),
            out_specs=(P(DP_AXIS), P(DP_AXIS)),
            check_vma=False))

    cache: dict[tuple, object] = {}

    def run_pass(bvh: GaussianBVH, rays_o, rays_d, kc, ks):
        static = (bvh.cluster_size, bvh.super_size, kc, ks)
        if static not in cache:
            cache[static] = make(static)
        return cache[static](
            bvh.xyz, bvh.cov_inv, bvh.opacity, bvh.normal,
            bvh.cluster_lo, bvh.cluster_hi, bvh.super_lo, bvh.super_hi,
            bvh.feat, rays_o, rays_d)

    def fn(bvh: GaussianBVH, rays_o, rays_d, with_overflow: bool = False,
           max_clusters: int | None = None, max_supers: int | None = None):
        kc = max_clusters if max_clusters is not None else \
            fn.default_max_clusters
        ks = max_supers if max_supers is not None else fn.default_max_supers
        vis, overflow = run_pass(bvh, rays_o, rays_d, kc, ks)
        n_clusters = bvh.cluster_lo.shape[0]
        R = vis.shape[0]
        m = mesh.size
        fn.last_stats = {"rounds": 0, "retraced_rays": 0}
        if adaptive and not isinstance(rays_o, jax.core.Tracer):
            for _ in range(max_rounds):
                if kc >= min(cap_limit, n_clusters):
                    break
                uncertain = (vis[:, 0] > 0.0) & (overflow > 0)
                # only a scalar crosses the device->host link per round
                n_unc = int(uncertain.sum())
                if n_unc == 0:
                    break
                fn.last_stats["rounds"] += 1
                fn.last_stats["retraced_rays"] += n_unc
                kc = min(escalation * kc, cap_limit, n_clusters)
                ks = min(escalation * ks, bvh.super_lo.shape[0])
                # pad the retrace set to a power of two (compiled-program
                # reuse across rounds/calls) then to mesh divisibility so
                # the shard_map splits evenly; fill slots index past R so
                # their scatters drop (jax .at[] default mode).
                n_pad = min(R, max(256, 1 << (n_unc - 1).bit_length()))
                n_pad = -(-n_pad // m) * m
                idx_p = jnp.nonzero(uncertain, size=n_pad, fill_value=R)[0]
                idx_c = jnp.minimum(idx_p, R - 1)
                sub_vis, sub_ovf = run_pass(bvh, rays_o[idx_c],
                                            rays_d[idx_c], kc, ks)
                vis = vis.at[idx_p].set(sub_vis)
                overflow = overflow.at[idx_p].set(sub_ovf)
        return (vis, overflow) if with_overflow else vis

    fn.default_max_clusters = max_clusters
    fn.default_max_supers = max_supers
    return fn
