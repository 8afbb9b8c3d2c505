"""Gaussian scene state: parameter pytrees, activations, adaptive density.

TPU-native re-design of the reference `GaussianModel`
(/root/reference/scene/gaussian_model.py:30-937). Key differences:

  * Parameters live in fixed-CAPACITY padded arrays with an `active` mask —
    densify/prune/reset are pure jitted functions over static shapes instead
    of tensor resizing + optimizer-state surgery. Surviving points never move
    slots; new points fill free slots, so Adam-moment "surgery" reduces to
    masked zeroing of changed slots (cf. reference cat/prune optimizer
    rebuild, gaussian_model.py:667-750).
  * Activations are free functions of the raw parameter pytree (reference
    gaussian_model.py:32-53): exp(scaling), sigmoid(opacity), normalized
    quaternion/normal, sigmoid*0.77+0.03 base color, sigmoid*0.9+0.09
    roughness.
  * The split sampling (N=2 from the gaussian's own covariance), clone, and
    prune criteria mirror gaussian_model.py:798-929 including the
    normal-gradient-driven densification and the accumulated-blend-weight
    prune.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.knn import mean_sq_dist_to_3nn
from ..utils.quaternions import (inverse_sigmoid, normalize_quaternion,
                                 quaternion_multiply, quaternion_to_rotmat,
                                 rotmat_to_quaternion)
from ..utils.sh import rgb_to_sh

MAX_SH_DEGREE = 3
N_SH = (MAX_SH_DEGREE + 1) ** 2  # 16


@struct.dataclass
class GaussianParams:
    """Raw (pre-activation) learnable parameters, padded to capacity."""
    xyz: jnp.ndarray            # [P, 3]
    normal: jnp.ndarray         # [P, 3]
    shs_dc: jnp.ndarray         # [P, 1, 3]
    shs_rest: jnp.ndarray       # [P, N_SH-1, 3]
    scaling: jnp.ndarray        # [P, 3] (log-scale)
    rotation: jnp.ndarray       # [P, 4] (unnormalized quaternion)
    opacity: jnp.ndarray        # [P, 1] (logit)
    # PBR (stage 2) — zero-size arrays when unused so the pytree is uniform.
    base_color: jnp.ndarray     # [P, 3] (logit)
    roughness: jnp.ndarray      # [P, 1] (logit)
    incidents_dc: jnp.ndarray   # [P, 1, 3]
    incidents_rest: jnp.ndarray  # [P, N_SH-1, 3]
    visibility_dc: jnp.ndarray  # [P, 1, 1]
    visibility_rest: jnp.ndarray  # [P, 15, 1]

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


@struct.dataclass
class GaussianAux:
    """Non-learnable training state (densification statistics)."""
    active: jnp.ndarray             # [P] bool
    max_radii2d: jnp.ndarray        # [P] f32
    xyz_grad_accum: jnp.ndarray     # [P] f32
    normal_grad_accum: jnp.ndarray  # [P] f32
    denom: jnp.ndarray              # [P] f32
    weights_accum: jnp.ndarray      # [P] f32


class DensifyStats(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_active: jnp.ndarray
    n_dropped: jnp.ndarray  # new points that didn't fit in capacity


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def get_scaling(p: GaussianParams) -> jnp.ndarray:
    return jnp.exp(p.scaling)


def get_opacity(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.opacity)


def get_rotation(p: GaussianParams) -> jnp.ndarray:
    return normalize_quaternion(p.rotation)


def get_normal(p: GaussianParams) -> jnp.ndarray:
    n = p.normal
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-3)


def get_shs(p: GaussianParams) -> jnp.ndarray:
    """[P, N_SH, 3] concatenated SH coefficients."""
    return jnp.concatenate([p.shs_dc, p.shs_rest], axis=1)


def get_base_color(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.base_color) * 0.77 + 0.03


def get_roughness(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.roughness) * 0.9 + 0.09


def get_incidents(p: GaussianParams) -> jnp.ndarray:
    return jnp.concatenate([p.incidents_dc, p.incidents_rest], axis=1)


def get_visibility_shs(p: GaussianParams) -> jnp.ndarray:
    return jnp.concatenate([p.visibility_dc, p.visibility_rest], axis=1)


def inverse_roughness(y: jnp.ndarray) -> jnp.ndarray:
    return inverse_sigmoid((y - 0.09) / 0.9)


def get_covariance(p: GaussianParams, scaling_modifier: float = 1.0):
    """Packed [P, 6] 3D covariance (gaussian_model.py get_covariance)."""
    from ..ops.projection import covariance3d_packed
    return covariance3d_packed(get_scaling(p), get_rotation(p),
                               scaling_modifier)


def get_inverse_covariance(p: GaussianParams, scaling_modifier: float = 1.0):
    """Packed [P, 6] inverse 3D covariance (used by the ray tracer)."""
    from ..ops.ray_trace import inverse_covariance_packed
    return inverse_covariance_packed(get_scaling(p) * scaling_modifier,
                                     get_rotation(p))


# ---------------------------------------------------------------------------
# Creation
# ---------------------------------------------------------------------------

def create_from_pcd(points: jnp.ndarray, colors: jnp.ndarray,
                    normals: jnp.ndarray, capacity: int,
                    use_pbr: bool = False) -> tuple[GaussianParams, GaussianAux]:
    """Initialize gaussians from an SfM point cloud, padded to `capacity`.

    Mirrors gaussian_model.py:416-456: per-point scale from the mean squared
    3-NN distance, opacity 0.1, identity rotation, DC-only SH from colors.
    """
    n = points.shape[0]
    assert capacity >= n, (capacity, n)
    dist2 = jnp.maximum(mean_sq_dist_to_3nn(points), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        shape = (capacity - n,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=0)

    rot = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    norm_safe = jnp.where(
        jnp.linalg.norm(normals, axis=-1, keepdims=True) < 1e-6,
        jnp.array([0.0, 0.0, 1.0]), normals)
    params = GaussianParams(
        xyz=pad(points),
        normal=pad(norm_safe),
        shs_dc=pad(rgb_to_sh(colors)[:, None, :]),
        shs_rest=jnp.zeros((capacity, N_SH - 1, 3)),
        scaling=pad(scales, fill=-10.0),
        rotation=pad(rot).at[n:, 0].set(1.0),
        opacity=pad(inverse_sigmoid(0.1 * jnp.ones((n, 1)))),
        **_pbr_fields(capacity, use_pbr),
    )
    aux = init_aux(capacity, n)
    return params, aux


def _pbr_fields(capacity: int, use_pbr: bool) -> dict[str, jnp.ndarray]:
    p = capacity if use_pbr else 0
    return dict(
        base_color=jnp.zeros((p, 3)),
        roughness=jnp.zeros((p, 1)),
        incidents_dc=jnp.zeros((p, 1, 3)),
        incidents_rest=jnp.zeros((p, N_SH - 1, 3)),
        visibility_dc=jnp.zeros((p, 1, 1)),
        visibility_rest=jnp.zeros((p, 15, 1)),
    )


def init_aux(capacity: int, n_active: int) -> GaussianAux:
    return GaussianAux(
        active=jnp.arange(capacity) < n_active,
        max_radii2d=jnp.zeros((capacity,)),
        xyz_grad_accum=jnp.zeros((capacity,)),
        normal_grad_accum=jnp.zeros((capacity,)),
        denom=jnp.zeros((capacity,)),
        weights_accum=jnp.zeros((capacity,)),
    )


def add_pbr_params(p: GaussianParams) -> GaussianParams:
    """Bootstrap stage-2: synthesize zero PBR params for a stage-1 model
    (mirrors gaussian_model.py:389-405)."""
    if p.base_color.shape[0] == p.capacity:
        return p
    return p.replace(**_pbr_fields(p.capacity, True))


def n_active(aux: GaussianAux) -> jnp.ndarray:
    return aux.active.sum()


def mask_grads(grads: GaussianParams, active: jnp.ndarray) -> GaussianParams:
    """Zero gradients of inactive (padding) slots.

    Inactive slots hold degenerate values (zero normals/quaternions) whose
    normalization produces NaN cotangents; they must never reach the
    optimizer or they poison the padded arrays.
    """
    P = active.shape[0]
    return jax.tree.map(
        lambda g: jnp.where(
            active.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0)
        if g.ndim >= 1 and g.shape[0] == P else g, grads)


# ---------------------------------------------------------------------------
# Densification statistics
# ---------------------------------------------------------------------------

class StatContribs(NamedTuple):
    """Per-view densification-stat contributions (summable across views)."""
    weights: jnp.ndarray      # [P]
    xyz_grad_norm: jnp.ndarray   # [P]
    normal_grad_norm: jnp.ndarray  # [P]
    denom: jnp.ndarray        # [P]
    radii: jnp.ndarray        # [P] f32 (max-combinable)


def densification_contribs(mean2d_grad: jnp.ndarray, normal_grad: jnp.ndarray,
                           weights: jnp.ndarray, radii: jnp.ndarray,
                           image_wh: tuple[int, int]) -> StatContribs:
    """Per-view stat contributions (gaussian_model.py:931-937).

    Args:
      mean2d_grad: [P, 2] d(loss)/d(pixel-space mean). Scaled here by
        (0.5*W, 0.5*H) to the reference's NDC-gradient convention — the CUDA
        backward folds ddelx_dx = 0.5*W into dL_dmean2D (backward.cu:481,601)
        and densify_grad_threshold=0.0002 is tuned for THAT scale; raw
        pixel-space norms sit ~0.5*W below it and never trigger densify.
      normal_grad: [P, 3] d(loss)/d(raw normal).
      weights: [P] per-gaussian accumulated blend weight from the rasterizer.
      radii: [P] screen radii (0 = invisible this view).
      image_wh: (W, H) of the rendered view.
    """
    vis_f = (radii > 0).astype(jnp.float32)
    ndc_scale = jnp.array([0.5 * image_wh[0], 0.5 * image_wh[1]],
                          mean2d_grad.dtype)
    return StatContribs(
        weights=weights,
        xyz_grad_norm=vis_f * jnp.linalg.norm(mean2d_grad * ndc_scale,
                                              axis=-1),
        normal_grad_norm=vis_f * jnp.linalg.norm(normal_grad, axis=-1),
        denom=vis_f,
        radii=vis_f * radii.astype(jnp.float32),
    )


def apply_stat_contribs(aux: GaussianAux, c: StatContribs) -> GaussianAux:
    return aux.replace(
        weights_accum=aux.weights_accum + c.weights,
        xyz_grad_accum=aux.xyz_grad_accum + c.xyz_grad_norm,
        normal_grad_accum=aux.normal_grad_accum + c.normal_grad_norm,
        denom=aux.denom + c.denom,
        max_radii2d=jnp.maximum(aux.max_radii2d, c.radii),
    )


def add_densification_stats(aux: GaussianAux, mean2d_grad: jnp.ndarray,
                            normal_grad: jnp.ndarray, weights: jnp.ndarray,
                            radii: jnp.ndarray,
                            image_wh: tuple[int, int]) -> GaussianAux:
    """Single-view stats accumulation (train.py:158-161)."""
    return apply_stat_contribs(
        aux, densification_contribs(mean2d_grad, normal_grad, weights, radii,
                                    image_wh))


# ---------------------------------------------------------------------------
# Densify / prune (pure, jittable, capacity-stable)
# ---------------------------------------------------------------------------

def densify_and_prune(params: GaussianParams, aux: GaussianAux,
                      opt_moments: tuple[Any, Any], key: jax.Array, *,
                      grad_threshold, grad_normal_threshold,
                      min_opacity: float, extent: float,
                      max_screen_size, percent_dense: float,
                      weights_threshold: float = 1e-4, n_split: int = 2):
    """One adaptive-density step: clone + split + prune in a single pass.

    Mirrors gaussian_model.py:890-929 semantics on padded arrays. Surviving
    points keep their slots; clones/split-children scatter into free slots
    (capacity overflow drops lowest-index candidates and is reported).

    Args:
      opt_moments: (mu, nu) pytrees shaped like `params` (Adam state leaves);
        moments of freed/assigned slots are zeroed.
    Returns:
      (params, aux, opt_moments, DensifyStats)
    """
    P = params.capacity
    act = aux.active
    denom_safe = jnp.maximum(aux.denom, 1.0)
    grads = jnp.where(aux.denom > 0, aux.xyz_grad_accum / denom_safe, 0.0)
    grads_n = jnp.where(aux.denom > 0, aux.normal_grad_accum / denom_safe, 0.0)

    opac = get_opacity(params)[:, 0]
    max_scale = get_scaling(params).max(-1)

    prune = act & ((opac < min_opacity) | (aux.weights_accum < weights_threshold))
    # Screen-size prune parity: the reference's densify_and_prune reads
    # big_points_vs = max_radii2D > max_screen_size (gaussian_model.py:907)
    # AFTER densification_postfix has just reset max_radii2D to zeros
    # (gaussian_model.py:788, run unconditionally by both clone and split)
    # — so under train.py's call pattern the radii2d>20px prune NEVER
    # fires; only the world-size term acts. Implementing the written-but-
    # dead semantics (window-max radii2d > 20px) pruned 20k/62k points in
    # one cycle at 800px and collapsed the model (round-4 post-mortem).
    # max_screen_size gates the world-size term exactly like the reference
    # (None before iteration 3000, train.py:167; jnp.inf here = disabled).
    prune = prune | (act & (max_scale > 0.1 * extent)
                     & (max_screen_size < jnp.inf))

    sel = (grads >= grad_threshold) | (grads_n >= grad_normal_threshold)
    sel = sel & act & ~prune
    clone = sel & (max_scale <= percent_dense * extent)
    split = sel & (max_scale > percent_dense * extent)

    # A split's child 0 REUSES the original's slot (in-place overwrite), so
    # the point set is identical to the reference's remove-original +
    # add-n_split-children, but a full pool degrades gracefully: when the
    # remaining children can't be placed the point still survives (as one
    # shrunk resampled child) instead of being destroyed.
    keep = act & ~prune
    n_cloned = clone.sum()
    n_splits = split.sum()

    # Rank free slots: argsort(keep) lists keep=False slots first.
    free_slots = jnp.argsort(keep)            # [P]
    n_free = P - keep.sum()

    clone_rank = jnp.cumsum(clone) - 1
    split_rank = jnp.cumsum(split) - 1
    total_new = n_cloned + (n_split - 1) * n_splits

    def dest_for(rank, valid):
        ok = valid & (rank < n_free)
        return jnp.where(ok, free_slots[jnp.clip(rank, 0, P - 1)], P)

    clone_dest = dest_for(clone_rank, clone)

    # Split children: sample from the gaussian's own covariance.
    scales_act = get_scaling(params)
    rot_mats = quaternion_to_rotmat(get_rotation(params))
    new_scaling_raw = jnp.log(jnp.maximum(scales_act / (0.8 * n_split), 1e-10))

    # Start from current params; deactivate non-keep slots implicitly via aux.
    new_params = params
    mu, nu = opt_moments

    changed = jnp.zeros((P,), bool)

    def scatter_rows(target, dest, overrides):
        """target[dest[i]] = params[i] (or override[i]) for dest[i] < P.

        Sources are always read from the ORIGINAL `params`, never from the
        partially updated target — destinations (free slots) can alias
        other new points' source slots (e.g. split originals).
        """
        def one(tgt_leaf, src_leaf, override):
            if tgt_leaf.shape[0] != P:  # empty pbr leaves
                return tgt_leaf
            src = override if override is not None else src_leaf
            return tgt_leaf.at[dest].set(src, mode="drop")
        flat_over = {k: overrides.get(k) for k in
                     GaussianParams.__dataclass_fields__}
        return GaussianParams(**{
            k: one(getattr(target, k), getattr(params, k), flat_over[k])
            for k in GaussianParams.__dataclass_fields__})

    # 1) Clones: exact copies.
    new_params = scatter_rows(new_params, clone_dest, {})
    changed = changed.at[clone_dest].set(True, mode="drop")

    # 2) Split children: child 0 overwrites the original slot in place, the
    #    remaining n_split-1 children scatter into free slots.
    self_slot = jnp.arange(P, dtype=jnp.int32)
    for j in range(n_split):
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, (P, 3)) * scales_act
        child_xyz = params.xyz + jnp.einsum("pij,pj->pi", rot_mats, noise)
        if j == 0:
            dest = jnp.where(split, self_slot, P)
        else:
            rank = n_cloned + (n_split - 1) * split_rank + (j - 1)
            dest = dest_for(rank, split)
        new_params = scatter_rows(
            new_params, dest, {"xyz": child_xyz, "scaling": new_scaling_raw})
        changed = changed.at[dest].set(True, mode="drop")

    # Freed slots (pruned) also count as changed so their Adam moments
    # don't leak into future occupants.
    changed = changed | (act & ~keep)

    def zero_changed(tree):
        return jax.tree.map(
            lambda leaf: jnp.where(
                changed.reshape((-1,) + (1,) * (leaf.ndim - 1)), 0.0, leaf)
            if leaf.ndim >= 1 and leaf.shape[0] == P else leaf, tree)

    mu, nu = zero_changed(mu), zero_changed(nu)

    # Activity: survivors (incl. in-place split child 0) + placed points.
    placed = jnp.zeros((P,), bool).at[clone_dest].set(True, mode="drop")
    for j in range(1, n_split):
        rank = n_cloned + (n_split - 1) * split_rank + (j - 1)
        placed = placed.at[dest_for(rank, split)].set(True, mode="drop")
    new_active = keep | placed

    stats = DensifyStats(
        n_cloned=n_cloned,
        n_split=n_splits,
        n_pruned=prune.sum(),
        n_active=new_active.sum(),
        n_dropped=jnp.maximum(total_new - n_free, 0),
    )
    new_aux = GaussianAux(
        active=new_active,
        max_radii2d=jnp.zeros((P,)),
        xyz_grad_accum=jnp.zeros((P,)),
        normal_grad_accum=jnp.zeros((P,)),
        denom=jnp.zeros((P,)),
        weights_accum=jnp.zeros((P,)),
    )
    return new_params, new_aux, (mu, nu), stats


def prune_only(params: GaussianParams, aux: GaussianAux,
               opt_moments: tuple[Any, Any], *, min_opacity: float,
               extent: float, max_screen_size: float | None,
               weights_threshold: float = 1e-4):
    """Prune without densifying (the reference's standalone `prune`,
    gaussian_model.py:916-929). Unlike densify_and_prune, the screen-size
    term DOES act here: no densification_postfix precedes it, so the
    accumulated max_radii2D is live (train.py never calls it, though)."""
    act = aux.active
    opac = get_opacity(params)[:, 0]
    max_scale = get_scaling(params).max(-1)
    prune = act & ((opac < min_opacity) | (aux.weights_accum < weights_threshold))
    prune = prune | (act & ((aux.max_radii2d > max_screen_size)
                            | ((max_scale > 0.1 * extent)
                               & (max_screen_size < jnp.inf))))
    keep = act & ~prune
    P = params.capacity

    def zero_pruned(tree):
        return jax.tree.map(
            lambda leaf: jnp.where(
                prune.reshape((-1,) + (1,) * (leaf.ndim - 1)), 0.0, leaf)
            if leaf.ndim >= 1 and leaf.shape[0] == P else leaf, tree)

    mu, nu = opt_moments
    new_aux = aux.replace(active=keep,
                          weights_accum=jnp.zeros_like(aux.weights_accum))
    return params, new_aux, (zero_pruned(mu), zero_pruned(nu)), prune.sum()


def reset_opacity(params: GaussianParams, opt_moments: tuple[Any, Any]):
    """Clamp opacities to <= 0.01 and clear their Adam moments
    (gaussian_model.py:563-566 + replace_tensor_to_optimizer)."""
    new_op = inverse_sigmoid(jnp.minimum(get_opacity(params), 0.01))
    mu, nu = opt_moments
    mu = mu.replace(opacity=jnp.zeros_like(mu.opacity))
    nu = nu.replace(opacity=jnp.zeros_like(nu.opacity))
    return params.replace(opacity=new_op), (mu, nu)


def grow_capacity(params: GaussianParams, aux: GaussianAux, new_capacity: int):
    """Pad all per-point arrays to a larger capacity (host-side; triggers
    re-jit of downstream steps). The functional replacement for the
    reference's unbounded tensor growth during densification."""
    P = params.capacity
    assert new_capacity >= P

    def pad(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == P:
            pad_shape = (new_capacity - P,) + leaf.shape[1:]
            return jnp.concatenate(
                [leaf, jnp.zeros(pad_shape, leaf.dtype)], axis=0)
        return leaf

    new_params = jax.tree.map(pad, params)
    # Padded rotations must stay valid quaternions.
    new_params = new_params.replace(
        rotation=new_params.rotation.at[P:, 0].set(1.0),
        normal=new_params.normal.at[P:, 2].set(1.0))
    new_aux = GaussianAux(
        active=jnp.concatenate(
            [aux.active, jnp.zeros(new_capacity - P, bool)]),
        **{k: jnp.concatenate([getattr(aux, k),
                               jnp.zeros(new_capacity - P)])
           for k in ["max_radii2d", "xyz_grad_accum", "normal_grad_accum",
                     "denom", "weights_accum"]})
    return new_params, new_aux


# ---------------------------------------------------------------------------
# Composition / transforms (host-side utilities for relighting)
# ---------------------------------------------------------------------------

def set_transform(params: GaussianParams, transform: jnp.ndarray) -> GaussianParams:
    """Apply a 4x4 affine transform (rotation+scale+translation) to the cloud
    (gaussian_model.py:88-112)."""
    A = transform[:3, :3]
    scale = jnp.linalg.norm(A, axis=-1)          # per-row scale
    rot = A / scale[:, None]
    xyz1 = jnp.concatenate([params.xyz, jnp.ones_like(params.xyz[:, :1])], -1)
    new_xyz = (xyz1 @ transform.T)[:, :3]
    new_scaling = jnp.log(get_scaling(params) * scale[None, :])
    new_normal = params.normal @ rot.T
    rot_q = rotmat_to_quaternion(rot)
    new_rot = quaternion_multiply(rot_q[None, :], params.rotation)
    return params.replace(xyz=new_xyz, scaling=new_scaling,
                          normal=new_normal, rotation=new_rot)


def concatenate(models: list[GaussianParams]) -> GaussianParams:
    """Concatenate multiple clouds (gaussian_model.py:344-356
    `create_from_gaussians`) — used by scene composition."""
    def cat(*leaves):
        return jnp.concatenate(leaves, axis=0)
    return jax.tree.map(cat, *models)
