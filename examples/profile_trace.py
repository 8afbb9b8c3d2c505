"""Trace-phase profile: cull vs eval cost at bench scale (P=100k, S=64).

Times (pipelined, one sync per phase):
  - full trace_visibility
  - cull-only (the two-level AABB selection scan)
  - eval-only (Pallas pairwise kernel on precomputed selections)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relightable3dgaussian_tpu.utils.compile_cache import \
    enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    """True sync: on the axon runtime block_until_ready can return before
    execution completes; only a value transfer reliably waits."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def main():
    from relightable3dgaussian_tpu.ops import ray_trace as rt
    from relightable3dgaussian_tpu.utils.graphics import \
        fibonacci_sphere_sampling

    print("backend:", jax.default_backend(), flush=True)
    n = 100_000
    s_trace = 64
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    dsh = jax.random.normal(ks[0], (n, 3))
    dsh = dsh / jnp.linalg.norm(dsh, axis=-1, keepdims=True)
    xyz = dsh * (1.0 + 0.02 * jax.random.normal(ks[1], (n,))[:, None])
    nrm = -dsh
    scl = jnp.stack([jnp.full((n,), 0.02), jnp.full((n,), 0.02),
                     jnp.full((n,), 0.004)], -1)
    rot = jax.random.normal(ks[2], (n, 4))
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    op = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.95)
    bvh = rt.build_bvh(xyz, scl, rot, op, nrm)
    sync(bvh.feat)

    dirs, _ = fibonacci_sphere_sampling(nrm, s_trace, key=None)
    ro = jnp.broadcast_to(xyz[:, None], (n, s_trace, 3)).reshape(-1, 3)
    rd = dirs.reshape(-1, 3)
    R = ro.shape[0]
    print(f"rays: {R/1e6:.1f}M", flush=True)

    # ---- full trace (warm + steady)
    t0 = time.time()
    out = rt.trace_visibility(bvh, ro, rd)
    sync(out["visibility"])
    print(f"full warm: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    out = rt.trace_visibility(bvh, ro, rd)
    sync(out["visibility"])
    dt_full = time.time() - t0
    print(f"full steady: {dt_full:.2f}s = {R/dt_full/1e6:.2f}M rays/s",
          flush=True)

    # ---- replicate the internal sort + padding to drive phases directly
    B = 128
    max_clusters, max_supers = 96, 32
    ro2 = ro.astype(jnp.float32) + 0.05 * rd.astype(jnp.float32)
    rd2 = rd.astype(jnp.float32)
    pad = (-R) % B
    if pad:
        ro2 = jnp.concatenate([ro2, jnp.tile(ro2[-1:], (pad, 1))])
        rd2 = jnp.concatenate([rd2, jnp.tile(rd2[-1:], (pad, 1))])
    Rp = ro2.shape[0]
    dbin = rt._direction_bins(rd2, res=16)
    dir_bits = 2 * 15 .bit_length()
    from relightable3dgaussian_tpu.ops.knn import morton_codes
    code = morton_codes(ro2, lo=bvh.cluster_lo.min(0),
                        hi=bvh.cluster_hi.max(0))
    morton_bits = 32 - dir_bits
    key = ((dbin << jnp.uint32(morton_bits))
           | (code >> jnp.uint32(max(0, 30 - morton_bits))))
    t0 = time.time()
    perm = jnp.argsort(key)
    ro_s, rd_s = ro2[perm], rd2[perm]
    sync(ro_s)
    print(f"ray sort: {time.time()-t0:.2f}s", flush=True)

    inv_d = 1.0 / jnp.where(jnp.abs(rd_s) < 1e-12,
                            jnp.where(rd_s >= 0, 1e-12, -1e-12), rd_s)
    n_blocks = Rp // B
    G_ = 8192 // B
    n_chunks = n_blocks // G_
    trim = n_chunks * G_ * B
    OB = ro_s[:trim].reshape(n_chunks, G_, B, 3)
    DB = rd_s[:trim].reshape(n_chunks, G_, B, 3)
    IB = inv_d[:trim].reshape(n_chunks, G_, B, 3)
    M = min(max_supers, bvh.super_lo.shape[0]) * bvh.super_size
    Kq = max(1, min(max_clusters, M, bvh.cluster_lo.shape[0]) // rt.QUAD)
    Kq = -(-Kq // rt._KCH) * rt._KCH

    pad_lo, pad_hi = rt._padded_cluster_aabbs(bvh)

    @jax.jit
    def cull_all(OB, IB):
        def body(_, oi):
            o, i = oi
            return None, rt._cull_chunk(bvh, pad_lo, pad_hi, o, i, Kq,
                                        max_supers)
        _, (sel, qbits, overflow) = jax.lax.scan(body, None, (OB, IB))
        return sel, qbits, overflow

    t0 = time.time()
    sel, qbits, ovf = cull_all(OB, IB)
    sync(sel)
    print(f"cull warm: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    sel, qbits, ovf = cull_all(OB, IB)
    sync(sel)
    dt_cull = time.time() - t0
    print(f"cull steady: {dt_cull:.2f}s ({dt_cull/dt_full*100:.0f}% of full)",
          flush=True)

    sel_flat = sel.reshape(-1, Kq)
    qb_flat = qbits.reshape(-1, Kq)
    # quarter-mask sparsity: fraction of (quarter, valid-quad) tiles hit
    valid = np.asarray(sel_flat) < bvh.feat.shape[0] - 1
    bits = np.unpackbits(
        np.asarray(qb_flat).astype(np.uint8)[..., None], axis=-1,
        count=4, bitorder="little").sum(-1)
    print(f"quarter-mask: valid quads/block {valid.sum(1).mean():.1f}/{Kq},"
          f" hit quarters/valid-quad {bits[valid].mean():.2f}/4",
          flush=True)

    for label, qm in (("masked", qb_flat), ("unmasked", None)):
        t0 = time.time()
        log_T, cnt = rt._eval_blocks_pallas(bvh, ro_s[:trim], rd_s[:trim],
                                            sel_flat, B, qmask=qm)
        sync(log_T)
        print(f"eval[{label}] warm: {time.time()-t0:.2f}s", flush=True)
        t0 = time.time()
        log_T, cnt = rt._eval_blocks_pallas(bvh, ro_s[:trim], rd_s[:trim],
                                            sel_flat, B, qmask=qm)
        sync(log_T)
        dt_eval = time.time() - t0
        print(f"eval[{label}] steady: {dt_eval:.2f}s "
              f"({dt_eval/dt_full*100:.0f}% of full)", flush=True)

    # cull sub-phases: level-1 only
    @jax.jit
    def cull_l1(OB, IB):
        def body(_, oi):
            o, i = oi
            s_hit = rt._axis_slab(bvh.super_lo[None, None],
                                  bvh.super_hi[None, None],
                                  o[:, :, None], i[:, :, None])
            s_cnt = s_hit.sum(1)
            return None, (s_cnt.sum(), s_hit.sum())
        _, outs = jax.lax.scan(body, None, (OB, IB))
        return outs

    o1 = cull_l1(OB, IB)
    sync(o1)
    t0 = time.time()
    o1 = cull_l1(OB, IB)
    sync(o1)
    print(f"cull L1-slab-only steady: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
