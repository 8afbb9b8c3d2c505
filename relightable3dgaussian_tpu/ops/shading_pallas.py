"""Fused Pallas shading kernel for the stage-2 TRAIN path (opt-in).

STATUS — measured on v5e at P=100k, S=64 and kept OPT-IN
(R3DG_FUSED_SHADING=1): XLA fuses the jnp rendering equation
(ops/shading.py, mirroring reference neilf.py:339-371) better than first
profiling suggested — the full jnp chain is ~9-11 ms fwd+bwd, and this
kernel is at best parity in isolation (fwd 8.4 vs 10.7 ms, fwd+bwd 10.4 vs
9.0 ms as wired, incl. env query + channel splits). Inside the full
stage-2 train step it is a clear LOSS (+27 ms: 112.6 -> 139.5 ms) because
the custom_vjp boundary pins the whole shading subgraph into discrete
Pallas dispatches that cannot overlap or share scheduling with the splat
pipeline the way XLA's own fusions do. The negative result is kept (with
its parity tests) for future compiler/hardware revisions; the default
train path stays on the jnp chain.

Design (if enabled): streams each block of points through VMEM once —

  * forward kernel: SH local light + env-visibility-gated global light +
    GGX specular + transport, reduced over samples in-register. HBM traffic
    = inputs + [P, 3] outputs, nothing else.
  * backward kernel: recomputes the forward chain per block (cheaper than
    storing residuals) and emits analytic gradients for base_color,
    roughness, viewdirs, incident SH coefficients, and the global light
    samples. The global-light grad chains into the env map through XLA
    (the equirect query stays differentiable outside the kernel).

TRAIN-PATH CONTRACT (matching models/render_view, which stop-gradients
normals during training): normals, visibility, incident dirs and areas are
treated as constants — their cotangents are zero. The reference flows no
gradient through them either at train time except normals, which the
reference ALSO detaches in its stage-2 loss path for the shaded color
(neilf.py:339 operates on pc.get_normal with the offset-loss handled
separately); parity with the repo's own jnp chain under stop_gradient is
pinned by tests/test_shading_fused.py.

Everything is f32; the per-(k,c) SH contraction runs as explicit
multiply-adds on [BP, S] tiles (no [P, S, K] basis is ever materialized).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BP = 256            # points per block (grid dim 0)
_FRESNEL = 0.04
_LN2 = float(np.log(2.0))
_4PI = 4.0 * np.pi


def _sh_basis_terms(x, y, z):
    """Degree-3 real SH basis as a list of 16 [BP, S] arrays, in the
    reference order (utils/sh.py eval_sh_basis, 3DGS sign convention)."""
    from ..utils.sh import C0, C1, C2, C3
    one = jnp.ones_like(x)
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    return [
        C0 * one,
        -C1 * y, C1 * z, -C1 * x,
        C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
        C2[3] * xz, C2[4] * (xx - yy),
        C3[0] * y * (3 * xx - yy), C3[1] * xy * z,
        C3[2] * y * (4 * zz - xx - yy), C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
        C3[4] * x * (4 * zz - xx - yy), C3[5] * z * (xx - yy),
        C3[6] * x * (xx - 3 * yy),
    ]


def _norm3(x, y, z, eps=1e-12):
    m = jnp.sqrt(x * x + y * y + z * z)
    M = jnp.maximum(m, eps)
    return x / M, y / M, z / M, m, M


def _chain(dx, dy, dz, visv, areav, glx, gly, glz, bc, rough, nrm, vdir,
           shs):
    """Shared forward chain on 2D tiles. Returns every intermediate the
    backward needs. Shapes: [BP,S] for sample arrays, [BP,1]/[BP,3]/[BP,48]
    for per-point arrays."""
    nx, ny, nz = nrm[:, 0:1], nrm[:, 1:2], nrm[:, 2:3]
    vdx, vdy, vdz = vdir[:, 0:1], vdir[:, 1:2], vdir[:, 2:3]

    # GGX geometry (ggx_specular, ops/shading.py:24-66)
    vx, vy, vz, m_v, M_v = _norm3(vdx, vdy, vdz)
    nhx, nhy, nhz, _, _ = _norm3(nx, ny, nz)
    nv_sign = vx * nhx + vy * nhy + vz * nhz
    sgn = jnp.sign(nv_sign)
    nsx, nsy, nsz = nhx * sgn, nhy * sgn, nhz * sgn

    h0x = (dx + vx) * 0.5
    h0y = (dy + vy) * 0.5
    h0z = (dz + vz) * 0.5
    hx, hy, hz, m_h, M_h = _norm3(h0x, h0y, h0z)

    NoL_raw = nsx * dx + nsy * dy + nsz * dz
    NoV_raw = nsx * vx + nsy * vy + nsz * vz
    NoH_raw = nsx * hx + nsy * hy + nsz * hz
    VoH_raw = vx * hx + vy * hy + vz * hz
    NoL = jnp.clip(NoL_raw, 1e-6, 1.0)
    NoV = jnp.clip(NoV_raw, 1e-6, 1.0)
    NoH = jnp.clip(NoH_raw, 1e-6, 1.0)
    VoH = jnp.clip(VoH_raw, 1e-6, 1.0)

    alpha = rough * rough
    alpha2 = alpha * alpha
    k = (alpha + 2.0 * rough + 1.0) / 8.0
    FMi = (-5.55473 * VoH - 6.98316) * VoH
    exp2FMi = jnp.exp2(FMi)
    frac0 = _FRESNEL + (1.0 - _FRESNEL) * exp2FMi
    u = frac0 * alpha2
    nom0 = NoH * NoH * (alpha2 - 1.0) + 1.0
    nom1 = NoV * (1.0 - k) + k
    nom2 = NoL * (1.0 - k) + k
    q = _4PI * nom0 * nom0 * nom1 * nom2
    nom = jnp.clip(q, 1e-6, _4PI)
    f_s = u / nom

    # local SH light + transport, per channel
    basis = _sh_basis_terms(dx, dy, dz)
    ndi = jnp.maximum(nx * dx + ny * dy + nz * dz, 0.0)
    an = areav * ndi
    e = []          # pre-relu SH values
    light = []
    trans = []
    gl = (glx, gly, glz)
    for c in range(3):
        acc = basis[0] * shs[:, c:c + 1]
        for kk in range(1, 16):
            acc = acc + basis[kk] * shs[:, 3 * kk + c:3 * kk + c + 1]
        e.append(acc)
        lc = jnp.maximum(acc, 0.0) + gl[c] * visv
        light.append(lc)
        trans.append(lc * an)

    S = dx.shape[1]
    dif = [jnp.sum(t, axis=1, keepdims=True) / S for t in trans]
    spec = [jnp.sum(f_s * t, axis=1, keepdims=True) / S for t in trans]
    pbr = [bc[:, c:c + 1] / np.pi * dif[c] + spec[c] for c in range(3)]

    return dict(
        pbr=pbr, dif=dif, spec=spec, trans=trans, light=light, e=e,
        basis=basis, f_s=f_s, u=u, nom=nom, q=q, frac0=frac0,
        exp2FMi=exp2FMi, alpha=alpha, alpha2=alpha2, k=k,
        NoL=NoL, NoV=NoV, NoH=NoH, VoH=VoH,
        NoL_raw=NoL_raw, NoV_raw=NoV_raw, NoH_raw=NoH_raw, VoH_raw=VoH_raw,
        nom0=nom0, nom1=nom1, nom2=nom2,
        vx=vx, vy=vy, vz=vz, m_v=m_v, M_v=M_v,
        hx=hx, hy=hy, hz=hz, m_h=m_h, M_h=M_h,
        h0x=h0x, h0y=h0y, h0z=h0z,
        nsx=nsx, nsy=nsy, nsz=nsz, an=an, visv=visv,
        vdx=vdx, vdy=vdy, vdz=vdz,
    )


def _bwd_math(ch, gpbr, gdif, gspec, bc, rough, dx, dy, dz):
    """Analytic VJP of _chain wrt (bc, rough, vdir, shs, gl)."""
    S = dx.shape[1]
    f_s = ch["f_s"]
    dbc, dgl, ge = [], [], []
    gf = jnp.zeros_like(f_s)
    for c in range(3):
        gpc = gpbr[:, c:c + 1]
        dbc.append(gpc * ch["dif"][c] / np.pi)
        gD = gdif[:, c:c + 1] + gpc * bc[:, c:c + 1] / np.pi
        gS = gspec[:, c:c + 1] + gpc
        gtrans = (gD + gS * f_s) * (1.0 / S)
        gf = gf + gS * ch["trans"][c] * (1.0 / S)
        glight = gtrans * ch["an"]
        dgl.append(glight * ch["visv"])
        ge.append(glight * (ch["e"][c] > 0.0).astype(glight.dtype))
    dbc = jnp.concatenate(dbc, axis=1)

    # SH coefficients: dshs[:, 3k+c] = sum_s basis_k * ge_c
    basis = ch["basis"]
    dshs_cols = []
    for kk in range(16):
        for c in range(3):
            dshs_cols.append(
                jnp.sum(basis[kk] * ge[c], axis=1, keepdims=True))
    dshs = jnp.concatenate(dshs_cols, axis=1)

    # GGX backward
    nom, u, q = ch["nom"], ch["u"], ch["q"]
    alpha, alpha2, k = ch["alpha"], ch["alpha2"], ch["k"]
    nom0, nom1, nom2 = ch["nom0"], ch["nom1"], ch["nom2"]
    NoV, NoH, VoH, NoL = ch["NoV"], ch["NoH"], ch["VoH"], ch["NoL"]
    mask = lambda raw, lo, hi: ((raw >= lo) & (raw <= hi)).astype(u.dtype)

    gu = gf / nom
    gq = -gf * u / (nom * nom) * mask(q, 1e-6, _4PI)
    gfrac0 = gu * alpha2
    galpha2 = jnp.sum(gu * ch["frac0"], axis=1, keepdims=True)
    gVoH = (gfrac0 * (1.0 - _FRESNEL) * _LN2 * ch["exp2FMi"]
            * (-2.0 * 5.55473 * VoH - 6.98316) * mask(ch["VoH_raw"], 1e-6,
                                                      1.0))
    gnom0 = gq * _4PI * 2.0 * nom0 * nom1 * nom2
    gnom1 = jnp.sum(gq * _4PI * nom0 * nom0 * nom2, axis=1, keepdims=True)
    gnom2 = gq * _4PI * nom0 * nom0 * nom1
    galpha2 = galpha2 + jnp.sum(gnom0 * NoH * NoH, axis=1, keepdims=True)
    gNoH = gnom0 * 2.0 * NoH * (alpha2 - 1.0) * mask(ch["NoH_raw"], 1e-6,
                                                     1.0)
    gk = (gnom1 * (1.0 - NoV)
          + jnp.sum(gnom2 * (1.0 - NoL), axis=1, keepdims=True))
    gNoV = gnom1 * (1.0 - k) * mask(ch["NoV_raw"], 1e-6, 1.0)
    galpha = galpha2 * 2.0 * alpha + gk * (1.0 / 8.0)
    drough = galpha * 2.0 * rough + gk * 0.25

    # vector chains: V-hat and H
    nsx, nsy, nsz = ch["nsx"], ch["nsy"], ch["nsz"]
    vx, vy, vz = ch["vx"], ch["vy"], ch["vz"]
    hx, hy, hz = ch["hx"], ch["hy"], ch["hz"]
    gvhx = gNoV * nsx
    gvhy = gNoV * nsy
    gvhz = gNoV * nsz
    gHx = gNoH * nsx + gVoH * vx
    gHy = gNoH * nsy + gVoH * vy
    gHz = gNoH * nsz + gVoH * vz
    gvhx = gvhx + jnp.sum(gVoH * hx, axis=1, keepdims=True)
    gvhy = gvhy + jnp.sum(gVoH * hy, axis=1, keepdims=True)
    gvhz = gvhz + jnp.sum(gVoH * hz, axis=1, keepdims=True)

    # H = h0 / max(||h0||, eps)
    m_h, M_h = ch["m_h"], ch["M_h"]
    h0x, h0y, h0z = ch["h0x"], ch["h0y"], ch["h0z"]
    gM_h = -(gHx * h0x + gHy * h0y + gHz * h0z) / (M_h * M_h)
    sel_h = (m_h > 1e-12).astype(u.dtype) / jnp.maximum(m_h, 1e-30)
    gh0x = gHx / M_h + gM_h * h0x * sel_h
    gh0y = gHy / M_h + gM_h * h0y * sel_h
    gh0z = gHz / M_h + gM_h * h0z * sel_h
    gvhx = gvhx + 0.5 * jnp.sum(gh0x, axis=1, keepdims=True)
    gvhy = gvhy + 0.5 * jnp.sum(gh0y, axis=1, keepdims=True)
    gvhz = gvhz + 0.5 * jnp.sum(gh0z, axis=1, keepdims=True)

    # V-hat = vdir / max(||vdir||, eps)
    m_v, M_v = ch["m_v"], ch["M_v"]
    vdx, vdy, vdz = ch["vdx"], ch["vdy"], ch["vdz"]
    gM_v = -(gvhx * vdx + gvhy * vdy + gvhz * vdz) / (M_v * M_v)
    sel_v = (m_v > 1e-12).astype(u.dtype) / jnp.maximum(m_v, 1e-30)
    gvdx = gvhx / M_v + gM_v * vdx * sel_v
    gvdy = gvhy / M_v + gM_v * vdy * sel_v
    gvdz = gvhz / M_v + gM_v * vdz * sel_v
    dvdir = jnp.concatenate([gvdx, gvdy, gvdz], axis=1)

    return dbc, drough, dvdir, dshs, tuple(dgl)


def _fwd_kernel(dx, dy, dz, visv, areav, glx, gly, glz, bc, rough, nrm,
                vdir, shs, pbr_ref, dif_ref, spec_ref):
    ch = _chain(dx[:], dy[:], dz[:], visv[:], areav[:], glx[:], gly[:],
                glz[:], bc[:], rough[:], nrm[:], vdir[:], shs[:])
    pbr_ref[:] = jnp.concatenate(ch["pbr"], axis=1)
    dif_ref[:] = jnp.concatenate(ch["dif"], axis=1)
    spec_ref[:] = jnp.concatenate(ch["spec"], axis=1)


def _bwd_kernel(dx, dy, dz, visv, areav, glx, gly, glz, bc, rough, nrm,
                vdir, shs, gpbr, gdif, gspec,
                dbc_ref, drough_ref, dvdir_ref, dshs_ref, dglx_ref,
                dgly_ref, dglz_ref):
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    ch = _chain(dxv, dyv, dzv, visv[:], areav[:], glx[:], gly[:], glz[:],
                bc[:], rough[:], nrm[:], vdir[:], shs[:])
    dbc, drough, dvdir, dshs, dgl = _bwd_math(
        ch, gpbr[:], gdif[:], gspec[:], bc[:], rough[:], dxv, dyv, dzv)
    dbc_ref[:] = dbc
    drough_ref[:] = drough
    dvdir_ref[:] = dvdir
    dshs_ref[:] = dshs
    dglx_ref[:] = dgl[0]
    dgly_ref[:] = dgl[1]
    dglz_ref[:] = dgl[2]


def _pad_p(x, pp):
    pad = pp - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _specs(P, S, n_ps, widths):
    """Block specs: n_ps leading [P, S] arrays then per-point widths."""
    sp = [pl.BlockSpec((_BP, S), lambda i: (i, 0),
                       memory_space=pltpu.VMEM) for _ in range(n_ps)]
    sp += [pl.BlockSpec((_BP, w), lambda i: (i, 0),
                        memory_space=pltpu.VMEM) for w in widths]
    return sp


@jax.custom_vjp
def _shade_core(dxyz, visv, areav, gl, bc, rough, nrm, vdir, shs):
    return _shade_core_fwd(dxyz, visv, areav, gl, bc, rough, nrm, vdir,
                           shs)[0]


def _shade_core_fwd(dxyz, visv, areav, gl, bc, rough, nrm, vdir, shs):
    P, S = visv.shape
    pp = -(-P // _BP) * _BP
    args = [_pad_p(a, pp) for a in
            (*dxyz, visv, areav, *gl, bc, rough, nrm, vdir, shs)]
    out_shape = [jax.ShapeDtypeStruct((pp, 3), jnp.float32)] * 3
    out_specs = [pl.BlockSpec((_BP, 3), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 3
    pbr, dif, spec = pl.pallas_call(
        _fwd_kernel,
        grid=(pp // _BP,),
        in_specs=_specs(pp, S, 8, (3, 1, 3, 3, 48)),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*args)
    outs = (pbr[:P], dif[:P], spec[:P])
    return outs, (dxyz, visv, areav, gl, bc, rough, nrm, vdir, shs)


def _shade_core_bwd(res, cts):
    dxyz, visv, areav, gl, bc, rough, nrm, vdir, shs = res
    gpbr, gdif, gspec = cts
    P, S = visv.shape
    pp = -(-P // _BP) * _BP
    args = [_pad_p(a, pp) for a in
            (*dxyz, visv, areav, *gl, bc, rough, nrm, vdir, shs,
             gpbr, gdif, gspec)]
    out_shape = [
        jax.ShapeDtypeStruct((pp, 3), jnp.float32),    # dbc
        jax.ShapeDtypeStruct((pp, 1), jnp.float32),    # drough
        jax.ShapeDtypeStruct((pp, 3), jnp.float32),    # dvdir
        jax.ShapeDtypeStruct((pp, 48), jnp.float32),   # dshs
        jax.ShapeDtypeStruct((pp, S), jnp.float32),    # dglx
        jax.ShapeDtypeStruct((pp, S), jnp.float32),
        jax.ShapeDtypeStruct((pp, S), jnp.float32),
    ]
    widths_out = (3, 1, 3, 48)
    out_specs = [pl.BlockSpec((_BP, w), lambda i: (i, 0),
                              memory_space=pltpu.VMEM) for w in widths_out]
    out_specs += [pl.BlockSpec((_BP, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 3
    in_specs = _specs(pp, S, 8, (3, 1, 3, 3, 48))
    in_specs += [pl.BlockSpec((_BP, 3), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 3
    dbc, drough, dvdir, dshs, dglx, dgly, dglz = pl.pallas_call(
        _bwd_kernel,
        grid=(pp // _BP,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*args)
    zero = lambda a: jax.tree_util.tree_map(jnp.zeros_like, a)
    return (zero(dxyz), zero(visv), zero(areav),
            (dglx[:P], dgly[:P], dglz[:P]),
            dbc[:P], drough[:P], zero(nrm), dvdir[:P], dshs[:P])


_shade_core.defvjp(_shade_core_fwd, _shade_core_bwd)


def rendering_equation_train(base_color, roughness, normals, viewdirs,
                             incidents_shs, global_light, visibility,
                             incident_dirs, incident_areas):
    """Fused train-path rendering equation.

    Args mirror ops.shading.rendering_equation with the env query already
    applied: `global_light` is [P, S, 3] (differentiable — its cotangent
    chains back into the env params through XLA). Returns
    (pbr [P,3], diffuse_light [P,3], specular [P,3]); normals/visibility/
    dirs/areas receive zero gradient (train contract — normals are
    stop-gradient'd by the caller).
    """
    P, S = visibility.shape[:2]
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    dxyz = tuple(f32(incident_dirs[..., c]) for c in range(3))
    gl = tuple(f32(global_light[..., c]) for c in range(3))
    visv = f32(visibility[..., 0])
    areav = f32(jnp.broadcast_to(incident_areas[..., 0], (P, S)))
    shs = f32(incidents_shs[:, :16].reshape(P, 48))
    return _shade_core(dxyz, visv, areav, gl, f32(base_color),
                       f32(roughness), f32(normals), f32(viewdirs), shs)


def rendering_equation_train_reference(base_color, roughness, normals,
                                       viewdirs, incidents_shs,
                                       global_light, visibility,
                                       incident_dirs, incident_areas):
    """jnp oracle with the exact same signature/reduction (for tests and
    non-TPU fallbacks): calls ops.shading.rendering_equation with a
    precomputed-light function."""
    from .shading import rendering_equation
    pbr, ex = rendering_equation(
        base_color, roughness, normals, viewdirs, incidents_shs,
        lambda d: global_light, visibility, incident_dirs, incident_areas)
    return pbr, ex["diffuse_light"], ex["specular"]
