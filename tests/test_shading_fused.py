"""Parity tests: fused Pallas train-shading vs the jnp rendering equation.

The fused op (ops/shading_pallas.py) must match ops.shading.rendering_equation
— outputs AND gradients — under the train contract (normals stop-gradient,
vis/dirs/areas constant). Runs in Pallas interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightable3dgaussian_tpu.models.lights import (direct_light,
                                                     init_direct_light)
from relightable3dgaussian_tpu.ops.shading_pallas import (
    rendering_equation_train, rendering_equation_train_reference)
from relightable3dgaussian_tpu.utils.graphics import \
    fibonacci_sphere_sampling


def make_inputs(P=37, S=8, seed=0, rough_lo=0.05, rough_hi=0.95):
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    normals = jax.random.normal(ks[0], (P, 3))
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    viewdirs = jax.random.normal(ks[1], (P, 3))
    viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
    dirs, areas = fibonacci_sphere_sampling(normals, S)
    vis = jax.random.uniform(ks[2], (P, S, 1))
    base_color = jax.random.uniform(ks[3], (P, 3))
    roughness = jax.random.uniform(ks[4], (P, 1), minval=rough_lo,
                                   maxval=rough_hi)
    shs = 0.3 * jax.random.normal(ks[5], (P, 16, 3))
    env = init_direct_light(8, 2.0, key=ks[6])
    gl = direct_light(env, dirs)
    w = jax.random.normal(ks[7], (P, 3))
    w2 = jax.random.normal(ks[8], (P, 3))
    w3 = jax.random.normal(ks[9], (P, 3))
    return (base_color, roughness, normals, viewdirs, shs, gl, vis, dirs,
            areas, w, w2, w3)


@pytest.mark.parametrize("seed,P,S", [(0, 37, 8), (1, 260, 16), (2, 64, 4)])
def test_forward_parity(seed, P, S):
    (bc, rough, nrm, vdir, shs, gl, vis, dirs, areas,
     *_) = make_inputs(P, S, seed)
    got = rendering_equation_train(bc, rough, nrm, vdir, shs, gl, vis,
                                   dirs, areas)
    want = rendering_equation_train_reference(bc, rough, nrm, vdir, shs,
                                              gl, vis, dirs, areas)
    for g, w_, name in zip(got, want, ("pbr", "diffuse", "specular")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("seed", [0, 3])
def test_grad_parity(seed):
    (bc, rough, nrm, vdir, shs, gl, vis, dirs, areas,
     w, w2, w3) = make_inputs(131, 8, seed)

    def loss(fn, bc, rough, vdir, shs, gl):
        pbr, dif, spec = fn(bc, rough, jax.lax.stop_gradient(nrm), vdir,
                            shs, gl, vis, dirs, areas)
        return ((w * pbr).sum() + (w2 * dif).sum() + (w3 * spec).sum())

    args = (bc, rough, vdir, shs, gl)
    g_fused = jax.grad(lambda *a: loss(rendering_equation_train, *a),
                       argnums=tuple(range(5)))(*args)
    g_ref = jax.grad(
        lambda *a: loss(rendering_equation_train_reference, *a),
        argnums=tuple(range(5)))(*args)
    names = ("base_color", "roughness", "viewdirs", "shs", "global_light")
    for gf, gr, name in zip(g_fused, g_ref, names):
        gf, gr = np.asarray(gf), np.asarray(gr)
        scale = max(np.abs(gr).max(), 1e-6)
        np.testing.assert_allclose(gf, gr, rtol=5e-5, atol=5e-6 * scale,
                                   err_msg=name)


def test_grad_through_env_params():
    """global_light cotangent must chain into env params through XLA."""
    (bc, rough, nrm, vdir, shs, _, vis, dirs, areas,
     w, w2, _) = make_inputs(41, 8, 5)
    env = init_direct_light(8, 2.0)

    def loss(fn, e):
        gl = direct_light(e, dirs)
        pbr, dif, _ = fn(bc, rough, jax.lax.stop_gradient(nrm), vdir, shs,
                         gl, vis, dirs, areas)
        return (w * pbr).sum() + (w2 * dif).sum()

    g_fused = jax.grad(lambda e: loss(rendering_equation_train, e))(env).env
    g_ref = jax.grad(
        lambda e: loss(rendering_equation_train_reference, e))(env).env
    scale = max(float(jnp.abs(g_ref).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=5e-5, atol=5e-6 * scale)


def test_extreme_roughness_and_occlusion():
    """roughness at the activation extremes; fully-occluded visibility."""
    (bc, _, nrm, vdir, shs, gl, vis, dirs, areas,
     w, w2, w3) = make_inputs(29, 8, 7)
    for rv in (1e-4, 0.999):
        rough = jnp.full((29, 1), rv)
        got = rendering_equation_train(bc, rough, nrm, vdir, shs, gl,
                                       jnp.zeros_like(vis), dirs, areas)
        want = rendering_equation_train_reference(
            bc, rough, nrm, vdir, shs, gl, jnp.zeros_like(vis), dirs, areas)
        for g, w_ in zip(got, want):
            assert bool(jnp.all(jnp.isfinite(g)))
            np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                       rtol=1e-4, atol=1e-5)
