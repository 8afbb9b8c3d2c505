"""A/B microbench: single-walk vs two-walk compositor backward on TPU.

Usage: python examples/bench_bwd.py [--n 100000] [--size 800] [--iters 20]
       [--mode both|single|two]

Builds the bench scene (same generator as bench.py), times the full
stage-1 train step (fwd+bwd+adam) with the single back-to-front walk
kernel and with R3DG_BWD_TWO_WALK=1. Timing uses the async-batch pattern
(N calls, one sync) because the tunnel costs ~23 ms per round trip.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--mode", choices=["both", "single", "two"],
                    default="both")
    ap.add_argument("--chunk", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from relightable3dgaussian_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()

    from relightable3dgaussian_tpu.models import gaussians as G
    from relightable3dgaussian_tpu.models.render import ViewInputs
    from relightable3dgaussian_tpu.ops import (RasterConfig,
                                               make_camera_params)
    from relightable3dgaussian_tpu.train.config import OptimizationConfig
    from relightable3dgaussian_tpu.train.optim import init_adam
    from relightable3dgaussian_tpu.train.stage1 import train_step

    size, n = args.size, args.n
    cfg_train = RasterConfig(height=size, width=size, feature_dim=5,
                             sh_degree=3, buffer_multiple=12,
                             chunk=args.chunk,
                             max_chunks_per_tile=64 * 128 // args.chunk)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    r = jax.random.uniform(ks[0], (n, 1)) ** (1 / 3)
    d = jax.random.normal(ks[1], (n, 3))
    pts = r * d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    params, aux = G.create_from_pcd(
        pts, jax.random.uniform(ks[2], (n, 3)),
        jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1)), capacity=n)
    cam = make_camera_params(np.eye(3), np.array([0.0, 0.0, 3.0]),
                             size, size, fovx=0.9, fovy=0.9)
    view = ViewInputs(cam=cam, image=jnp.zeros((3, size, size)),
                      image_mask=jnp.ones((1, size, size)),
                      depth=jnp.zeros((1, size, size)),
                      normal=jnp.zeros((3, size, size)))
    opt = OptimizationConfig(lambda_normal_render_depth=0.01,
                             lambda_normal_smooth=0.01,
                             lambda_mask_entropy=0.1, lambda_depth_var=1e-2)
    opt_state = init_adam(params)

    def sync(out):
        # block_until_ready is a no-op through the axon tunnel; a value
        # fetch is the only reliable device sync.
        float(jnp.asarray(out[0].xyz[0, 0]))

    def run(label):
        t0 = time.time()
        out = train_step(params, aux, opt_state, view, jnp.asarray(1),
                         jax.random.PRNGKey(0), cfg=cfg_train, opt=opt,
                         spatial_lr_scale=1.0)
        sync(out)
        print(f"{label}: compile+first {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        for i in range(args.iters):
            out = train_step(out[0], out[1], out[2], view,
                             jnp.asarray(i + 2), jax.random.PRNGKey(i),
                             cfg=cfg_train, opt=opt, spatial_lr_scale=1.0)
        sync(out)
        dt = (time.time() - t0) / args.iters
        print(f"{label}: {dt * 1e3:.1f} ms/it = {1 / dt:.2f} it/s",
              flush=True)
        return dt

    results = {}
    if args.mode in ("both", "single"):
        os.environ.pop("R3DG_BWD_TWO_WALK", None)
        results["single"] = run("single-walk bwd")
    if args.mode in ("both", "two"):
        os.environ["R3DG_BWD_TWO_WALK"] = "1"
        jax.clear_caches()   # kernel choice is read at trace time
        results["two"] = run("two-walk bwd")
    if len(results) == 2:
        print(f"speedup: {results['two'] / results['single']:.3f}x")


if __name__ == "__main__":
    main()
