"""relightable3dgaussian_tpu — a TPU-native relightable 3D Gaussian splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
NJU-3DV/Relightable3DGaussian (ECCV 2024): two-stage training of relightable
3D Gaussian splats — stage 1 trains enhanced 3DGS with per-point normals and
arbitrary feature splatting; stage 2 learns per-point BRDF + incident/visibility
spherical harmonics + a global environment map with physically based shading and
ray-traced visibility.

Design notes (TPU-first, not a CUDA port):
  * Alpha compositing is expressed as a cumulative-product transmittance scan
    plus a (pixels x gaussians) weight matmul so blending runs on the MXU,
    instead of a serial per-pixel front-to-back loop.
  * All hot paths are static-shape: gaussians live in padded capacity arrays
    with an active mask; tile binning uses a fixed-budget duplication buffer
    ordered by a lexicographic `lax.sort` (replacing cub radix sort).
  * Ray-traced visibility uses an implicit complete BVH over Morton-sorted
    gaussians; transmittance products are order-independent so no hit sorting
    is needed.
  * Multi-device scaling uses `jax.sharding.Mesh` + collectives (camera-batch
    data parallelism, point-sharded shading) rather than any NCCL analogue.
"""

__version__ = "0.1.0"
