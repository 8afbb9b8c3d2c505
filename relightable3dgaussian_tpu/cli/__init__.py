"""CLI entry points (train / eval_nvs / eval_relighting_syn4 / relighting /
gui / convert).

Importing this package enables the persistent XLA compilation cache so every
CLI process after the first starts in seconds instead of paying the
multi-minute TPU compile (set R3DG_COMPILE_CACHE=0 to disable).
"""
import os as _os

if _os.environ.get("R3DG_COMPILE_CACHE") != "0":
    from ..utils.compile_cache import enable_compilation_cache as _enable

    _enable()


def auto_plan_config(cfg, params, active, cameras, args=None):
    """Right-size the binning (tier plan + pair budget + depth cap) from
    measured footprints of a few probe views — the same auto-sizing the
    trainer and benchmarks use, so eval/relighting/GUI renders get the
    tiered-sort speedup too (the CUDA reference sizes these buffers
    dynamically per call, rasterizer_impl.cu:199-230). `--no_auto_plan`
    restores the dense default; a user-pinned --buffer_multiple /
    --max_chunks_per_tile is preserved."""
    if args is not None and getattr(args, "no_auto_plan", False):
        return cfg
    from ..train.autotune import plan_raster_config
    probes = [c.view_inputs() for c in cameras[:: max(1, len(cameras) // 3)]]
    new_cfg, _ = plan_raster_config(
        cfg, params, active, probes,
        keep_buffer=bool(args is not None
                         and getattr(args, "buffer_multiple", 0)),
        fit_depth_cap=not (args is not None
                           and getattr(args, "max_chunks_per_tile", 0)))
    return new_cfg


def add_trace_args(parser):
    """Visibility-tracer cap flags shared by every stage-2 CLI."""
    parser.add_argument("--trace_max_clusters", type=int, default=0,
                        help="visibility-tracer candidate-cluster cap "
                             "(0 = auto-size from a measured probe, "
                             "ops.ray_trace.probe_trace_caps)")
    parser.add_argument("--trace_max_supers", type=int, default=0,
                        help="visibility-tracer supercluster cap (0 = auto)")


def trace_caps_from_args(args):
    """kwargs for update_visibility from the --trace_* flags (0 = auto)."""
    return dict(
        max_clusters=getattr(args, "trace_max_clusters", 0) or None,
        max_supers=getattr(args, "trace_max_supers", 0) or None)


def sharded_shading_from_args(args):
    """Point-sharded eval shading for `--n_devices N` CLIs (N > 1), else
    None (host-chunked single-device path). SURVEY §2.3 item 2: the
    reference's eval shading chunk loop (neilf.py:98-113) becomes a
    shard_map over the P axis."""
    n = getattr(args, "n_devices", 1) or 1
    if n <= 1:
        return None
    import jax

    from ..parallel import make_mesh
    from ..parallel.point_sharded import make_sharded_shading
    if len(jax.devices()) < n:
        raise SystemExit(f"--n_devices {n} requested but only "
                         f"{len(jax.devices())} devices are visible")
    print(f"Eval shading point-sharded over {n} devices")
    return make_sharded_shading(make_mesh(jax.devices()[:n]),
                                full_extras=True)


def sharded_trace_from_args(args):
    """Ray-sharded visibility tracer for `--n_devices N` CLIs (N > 1), else
    None (single-device adaptive tracer). SURVEY §2.3 item 2: the
    reference's visibility chunk loop (gaussian_model.py:322-336) becomes a
    shard_map over the mesh's ray axis."""
    n = getattr(args, "n_devices", 1) or 1
    if n <= 1:
        return None
    import jax

    from ..parallel import make_mesh
    from ..parallel.point_sharded import make_sharded_trace
    if len(jax.devices()) < n:
        raise SystemExit(f"--n_devices {n} requested but only "
                         f"{len(jax.devices())} devices are visible")
    print(f"Visibility tracing ray-sharded over {n} devices")
    return make_sharded_trace(make_mesh(jax.devices()[:n]))
