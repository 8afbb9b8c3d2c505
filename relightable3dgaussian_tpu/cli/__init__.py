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
