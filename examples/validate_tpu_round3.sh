#!/bin/bash
# Round-3 TPU validation queue: drives every kernel changed since the last
# live-TPU measurement, in dependency order, with per-step logs under
# $WORKDIR (default /tmp/r3_validate). Steps are independent — a crash in
# one does not block the next; each is bounded by `timeout`.
#
# Run ONLY when the axon tunnel is alive and nothing else is using the TPU
# (two concurrent clients can wedge the worker — see README perf notes).
set -u
WORKDIR=${WORKDIR:-/tmp/r3_validate}
mkdir -p "$WORKDIR"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  ( timeout "$TMO" "$@" > "$WORKDIR/$name.log" 2>&1 )
  rc=$?
  echo "--- $name exit=$rc; tail:"
  tail -n 12 "$WORKDIR/$name.log"
}

# 1. forward kernel (no-RMW weight stores, 249b780): correctness on-device
TMO=600 run render_toy python -u examples/render_toy_scene.py --size 64

# 2. backward kernels A/B (no-RMW stores 8403039; single-walk 2ea3711)
TMO=600 run bench_bwd python -u examples/bench_bwd.py

# 3. trace phases + masked/unmasked eval A/B (double-buffer 8403039,
#    quarter early-exit 483658e, quarter masks + contiguous AABB fetch r3)
TMO=900 run profile_trace python -u examples/profile_trace.py

# 4. headline bench (render FPS + train it/s + trace steady)
TMO=1200 run bench python -u bench.py

echo "=== all logs in $WORKDIR ==="
