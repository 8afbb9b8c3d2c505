"""Measure rank-space reduction strategies: [B] pair values -> [P] gaussians.

Variants:
  a  .at[rank].add(w)  (current)                        — general scatter-add
  b  .at[rank].add(w[:, None] * ones8)                  — 8-channel scatter
  c  .at[rank].add(slots12)                             — 12-channel (bwd-like)
  d  emission-position scatter (unique indices, set) + row-sum
  e  sort_key_val(rank, w) then segment-sum via cumsum diff at boundaries
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
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def bench(label, fn, *args, iters=20):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{label:46s} {(time.time() - t0) / iters * 1e3:8.2f} ms",
          flush=True)


def main():
    P, B = 100_000, 1_200_000
    key = jax.random.PRNGKey(0)
    rank = jax.random.randint(key, (B,), 0, P, jnp.int32)
    w = jax.random.uniform(jax.random.PRNGKey(1), (B,))
    slots12 = jax.random.uniform(jax.random.PRNGKey(2), (B, 12))

    @jax.jit
    def a(rank, w):
        return jnp.zeros((P,)).at[rank].add(w, mode="drop")

    @jax.jit
    def b(rank, slots):
        return jnp.zeros((P, 8)).at[rank].add(slots[:, :8], mode="drop")

    @jax.jit
    def c(rank, slots):
        return jnp.zeros((P, 12)).at[rank].add(slots, mode="drop")

    # d: unique emission positions (simulated): each pair gets a unique slot
    # in a [P, 16] table (B < 16P)
    emit_pos = jax.random.permutation(jax.random.PRNGKey(3),
                                      P * 16)[:B].astype(jnp.int32)

    @jax.jit
    def d(emit_pos, w):
        table = jnp.zeros((P * 16,)).at[emit_pos].set(w, mode="drop",
                                                      unique_indices=True)
        return table.reshape(P, 16).sum(-1)

    @jax.jit
    def e(rank, w):
        sr, sw = jax.lax.sort_key_val(rank, w)
        cs = jnp.cumsum(sw)
        # last position of each segment
        is_last = jnp.concatenate([sr[1:] != sr[:-1],
                                   jnp.ones((1,), bool)])
        seg_end = jnp.where(is_last, cs, 0.0)
        out = jnp.zeros((P,)).at[sr].max(seg_end, mode="drop")
        prev = jnp.concatenate([jnp.zeros((1,)), out[:-1]])  # wrong but timing
        return out - jnp.cumsum(prev) * 0  # timing only

    bench("a  scatter-add [B]->[P] 1ch", a, rank, w)
    bench("b  scatter-add [B,8]->[P,8]", b, rank, slots12)
    bench("c  scatter-add [B,12]->[P,12]", c, rank, slots12)
    bench("d  unique-set [B]->[16P] + rowsum", d, emit_pos, w)
    bench("e  sort_key_val + segsum (timing)", e, rank, w)


if __name__ == "__main__":
    main()
