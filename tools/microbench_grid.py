"""Micro-benchmark the note-grid contraction variants on the real chip.

The octave(+)degree "note generating" tail (style/model.py:203-297, 582-675)
is the train step's top cost center. This compares formulations of
``LR(LR(xo)⊕LR(xd)) @ w`` at the bench bucket shape, fwd and fwd+bwd, to
pick the one XLA lowers best on the v5e. Run ad hoc; results feed
models/layers.grid_times_w.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.models.layers import leaky_relu
from mst_tpu.ops.shapes import squash_dims

B, C, R, T, F10, O, D, K, P = 1, 8, 128, 4, 10, 8, 7, 30, 5


def grid(xo, xd):
    x1 = leaky_relu(xo)[..., :, None, :]
    x2 = leaky_relu(xd)[..., None, :, :]
    return leaky_relu(x1 + x2)                    # (…, O, D, K)


def v_dot(xo, xd, w):
    return squash_dims(grid(xo, xd), 5, 7) @ w


def v_reduce_mid(xo, xd, w):
    return (grid(xo, xd)[..., :, None] * w).sum(-2)


def v_reduce_inner(xo, xd, w):
    wt = w.T                                      # (P, K)
    return (grid(xo, xd)[..., None, :] * wt).sum(-1)


def v_map_dot(xo, xd, w):
    # chunk the bar axis; dot per chunk (operand transient = 1/chunks)
    n_chunks = 16
    xo_c = xo.reshape((B, C, n_chunks, R // n_chunks) + xo.shape[3:])
    xd_c = xd.reshape((B, C, n_chunks, R // n_chunks) + xd.shape[3:])
    xo_c = jnp.moveaxis(xo_c, 2, 0)
    xd_c = jnp.moveaxis(xd_c, 2, 0)

    def body(args):
        a, b = args
        x1 = leaky_relu(a)[..., :, None, :]
        x2 = leaky_relu(b)[..., None, :, :]
        g = leaky_relu(x1 + x2)
        return squash_dims(g, 4, 6) @ w

    y = jax.lax.map(body, (xo_c, xd_c))
    return jnp.moveaxis(y, 0, 2).reshape((B, C, R, T, F10, O * D, P))


def bench(name, fn, args, grad=False):
    if grad:
        f = jax.jit(jax.grad(lambda a: fn(*a).sum()))
        run = lambda: jax.block_until_ready(f(args))
    else:
        f = jax.jit(lambda a: fn(*a))
        run = lambda: jax.block_until_ready(f(args))
    run(); run()
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        run()
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:16s} {'bwd' if grad else 'fwd'}: {dt:8.2f} ms")


def bench_full_tail():
    """Compare the complete applier tail (grid + contraction + rest + sigmoid
    scale): the checkpointed jnp formulation vs the Pallas kernel + custom
    VJP (ops/pallas_grid.py), values cross-checked. This is the validation +
    measurement gate for flipping pallas_grid's default on a new chip
    generation."""
    from mst_tpu.ops.pallas_grid import _tail_jnp, fused_grid_tail

    rng = np.random.default_rng(0)
    scale = (6.0, 1.0, 1.0, 1.0, 1.0)
    xo = jnp.asarray(rng.normal(size=(B, C, R, T, F10, O, K)).astype(np.float32))
    xd = jnp.asarray(rng.normal(size=(B, C, R, T, F10, D, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, P)).astype(np.float32))
    rest = jnp.asarray(
        rng.normal(size=(B, 1, R, T, F10, O * D, P)).astype(np.float32))

    interpret = jax.default_backend() == "cpu"   # smoke-testable off-chip
    outs = {}
    for name, fn in (("tail_jnp", _tail_jnp),
                     ("tail_pallas",
                      lambda *a: fused_grid_tail(*a, interpret=interpret))):
        f = jax.jit(lambda *a, fn=fn: fn(*a, scale))
        g = jax.jit(jax.value_and_grad(
            lambda a, fn=fn: (fn(*a, scale) ** 2).sum()))
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(xo, xd, w, rest))
        print(f"{name}: fwd compiled+ran in {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        _, gr = g((xo, xd, w, rest))
        jax.block_until_ready(gr)
        print(f"{name}: grad compiled+ran in {time.perf_counter() - t0:.1f}s",
              flush=True)
        outs[name] = (np.asarray(out), [np.asarray(a) for a in gr])
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(xo, xd, w, rest)
        jax.block_until_ready(out)
        t_f = (time.perf_counter() - t0) / n
        t0 = time.perf_counter()
        for _ in range(n):
            _, gr = g((xo, xd, w, rest))
        jax.block_until_ready(gr)
        t_g = (time.perf_counter() - t0) / n
        print(f"{name}: fwd {t_f * 1e3:.2f} ms, fwd+bwd {t_g * 1e3:.2f} ms",
              flush=True)

    print("fwd max diff:",
          np.abs(outs["tail_jnp"][0] - outs["tail_pallas"][0]).max())
    for i, nm in enumerate(("xo", "xd", "w", "rest")):
        d = np.abs(outs["tail_jnp"][1][i] - outs["tail_pallas"][1][i]).max()
        m = np.abs(outs["tail_jnp"][1][i]).max()
        print(f"grad {nm}: max abs diff {d:.3e} (scale {m:.3e})")


def main():
    import sys
    if "--tail" in sys.argv:
        bench_full_tail()
        return
    rng = np.random.default_rng(0)
    xo = jnp.asarray(rng.normal(size=(B, C, R, T, F10, O, K)).astype(np.float32))
    xd = jnp.asarray(rng.normal(size=(B, C, R, T, F10, D, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, P)).astype(np.float32))
    variants = [("dot", v_dot), ("reduce_mid", v_reduce_mid),
                ("reduce_inner", v_reduce_inner), ("map_dot", v_map_dot)]
    for name, fn in variants:
        bench(name, fn, (xo, xd, w))
    for name, fn in variants:
        bench(name, jax.checkpoint(fn), (xo, xd, w), grad=True)


if __name__ == "__main__":
    main()
