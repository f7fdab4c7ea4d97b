"""A/B the fused Pallas spline kernel vs the XLA formulation in the full
spline-MAF train step at a parameterized width.

Round-2 measured a tie standalone and a ~10% loss in-step at the bench
width (96 DOF). This harness checks whether the balance changes at
larger widths (where the one-hot bin-select's multiply-reduce grows as
D * n_bins while the kernel's gather stays O(D)) — the open question of
the Pallas-kernel decision.

Usage: python benchmarks/spline_fused_bench.py --dim 96 --fused never
       python benchmarks/spline_fused_bench.py --dim 768 --fused always
(one process per run — see docs/PERFORMANCE.md Methodology.)
"""

import argparse
import functools
import os
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--dim', type=int, default=96)
    parser.add_argument('--batch', type=int, default=4096)
    parser.add_argument('--layers', type=int, default=6)
    parser.add_argument('--n-bins', type=int, default=8)
    parser.add_argument('--fused', choices=['never', 'always'],
                        default='never')
    parser.add_argument('--timed-steps', type=int, default=20)
    parser.add_argument('--rounds', type=int, default=4)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tfep_bench')
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tfep_tpu.app.trainer import _dealias
    from tfep_tpu.nn.conditioners.made import generate_degrees
    from tfep_tpu.nn.flows import MAF, SequentialFlow
    from tfep_tpu.nn.module import (
        apply_updates, filter_value_and_grad, partition,
    )
    from tfep_tpu.nn.transformers import NeuralSplineTransformer

    dim = args.dim
    keys = jax.random.split(jax.random.key(0), args.layers)
    layers = []
    for i in range(args.layers):
        transformer = NeuralSplineTransformer.create(
            x0=-3.0 * jnp.ones(dim, jnp.float32),
            xf=3.0 * jnp.ones(dim, jnp.float32), n_bins=args.n_bins,
            fused=args.fused)
        layers.append(MAF.create(
            keys[i], generate_degrees(
                dim, order='ascending' if i % 2 == 0 else 'descending'),
            transformer=transformer, dtype=jnp.float32))
    flow = _dealias(SequentialFlow.create(*layers))

    optimizer = optax.adamw(1e-4)
    trainable, _ = partition(flow)
    opt_state = optimizer.init(trainable)
    x = jax.random.normal(jax.random.key(1), (args.batch, dim), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(flow, opt_state, x):
        def loss_fn(f):
            y, ldj = f.forward(x)
            return jnp.mean(0.5 * jnp.sum(y ** 2, axis=-1) - ldj)

        loss, grads = filter_value_and_grad(loss_fn)(flow)
        tr, _ = partition(flow)
        updates, new_opt_state = optimizer.update(grads, opt_state, tr)
        return apply_updates(flow, updates), new_opt_state, loss

    t0 = time.time()
    flow, opt_state, loss = train_step(flow, opt_state, x)
    jax.block_until_ready(loss)
    compile_s = time.time() - t0

    best_dt = float('inf')
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        for _ in range(args.timed_steps):
            flow, opt_state, loss = train_step(flow, opt_state, x)
        jax.block_until_ready(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)
    frames_per_s = args.batch * args.timed_steps / best_dt
    print(f'platform={jax.devices()[0].platform} dim={dim} '
          f'batch={args.batch} layers={args.layers} n_bins={args.n_bins} '
          f'fused={args.fused} compile={compile_s:.1f}s '
          f'loss={float(loss):.4f} frames/s={frames_per_s:.1f} '
          f'ms/step={best_dt / args.timed_steps * 1e3:.3f}')


if __name__ == '__main__':
    main()
