"""CNF (EGNN dynamics) training-step throughput benchmark.

Times one jitted CNF training step — ContinuousFlow(EGNNDynamics) forward
with Hutchinson trace + KL loss + grad + AdamW update — at a realistic
molecular size. Used to track the CNF path round-over-round (the headline
bench.py tracks the MAF paths).

Usage:  python benchmarks/cnf_bench.py [--atoms 32] [--batch 256]
        [--steps 8] [--compute-dtype bfloat16] [--force-cpu-devices N]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--atoms', type=int, default=32)
    parser.add_argument('--batch', type=int, default=256)
    parser.add_argument('--steps', type=int, default=8,
                        help='ODE integration steps (rk4)')
    parser.add_argument('--layers', type=int, default=4)
    parser.add_argument('--feat', type=int, default=64)
    parser.add_argument('--compute-dtype', default=None,
                        help="e.g. 'bfloat16' for MXU mixed precision")
    parser.add_argument('--pairwise', default='xla',
                        choices=['xla', 'pallas'],
                        help='per-pair message block implementation')
    parser.add_argument('--timed-steps', type=int, default=10)
    parser.add_argument('--rounds', type=int, default=4)
    parser.add_argument('--force-cpu-devices', type=int, default=0)
    args = parser.parse_args()

    if args.force_cpu_devices:
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '')
            + f' --xla_force_host_platform_device_count='
              f'{args.force_cpu_devices}').strip()

    import jax
    import jax.numpy as jnp
    import optax

    if args.force_cpu_devices:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tfep_bench')
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tfep_tpu.app.trainer import _dealias
    from tfep_tpu.nn.dynamics import EGNNDynamics
    from tfep_tpu.nn.flows import ContinuousFlow
    from tfep_tpu.nn.module import (
        apply_updates, filter_value_and_grad, partition,
    )

    n_atoms, batch = args.atoms, args.batch
    dim = n_atoms * 3

    dynamics = EGNNDynamics.create(
        jax.random.key(0),
        node_types=np.arange(n_atoms) % 4,
        r_cutoff=6.0,
        node_feat_dim=args.feat, distance_feat_dim=args.feat,
        n_layers=args.layers, initialize_identity=False,
        dtype=jnp.float32, pairwise=args.pairwise,
        **({'compute_dtype': args.compute_dtype}
           if args.compute_dtype else {}))
    flow = _dealias(ContinuousFlow.create(
        dynamics, trace_estimator='hutchinson', solver='rk4',
        n_steps=args.steps, regularization=True))

    optimizer = optax.adamw(1e-4)
    trainable, _ = partition(flow)
    opt_state = optimizer.init(trainable)
    x = 0.5 * jax.random.normal(jax.random.key(1), (batch, dim), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(flow, opt_state, x):
        def loss_fn(f):
            y, ldj, reg = f.forward(x)
            potential = 0.5 * jnp.sum(y ** 2, axis=-1)
            return jnp.mean(potential - ldj) + 0.01 * jnp.mean(reg)

        loss, grads = filter_value_and_grad(loss_fn)(flow)
        tr, _ = partition(flow)
        updates, new_opt_state = optimizer.update(grads, opt_state, tr)
        return apply_updates(flow, updates), new_opt_state, loss

    t0 = time.perf_counter()
    flow, opt_state, loss = train_step(flow, opt_state, x)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0

    best_dt = float('inf')
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        for _ in range(args.timed_steps):
            flow, opt_state, loss = train_step(flow, opt_state, x)
        jax.block_until_ready(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)

    frames_s = batch * args.timed_steps / best_dt
    print(f'platform={jax.devices()[0].platform} atoms={n_atoms} '
          f'batch={batch} ode_steps={args.steps} layers={args.layers} '
          f'feat={args.feat} compute_dtype={args.compute_dtype} '
          f'pairwise={args.pairwise} '
          f'compile={compile_s:.1f}s loss={float(loss):.4f} '
          f'frames/s={frames_s:.1f}')


if __name__ == '__main__':
    main()
