"""Vmapped-ensemble throughput at engine-bound batch sizes.

TFEP batches are set by the potential engine (tens to a few hundred
frames), leaving the chip far below saturation — this measures how many
independent flow replicas (seeds / hyperparameter replicas) ride along
for free when the training step is vmapped over a stacked ensemble
(tfep_tpu.nn.ensemble). Reports per-member step time vs the single-model
step at the same batch size.

Usage: python benchmarks/ensemble_bench.py [--batch 256] [--members 1,2,4,8,16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=256)
    parser.add_argument('--members', type=str, default='1,2,4,8,16')
    parser.add_argument('--n-maf-layers', type=int, default=6)
    parser.add_argument('--n-bins', type=int, default=8)
    parser.add_argument('--n-atoms', type=int, default=32)
    parser.add_argument('--force-cpu-devices', type=int, default=0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    if args.force_cpu_devices:
        # Must land in XLA_FLAGS before backend init (same pattern as the
        # sibling benchmarks), or the device count is silently ignored.
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '')
            + f' --xla_force_host_platform_device_count='
              f'{args.force_cpu_devices}').strip()
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tfep_bench')
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from bench import _steady_state_best
    from tfep_tpu.app.trainer import _dealias
    from tfep_tpu.nn.conditioners.made import generate_degrees
    from tfep_tpu.nn.ensemble import (
        ensemble_init, make_ensemble_train_step, stack_modules,
    )
    from tfep_tpu.nn.flows import MAF, SequentialFlow
    from tfep_tpu.nn.module import partition
    from tfep_tpu.nn.transformers.spline import NeuralSplineTransformer

    dim = args.n_atoms * 3

    def build_flow(seed):
        keys = jax.random.split(jax.random.key(seed), args.n_maf_layers)
        layers = []
        for i in range(args.n_maf_layers):
            transformer = NeuralSplineTransformer.create(
                x0=-3.0 * jnp.ones(dim, jnp.float32),
                xf=3.0 * jnp.ones(dim, jnp.float32), n_bins=args.n_bins)
            layers.append(MAF.create(
                keys[i], generate_degrees(
                    dim, order='ascending' if i % 2 == 0 else 'descending'),
                transformer=transformer, dtype=jnp.float32))
        return _dealias(SequentialFlow.create(*layers))

    def loss_fn(flow, x):
        y, ldj = flow.forward(x)
        return jnp.mean(0.5 * jnp.sum(y ** 2, axis=-1) - ldj)

    optimizer = optax.adamw(1e-4)
    x = jax.random.normal(jax.random.key(99), (args.batch, dim),
                          jnp.float32)

    results = []
    single_member_s = None
    for k in (int(s) for s in args.members.split(',')):
        stacked = stack_modules([build_flow(i) for i in range(k)])
        opt_state = ensemble_init(optimizer, stacked)
        step = jax.jit(make_ensemble_train_step(loss_fn, optimizer),
                       donate_argnums=(0, 1))

        stacked, opt_state, losses = step(stacked, opt_state, x)
        jax.block_until_ready(losses)

        n_steps = 20
        state = [stacked, opt_state]

        def run_block():
            s, o = state
            for _ in range(n_steps):
                s, o, losses = step(s, o, x)
            jax.block_until_ready(losses)
            state[:] = [s, o]

        # units = member-steps per block
        member_steps_per_s = _steady_state_best(run_block, k * n_steps,
                                                budget_s=45.0)
        step_ms = k * 1e3 / member_steps_per_s
        if k == 1:
            single_member_s = member_steps_per_s
        eff = (member_steps_per_s / single_member_s
               if single_member_s else float('nan'))
        results.append((k, step_ms, member_steps_per_s, eff))
        print(f'members={k:3d} step={step_ms:8.3f} ms '
              f'member-steps/s={member_steps_per_s:10.1f} '
              f'scaling-vs-1={eff:6.2f}x', flush=True)

    print('platform=' + jax.devices()[0].platform,
          f'batch={args.batch}',
          'summary=' + ';'.join(f'{k}:{e:.2f}x' for k, _, _, e in results))


if __name__ == '__main__':
    main()
