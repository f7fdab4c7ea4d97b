"""Weak-scaling benchmark: frames/s at 1..N devices (frames-axis DP).

Measures the flagship spline-MAF training step with the per-device batch
held fixed while devices are added (weak scaling): parameters replicated,
frames sharded over the mesh, XLA inserting the gradient psum. On a real
pod slice this reports multi-chip ICI scaling; on a single-chip host run it
can exercise the sharding path over virtual CPU devices with
``--force-cpu-devices N`` (scaling *shape* only — absolute numbers then
reflect the host CPU).

Usage:
    python benchmarks/weak_scaling.py [--per-device-batch 4096]
        [--force-cpu-devices 8]

Prints one JSON line per device count with the weak-scaling efficiency
relative to 1 device.
"""

import argparse
import json
import os
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--per-device-batch', type=int, default=4096)
    parser.add_argument(
        '--global-batch', type=int, default=None,
        help='Strong-scaling mode: hold the GLOBAL batch fixed at this '
             'size for every device count (total work constant). On '
             'shared-host virtual devices the 1-vs-N throughput ratio '
             'then isolates GSPMD partitioning cost (reads >1 when '
             'partitioned execution uses the host cores better than '
             'single-device intra-op threading; regression = collapse), '
             'instead of the core-saturation number weak scaling gives.')
    parser.add_argument('--n-atoms', type=int, default=32)
    parser.add_argument('--n-layers', type=int, default=6)
    parser.add_argument('--n-bins', type=int, default=8)
    parser.add_argument('--steps', type=int, default=10)
    parser.add_argument(
        '--rounds', type=int, default=1,
        help='Best-of-N timing rounds per device count. The canary ratio '
             'divides two measurements, so BOTH sides need the same '
             'noise rejection — a noisy 1-device denominator once made '
             'the 8-device ratio read 1.114 (above ideal).')
    parser.add_argument(
        '--device-counts', type=str, default=None,
        help='Comma-separated device counts to measure (default: powers '
             'of two up to the available devices). The bench canary '
             'passes "1,8" — it only consumes those two points, and '
             'measuring 2/4 as well would waste most of its stage '
             'budget.')
    parser.add_argument('--force-cpu-devices', type=int, default=None)
    args = parser.parse_args()

    if args.force_cpu_devices:
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '')
            + f' --xla_force_host_platform_device_count='
              f'{args.force_cpu_devices}')

    import jax
    if args.force_cpu_devices:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tfep_tpu.nn.conditioners.made import generate_degrees
    from tfep_tpu.nn.flows import MAF, SequentialFlow
    from tfep_tpu.nn.module import (
        apply_updates, filter_value_and_grad, partition,
    )
    from tfep_tpu.nn.transformers import NeuralSplineTransformer
    from tfep_tpu.parallel.sharding import (
        make_mesh, replicate, shard_batch,
    )

    dim = args.n_atoms * 3
    keys = jax.random.split(jax.random.key(0), args.n_layers)
    layers = []
    for i in range(args.n_layers):
        transformer = NeuralSplineTransformer.create(
            x0=-3.0 * jnp.ones(dim, jnp.float32),
            xf=3.0 * jnp.ones(dim, jnp.float32), n_bins=args.n_bins)
        layers.append(MAF.create(
            keys[i], generate_degrees(
                dim, order='ascending' if i % 2 == 0 else 'descending'),
            transformer=transformer, dtype=jnp.float32))
    flow0 = SequentialFlow.create(*layers)
    optimizer = optax.adamw(1e-4)

    n_available = len(jax.devices())
    if args.device_counts:
        device_counts = [int(n) for n in args.device_counts.split(',')
                         if int(n) <= n_available]
    else:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32)
                         if n <= n_available]

    baseline = None
    for n_devices in device_counts:
        mesh = make_mesh(n_devices)
        flow = replicate(flow0, mesh)
        trainable, _ = partition(flow)
        opt_state = replicate(optimizer.init(trainable), mesh)

        if args.global_batch is not None:
            if args.global_batch % n_devices:
                continue
            batch = args.global_batch
        else:
            batch = args.per_device_batch * n_devices
        x = jax.random.normal(jax.random.key(1), (batch, dim), jnp.float32)
        x = shard_batch({'x': x}, mesh)['x']

        @jax.jit
        def train_step(flow, opt_state, x):
            def loss_fn(f):
                y, ldj = f.forward(x)
                return jnp.mean(0.5 * jnp.sum(y ** 2, axis=-1) - ldj)

            loss, grads = filter_value_and_grad(loss_fn)(flow)
            tr, _ = partition(flow)
            updates, new_opt = optimizer.update(grads, opt_state, tr)
            return apply_updates(flow, updates), new_opt, loss

        flow, opt_state, loss = train_step(flow, opt_state, x)
        jax.block_until_ready(loss)
        dt = float('inf')
        for _ in range(max(1, args.rounds)):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                flow, opt_state, loss = train_step(flow, opt_state, x)
            jax.block_until_ready(loss)
            dt = min(dt, time.perf_counter() - t0)
        frames_per_s = batch * args.steps / dt
        per_chip = frames_per_s / n_devices
        record = {
            'n_devices': n_devices,
            'frames_per_s': round(frames_per_s, 1),
            'frames_per_s_per_chip': round(per_chip, 1),
        }
        if args.global_batch is not None:
            # Strong scaling: total work is constant, so the total
            # throughput ratio vs 1 device is the partitioning cost.
            if baseline is None:
                baseline = frames_per_s
            record['relative_throughput'] = round(frames_per_s / baseline, 3)
        else:
            if baseline is None:
                baseline = per_chip
            record['weak_scaling_efficiency'] = round(per_chip / baseline, 3)
        if args.force_cpu_devices:
            # Virtual devices share the host's physical cores, so total
            # throughput saturates and weak-scaling per-chip efficiency
            # MUST drop with device count — on virtual devices prefer
            # --global-batch, whose relative_throughput isolates GSPMD
            # partitioning cost instead (>1 = partitioning uses the
            # cores better than intra-op threading; collapse = bug).
            record['virtual_devices'] = True
            record['note'] = ('shared-host CPU: weak-scaling efficiency '
                              'reflects core saturation, not ICI scaling')
        print(json.dumps(record), flush=True)


if __name__ == '__main__':
    main()
