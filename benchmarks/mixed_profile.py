"""Decompose the MixedMAFMap training-step cost on the chip.

Answers "where does the mixed step's time go?" by timing, at the bench
configuration (32-atom chain, batch 4096, 6 spline-MAF layers):

  1. the full mixed train step (bench.bench_mixed_jax's step),
  2. the same MAF stack driven directly with precomputed mixed
     coordinates (no conversion) — isolating the flow cost,
  3. cartesian_to_mixed alone, forward and forward+backward,
  4. mixed_to_cartesian (NeRF reconstruction) alone, fwd and fwd+bwd,

plus XLA cost-analysis FLOP/byte counts for the conversion pieces, which
give the roofline bound for the conversion residual.

Usage: python benchmarks/mixed_profile.py [--batch 4096] [--steps 20]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np


def _time(fn, *args, steps=20, rounds=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=4096)
    parser.add_argument('--steps', type=int, default=20)
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
    import bench
    from tfep_tpu.nn.module import (
        apply_updates, filter_value_and_grad, partition,
    )

    bench.BATCH = args.batch

    # Reuse the bench's map construction (same 32-atom chain).
    # bench_mixed_jax builds and times internally; rebuild its pieces here.
    from tfep_tpu.app import MixedMAFMap
    from tfep_tpu.app.trainer import _dealias
    from tfep_tpu.io.topology import Topology
    from tfep_tpu.io.traj import System
    from tfep_tpu.units import ureg

    N_ATOMS = bench.N_ATOMS
    rng = np.random.default_rng(0)
    turns = np.arange(N_ATOMS) * 1.2
    base = np.stack([1.5 * np.cos(turns), 1.5 * np.sin(turns),
                     0.3 * np.arange(N_ATOMS)], axis=1)
    positions = base[None] + 0.05 * rng.normal(size=(args.batch, N_ATOMS, 3))
    topology = Topology(
        names=[f'C{i}' for i in range(N_ATOMS)],
        elements=['C'] * N_ATOMS,
        bonds=[(i, i + 1) for i in range(N_ATOMS - 1)])
    system = System(topology, positions.astype(np.float32))

    class SumPotential:
        energy_unit = None

        def __call__(self, x, cell=None):
            return jnp.sum(x, axis=-1)

    tfep_map = MixedMAFMap(
        potential_energy_func=SumPotential(),
        temperature=300.0 * ureg.kelvin,
        system=system, batch_size=args.batch,
        tfep_logger_dir_path=None,
        n_maf_layers=bench.N_MAF_LAYERS, n_bins=bench.N_BINS)
    tfep_map.setup()

    conversion = _dealias(tfep_map.flow)       # CartesianToMixedFlow
    inner_flow = conversion.flow               # the MAF stack
    optimizer = optax.adamw(1e-4)

    batch = {k: jnp.asarray(v) for k, v in tfep_map.dataset.get_batch(
        list(range(args.batch))).items()}
    x = batch['positions']

    schedule_levels = int(conversion.placement_schedule[0].shape[0])
    print(f'n_atoms={N_ATOMS} n_ic={conversion.n_ic_atoms} '
          f'placement_levels={schedule_levels} batch={args.batch} '
          f'platform={jax.devices()[0].platform}')

    # ---------------- 1. full train step -------------------------------- #
    trainable, _ = partition(conversion)
    opt_state = optimizer.init(trainable)

    @jax.jit
    def full_step(flow, opt_state, batch):
        (loss, _), grads = filter_value_and_grad(
            lambda f: tfep_map.training_step_fn(f, batch),
            has_aux=True)(flow)
        tr, _ = partition(flow)
        updates, new_opt = optimizer.update(grads, opt_state, tr)
        return apply_updates(flow, updates), new_opt, loss

    t_full = _time(lambda: full_step(conversion, opt_state, batch)[2],
                   steps=args.steps)

    # ---------------- 2. MAF-only step (precomputed mixed coords) ------- #
    y_mixed, _, _, _ = jax.jit(conversion.cartesian_to_mixed)(x)
    y_mixed = jax.block_until_ready(y_mixed)
    tr_inner, _ = partition(inner_flow)
    opt_inner = optimizer.init(tr_inner)

    @jax.jit
    def maf_step(flow, opt_state, y):
        def loss_fn(f):
            z, ldj = f.forward(y)
            return jnp.mean(jnp.sum(z, axis=-1) / tfep_map.kT - ldj)

        loss, grads = filter_value_and_grad(loss_fn)(flow)
        tr, _ = partition(flow)
        updates, new_opt = optimizer.update(grads, opt_state, tr)
        return apply_updates(flow, updates), new_opt, loss

    t_maf = _time(lambda: maf_step(inner_flow, opt_inner, y_mixed)[2],
                  steps=args.steps)

    # ---------------- 3/4. conversion pieces ---------------------------- #
    c2m = jax.jit(lambda z: conversion.cartesian_to_mixed(z)[:2])
    t_c2m_fwd = _time(c2m, x, steps=args.steps)

    c2m_grad = jax.jit(jax.grad(
        lambda z: (conversion.cartesian_to_mixed(z)[0].sum()
                   + conversion.cartesian_to_mixed(z)[1].sum())))
    t_c2m_bwd = _time(c2m_grad, x, steps=args.steps)

    _, _, origin, rotation = jax.block_until_ready(
        jax.jit(conversion.cartesian_to_mixed)(x))

    m2c = jax.jit(lambda y, o, r: conversion.mixed_to_cartesian(y, o, r))
    t_m2c_fwd = _time(m2c, y_mixed, origin, rotation, steps=args.steps)

    m2c_grad = jax.jit(jax.grad(
        lambda y, o, r: (conversion.mixed_to_cartesian(y, o, r)[0].sum()
                         + conversion.mixed_to_cartesian(y, o, r)[1].sum())))
    t_m2c_bwd = _time(m2c_grad, y_mixed, origin, rotation, steps=args.steps)

    # ---------------- XLA cost analysis of the conversion --------------- #
    def cost(fn, *a):
        c = jax.jit(fn).lower(*a).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return (c or {}).get('flops', 0), (c or {}).get('bytes accessed', 0)

    c2m_flops, c2m_bytes = cost(lambda z: conversion.cartesian_to_mixed(z)[:2], x)
    m2c_flops, m2c_bytes = cost(
        lambda y, o, r: conversion.mixed_to_cartesian(y, o, r),
        y_mixed, origin, rotation)

    frames = args.batch
    print(f'full_step      {t_full * 1e3:8.3f} ms  '
          f'{frames / t_full:12.0f} frames/s')
    print(f'maf_only_step  {t_maf * 1e3:8.3f} ms  '
          f'{frames / t_maf:12.0f} frames/s')
    print(f'conversion residual (full - maf): '
          f'{(t_full - t_maf) * 1e3:8.3f} ms '
          f'({100 * (t_full - t_maf) / t_full:.1f}% of step)')
    print(f'c2m fwd  {t_c2m_fwd * 1e3:7.3f} ms   c2m fwd+bwd '
          f'{t_c2m_bwd * 1e3:7.3f} ms')
    print(f'm2c fwd  {t_m2c_fwd * 1e3:7.3f} ms   m2c fwd+bwd '
          f'{t_m2c_bwd * 1e3:7.3f} ms')
    print(f'c2m cost: {c2m_flops / 1e6:.1f} MFLOP, '
          f'{c2m_bytes / 1e6:.1f} MB accessed '
          f'-> bandwidth bound {c2m_bytes / 819e9 * 1e6:.1f} us')
    print(f'm2c cost: {m2c_flops / 1e6:.1f} MFLOP, '
          f'{m2c_bytes / 1e6:.1f} MB accessed '
          f'-> bandwidth bound {m2c_bytes / 819e9 * 1e6:.1f} us')
    print(f'per-level m2c fwd time: '
          f'{t_m2c_fwd / schedule_levels * 1e6:.1f} us/level over '
          f'{schedule_levels} sequential levels')


if __name__ == '__main__':
    main()
