"""Production-scale MixedMAFMap throughput: a solvated ligand system.

Times the flagship training step at a realistic solvated-system size
(BASELINE config 2 scale): a bonded ligand chain plus hundreds of water
fragments, all mapped through the automatic per-fragment Z-matrix and the
level-scheduled NeRF reconstruction. Reports host-side setup time (graph
BFS + dataset pass) and device step throughput. The MADE widths are
capped explicitly — at D ≈ 2700 DOF the auto width (~sqrt(D * D*K)) would
not fit one chip's HBM with AdamW moments.

Usage: python benchmarks/solvated_bench.py [--waters 293] [--batch 256]
       [--n-maf-layers 2] [--hidden N] [--n-bins 5]
       [--force-cpu-devices N]
"""

import argparse
import os
import sys
import time

import numpy as np


def build_solvated_system(n_waters: int, n_frames: int, seed: int = 0):
    """A 21-atom bent ligand chain + n_waters TIP3-like fragments."""
    from tfep_tpu.io.topology import Topology
    from tfep_tpu.io.traj import System

    rng = np.random.default_rng(seed)

    # Ligand: a strongly bent helix chain (no collinear triplets).
    n_lig = 21
    turns = np.arange(n_lig) * 1.2
    ligand = np.stack([1.5 * np.cos(turns), 1.5 * np.sin(turns),
                       0.3 * np.arange(n_lig)], axis=1)
    names = [f'C{i}' for i in range(n_lig)]
    elements = ['C'] * n_lig
    bonds = [(i, i + 1) for i in range(n_lig - 1)]

    # Waters on a jittered cubic lattice around the ligand.
    n_side = int(np.ceil(n_waters ** (1 / 3)))
    grid = np.stack(np.meshgrid(*[np.arange(n_side)] * 3),
                    axis=-1).reshape(-1, 3)[:n_waters] * 3.1 - 1.5 * n_side
    water_geo = np.array([[0.0, 0.0, 0.0], [0.9572, 0.0, 0.0],
                          [-0.2399, 0.9266, 0.0]])
    waters = (grid[:, None, :] + water_geo[None]).reshape(-1, 3)
    for w in range(n_waters):
        base = n_lig + 3 * w
        names += [f'OW{w}', f'HW{2 * w}', f'HW{2 * w + 1}']
        elements += ['O', 'H', 'H']
        bonds += [(base, base + 1), (base, base + 2)]

    coords = np.concatenate([ligand, waters])
    positions = coords[None] + 0.04 * rng.normal(
        size=(n_frames, len(coords), 3))
    topology = Topology(names=names, elements=elements, bonds=bonds)
    return System(topology, positions.astype(np.float32))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--waters', type=int, default=293,
                        help='21 + 3*293 = 900 atoms by default')
    parser.add_argument('--batch', type=int, default=256)
    parser.add_argument('--n-maf-layers', type=int, default=2)
    parser.add_argument('--hidden', type=int, default=None,
                        help='explicit MADE hidden width (one hidden layer); '
                             'default: the smallest lane-aligned width MADE '
                             'accepts (hidden >= embedded relevant inputs)')
    parser.add_argument('--n-bins', type=int, default=5)
    parser.add_argument('--timed-steps', type=int, default=5)
    parser.add_argument('--rounds', type=int, default=3)
    parser.add_argument('--roofline', action='store_true',
                        help='Also report XLA-counted FLOPs/step and the '
                             'bytes-accessed upper bound of the compiled '
                             'step (cf. benchmarks/roofline.py).')
    parser.add_argument('--optimizer', type=str, default='adamw',
                        choices=('adamw', 'adafactor', 'sgd'),
                        help='adamw is the tracked default; adafactor '
                             '(factored second moments) and sgd bound the '
                             'optimizer-state HBM traffic, which is a '
                             'large share of the step at 258M params.')
    parser.add_argument('--no-weight-norm', dest='weight_norm',
                        action='store_false', default=True,
                        help='Disable masked weight normalization (the '
                             'reference-paritied weight_norm=False '
                             'option). At this scale the per-step '
                             'normalization chain makes several full '
                             'passes over the 258M weights and dominates '
                             'the step; see docs/PERFORMANCE.md.')
    parser.add_argument('--compute-dtype', type=str, default=None,
                        help="Mixed-precision matmul policy for the MADE "
                             "stacks (e.g. 'bfloat16'); parameters stay "
                             "f32. Off by default: the tracked metric is "
                             "the f32 step.")
    parser.add_argument('--force-cpu-devices', type=int, default=0)
    args = parser.parse_args()
    if args.timed_steps < 1:
        parser.error('--timed-steps must be >= 1 (each timed block runs '
                     'that many training steps).')

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
    from tfep_tpu.app import MixedMAFMap
    from tfep_tpu.app.trainer import _dealias
    from tfep_tpu.nn.module import (
        apply_updates, filter_value_and_grad, partition, n_parameters,
    )
    from tfep_tpu.units import ureg

    n_atoms = 21 + 3 * args.waters
    t0 = time.time()
    system = build_solvated_system(args.waters, n_frames=args.batch)
    t_system = time.time() - t0

    class HarmonicPotential:
        """Bounded-below toy target (kT units): loss stays finite at any
        setting, so a nan here means a numeric bug rather than the
        unbounded runaway a linear toy potential invites. Cost is one
        elementwise pass per frame — timing-neutral."""
        energy_unit = None

        def __call__(self, x, cell=None):
            return 0.05 * jnp.sum(x ** 2, axis=-1)

    if args.hidden is None:
        # MADE requires the hidden width to cover every relevant (embedded)
        # input degree: all DOFs plus one extra slot per torsion from the
        # periodic cos/sin lift. Round up to the 128-lane width.
        n_torsions = 21 - 3  # ligand-chain Z-matrix rows; waters have none
        n_embedded = 3 * n_atoms + n_torsions
        args.hidden = -(-n_embedded // 128) * 128

    t0 = time.time()
    tfep_map = MixedMAFMap(
        potential_energy_func=HarmonicPotential(),
        temperature=300.0 * ureg.kelvin,
        system=system, batch_size=args.batch,
        tfep_logger_dir_path=None,
        n_maf_layers=args.n_maf_layers, n_bins=args.n_bins,
        flow_kwargs={'hidden_layers': [args.hidden],
                     'weight_norm': args.weight_norm,
                     **({'compute_dtype': args.compute_dtype}
                        if args.compute_dtype else {})})
    tfep_map.setup()
    t_setup = time.time() - t0

    flow = _dealias(tfep_map.flow)
    n_params = n_parameters(flow)
    optimizer = {'adamw': lambda: optax.adamw(1e-4),
                 'adafactor': lambda: optax.adafactor(1e-4),
                 'sgd': lambda: optax.sgd(1e-4)}[args.optimizer]()
    trainable, _ = partition(flow)
    opt_state = optimizer.init(trainable)
    batch = {k: jnp.asarray(v) for k, v in tfep_map.dataset.get_batch(
        list(range(args.batch))).items()}

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(flow, opt_state, batch):
        (loss, _), grads = filter_value_and_grad(
            lambda f: tfep_map.training_step_fn(f, batch),
            has_aux=True)(flow)
        tr, _ = partition(flow)
        updates, new_opt_state = optimizer.update(grads, opt_state, tr)
        return apply_updates(flow, updates), new_opt_state, loss

    t0 = time.time()
    flow, opt_state, loss = train_step(flow, opt_state, batch)
    jax.block_until_ready(loss)
    t_compile = time.time() - t0

    roofline = None
    if args.roofline:
        # XLA's cost analysis of the exact compiled step: counted FLOPs
        # plus the logical bytes-accessed upper bound, so the
        # parameter-traffic-bound claim in docs/PERFORMANCE.md is
        # checkable from the record rather than inferred from knob
        # deltas (same caveats as benchmarks/roofline.py: bytes accessed
        # upper-bounds HBM traffic; f32 matmul peak is ~1/4 of bf16).
        cost = train_step.lower(flow, opt_state, batch).compile() \
            .cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else None
        if cost:
            roofline = {'flops_per_step': float(cost.get('flops', 0.0)),
                        'bytes_accessed_upper_bound':
                            float(cost.get('bytes accessed', 0.0))}
        else:
            print('roofline: cost analysis unavailable on this backend')

    # Adaptive steady-state best-of, shared with every bench.py stage so
    # the tracked metrics stay protocol-comparable (the repo root is
    # already on sys.path, inserted above before the tfep_tpu imports).
    from bench import _steady_state_best

    state = [flow, opt_state]
    loss_box = [None]

    def run_block():
        f, o = state
        for _ in range(args.timed_steps):
            f, o, loss = train_step(f, o, batch)
        jax.block_until_ready(loss)
        state[:] = [f, o]
        loss_box[0] = loss

    frames_per_s = _steady_state_best(run_block,
                                      args.batch * args.timed_steps,
                                      min_blocks=args.rounds)
    flow, opt_state = state
    loss = loss_box[0]
    print(f'platform={jax.devices()[0].platform} atoms={n_atoms} '
          f'dof={3 * n_atoms} batch={args.batch} '
          f'maf_layers={args.n_maf_layers} hidden={args.hidden} '
          f'n_bins={args.n_bins} params={n_params / 1e6:.1f}M '
          f'system_build={t_system:.1f}s zmatrix_setup={t_setup:.1f}s '
          f'compile={t_compile:.1f}s loss={float(loss):.4f} '
          f'frames/s={frames_per_s:.1f}')
    if roofline is not None:
        step_s = args.batch / frames_per_s
        print(f'roofline: flops/step={roofline["flops_per_step"]:.3e} '
              f'sustained_tflop_s='
              f'{roofline["flops_per_step"] / step_s / 1e12:.2f} '
              f'bytes_accessed_upper_bound='
              f'{roofline["bytes_accessed_upper_bound"]:.3e} '
              f'implied_gb_s_upper_bound='
              f'{roofline["bytes_accessed_upper_bound"] / step_s / 1e9:.0f}')


if __name__ == '__main__':
    main()
