"""Roofline check: how close is a tracked training step to the hardware?

Compiles a tracked training step (the exact programs bench.py times — the
headline spline-MAF step by default, the CNF/EGNN step with ``--step cnf``),
pulls the compiled executable's FLOP count from XLA's cost analysis,
times the step, and reports sustained FLOP/s against the chip's matmul peak.

Two caveats printed with the numbers, so they are read as what they are:

* XLA's ``bytes accessed`` counts logical operand traffic, much of which
  stays in VMEM/registers after fusion — it upper-bounds HBM traffic rather
  than measuring it, so the memory-roof column is an upper bound on pressure.
* Peak FLOP/s depends on dtype; the step is float32, and f32 matmuls run the
  MXU at roughly a quarter of its bf16 rate. Peaks for known platforms are
  tabled below; unknown platforms report absolute FLOP/s only.

Usage:
    python benchmarks/roofline.py [--step spline|cnf]

Run each step in its OWN process (one invocation per step): the remote
compile tunnel degrades executables compiled later in a process's
lifetime (see bench.py _run_stage).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (matmul peak TFLOP/s by dtype, HBM GB/s). Public spec-sheet numbers.
PEAKS = {
    'v5e': {'bf16': 197.0, 'f32': 49.0, 'hbm_gb_s': 819.0},
    'v4': {'bf16': 275.0, 'f32': 69.0, 'hbm_gb_s': 1228.0},
}


def main():
    import jax

    import bench

    parser = argparse.ArgumentParser()
    parser.add_argument('--step', choices=['spline', 'cnf'],
                        default='spline')
    args = parser.parse_args()

    if args.step == 'spline':
        step_name = 'neural-spline MAF train step (bench.py headline config)'
        train_step, flow, opt_state, x = bench.build_spline_maf_train_step()
    else:
        step_name = 'CNF/EGNN train step (bench.py cnf config: batch 512, ' \
                    'rk4 x 8, Hutchinson trace)'
        train_step, flow, opt_state, x = bench.build_cnf_train_step()

    compiled = train_step.lower(flow, opt_state, x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get('flops', 0.0))
    bytes_accessed = float(cost.get('bytes accessed', 0.0))

    # Warmup + best-of-N timing (same protocol as bench.py; the tunnel is
    # noisy, so take the fastest round). Time the AOT-compiled executable
    # itself so the numbers match the exact program whose FLOP count was
    # extracted (lower().compile() does not populate the jit call cache).
    flow, opt_state, loss = compiled(flow, opt_state, x)
    jax.block_until_ready(loss)
    best_dt = float('inf')
    for _ in range(bench.N_ROUNDS):
        t0 = time.perf_counter()
        for _ in range(bench.N_TIMED_STEPS):
            flow, opt_state, loss = compiled(flow, opt_state, x)
        jax.block_until_ready(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)
    step_s = best_dt / bench.N_TIMED_STEPS

    tflops_sustained = flops / step_s / 1e12
    record = {
        'step': step_name,
        'platform': jax.devices()[0].platform,
        'device': str(jax.devices()[0]),
        'flops_per_step': flops,
        'bytes_accessed_per_step_upper_bound': bytes_accessed,
        'step_ms': round(step_s * 1e3, 3),
        'sustained_tflop_s': round(tflops_sustained, 2),
    }
    gen = os.environ.get('PALLAS_AXON_TPU_GEN', '').lower()
    peaks = PEAKS.get(gen)
    if peaks is not None:
        record['f32_matmul_peak_tflop_s'] = peaks['f32']
        record['fraction_of_f32_peak'] = round(
            tflops_sustained / peaks['f32'], 3)
        record['hbm_bytes_per_s_upper_bound_vs_peak'] = round(
            bytes_accessed / step_s / 1e9 / peaks['hbm_gb_s'], 2)
    print(json.dumps(record))


if __name__ == '__main__':
    main()
