"""Benchmark: TFEP training throughput (trajectory frames/s/chip).

Times the flagship training step (Cartesian MAF map: flow forward +
potential + KL loss + grad + AdamW update) on the available accelerator and
compares against an equivalent PyTorch implementation of the same model/step
(the reference framework is pure PyTorch, SURVEY §0) run on CPU in this
image. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": R}
"""

import json
import os
import sys
import time

import numpy as np

N_ATOMS = 32          # 96 DOFs
BATCH = 4096
N_MAF_LAYERS = 6
N_TIMED_STEPS = 20
TORCH_TIMED_STEPS = 3


def bench_jax():
    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as g
    from tfep_tpu.nn.module import (
        apply_updates, filter_value_and_grad, partition,
    )

    tfep_map = g._build_toy_map(
        n_atoms=N_ATOMS, n_frames=BATCH, batch_size=BATCH,
        n_maf_layers=N_MAF_LAYERS)
    flow = tfep_map.flow
    optimizer = optax.adamw(1e-4)
    trainable, _ = partition(flow)
    opt_state = optimizer.init(trainable)

    batch = tfep_map.dataset.get_batch(list(range(BATCH)))
    batch = {k: jnp.asarray(v, dtype=jnp.float32)
             if np.issubdtype(v.dtype, np.floating) else jnp.asarray(v)
             for k, v in batch.items()}
    flow = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating)
        else x, flow)

    @jax.jit
    def train_step(flow, opt_state, batch):
        (loss, aux), grads = filter_value_and_grad(
            tfep_map.training_step_fn, has_aux=True)(flow, batch)
        trainable, _ = partition(flow)
        updates, new_opt_state = optimizer.update(grads, opt_state, trainable)
        return apply_updates(flow, updates), new_opt_state, loss

    # Warmup/compile.
    flow, opt_state, loss = train_step(flow, opt_state, batch)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(N_TIMED_STEPS):
        flow, opt_state, loss = train_step(flow, opt_state, batch)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return BATCH * N_TIMED_STEPS / dt, jax.devices()[0].platform


def bench_torch_baseline():
    """Equivalent affine-MAF training step in PyTorch (CPU), same sizes."""
    import torch

    torch.manual_seed(0)
    n_dofs = N_ATOMS * 3

    class MaskedLinear(torch.nn.Linear):
        def __init__(self, n_in, n_out, mask):
            super().__init__(n_in, n_out)
            self.register_buffer('mask', mask)

        def forward(self, x):
            return torch.nn.functional.linear(
                x, self.weight * self.mask, self.bias)

    class MADE(torch.nn.Module):
        def __init__(self, degrees_in, degrees_out, width):
            super().__init__()
            hidden = torch.as_tensor(
                np.resize(np.asarray(degrees_in), width))
            d_in = torch.as_tensor(degrees_in)
            d_out = torch.as_tensor(degrees_out)
            self.l1 = MaskedLinear(len(d_in), width,
                                   (hidden[:, None] >= d_in[None, :]).float())
            self.l2 = MaskedLinear(width, width,
                                   (hidden[:, None] >= hidden[None, :]).float())
            self.l3 = MaskedLinear(width, len(d_out),
                                   (d_out[:, None] > hidden[None, :]).float())

        def forward(self, x):
            x = torch.nn.functional.elu(self.l1(x))
            x = torch.nn.functional.elu(self.l2(x))
            return self.l3(x)

    class MAFLayer(torch.nn.Module):
        def __init__(self, n, ascending):
            super().__init__()
            d = np.arange(n) if ascending else np.arange(n)[::-1].copy()
            self.made = MADE(d, np.tile(d, 2), n)

        def forward(self, x):
            p = self.made(x)
            shift, log_scale = p.chunk(2, dim=-1)
            y = x * torch.exp(log_scale) + shift
            return y, log_scale.sum(dim=-1)

    class Stack(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = torch.nn.ModuleList(
                [MAFLayer(n_dofs, i % 2 == 0) for i in range(N_MAF_LAYERS)])

        def forward(self, x):
            ldj = torch.zeros(x.shape[0])
            for l in self.layers:
                x, d = l(x)
                ldj = ldj + d
            return x, ldj

    model = Stack()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    x = torch.randn(BATCH, n_dofs)

    def step():
        opt.zero_grad()
        y, ldj = model(x)
        potential = 0.5 * (y ** 2).sum(dim=-1)
        loss = (potential - ldj).mean()
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(TORCH_TIMED_STEPS):
        step()
    dt = time.perf_counter() - t0
    return BATCH * TORCH_TIMED_STEPS / dt


def main():
    value, platform = bench_jax()
    try:
        baseline = bench_torch_baseline()
        vs_baseline = value / baseline
    except Exception:
        baseline = None
        vs_baseline = None
    print(json.dumps({
        'metric': f'trajectory frames/s/chip (affine MAF train step, '
                  f'{N_ATOMS} atoms, batch {BATCH}, {platform})',
        'value': round(value, 1),
        'unit': 'frames/s',
        'vs_baseline': round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == '__main__':
    main()
