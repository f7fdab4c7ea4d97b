"""StatefulBatchSampler unit tests (the reference tests these directly,
tests/io/test_sampler.py; round 1 covered them only via app-level resume).
"""

import numpy as np
import pytest

from tfep_tpu.io.sampler import StatefulBatchSampler


class MockTrainer:
    def __init__(self, global_step=0):
        self.global_step = global_step


def collect(sampler):
    return [batch.tolist() for batch in sampler]


def test_requires_trainer():
    sampler = StatefulBatchSampler(list(range(4)), batch_size=2)
    with pytest.raises(RuntimeError, match='trainer'):
        next(iter(sampler))


def test_len_and_drop_last():
    data = list(range(10))
    assert len(StatefulBatchSampler(data, batch_size=3)) == 4
    assert len(StatefulBatchSampler(data, batch_size=3, drop_last=True)) == 3
    assert len(StatefulBatchSampler(data, batch_size=5)) == 2


def test_sequential_batches_without_shuffle():
    sampler = StatefulBatchSampler(list(range(7)), batch_size=3,
                                   trainer=MockTrainer())
    assert collect(sampler) == [[0, 1, 2], [3, 4, 5], [6]]


def test_shuffle_permutation_covers_epoch():
    sampler = StatefulBatchSampler(list(range(12)), batch_size=4,
                                   shuffle=True, trainer=MockTrainer())
    batches = collect(sampler)
    flat = [i for b in batches for i in b]
    assert sorted(flat) == list(range(12))


def test_mid_epoch_resume_replays_same_permutation():
    """A resumed sampler with the stored seed yields exactly the batches the
    crashed run did not visit."""
    n, batch_size = 12, 4
    trainer = MockTrainer()
    sampler = StatefulBatchSampler(list(range(n)), batch_size=batch_size,
                                   shuffle=True, trainer=trainer)
    # Crash after 1 of 3 batches.
    it = iter(sampler)
    first = next(it).tolist()
    trainer.global_step = 1
    state = sampler.state_dict()

    resumed = StatefulBatchSampler(list(range(n)), batch_size=batch_size,
                                   shuffle=True,
                                   trainer=MockTrainer(global_step=1))
    resumed.load_state_dict(state)
    rest = collect(resumed)
    flat = first + [i for b in rest for i in b]
    assert len(rest) == 2
    assert sorted(flat) == list(range(n))
    assert len(set(flat)) == n  # no repeats across the crash


def test_new_epoch_draws_new_seed():
    trainer = MockTrainer()
    sampler = StatefulBatchSampler(list(range(64)), batch_size=8,
                                   shuffle=True, trainer=trainer)
    first_epoch = collect(sampler)
    seed1 = sampler.state_dict()['current_epoch_seed']
    # Next epoch (global_step back to a multiple of n_batches).
    trainer.global_step = len(sampler)
    second_epoch = collect(sampler)
    seed2 = sampler.state_dict()['current_epoch_seed']
    assert seed1 != seed2
    assert first_epoch != second_epoch  # same would be astronomically unlikely


def test_resume_at_epoch_boundary_starts_fresh():
    trainer = MockTrainer(global_step=3)  # exactly one epoch of 3 batches
    sampler = StatefulBatchSampler(list(range(9)), batch_size=3,
                                   shuffle=True, trainer=trainer)
    sampler.load_state_dict({'current_epoch_seed': 1234})
    batches = collect(sampler)
    assert len(batches) == 3  # full new epoch, stored seed replaced


def test_shuffle_seed_reproducible_across_runs():
    """With shuffle_seed set, two independent samplers replay the same
    multi-epoch batch-order sequence (run-to-run reproducibility); with
    it unset, two runs draw different orders (the reference's OS-entropy
    behavior)."""
    def run_epochs(shuffle_seed, n_epochs=3):
        trainer = MockTrainer()
        sampler = StatefulBatchSampler(
            list(range(12)), batch_size=4, shuffle=True, trainer=trainer,
            shuffle_seed=shuffle_seed)
        orders = []
        for _ in range(n_epochs):
            epoch = collect(sampler)
            trainer.global_step += len(sampler)
            orders.append(epoch)
        return orders

    assert run_epochs(123) == run_epochs(123)
    assert run_epochs(123) != run_epochs(124)
    # Distinct epochs of one seeded run still differ from each other.
    orders = run_epochs(123)
    assert orders[0] != orders[1] != orders[2]
    # Unseeded runs are independent draws (equal only with prob ~1/12!^3).
    assert run_epochs(None) != run_epochs(None)


def test_shuffle_seed_mid_epoch_resume():
    """Seeded shuffling keeps the checkpoint contract: a resumed sampler
    (restored epoch seed + the trainer's global step) yields exactly the
    unvisited batches of the interrupted epoch."""
    trainer = MockTrainer()
    sampler = StatefulBatchSampler(list(range(12)), batch_size=4,
                                   shuffle=True, trainer=trainer,
                                   shuffle_seed=42)
    full_epoch = collect(sampler)
    state = sampler.state_dict()

    resumed_trainer = MockTrainer(global_step=1)   # crashed after batch 0
    resumed = StatefulBatchSampler(list(range(12)), batch_size=4,
                                   shuffle=True, trainer=resumed_trainer,
                                   shuffle_seed=42)
    resumed.load_state_dict(state)
    assert collect(resumed) == full_epoch[1:]


def test_shuffle_seed_rejects_negative():
    with pytest.raises(ValueError, match='non-negative'):
        StatefulBatchSampler(list(range(4)), batch_size=2, shuffle=True,
                             shuffle_seed=-1)


def test_shuffle_seed_mid_epoch_without_state_dict():
    """A seeded sampler started mid-epoch with only global_step restored
    recomputes the epoch seed from (shuffle_seed, epoch) and replays the
    interrupted epoch's permutation exactly."""
    trainer = MockTrainer()
    sampler = StatefulBatchSampler(list(range(12)), batch_size=4,
                                   shuffle=True, trainer=trainer,
                                   shuffle_seed=42)
    full_epoch = collect(sampler)

    bare = StatefulBatchSampler(list(range(12)), batch_size=4,
                                shuffle=True,
                                trainer=MockTrainer(global_step=1),
                                shuffle_seed=42)  # no load_state_dict
    assert collect(bare) == full_epoch[1:]
