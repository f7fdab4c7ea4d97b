"""Timestep-iteration API: the last dataset-surface parity gap.

Covers ``TrajectoryDataset.get_timestep`` / ``iterate_as_timestep`` (the
native counterpart of the reference's MDAnalysis-Timestep accessors,
/root/reference/tfep/io/dataset/traj.py:226-293), the subset delegation,
and ``Subset.from_filter`` (traj.py:452-476) — including the
dataset_sample_index remapping contract of subsets.
"""

import numpy as np

from tfep_tpu.io.dataset import Subset, TrajectorySubset
from tfep_tpu.io.topology import Topology
from tfep_tpu.io.traj import System, Timestep, TrajectoryDataset

N_FRAMES, N_ATOMS = 8, 5


def make_dataset(with_box=True, with_times=True):
    rng = np.random.default_rng(0)
    topology = Topology(names=[f'C{i}' for i in range(N_ATOMS)])
    positions = rng.normal(0, 1, size=(N_FRAMES, N_ATOMS, 3))
    dimensions = (np.tile([10.0, 11.0, 12.0, 90.0, 90.0, 90.0],
                          (N_FRAMES, 1)) if with_box else None)
    times = np.arange(N_FRAMES) * 0.5 if with_times else None
    return TrajectoryDataset(System(topology, positions,
                                    dimensions=dimensions, times=times))


def test_get_timestep_fields():
    dataset = make_dataset()
    ts = dataset.get_timestep(3)
    assert isinstance(ts, Timestep)
    assert ts.frame == 3
    assert ts.n_atoms == N_ATOMS
    np.testing.assert_allclose(ts.positions,
                               dataset.system.positions[3])
    np.testing.assert_allclose(ts.dimensions,
                               [10.0, 11.0, 12.0, 90.0, 90.0, 90.0])
    assert ts.time == 1.5
    assert 'frame=3' in repr(ts)


def test_get_timestep_without_box_or_times():
    dataset = make_dataset(with_box=False, with_times=False)
    ts = dataset.get_timestep(0)
    assert ts.dimensions is None
    # System defaults times to the frame index when none are given.
    assert ts.time == 0.0


def test_iterate_honors_subsample_and_selection():
    dataset = make_dataset()
    dataset.subsample(step=2)                  # frames 0, 2, 4, 6
    dataset.select_atoms([1, 3])
    frames = list(dataset.iterate_as_timestep())
    assert [ts.frame for ts in frames] == [0, 2, 4, 6]
    assert all(ts.n_atoms == 2 for ts in frames)
    np.testing.assert_allclose(
        frames[1].positions, dataset.system.positions[2][[1, 3]])


def test_subset_timestep_and_filter():
    assert TrajectorySubset is Subset          # reference-name alias
    dataset = make_dataset()
    subset = Subset(dataset, [1, 4, 6])

    assert [ts.frame for ts in subset.iterate_as_timestep()] == [1, 4, 6]
    assert subset.get_timestep(2).frame == 6
    assert subset.trajectory_sample_indices.tolist() == [1, 4, 6]

    # Filter constructor: keep frames whose first atom has x > 0.
    chosen = Subset.from_filter(
        dataset, lambda idx, ts: ts.positions[0, 0] > 0)
    expected = [i for i in range(N_FRAMES)
                if dataset.system.positions[i][0, 0] > 0]
    assert [ts.frame for ts in chosen.iterate_as_timestep()] == expected


def test_subset_remaps_dataset_sample_index():
    """Samplers/loggers address the subset, so dataset_sample_index must
    be the subset index while trajectory_sample_index stays absolute."""
    dataset = make_dataset()
    subset = Subset(dataset, [2, 5, 7])

    sample = subset[1]
    assert int(sample['dataset_sample_index']) == 1
    assert int(sample['trajectory_sample_index']) == 5

    batch = subset.get_batch([0, 2])
    assert batch['dataset_sample_index'].tolist() == [0, 2]
    assert batch['trajectory_sample_index'].tolist() == [2, 7]
    np.testing.assert_allclose(
        batch['positions'][1],
        dataset.system.positions[7].reshape(-1))

    # Negative indices normalize before being stamped: a raw -1 would
    # later silently select the wrong row from anything indexed by
    # dataset_sample_index (e.g. reference_potentials in the estimator).
    sample = subset[-1]
    assert int(sample['dataset_sample_index']) == 2
    assert int(sample['trajectory_sample_index']) == 7
    batch = subset.get_batch([-1, 0])
    assert batch['dataset_sample_index'].tolist() == [2, 0]
