"""API parity: every public symbol of the reference has an equivalent here.

A user of andrrizzi/tfep switching to tfep_tpu should find everything they
used. This test enumerates the reference's public surface (its subpackage
re-exports plus the public classes/functions of each module — torch-idiom
internals like ``*PotentialEnergyFunc`` autograd Functions and tensor
conversion shims excluded, since the JAX architecture replaces them with
``custom_vjp`` bridges) and asserts the documented equivalent exists.
docs/MIGRATION.md is the human-readable version of this table.
"""

import importlib

import pytest

# (module here, [reference public symbols that must exist there])
PARITY = {
    # tfep.app + the Lightning Trainer replacement
    'tfep_tpu.app': ['TFEPMapBase', 'CartesianMAFMap', 'MixedMAFMap',
                     'Trainer'],
    # tfep.loss
    'tfep_tpu.loss': ['BoltzmannKLDivLoss'],
    # tfep.nn.flows
    'tfep_tpu.nn.flows': [
        'MAF', 'SequentialFlow', 'PartialFlow', 'CenteredCentroidFlow',
        'OrientedFlow', 'PCAWhitenedFlow', 'ContinuousFlow',
        'AutoregressiveFlow',
    ],
    # tfep.nn.transformers (classes + functional API)
    'tfep_tpu.nn.transformers': [
        'MAFTransformer',
        'AffineTransformer', 'affine_transformer',
        'affine_transformer_inverse',
        'VolumePreservingShiftTransformer',
        'volume_preserving_shift_transformer',
        'volume_preserving_shift_transformer_inverse',
        'MixedTransformer',
        'MoebiusTransformer', 'moebius_transformer',
        'SymmetrizedMoebiusTransformer', 'symmetrized_moebius_transformer',
        'symmetrized_moebius_transformer_inverse',
        'QuaternionProductTransformer',
        'SOSPolynomialTransformer', 'sos_polynomial_transformer',
        'NeuralSplineTransformer', 'neural_spline_transformer',
    ],
    # tfep.nn.conditioners / embeddings / masked / graph / dynamics
    'tfep_tpu.nn.conditioners': ['MADE', 'generate_degrees'],
    'tfep_tpu.nn.embeddings': [
        'MAFEmbedding', 'PeriodicEmbedding', 'FlipInvariantEmbedding',
        'MixedEmbedding', 'GaussianBasisExpansion',
        'BehlerParrinelloRadialExpansion',
    ],
    'tfep_tpu.nn.masked': ['create_autoregressive_mask', 'MaskedLinear'],
    'tfep_tpu.nn.graph': [
        'FixedGraph', 'get_all_edges', 'fix_node_indices_batch_size',
        'compute_edge_distances', 'prune_long_edges', 'unsorted_segment_sum',
    ],
    'tfep_tpu.nn.dynamics': ['EGNNDynamics'],
    # tfep.potentials
    'tfep_tpu.potentials': [
        'PotentialBase', 'ASEPotential', 'OpenMMPotential', 'Psi4Potential',
        'TBLitePotential', 'GROMACSPotential', 'MiMiCPotential',
    ],
    'tfep_tpu.potentials.psi4': ['configure_psi4', 'create_psi4_molecule'],
    'tfep_tpu.potentials.gromacs': ['GmxGrompp', 'GmxMdrun', 'GmxTraj'],
    'tfep_tpu.potentials.mimic': ['Cpmd'],
    # tfep.io
    'tfep_tpu.io': [
        'TFEPLogger', 'TrajectoryDataset', 'TrajectorySubset', 'DictDataset',
        'MergedDataset', 'get_subsampled_indices', 'StatefulBatchSampler',
        'Timestep',
    ],
    # tfep.analysis
    'tfep_tpu.analysis': ['fep_estimator', 'bootstrap'],
    # tfep.utils.parallel + tfep.utils.cli
    'tfep_tpu.parallel': [
        'ParallelizationStrategy', 'SerialStrategy', 'ProcessPoolStrategy',
        'CLITool', 'KeyValueOption', 'AbsolutePathOption', 'FlagOption',
        'Launcher', 'SRunLauncher', 'SRunTool',
    ],
    # tfep.utils.{misc,geometry,math}
    'tfep_tpu.utils.misc': [
        'atom_to_flattened', 'atom_to_flattened_indices', 'flattened_to_atom',
        'remove_and_shift_sorted_indices', 'temporary_cd',
    ],
    'tfep_tpu.utils.geometry': [
        'pdist', 'vector_vector_angle', 'vector_plane_angle',
        'proper_dihedral_angle', 'rotation_matrix_3d', 'batchwise_rotate',
        'get_axis_from_name', 'reference_frame_rotation_matrix',
        'cartesian_to_polar', 'polar_to_cartesian',
    ],
    'tfep_tpu.utils.math': [
        'batchwise_dot', 'batchwise_outer', 'cov',
        'batch_autograd_jacobian', 'batch_autograd_log_abs_det_J',
    ],
}


@pytest.mark.parametrize('module_name', sorted(PARITY))
def test_reference_symbols_exist(module_name):
    module = importlib.import_module(module_name)
    missing = [name for name in PARITY[module_name]
               if not hasattr(module, name)]
    assert not missing, (
        f'{module_name} is missing reference-parity symbols: {missing}')


# Method-level parity for the classes whose *member* surface the reference
# documents as user API (audited against /root/reference/tfep/io: traj.py
# TrajectoryDataset/TrajectorySubset methods, sampler.py, log.py).
MEMBER_PARITY = {
    ('tfep_tpu.io', 'TrajectoryDataset'): [
        'n_atoms', 'trajectory_sample_indices', 'select_atoms', 'subsample',
        'get_timestep', 'iterate_as_timestep', '__getitem__', '__len__',
    ],
    ('tfep_tpu.io', 'TrajectorySubset'): [
        'dataset', 'indices', 'from_filter', 'n_atoms',
        'trajectory_sample_indices', 'select_atoms', 'get_timestep',
        'iterate_as_timestep', '__getitem__', '__len__',
    ],
    ('tfep_tpu.io', 'StatefulBatchSampler'): [
        'batch_size', 'shuffle', 'drop_last', 'state_dict',
        'load_state_dict', '__iter__', '__len__',
    ],
    ('tfep_tpu.io', 'TFEPLogger'): [
        'batch_size', 'n_samples_per_epoch', 'n_batches_per_epoch',
        'save_dir_path', 'read_eval_tensors', 'read_train_tensors',
        'save_eval_tensors', 'save_train_tensors',
    ],
}


@pytest.mark.parametrize('module_name,class_name', sorted(MEMBER_PARITY))
def test_reference_members_exist(module_name, class_name):
    cls = getattr(importlib.import_module(module_name), class_name)
    missing = [name for name in MEMBER_PARITY[(module_name, class_name)]
               if not hasattr(cls, name)]
    assert not missing, (
        f'{module_name}.{class_name} is missing reference-parity members: '
        f'{missing}')


def test_pint_style_units_surface():
    """The pint-replacement registry exposes the spellings the reference's
    potentials rely on (kT conversion, engine units, molar conversion)."""
    from tfep_tpu.units import Quantity, Unit, ureg

    for name in ('kelvin', 'angstrom', 'nanometer', 'bohr', 'hartree', 'eV',
                 'kilojoule_per_mole', 'kcal', 'mole', 'picosecond'):
        assert isinstance(getattr(ureg, name), Unit), name
    q = (300.0 * ureg.kelvin)
    assert isinstance(q, Quantity)
    # Molar conversion: hartree -> kcal/mol multiplies by Avogadro.
    e = (1.0 * ureg.hartree).to(ureg.kcal / ureg.mole)
    assert abs(e.magnitude - 627.5) < 0.1
