"""Unit tests for TFEPLogger: save/read/resume/NaN matrix.

Coverage model: reference tests exercise the logger through the app layer;
here the on-disk contract is pinned directly (epoch/step addressing, the
``__mask`` column, NaN filtering variants, eval update-by-sample-index,
metadata resume).
"""

import json
import os

import numpy as np
import pytest

from tfep_tpu.io.log import TFEPLogger


def make_logger(tmp_path, batch_size=4, n_samples=10):
    return TFEPLogger(save_dir_path=str(tmp_path / 'logs'),
                      batch_size=batch_size, n_samples_per_epoch=n_samples)


def batch_tensors(indices, potentials=None):
    indices = np.asarray(indices)
    if potentials is None:
        potentials = indices.astype(float) * 10.0
    return {'dataset_sample_index': indices, 'potential': potentials}


def test_constructor_requires_sizes(tmp_path):
    with pytest.raises(ValueError, match='batch_size'):
        TFEPLogger(save_dir_path=str(tmp_path / 'logs'))


def test_constructor_from_data_loader(tmp_path):
    class Loader:
        batch_size = 3
        drop_last = True
        dataset = list(range(11))

    logger = TFEPLogger(save_dir_path=str(tmp_path / 'logs'),
                        data_loader=Loader())
    assert logger.batch_size == 3
    # drop_last truncates to a whole number of batches.
    assert logger.n_samples_per_epoch == 9
    assert logger.n_batches_per_epoch == 3


def test_train_batch_positioning_and_mask(tmp_path):
    logger = make_logger(tmp_path)  # batch 4, 10 samples -> 3 batches
    # Write batches out of order; the middle one is missing.
    logger.save_train_tensors(batch_tensors([8, 9]), epoch_idx=0, batch_idx=2)
    logger.save_train_tensors(batch_tensors([0, 1, 2, 3]), epoch_idx=0,
                              batch_idx=0)

    data = logger.read_train_tensors(epoch_idx=0)
    # Only written rows come back, in on-disk (batch-position) order.
    np.testing.assert_array_equal(data['dataset_sample_index'],
                                  [0, 1, 2, 3, 8, 9])
    np.testing.assert_allclose(data['potential'], [0, 10, 20, 30, 80, 90])

    # Single-batch read honors the batch slice and its mask.
    data = logger.read_train_tensors(epoch_idx=0, batch_idx=2)
    np.testing.assert_array_equal(data['dataset_sample_index'], [8, 9])
    data = logger.read_train_tensors(epoch_idx=0, batch_idx=1)
    assert len(data['dataset_sample_index']) == 0


def test_train_step_addressing(tmp_path):
    logger = make_logger(tmp_path)  # 3 batches/epoch
    # step 4 == epoch 1, batch 1.
    logger.save_train_tensors(batch_tensors([4, 5, 6, 7]), step_idx=4)
    data = logger.read_train_tensors(epoch_idx=1, batch_idx=1)
    np.testing.assert_array_equal(data['dataset_sample_index'], [4, 5, 6, 7])
    # Files are per-epoch on disk.
    assert os.path.isfile(
        os.path.join(logger.save_dir_path, 'train', 'epoch-1.npz'))


def test_train_whole_epoch_write(tmp_path):
    logger = make_logger(tmp_path, batch_size=5, n_samples=5)
    logger.save_train_tensors(batch_tensors(np.arange(5)), epoch_idx=3)
    data = logger.read_train_tensors(epoch_idx=3)
    assert len(data['potential']) == 5


def test_train_remove_nans_variants(tmp_path):
    logger = make_logger(tmp_path, batch_size=4, n_samples=4)
    tensors = {'dataset_sample_index': np.arange(4),
               'potential': np.array([1.0, np.nan, 3.0, 4.0]),
               'log_det_J': np.array([0.1, 0.2, np.nan, 0.4])}
    logger.save_train_tensors(tensors, epoch_idx=0, batch_idx=0)

    # remove_nans=True: any float column NaN drops the row.
    data = logger.read_train_tensors(epoch_idx=0, remove_nans=True)
    np.testing.assert_array_equal(data['dataset_sample_index'], [0, 3])
    # remove_nans='potential': only that column is checked.
    data = logger.read_train_tensors(epoch_idx=0, remove_nans='potential')
    np.testing.assert_array_equal(data['dataset_sample_index'], [0, 2, 3])
    # remove_nans=False keeps everything written.
    data = logger.read_train_tensors(epoch_idx=0)
    assert len(data['potential']) == 4


def test_eval_append_and_update(tmp_path):
    logger = make_logger(tmp_path)
    logger.save_eval_tensors(batch_tensors([0, 1, 2]), step_idx=7)
    logger.save_eval_tensors(batch_tensors([3, 4]), step_idx=7)
    data = logger.read_eval_tensors(step_idx=7)
    np.testing.assert_array_equal(data['dataset_sample_index'],
                                  [0, 1, 2, 3, 4])

    # update=True overwrites matched sample indices, appends the rest.
    logger.save_eval_tensors(
        {'dataset_sample_index': np.array([1, 5]),
         'potential': np.array([-1.0, -5.0])}, step_idx=7, update=True)
    data = logger.read_eval_tensors(step_idx=7, sort_by='dataset_sample_index')
    np.testing.assert_array_equal(data['dataset_sample_index'],
                                  [0, 1, 2, 3, 4, 5])
    np.testing.assert_allclose(data['potential'],
                               [0.0, -1.0, 20.0, 30.0, 40.0, -5.0])


def test_eval_missing_column_raises(tmp_path):
    logger = make_logger(tmp_path)
    logger.save_eval_tensors(batch_tensors([0, 1]), step_idx=0)
    with pytest.raises(KeyError, match='must include all'):
        logger.save_eval_tensors({'dataset_sample_index': np.array([2])},
                                 step_idx=0)


def test_eval_sort_persists(tmp_path):
    logger = make_logger(tmp_path)
    logger.save_eval_tensors(batch_tensors([2, 0, 1]), step_idx=0)
    logger.read_eval_tensors(step_idx=0, sort_by='dataset_sample_index')
    # A fresh logger instance sees the sorted archive.
    logger2 = TFEPLogger(save_dir_path=logger.save_dir_path)
    data = logger2.read_eval_tensors(step_idx=0)
    np.testing.assert_array_equal(data['dataset_sample_index'], [0, 1, 2])


def test_eval_remove_nans(tmp_path):
    logger = make_logger(tmp_path)
    logger.save_eval_tensors(
        batch_tensors([0, 1, 2], np.array([1.0, np.nan, 3.0])), step_idx=0)
    data = logger.read_eval_tensors(step_idx=0, remove_nans=True)
    np.testing.assert_array_equal(data['dataset_sample_index'], [0, 2])


def test_eval_requires_step_address(tmp_path):
    logger = make_logger(tmp_path)
    with pytest.raises(ValueError, match='step_idx'):
        logger.save_eval_tensors(batch_tensors([0]), epoch_idx=0)


def test_metadata_resume_overrides_sizes(tmp_path):
    logger = make_logger(tmp_path, batch_size=4, n_samples=10)
    logger.save_train_tensors(batch_tensors([0, 1, 2, 3]), epoch_idx=0,
                              batch_idx=0)
    # Re-created with different (ignored) sizes: resumes from metadata.
    logger2 = TFEPLogger(save_dir_path=logger.save_dir_path,
                         batch_size=99, n_samples_per_epoch=99)
    assert logger2.batch_size == 4
    assert logger2.n_samples_per_epoch == 10
    data = logger2.read_train_tensors(epoch_idx=0)
    assert len(data['potential']) == 4

    with open(os.path.join(logger.save_dir_path, 'metadata.json')) as f:
        meta = json.load(f)
    assert meta['batch_size'] == 4


def test_warns_without_sample_index(tmp_path):
    logger = make_logger(tmp_path)
    with pytest.warns(UserWarning, match='sample indices'):
        logger.save_train_tensors({'potential': np.zeros(4)}, epoch_idx=0,
                                  batch_idx=0)


def test_read_missing_index_requires_address(tmp_path):
    logger = make_logger(tmp_path)
    with pytest.raises(ValueError, match='epoch_idx'):
        logger.read_train_tensors()


def test_jax_arrays_accepted(tmp_path):
    import jax.numpy as jnp
    logger = make_logger(tmp_path, batch_size=2, n_samples=2)
    logger.save_train_tensors(
        {'dataset_sample_index': jnp.arange(2),
         'potential': jnp.array([1.0, 2.0])}, epoch_idx=0, batch_idx=0)
    data = logger.read_train_tensors(epoch_idx=0)
    assert isinstance(data['potential'], np.ndarray)
    np.testing.assert_allclose(data['potential'], [1.0, 2.0])
