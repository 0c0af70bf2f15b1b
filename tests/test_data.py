"""Data pipeline tests: shape normalizer dim-combinations, paired augmentations,
loader batching/padding, native reader parity (SURVEY.md §4)."""

import os

import numpy as np
import pytest

from long_context_biomedical_imaging_tpu.data import (BatchLoader, NumpyDataset,
                                                      apply_augmentations,
                                                      normalize_shape,
                                                      sample_augmentation_params)
from long_context_biomedical_imaging_tpu.data.native_io import (load_npy_batch,
                                                                native_available)
from long_context_biomedical_imaging_tpu.setup import Config


def test_normalize_shape_all_combinations(rng):
    # 2D single channel from 2D/3D/4D stored arrays
    for shape in [(20, 24), (20, 24, 1), (20, 24, 1, 1)]:
        out = normalize_shape(rng.normal(size=shape), 16, 16, 1, 1)
        assert out.shape == (1, 16, 16, 1)
    # 2D multichannel
    out = normalize_shape(rng.normal(size=(20, 24, 3)), 16, 16, 1, 3)
    assert out.shape == (1, 16, 16, 3)
    # 3D single channel: depth pad and crop
    out = normalize_shape(rng.normal(size=(20, 24, 5)), 16, 16, 8, 1)
    assert out.shape == (8, 16, 16, 1)
    out = normalize_shape(rng.normal(size=(20, 24, 12)), 16, 16, 8, 1)
    assert out.shape == (8, 16, 16, 1)
    # 3D multichannel
    out = normalize_shape(rng.normal(size=(20, 24, 5, 2)), 16, 16, 8, 2)
    assert out.shape == (8, 16, 16, 2)
    # wrong channels raises
    with pytest.raises(ValueError):
        normalize_shape(rng.normal(size=(20, 24, 3)), 16, 16, 1, 2)


def test_depth_pad_is_centered(rng):
    img = rng.normal(size=(8, 8, 4)).astype(np.float32)
    out = normalize_shape(img, 8, 8, 8, 1)  # pad 4 -> 8, split 2/2
    assert np.all(out[:2] == 0) and np.all(out[-2:] == 0)
    assert not np.all(out[2:6] == 0)


def _aug_config():
    cfg = Config()
    cfg.affine_aug = True
    cfg.brightness_aug = True
    cfg.gaussian_blur_aug = False
    return cfg


def test_paired_geometric_augmentation(rng):
    """Input and mask must receive the identical affine (ref: data_base.py:86-99)."""
    cfg = _aug_config()
    params = sample_augmentation_params(np.random.default_rng(3), cfg, 32, 32)
    assert params.apply_affine
    img = rng.normal(size=(1, 32, 32, 1)).astype(np.float32)
    a1 = apply_augmentations(img, params, photometric=False)
    a2 = apply_augmentations(img, params, photometric=False)
    np.testing.assert_array_equal(a1, a2)  # deterministic given params
    # mask transformed with the same params stays label-valued
    mask = rng.integers(0, 3, size=(1, 32, 32, 1)).astype(np.float32)
    m1 = apply_augmentations(mask, params, photometric=False, nearest=True)
    assert set(np.unique(m1)) <= set(np.unique(mask)) | {0.0}


def _make_class_dataset(root, n=7):
    import pandas as pd
    rows = []
    rng = np.random.default_rng(0)
    for i in range(n):
        sid = f"s{i}"
        os.makedirs(f"{root}/{sid}", exist_ok=True)
        np.save(f"{root}/{sid}/{sid}_input.npy",
                rng.normal(size=(8, 8)).astype(np.float32))
        rows.append((sid, i % 2))
    pd.DataFrame({"SubjectID": [r[0] for r in rows],
                  "Label": [r[1] for r in rows]}).to_csv(
        f"{root}/m_metadata.csv", index=False)


def test_loader_pads_final_batch(tmp_path):
    _make_class_dataset(tmp_path, n=7)
    cfg = Config()
    cfg.data_dir = str(tmp_path)
    cfg.split_csv_path = None
    cfg.task_type = "class"
    cfg.height = cfg.width = 8
    cfg.time = 1
    cfg.no_in_channel = 1
    cfg.no_out_channel = 2
    cfg.percent_data = 1.0
    cfg.seed = 0
    cfg.affine_aug = cfg.brightness_aug = cfg.gaussian_blur_aug = False
    ds = NumpyDataset(cfg, "train")  # 60% of 7 = 4 subjects
    loader = BatchLoader(ds, batch_size=3, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    images, labels, ids, n_valid = batches[-1]
    assert images.shape[0] == 3      # padded to static batch
    # a singleton batch is duplicated (BatchNorm hack, ref: trainer_base.py:161-164)
    assert n_valid == 2
    np.testing.assert_array_equal(images[0], images[1])
    # epochs reshuffle deterministically
    loader.set_epoch(1)
    ids_e1 = [i for _, _, ids_, _ in loader for i in ids_]
    loader.set_epoch(1)
    ids_e1b = [i for _, _, ids_, _ in loader for i in ids_]
    assert ids_e1 == ids_e1b


def test_native_reader_parity(tmp_path, rng):
    if not native_available():
        pytest.skip("native reader not built")
    paths = []
    for i, shape in enumerate([(4, 5), (2, 3, 4), (7,)]):
        p = f"{tmp_path}/x{i}.npy"
        np.save(p, rng.normal(size=shape).astype(np.float32))
        paths.append(p)
    got = load_npy_batch(paths)
    for g, p in zip(got, paths):
        np.testing.assert_array_equal(g, np.load(p))


def test_loader_early_exit_does_not_leak(tmp_path):
    """Breaking out of iteration (e.g. --debug) must unblock and join the
    producer thread even with a full prefetch queue."""
    import threading

    _make_class_dataset(tmp_path, n=20)
    cfg = Config()
    cfg.data_dir = str(tmp_path)
    cfg.split_csv_path = None
    cfg.task_type = "class"
    cfg.height = cfg.width = 8
    cfg.time = 1
    cfg.no_in_channel = 1
    cfg.no_out_channel = 2
    cfg.percent_data = 1.0
    cfg.seed = 0
    cfg.affine_aug = cfg.brightness_aug = cfg.gaussian_blur_aug = False
    ds = NumpyDataset(cfg, "train")
    before = threading.active_count()
    for _ in range(3):
        loader = BatchLoader(ds, batch_size=2, shuffle=False, seed=0,
                             prefetch_batches=1)
        for _i, _batch in enumerate(loader):
            break  # early exit with a full queue behind us
    import time as _t
    _t.sleep(0.5)
    assert threading.active_count() <= before + 2


def test_loader_slow_consumer_gets_sentinel(tmp_path):
    """End-of-epoch sentinel must arrive even when the prefetch queue is full
    at producer exit (a slow consumer must not hang forever)."""
    import time

    _make_class_dataset(tmp_path, n=12)
    cfg = Config()
    cfg.data_dir = str(tmp_path)
    cfg.split_csv_path = None
    cfg.task_type = "class"
    cfg.height = cfg.width = 8
    cfg.time = 1
    cfg.no_in_channel = 1
    cfg.no_out_channel = 2
    cfg.percent_data = 1.0
    cfg.seed = 0
    cfg.affine_aug = cfg.brightness_aug = cfg.gaussian_blur_aug = False
    ds = NumpyDataset(cfg, "train")
    loader = BatchLoader(ds, batch_size=2, shuffle=False, seed=0,
                         prefetch_batches=1, num_workers=2)
    seen = 0
    for batch in loader:          # slower than the producer fills the queue
        time.sleep(0.05)
        seen += 1
    assert seen == len(loader)    # iteration terminated; all batches seen
