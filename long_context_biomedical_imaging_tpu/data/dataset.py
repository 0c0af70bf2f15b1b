"""Per-subject .npy dataset (ref: data/data_base.py:20-125).

Directory layout: `<data_dir>/<id>/<id>_input.npy` (+ `<id>_output.npy` for
seg/enhance) and `<data_dir>/*_metadata.csv` with SubjectID/Label columns for
classification. Splits come from a CSV (SubjectID, Split) or the reference's
deterministic glob-ordered 60/20/20 split.

Items are channels-last: (T, H, W, C) float32 images; seg targets (T, H, W)
int; enhance targets (T, H, W, C) float32; class targets scalar int.
"""

from __future__ import annotations

import glob
import logging
import os

import cv2
import numpy as np
import pandas as pd

from .native_io import load_npy_batch
from .transforms import apply_augmentations, normalize_shape, sample_augmentation_params


def _load_npy(path: str) -> np.ndarray:
    """np.load via the native GIL-free reader when built (native/parallel_io.cpp);
    np.load holds the GIL for the whole disk read, which serializes the
    loader's worker threads."""
    return load_npy_batch([path])[0]


class NumpyDataset:
    def __init__(self, config, split: str):
        self.config = config
        self.split = split
        self.data_loc = config.data_dir
        self.task_type = config.task_type

        assert config.time >= 1, "Time arg should be >= 1"
        assert config.no_in_channel >= 1
        assert config.no_out_channel >= 1

        if config.split_csv_path is not None:
            df = pd.read_csv(config.split_csv_path)
            df = df[df.Split.isin([split])]
            self.subject_ids = list(df.SubjectID)
        else:
            all_ids = [p.split(os.sep)[-2] for p in
                       glob.glob(os.path.join(self.data_loc, "*", "*_input.npy"))]
            n = len(all_ids)
            if split == "train":
                self.subject_ids = all_ids[:int(0.6 * n)]
            elif split == "val":
                self.subject_ids = all_ids[int(0.6 * n):int(0.8 * n)]
            elif split == "test":
                self.subject_ids = all_ids[int(0.8 * n):]
            else:
                raise ValueError(f"Unknown split {split}")

        if split == "train" and getattr(config, "percent_data", 1.0) < 1.0:
            keep = max(1, int(len(self.subject_ids) * config.percent_data))
            self.subject_ids = self.subject_ids[:keep]

        logging.getLogger("lcbi").info(
            "Size of %s dataset: %d", split, len(self.subject_ids))

        if not self.subject_ids:
            logging.getLogger("lcbi").warning(
                "No subjects found for split %r under %s (expected "
                "<data_dir>/<id>/<id>_input.npy)", split, self.data_loc)

        if self.task_type == "class":
            meta_paths = glob.glob(os.path.join(self.data_loc, "*_metadata.csv"))
            if not meta_paths:
                raise FileNotFoundError(
                    f"Classification task needs a '*_metadata.csv' with "
                    f"SubjectID/Label columns in {self.data_loc}")
            self.metadata = pd.read_csv(meta_paths[0])

        # per-item RNG stream: deterministic given config.seed + epoch + index
        self._base_seed = config.seed if config.seed is not None else 0
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.subject_ids)

    def __getitem__(self, index: int):
        sid = self.subject_ids[index]
        cfg = self.config
        image_path = os.path.join(self.data_loc, sid, sid + "_input.npy")
        image = _load_npy(image_path).astype(np.float32)
        image = normalize_shape(image, cfg.height, cfg.width, cfg.time,
                                cfg.no_in_channel)

        train = self.split == "train"
        rng = np.random.default_rng(
            (self._base_seed * 1_000_003 + self.epoch * 7919 + index) & 0x7FFFFFFF)
        params = sample_augmentation_params(rng, cfg, cfg.height, cfg.width) \
            if train else None

        if params is not None:
            image = apply_augmentations(image, params)

        if self.task_type == "seg":
            seg = _load_npy(image_path.replace("_input", "_output")).astype(np.float32)
            seg = normalize_shape(seg, cfg.height, cfg.width, cfg.time, 1,
                                  interp=cv2.INTER_NEAREST)
            if params is not None:
                seg = apply_augmentations(seg, params, photometric=False,
                                          nearest=True)
            return image, seg[..., 0].astype(np.int32), sid

        if self.task_type == "enhance":
            out = _load_npy(image_path.replace("_input", "_output")).astype(np.float32)
            out = normalize_shape(out, cfg.height, cfg.width, cfg.time,
                                  cfg.no_out_channel)
            if params is not None:
                # enhancement targets get geometric + brightness (same draws),
                # no blur (ref: data_utils.py:133-135,139-140). Brightness must
                # match the input path: scale first, then shift by the mean of
                # the *scaled* image (ref: brightness.py:24-27).
                out = apply_augmentations(out, params, photometric=False)
                if params.apply_brightness:
                    out = out * params.alpha
                    out = out + params.beta * out.mean()
            return image, out.astype(np.float32), sid

        if self.task_type == "class":
            row = self.metadata[self.metadata.SubjectID.isin([sid])]
            label = int(float(row.Label.iloc[0]))
            return image, np.int32(label), sid

        raise ValueError("Unknown task type.")
