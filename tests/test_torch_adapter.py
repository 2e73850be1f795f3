"""Torch interop adapter: reference-style {'sample_values','labels'} items."""
import numpy as np

from ecg_representation_learning_tpu.data import as_torch_dataset, get_ptbxl_splits, synth_ptbxl
from ecg_representation_learning_tpu.registry import PTBXL_TRAIN_STATS


def test_torch_dataset_items():
    import torch
    signals, labels, folds = synth_ptbxl(n=32, length=250)
    splits = get_ptbxl_splits(signals, labels, folds)
    stats = PTBXL_TRAIN_STATS['original']
    ds = as_torch_dataset(splits.train, mean=stats['mean'], std=stats['std'],
                          pad_to_multiple=64)
    item = ds[0]
    assert isinstance(item['sample_values'], torch.Tensor)
    assert item['sample_values'].shape == (12, 256)  # 250 padded up to 256
    assert item['labels'].shape == (71,)
    assert item['labels'].dtype == torch.float32
    # works with a torch DataLoader
    from torch.utils.data import DataLoader
    batch = next(iter(DataLoader(ds, batch_size=4)))
    assert batch['sample_values'].shape == (4, 12, 256)


def test_torch_dataset_timeout_masks():
    signals, labels, folds = synth_ptbxl(n=16, length=256)
    splits = get_ptbxl_splits(signals, labels, folds)
    ds = as_torch_dataset(splits.train, pad_to_multiple=None, timeout=True)
    masked = 0
    for i in range(len(ds)):
        sig = ds[i]['sample_values'].numpy()
        zero_cols = (sig == 0).all(axis=0)
        if zero_cols.any():
            masked += 1
            idx = np.nonzero(zero_cols)[0]
            assert (np.diff(idx) == 1).all()  # contiguous span
    assert masked > 0
