"""Data layer: corpus ingest/export, datasets, splits, input pipeline."""
from .datasets import (
    EcgDataset, PtbxlSplits, get_ptbxl_splits, labels_to_multi_hot,
    load_ptbxl_from_export, parse_scp_codes, split_by_strat_fold, synth_ecg,
    synth_ptbxl, synth_ptbxl_device, write_combined_hdf5,
)
from .readers import BulkHdf5Reader, read_csv_record, read_header, read_many, read_record
from .export import (export_combined, export_denoised, export_records_csv,
                     export_shards, get_rec_paths, read_shard_meta)
from .pipeline import (MixedRecordStream, ShardedRecordStream,
                       device_batches, prefetch_to_device)
from .datasets import compute_train_stats, export_ptbxl_labels
from .torch_adapter import TorchPtbxlDataset, as_torch_dataset

__all__ = [
    'EcgDataset', 'PtbxlSplits', 'get_ptbxl_splits', 'labels_to_multi_hot',
    'load_ptbxl_from_export', 'parse_scp_codes', 'split_by_strat_fold', 'synth_ecg',
    'synth_ptbxl', 'synth_ptbxl_device', 'write_combined_hdf5',
    'BulkHdf5Reader', 'read_csv_record', 'read_header', 'read_many', 'read_record',
    'export_combined', 'export_denoised', 'export_records_csv',
    'export_shards', 'get_rec_paths', 'read_shard_meta',
    'MixedRecordStream', 'ShardedRecordStream', 'device_batches',
    'prefetch_to_device',
    'compute_train_stats', 'export_ptbxl_labels',
    'TorchPtbxlDataset', 'as_torch_dataset',
]
