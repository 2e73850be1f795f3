"""Corpus export jobs: raw corpora -> unified 250 Hz HDF5 (+ denoised pass).

Reference parity (preprocess/data_export.py + preprocess_matlab/DataExport.m):
  * ``export_combined``: per-dataset glob via the registry ``rec_fmt``
    (data_export.py:61-66), threaded host reads (191-193), resample to 250 Hz
    (205-215), fixed-length (N, 12, L) float32 HDF5 with JSON attrs (221-230).
    Signals shorter than the pad length are zero-padded at the end; longer
    ones are truncated (the reference allocates max-length and writes rows).
  * ``export_records_csv``: the labels index (patient / record / dataset
    columns, data_export.py:46, 164-173).
  * ``export_denoised``: the MATLAB batch-denoise driver (DataExport.m:12-66)
    as a checkpointed device job -- RESUMABLE by skipping rows already nonzero
    in the output (DataExport.m:28-44), with the broken-record rule: an
    all-zero input lead stays all-zero instead of becoming NaN
    (record 12722's lead 11, DataExport.m:46-54).

TPU-native difference: resampling/denoising run as device-batched jitted
programs over thousands of records at once, not a per-record host loop.
"""
from __future__ import annotations

import glob as globlib
import json
import os
from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..configs import PreprocessConfig
from ..ops.preprocess import zheng_denoise
from ..ops.resample import resample_to
from ..registry import DATASETS, TARGET_FQS, DatasetMeta
from ..utils.logging import get_logger
from .readers import (BulkHdf5Reader, read_csv_record, read_header, read_many,
                      read_record)


def get_rec_paths(dataset_key: str, data_root: str) -> List[str]:
    """Record files per the registry glob (reference get_rec_paths, ecg.py:178-182)."""
    meta = DATASETS[dataset_key]
    pattern = os.path.join(data_root, meta.dir_name, meta.rec_fmt)
    return sorted(globlib.iglob(pattern, recursive=True))


def _strip_ext(path: str, ext: Optional[str]) -> str:
    return path[:-len(ext)] if ext else path


def _wfdb_native_batch(paths: Sequence[str], ext: Optional[str],
                       n_workers: int) -> Optional[List[np.ndarray]]:
    """Threaded C++ fast path for a homogeneous fmt-16 batch (incl. the
    '16+offset' CinC .mat layout); None when not applicable -> Python path."""
    from .native import native_available, read_records_16_batch
    if not native_available():
        return None
    hdrs = [read_header(_strip_ext(p, ext) + '.hea') for p in paths]
    h0 = hdrs[0]
    if not all(h.n_sig == h0.n_sig and h.n_samples == h0.n_samples
               for h in hdrs):
        return None
    specs = [s for h in hdrs for s in h.signals]
    if not all(s.fmt == 16 and s.samples_per_frame == 1 for s in specs):
        return None
    if any(len({s.file_name for s in h.signals}) != 1 for h in hdrs):
        return None   # multi-.dat records: generic path
    gains = np.array([[s.gain for s in h.signals] for h in hdrs], np.float64)
    baselines = np.array([[s.baseline for s in h.signals] for h in hdrs],
                         np.int32)
    offsets = np.array([h.signals[0].byte_offset for h in hdrs], np.int64)
    files = [os.path.join(os.path.dirname(_strip_ext(p, ext)),
                          h.signals[0].file_name)
             for p, h in zip(paths, hdrs)]
    batch = read_records_16_batch(files, h0.n_sig, h0.n_samples, gains,
                                  baselines, offsets=offsets,
                                  n_threads=n_workers)
    return None if batch is None else list(batch)


def _batch_reader(dataset_key: str, paths: Sequence[str], n_workers: int = 8
                  ) -> Tuple[int, Callable[[int, int], List[np.ndarray]]]:
    """(n_records, read_batch(i0, i1)) -- never materializes the full corpus."""
    meta = DATASETS[dataset_key]
    if meta.reader == 'hdf5_bulk':
        rd = BulkHdf5Reader(paths[0])
        return len(rd), lambda i0, i1: [rd[i] for i in range(i0, i1)]
    if meta.reader == 'csv':
        return len(paths), lambda i0, i1: read_many(paths[i0:i1],
                                                    read_csv_record, n_workers)
    ext = meta.rec_ext

    def read_batch(i0: int, i1: int) -> List[np.ndarray]:
        fast = _wfdb_native_batch(paths[i0:i1], ext, n_workers)
        if fast is not None:
            return fast
        return read_many(paths[i0:i1],
                         lambda p: read_record(_strip_ext(p, ext))[0], n_workers)

    return len(paths), read_batch


def _probe_max_len(dataset_key: str, paths: Sequence[str]) -> int:
    """Longest record length WITHOUT reading signal payloads: WFDB headers
    carry n_samples, bulk HDF5 carries its shape, CSVs are line-counted."""
    meta = DATASETS[dataset_key]
    if meta.reader == 'hdf5_bulk':
        return BulkHdf5Reader(paths[0]).record_length
    if meta.reader == 'csv':
        mx = 0
        for p in paths:
            with open(p, 'rb') as f:
                n = sum(buf.count(b'\n')
                        for buf in iter(lambda: f.read(1 << 20), b''))
            mx = max(mx, n - 1)  # minus the CSV header row
        return mx
    return max(read_header(_strip_ext(p, meta.rec_ext) + '.hea').n_samples
               for p in paths)


def export_combined(
    dataset_key: str,
    data_root: str,
    out_dir: str,
    fqs: int = TARGET_FQS,
    pad_length: Optional[int] = None,
    batch: int = 256,
    n_workers: int = 8,
) -> str:
    """Raw corpus -> ``{key}-combined.hdf5`` on the unified grid.

    Streaming: records are read, resampled, and written one batch at a time,
    so peak host RAM is O(batch x record), never O(corpus) -- the reference
    loads every record before writing (data_export.py:191-221), which does
    not fit a small host for the 30-min INCART records or multi-corpus runs.
    """
    import h5py
    logger = get_logger('ECG Record Export')
    meta = DATASETS[dataset_key]
    paths = get_rec_paths(dataset_key, data_root)
    assert paths, f'no records matched for {dataset_key} under {data_root}'
    logger.info(f'Exporting {dataset_key}: {len(paths)} records @ {meta.fqs} Hz')

    src_fqs = meta.fqs
    n, read_batch = _batch_reader(dataset_key, paths, n_workers)
    tgt_len = pad_length or int(round(
        _probe_max_len(dataset_key, paths) * fqs / src_fqs))
    c = read_batch(0, 1)[0].shape[0]
    out_path = os.path.join(out_dir, f'{dataset_key}-combined.hdf5')
    os.makedirs(out_dir, exist_ok=True)
    with h5py.File(out_path, 'w') as f:
        dset = f.create_dataset('data', shape=(n, c, tgt_len), dtype=np.float32)
        for i0 in range(0, n, batch):
            chunk = read_batch(i0, min(i0 + batch, n))
            # group equal-length signals to keep shapes static under jit
            by_len = {}
            for j, s in enumerate(chunk):
                by_len.setdefault(s.shape[-1], []).append(j)
            out_chunk = np.zeros((len(chunk), c, tgt_len), np.float32)
            for length, idxs in by_len.items():
                arr = np.stack([np.nan_to_num(chunk[j]) for j in idxs])
                res = np.asarray(resample_to(jnp.asarray(arr), src_fqs, fqs,
                                             method='fft'))
                keep = min(res.shape[-1], tgt_len)
                out_chunk[idxs, :, :keep] = res[..., :keep]
            assert np.isfinite(out_chunk).all()  # reference data_export.py:199-200
            dset[i0:i0 + len(chunk)] = out_chunk
        f.attrs['meta'] = json.dumps({'dnm': dataset_key, 'fqs': fqs})
    logger.info(f'Wrote {out_path} ({n} x {c} x {tgt_len})')
    return out_path


def export_shards(
    dataset_key: str,
    data_root: str,
    out_dir: str,
    records_per_shard: int = 256,
    wire_dtype: str = 'int16',
    wire_scale: float = 1000.0,
    pad_length: Optional[int] = None,
    n_workers: int = 8,
) -> List[str]:
    """Raw corpus -> streaming-pretrain shard files (BASELINE config 5).

    Unlike :func:`export_combined` (the supervised path: resampled to the
    unified 250 Hz grid, float32), shards stay at the corpus's NATIVE rate --
    the fused resample+filter+normalize runs ON DEVICE inside the jitted
    pretrain step (train/pretrain.py build_stream_step) -- and ship int16
    ADC-style counts (``round(x * wire_scale)``), the principled wire format
    since WFDB sources are int16 natively; it also halves host->HBM traffic
    (PERF.md "int16 on the wire").  Each shard carries its own metadata
    (``fqs``, ``wire_scale``, ``wire_dtype``) so consumers (``cli pretrain
    --stream``) need no per-corpus flags.

    Returns the shard paths, ``{key}-shard-0000.hdf5`` ... under ``out_dir``.
    """
    import h5py
    assert wire_dtype in ('int16', 'float32'), wire_dtype
    logger = get_logger('ECG Shard Export')
    meta = DATASETS[dataset_key]
    paths = get_rec_paths(dataset_key, data_root)
    assert paths, f'no records matched for {dataset_key} under {data_root}'
    n, read_batch = _batch_reader(dataset_key, paths, n_workers)
    tgt_len = pad_length or _probe_max_len(dataset_key, paths)
    c = read_batch(0, 1)[0].shape[0]
    os.makedirs(out_dir, exist_ok=True)
    logger.info(f'Sharding {dataset_key}: {n} records @ {meta.fqs} Hz native, '
                f'{records_per_shard}/shard, wire {wire_dtype}')
    out_paths = []
    attrs = {'dnm': dataset_key, 'fqs': meta.fqs, 'wire_dtype': wire_dtype,
             'wire_scale': wire_scale if wire_dtype == 'int16' else None}
    for si, i0 in enumerate(range(0, n, records_per_shard)):
        i1 = min(i0 + records_per_shard, n)
        chunk = read_batch(i0, i1)
        out = np.zeros((i1 - i0, c, tgt_len), np.float32)
        for j, s in enumerate(chunk):
            keep = min(s.shape[-1], tgt_len)
            out[j, :, :keep] = np.nan_to_num(s[:, :keep])
        if wire_dtype == 'int16':
            wire = np.clip(np.round(out * wire_scale), -32768, 32767
                           ).astype(np.int16)
        else:
            wire = out
        path = os.path.join(out_dir, f'{dataset_key}-shard-{si:04d}.hdf5')
        with h5py.File(path, 'w') as f:
            f.create_dataset('data', data=wire)
            f.attrs['meta'] = json.dumps(attrs)
        out_paths.append(path)
    logger.info(f'Wrote {len(out_paths)} shards under {out_dir}')
    return out_paths


def read_shard_meta(path: str) -> dict:
    """The per-shard metadata written by :func:`export_shards` (native fqs,
    wire dtype/scale); {} for shards without it (plain write_combined_hdf5)."""
    import h5py
    with h5py.File(path, 'r') as f:
        raw = f.attrs.get('meta')
        return json.loads(raw) if raw else {}


def export_records_csv(dataset_keys: Sequence[str], data_root: str,
                       out_path: str) -> str:
    """The labels/record index (reference export_record_info,
    data_export.py:164-173: one row per record with patient/record/dataset)."""
    import pandas as pd
    rows = []
    for key in dataset_keys:
        for p in get_rec_paths(key, data_root):
            rows.append({'dataset': key,
                         'record': os.path.splitext(os.path.basename(p))[0],
                         'path': p})
    df = pd.DataFrame(rows)
    os.makedirs(os.path.dirname(out_path) or '.', exist_ok=True)
    df.to_csv(out_path, index=False)
    return out_path


def export_denoised(
    combined_path: str,
    out_path: Optional[str] = None,
    cfg: PreprocessConfig = PreprocessConfig(),
    batch: int = 64,
    resume: bool = True,
) -> str:
    """Combined -> denoised HDF5 via the device Zheng chain; resumable."""
    import h5py
    logger = get_logger('ECG Denoise Export')
    if out_path is None:
        if '-combined' in combined_path:
            out_path = combined_path.replace('-combined', '-denoised')
        else:
            base, ext = os.path.splitext(combined_path)
            out_path = f'{base}-denoised{ext}'
    assert os.path.abspath(out_path) != os.path.abspath(combined_path)
    with h5py.File(combined_path, 'r') as src:
        data = src['data']
        attrs = json.loads(src.attrs['meta'])
        n, c, length = data.shape
        fqs = attrs['fqs']
        mode = 'r+' if (resume and os.path.exists(out_path)) else 'w'
        with h5py.File(out_path, mode) as dst:
            if 'data' not in dst:
                dst.create_dataset('data', shape=(n, c, length), dtype=np.float32)
                dst.attrs['meta'] = json.dumps({**attrs, 'denoised': True})
            out = dst['data']
            for i0 in range(0, n, batch):
                i1 = min(i0 + batch, n)
                if resume:  # skip rows already denoised (DataExport.m:28-44)
                    existing = out[i0:i1]
                    todo = ~np.any(existing != 0, axis=(1, 2))
                    if not todo.any():
                        continue
                else:
                    todo = np.ones(i1 - i0, bool)
                chunk = np.asarray(data[i0:i1], np.float32)
                den = np.asarray(zheng_denoise(jnp.asarray(chunk), fqs=fqs, cfg=cfg))
                # broken-record rule: all-zero input lead stays all-zero
                zero_leads = ~np.any(chunk != 0, axis=-1)          # (B, C)
                den = np.where(zero_leads[..., None], 0.0, den)
                den = np.nan_to_num(den)
                merged = np.where(todo[:, None, None], den, out[i0:i1])
                out[i0:i1] = merged
                logger.info(f'denoised rows [{i0}, {i1})')
    return out_path
