"""BASELINE config 5 as a PRODUCT path (VERDICT r4 directive #2): two raw
corpora trees -> ``cli export-shards`` -> ``cli pretrain --stream`` with
weighted mixing, per-corpus native-rate on-device preprocess, int16 wire,
and crash-exact resume -- all through the CLI, end to end.

Corpus A is a PTB-XL-shaped WFDB tree at 500 Hz (reusing the
test_raw_tree_integration record writer); corpus B is a CODE-TEST-shaped
bulk HDF5 at 400 Hz -- two different readers, two different native rates,
so the per-corpus ``raw_fqs``-to-fused-preprocess routing is really
exercised (reference export scope: data_export.py:61-230; the reference has
no streaming pretrain at all).
"""
import json

import numpy as np
import pytest

from tests.test_raw_tree_integration import FS_RAW, _write_record

pytestmark = pytest.mark.slow  # CLI trainer loops

LEN_A = 5000          # 10 s at 500 Hz -> 2500 @250 -> pad 2560 (model input)
FS_B, LEN_B = 400, 4096   # CODE-TEST native rate; -> 2560 @250 exactly


def _ptbxl_tree(tmp_path, n, rng):
    root = tmp_path / 'rawA'
    rec_dir = root / 'PTB-XL' / 'records500' / '00000'
    rec_dir.mkdir(parents=True)
    assert FS_RAW == 500
    for ecg_id in range(1, n + 1):
        sig = rng.normal(0, 0.4, (12, LEN_A)).astype(np.float32)
        _write_record(rec_dir, ecg_id, sig)
    return str(root)


def _codetest_tree(tmp_path, n, rng):
    import h5py
    root = tmp_path / 'rawB'
    d = root / 'CODE-test'
    d.mkdir(parents=True)
    with h5py.File(d / 'ecg_tracings.hdf5', 'w') as f:
        f.create_dataset(
            'tracings', data=rng.normal(0, 0.4, (n, 12, LEN_B)).astype(np.float32))
    return str(root)


def _cli_json(capsys, argv):
    from ecg_representation_learning_tpu import cli
    cli.main(argv)
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def _export_both(tmp_path, rng, capsys, n=16):
    root_a = _ptbxl_tree(tmp_path, n, rng)
    root_b = _codetest_tree(tmp_path, n, rng)
    ra = _cli_json(capsys, ['export-shards', '--dataset', 'PTB-XL',
                            '--data-root', root_a,
                            '--out', str(tmp_path / 'shardsA'),
                            '--records-per-shard', '8'])
    rb = _cli_json(capsys, ['export-shards', '--dataset', 'CODE-TEST',
                            '--data-root', root_b,
                            '--out', str(tmp_path / 'shardsB'),
                            '--records-per-shard', '8'])
    assert ra['shards'] == 2 and rb['shards'] == 2
    return str(tmp_path / 'shardsA'), str(tmp_path / 'shardsB')


def test_export_shards_native_rate_int16_metadata(tmp_path, rng, capsys):
    """Shards keep the corpus's NATIVE rate + int16 wire, with self-describing
    metadata; decode(counts)/scale reproduces the raw signal to wire precision."""
    import h5py
    from ecg_representation_learning_tpu.data import read_shard_meta
    dir_a, dir_b = _export_both(tmp_path, rng, capsys, n=16)
    shard_a = f'{dir_a}/PTB-XL-shard-0000.hdf5'
    meta = read_shard_meta(shard_a)
    assert meta['fqs'] == 500 and meta['wire_dtype'] == 'int16'
    assert meta['wire_scale'] == 1000.0
    meta_b = read_shard_meta(f'{dir_b}/CODE-TEST-shard-0000.hdf5')
    assert meta_b['fqs'] == 400
    with h5py.File(shard_a, 'r') as f:
        wire = np.asarray(f['data'])
    assert wire.dtype == np.int16 and wire.shape == (8, 12, LEN_A)
    # decode parity vs the raw record (fmt-16 GAIN=200 quantization +
    # int16 wire at scale 1000 -> within 1/200 + 1/2000 of the original)
    from ecg_representation_learning_tpu.data.readers import read_record
    raw, _ = read_record(str(tmp_path / 'rawA' / 'PTB-XL' / 'records500'
                             / '00000' / '00001_hr'))
    assert np.allclose(wire[0] / 1000.0, raw, atol=1 / 200 + 1 / 2000 + 1e-6)


def test_cli_stream_pretrain_mixes_two_corpora(tmp_path, rng, capsys):
    dir_a, dir_b = _export_both(tmp_path, rng, capsys)
    res = _cli_json(capsys, [
        'pretrain', '--size', 'debug', '--batch-size', '8', '--lr', '1e-3',
        '--stream', dir_a, '--stream', dir_b,
        '--stream-weights', '0.75,0.25', '--stream-steps', '24',
        '--log-every', '8',
        '--output-dir', str(tmp_path / 'mae-stream')])
    assert res['steps'] == 24 and np.isfinite(res['pretrain_loss'])
    mix = {int(k): v for k, v in res['mix_counts'].items()}
    # deterministic seeded mixing: both corpora drawn, realized proportion
    # near the 0.75/0.25 request (binomial std at n=24 is ~2 steps)
    assert set(mix) == {0, 1} and sum(mix.values()) == 24
    assert 13 <= mix[0] <= 23, mix
    assert res['checkpoint']


def test_cli_stream_pretrain_kill_resume_bit_exact(tmp_path, rng, capsys):
    """A streaming job SIGKILLED mid-run and resumed via --resume must land
    bit-identically on the uninterrupted run: a real subprocess runs the
    SAME 20-step job (same LR schedule span), gets kill -9'd once its
    step-10 checkpoint commits, and ``--resume`` finishes it over the same
    deterministic mixed stream -- the crash-recovery contract of BASELINE
    config 5 (multi-day pretrain surviving preemption)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from ecg_representation_learning_tpu.train.checkpoint import (
        latest_committed_checkpoint)
    dir_a, dir_b = _export_both(tmp_path, rng, capsys)
    base = ['pretrain', '--size', 'debug', '--batch-size', '8', '--lr', '1e-3',
            '--stream', dir_a, '--stream', dir_b,
            '--stream-weights', '0.5,0.5', '--log-every', '5',
            '--stream-steps', '20', '--ckpt-every', '10']
    full = _cli_json(capsys, base + ['--output-dir', str(tmp_path / 'full')])
    assert full['steps'] == 20

    killed_dir = str(tmp_path / 'killed')
    env = {**os.environ, 'JAX_PLATFORMS': 'cpu'}
    proc = subprocess.Popen(
        [sys.executable, '-m', 'ecg_representation_learning_tpu.cli',
         '--platform', 'cpu'] + base + ['--output-dir', killed_dir],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    deadline = time.time() + 600
    try:
        # kill -9 as soon as ANY checkpoint is durably committed (resume
        # from any committed step reaches the same final state)
        while latest_committed_checkpoint(killed_dir) is None:
            assert proc.poll() is None, 'subprocess died before checkpointing'
            assert time.time() < deadline, 'no checkpoint within 10 min'
            time.sleep(0.25)
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
    resumed = _cli_json(capsys, base + ['--resume', '--output-dir', killed_dir])
    assert resumed['steps'] == 20
    # the resumed leg consumed only the tail of the stream (the kill landed
    # mid-run, so this also proves the subprocess did not just finish)
    n_tail = sum(resumed['mix_counts'].values())
    assert 1 <= n_tail <= 10, resumed['mix_counts']
    assert resumed['pretrain_loss'] == full['pretrain_loss'], \
        (resumed['pretrain_loss'], full['pretrain_loss'])
