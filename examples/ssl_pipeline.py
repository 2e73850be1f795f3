"""SSL walkthrough: pretrain -> linear probe -> fine-tune, through the CLI.

The reference *names* self-supervision as its goal (dataset.py:2-5) but never
ships the workflow; this framework does, and this script is its front door.
It drives the actual command-line interface (the same commands a user types),
end to end on a synthetic PTB-XL-shaped corpus:

  1. ``cli synth``      -- write a PTB-XL-shaped corpus (HDF5 + labels CSV)
  2. ``cli pretrain --objective mae``      -- masked-patch reconstruction
  3. ``cli train --init-encoder --probe``  -- LINEAR PROBE: frozen trunk,
                                              train only the classifier head
  4. ``cli train --init-encoder``          -- FULL FINE-TUNE from the trunk
  5. ``cli train`` (no init)               -- from-scratch control run
  6. ``cli evaluate --checkpoint ...``     -- AUROC report JSON on disk

Run:  python examples/ssl_pipeline.py                       (CPU, ~8-10 min;
                                                             compile-dominated)
      python examples/ssl_pipeline.py --n 2048 --epochs 8 --control

Expected output (CPU, defaults; numbers vary a little with the seed):

  [1/5] synth corpus ............ 384 records -> /tmp/.../PTB-XL-combined.hdf5
  [2/5] MAE pretrain ............ pretrain_loss ~1.0-1.1 (falls epoch over epoch)
  [3/5] linear probe ............ test macro-AUROC ~0.60 (chance = 0.5)
  [4/5] full fine-tune .......... test macro-AUROC ~0.75-0.9
  [5/5] evaluate report ......... evaluation JSON written under eval/
  (--control adds a from-scratch run at the same budget: similar AUROC on
   this easy synthetic corpus; on few-label real data the SSL init is what
   closes the gap)

The probe beating chance (0.5) with a FROZEN trunk is the proof that MAE
pretraining learned signal structure.  For the pretext that WINS the
label-scarce transfer comparison, use ``--objective contrastive``: on the
hard reference-scale corpus the frozen contrastive trunk's probe (0.82)
beats even full from-scratch training (0.73) at 2% labels — the measured
study is PERF.md "SSL transfer", and the driver verifies it every round
(bench.py ssl_transfer_auroc_delta).  With real data, replace step 1 with
``cli export`` over a PhysioNet tree and pass the exported HDF5.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cli(*args, capture=True):
    """Run one CLI command exactly as a user would."""
    cmd = [sys.executable, '-m', 'ecg_representation_learning_tpu.cli',
           '--platform', 'cpu'] + [str(a) for a in args]
    print('    $', ' '.join(cmd[2:]))
    out = subprocess.run(cmd, cwd=REPO, check=True,
                         capture_output=capture, text=True)
    if capture:
        # the CLI prints one JSON result line last
        line = out.stdout.strip().splitlines()[-1]
        return json.loads(line)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=384, help='synthetic corpus size')
    ap.add_argument('--epochs', type=int, default=3)
    ap.add_argument('--size', default='debug', help='model size ladder name')
    ap.add_argument('--control', action='store_true',
                    help='also run the from-scratch control (one more ~2.5 '
                         'min CPU training leg)')
    ap.add_argument('--workdir', default=None)
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix='ssl-pipeline-')
    os.makedirs(work, exist_ok=True)
    data = os.path.join(work, 'data')
    os.makedirs(data, exist_ok=True)
    print(f'workdir: {work}')

    # 1. corpus ------------------------------------------------------------
    print(f'[1/5] synth corpus ({args.n} records)')
    r = cli('synth', '--n', args.n, '--marker-classes', 8, '--out', data)
    h5, csv = r['hdf5'], r['labels_csv']
    corpus = ['--hdf5', h5, '--labels-csv', csv]

    # 2. MAE pretrain --------------------------------------------------------
    print('[2/5] MAE pretrain (masked-patch reconstruction, 75% mask)')
    r = cli('pretrain', '--objective', 'mae', '--size', args.size,
            '--epochs', args.epochs, '--batch-size', 64, '--lr', 1e-3,
            '--output-dir', os.path.join(work, 'mae'), *corpus)
    ssl_ckpt = r['checkpoint']
    print(f'    pretrain loss {r["pretrain_loss"]:.4f} -> {ssl_ckpt}')

    # 3. linear probe --------------------------------------------------------
    print('[3/5] linear probe (trunk FROZEN, head only)')
    r = cli('train', '--size', args.size, '--epochs', args.epochs,
            '--batch-size', 64, '--lr', 1e-2,
            '--init-encoder', ssl_ckpt, '--probe',
            '--output-dir', os.path.join(work, 'probe'), *corpus)
    probe_auc = r['test_macro_auc']
    print(f'    probe test macro-AUROC = {probe_auc:.4f} '
          f'(chance = 0.5; > chance proves the frozen trunk carries signal)')

    # 4. full fine-tune --------------------------------------------------------
    print('[4/5] full fine-tune from the pretrained trunk')
    r = cli('train', '--size', args.size, '--epochs', args.epochs,
            '--batch-size', 64, '--lr', 1e-3, '--init-encoder', ssl_ckpt,
            '--output-dir', os.path.join(work, 'finetune'), *corpus)
    ft_auc = r['test_macro_auc']
    print(f'    fine-tune test macro-AUROC = {ft_auc:.4f}')

    scratch_auc = None
    if args.control:
        print('[+]   from-scratch control (same budget, no SSL init)')
        r = cli('train', '--size', args.size, '--epochs', args.epochs,
                '--batch-size', 64, '--lr', 1e-3,
                '--output-dir', os.path.join(work, 'scratch'), *corpus)
        scratch_auc = r['test_macro_auc']
        print(f'    scratch test macro-AUROC = {scratch_auc:.4f}')

    # 5. offline AUROC report -------------------------------------------------
    print('[5/5] offline evaluation report on the fine-tuned checkpoint')
    ft_ckpt = os.path.join(work, 'finetune', 'ckpt-final')
    r = cli('evaluate', '--size', args.size, '--checkpoint', ft_ckpt,
            '--out', os.path.join(work, 'eval'), *corpus)
    print(f'    report splits: {r}')

    print('\nsummary')
    print(f'  linear probe   macro-AUROC {probe_auc:.4f}')
    print(f'  fine-tune      macro-AUROC {ft_auc:.4f}')
    if scratch_auc is not None:
        print(f'  from scratch   macro-AUROC {scratch_auc:.4f}')
    print(f'  artifacts under {work}')
    if not (probe_auc > 0.5):
        raise SystemExit('probe did not beat chance -- SSL handoff broken?')


if __name__ == '__main__':
    main()
