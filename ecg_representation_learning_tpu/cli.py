"""Command-line interface.

The reference has no CLI at all -- every entry point is an ``if __name__``
block or a notebook (SURVEY.md §1).  This CLI covers the full workflow:

    python -m ecg_representation_learning_tpu.cli export   --dataset PTB-XL --data-root ... --out ...
    python -m ecg_representation_learning_tpu.cli denoise  --input PTB-XL-combined.hdf5
    python -m ecg_representation_learning_tpu.cli train    --size base --epochs 32 ...
    python -m ecg_representation_learning_tpu.cli pretrain --size base --mask-ratio 0.75 ...
    python -m ecg_representation_learning_tpu.cli evaluate --checkpoint ckpt-final ...
    python -m ecg_representation_learning_tpu.cli tokenize --k 8 --clusters 256 ...
    python -m ecg_representation_learning_tpu.cli synth    --n 512 --out data/
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def _add_common_train_flags(p):
    p.add_argument('--size', default='base',
                   choices=['debug', 'tiny', 'small', 'base', 'large'])
    p.add_argument('--epochs', type=int, default=3)
    p.add_argument('--batch-size', type=int, default=64)
    p.add_argument('--lr', type=float, default=3e-4)
    p.add_argument('--weight-decay', type=float, default=1e-2)
    p.add_argument('--schedule', default='cosine', choices=['cosine', 'constant'])
    p.add_argument('--warmup-ratio', type=float, default=0.05)
    p.add_argument('--patience', type=int, default=8)
    p.add_argument('--timeout-augment', action='store_true')
    p.add_argument('--mesh-model', type=int, default=1,
                   help='tensor-parallel axis size (data axis = n_devices / this)')
    p.add_argument('--fsdp', action='store_true',
                   help='ZeRO-style storage sharding of params + Adam moments '
                        'over the data axis')
    p.add_argument('--epoch-scan', action='store_true',
                   help='run each epoch as ONE jitted lax.scan dispatch over '
                        'the train step (device-resident splits; removes '
                        'per-step host dispatch -- bit-identical updates)')
    p.add_argument('--steps-per-dispatch', type=int, default=1,
                   help='unroll K train steps into one jitted dispatch '
                        '(amortizes per-dispatch runtime overhead on '
                        'high-latency-attached hosts; program size grows ~K-fold)')
    p.add_argument('--resident-dtype', default=None,
                   choices=[None, 'float16', 'bfloat16'],
                   help='storage dtype for the HBM-resident signals (halves '
                        'resident HBM and per-dispatch input-walk cost; steps '
                        'compute in float32)')
    p.add_argument('--grad-accum', type=int, default=1,
                   help='microbatches per optimizer step (activation memory '
                        '/ N at the same effective batch; grads averaged '
                        'before one update)')
    p.add_argument('--ema-decay', type=float, default=0.0,
                   help='>0: keep an EMA of the params (e.g. 0.999); '
                        'eval/inference then run on the EMA weights')
    p.add_argument('--moe-experts', type=int, default=0,
                   help='Switch-MoE: replace every --moe-every-th block\'s '
                        'MLP with this many expert FFNs behind a top-1 '
                        'router; expert stacks shard over the model axis '
                        '(expert parallelism, models/moe.py)')
    p.add_argument('--moe-every', type=int, default=2)
    p.add_argument('--seed', type=int, default=77)
    p.add_argument('--output-dir', default=None)
    p.add_argument('--n-sample', type=int, default=None)
    p.add_argument('--bf16', action=argparse.BooleanOptionalAction, default=True,
                   help='bfloat16 activations (--no-bf16 for float32)')
    p.add_argument('--patch-norm', action=argparse.BooleanOptionalAction,
                   default=True,
                   help='LayerNorms around the patch projection; use '
                        '--no-patch-norm for reference-layout checkpoints '
                        '(ported .pt / their orbax conversions)')


def _load_splits(args):
    from .data import load_ptbxl_from_export, get_ptbxl_splits, synth_ptbxl
    if args.hdf5 and args.labels_csv:
        return load_ptbxl_from_export(args.hdf5, args.labels_csv, args.n_sample)
    # fallback: synthetic corpus (documented; real corpora need the export step)
    print('[cli] no --hdf5/--labels-csv given; using a synthetic PTB-XL-shaped corpus',
          file=sys.stderr)
    signals, labels, folds = synth_ptbxl(n=args.synth_n)
    return get_ptbxl_splits(signals, labels, folds, args.n_sample)


def cmd_export(args):
    from .data.export import export_combined, export_records_csv
    from .registry import EXPORT_DATASETS
    keys = [args.dataset] if args.dataset else list(EXPORT_DATASETS)
    for key in keys:
        export_combined(key, args.data_root, args.out)
    export_records_csv(keys, args.data_root, os.path.join(args.out, 'records.csv'))


def cmd_export_shards(args):
    from .data.export import export_shards
    paths = export_shards(args.dataset, args.data_root, args.out,
                          records_per_shard=args.records_per_shard,
                          wire_dtype=args.wire, wire_scale=args.wire_scale)
    print(json.dumps({'shards': len(paths), 'out': args.out,
                      'first': paths[0]}))


def cmd_denoise(args):
    from .configs import PreprocessConfig
    from .data.export import export_denoised
    cfg = PreprocessConfig(nlm_search_width=args.nlm_search_width,
                           loess_robust_iters=args.loess_robust_iters)
    out = export_denoised(args.input, args.out, cfg=cfg, batch=args.batch,
                          resume=not args.no_resume)
    print(out)


def _model_cfg_for(args):
    """VitConfig for the run; --port-checkpoint implies the reference
    vit-pytorch-0.33.2-compatible layout (patch_norm=False)."""
    from .configs import VitConfig
    from .models.port import reference_vit_config
    from .utils.check_args import ca
    ca(model_size=args.size)
    dtype = 'bfloat16' if args.bf16 else 'float32'
    if getattr(args, 'port_checkpoint', None) or not getattr(args, 'patch_norm', True):
        cfg = reference_vit_config(args.size, dtype=dtype)
    else:
        cfg = VitConfig.from_defined(args.size, dtype=dtype)
    if getattr(args, 'moe_experts', 0):
        import dataclasses
        cfg = dataclasses.replace(cfg, moe_num_experts=args.moe_experts,
                                  moe_every=args.moe_every)
    return cfg


def _load_ckpt(tr, args):
    """Restore --checkpoint and surface a silent EMA drop: a checkpoint that
    carries ema_params restored without --ema-decay serves the RAW weights,
    which changes served accuracy with only a buried logger warning."""
    import sys
    tr.load_checkpoint(args.checkpoint)
    if getattr(tr, 'last_restore_info', {}).get('dropped_ema'):
        print(f'[hint] {args.checkpoint} contains EMA weights but '
              f'--ema-decay was not given: serving the RAW params. '
              f'Pass --ema-decay (e.g. the training value) to serve the '
              f'EMA weights instead.', file=sys.stderr)


def _maybe_port(args, trainer):
    """Install a reference torch state_dict into the trainer if requested."""
    if getattr(args, 'port_checkpoint', None):
        from .models.port import port_vit_pytorch_state_dict
        import torch
        sd = torch.load(args.port_checkpoint, map_location='cpu')
        if isinstance(sd, dict) and 'state_dict' in sd:
            sd = sd['state_dict']
        trainer.set_params(port_vit_pytorch_state_dict(sd, trainer.model_cfg))


def cmd_train(args):
    import dataclasses

    from .configs import TrainConfig
    from .registry import PTBXL_TRAIN_STATS
    from .train import Trainer
    splits = _load_splits(args)
    model_cfg = _model_cfg_for(args)
    cfg = TrainConfig(
        num_train_epoch=args.epochs, train_batch_size=args.batch_size,
        eval_batch_size=args.batch_size, learning_rate=args.lr,
        weight_decay=args.weight_decay, schedule=args.schedule,
        warmup_ratio=args.warmup_ratio, patience=args.patience,
        augment_timeout=args.timeout_augment, mesh_model=args.mesh_model,
        fsdp=args.fsdp, mesh_stage=getattr(args, 'mesh_stage', 1),
        seed=args.seed, n_sample=args.n_sample,
        epoch_scan=getattr(args, 'epoch_scan', False),
        steps_per_dispatch=getattr(args, 'steps_per_dispatch', 1),
        resident_dtype=getattr(args, 'resident_dtype', None),
        grad_accum=args.grad_accum, ema_decay=args.ema_decay,
        linear_probe=getattr(args, 'probe', False))
    stats = PTBXL_TRAIN_STATS[args.stats] if args.stats else None
    if cfg.mesh_stage > 1:
        # pipeline-parallel training mode (train/pipeline_vit.py): the block
        # stack staged over 'stage'; eval runs the merged plain model
        import jax

        from .models.vit import stack_unrolled_params, unstack_scanned_params
        from .train.pipeline_vit import PipelineVitTrainer
        pp_model_cfg = dataclasses.replace(model_cfg, scan_blocks=True)
        n_data = len(jax.devices()) // cfg.mesh_stage
        pp = PipelineVitTrainer(
            pp_model_cfg, dataclasses.replace(cfg, mesh_data=n_data),
            train_data=splits.train, norm_stats=stats,
            output_dir=args.output_dir)
        n_layers = pp_model_cfg.num_hidden_layers
        if getattr(args, 'port_checkpoint', None):
            # reference torch .pt -> unrolled layout -> stacked -> staged
            from .models.port import port_vit_pytorch_state_dict
            import torch
            sd = torch.load(args.port_checkpoint, map_location='cpu')
            if isinstance(sd, dict) and 'state_dict' in sd:
                sd = sd['state_dict']
            ported = port_vit_pytorch_state_dict(sd, pp_model_cfg)
            pp.set_merged_params(stack_unrolled_params(ported, n_layers))
        if getattr(args, 'init_encoder', None):
            # SSL trunk (MAE or contrastive, auto-detected) -> the unrolled
            # view of the pipeline params -> staged
            from .train.contrastive import load_any_encoder
            if pp.state is None:
                pp.init_state()
            unrolled = unstack_scanned_params(pp.merged_params(), n_layers)
            merged = stack_unrolled_params(
                load_any_encoder(args.init_encoder, unrolled), n_layers)
            pp.set_merged_params(merged)
        if args.resume_from:
            pp.load_checkpoint(args.resume_from)
        result = pp.train()
        ev_tr = Trainer(pp_model_cfg, TrainConfig(eval_batch_size=args.batch_size),
                        norm_stats=stats, output_dir=args.output_dir)
        ev_tr.init_state()
        ev_tr.set_params(pp.merged_params())
        test_metrics = ev_tr.evaluate(splits.test)
        print(json.dumps({'train_loss': result['loss'],
                          'test_macro_auc': test_metrics['macro_auc'],
                          'mesh': f'{n_data} data x {cfg.mesh_stage} stage'}))
        return
    tr = Trainer(model_cfg, cfg, train_data=splits.train, eval_data=splits.eval,
                 norm_stats=stats, output_dir=args.output_dir)
    _maybe_port(args, tr)
    if getattr(args, 'init_encoder', None):
        # SSL -> supervised handoff: pretrained trunk into the classifier
        # (MAE or contrastive checkpoint, auto-detected from its param tree;
        # full fine-tune by default; --probe freezes the trunk)
        from .train.contrastive import load_any_encoder
        if tr.state is None:
            tr.init_state()
        tr.set_params(load_any_encoder(args.init_encoder, tr.state.params))
    if args.resume_from:
        tr.load_checkpoint(args.resume_from)
    result = tr.train()
    test_metrics = tr.evaluate(splits.test)
    print(json.dumps({'best_eval_loss': result['best_eval_loss'],
                      'test_macro_auc': test_metrics['macro_auc'],
                      'epochs': result['epochs']}))


def _expand_corpus(spec: str):
    """One ``--stream`` value -> sorted shard paths: a directory (all *.hdf5
    inside), a glob, or a single shard file."""
    import glob as globlib
    if os.path.isdir(spec):
        paths = sorted(globlib.glob(os.path.join(spec, '*.hdf5')))
    elif any(ch in spec for ch in '*?['):
        paths = sorted(globlib.glob(spec))
    else:
        paths = [spec]
    if not paths:
        raise SystemExit(f'--stream {spec}: no shard files found')
    return paths


def _cmd_pretrain_stream(args):
    """BASELINE config 5 as a product path: streaming multi-corpus MAE
    pretrain over shard directories (``cli export-shards`` output), with
    per-corpus weighted mixing, per-corpus native-rate on-device preprocess,
    int16 wire decode, periodic checkpoints and crash-exact resume."""
    from .configs import MaeConfig, TrainConfig
    from .data import MixedRecordStream, prefetch_to_device, read_shard_meta
    from .registry import PTBXL_TRAIN_STATS
    from .train.pretrain import MaeTrainer
    if getattr(args, 'objective', 'mae') != 'mae':
        raise SystemExit('--stream supports --objective mae (the config-5 '
                         'pretrain job); contrastive streaming is not a '
                         'reference capability')
    corpora = [_expand_corpus(s) for s in args.stream]
    metas = [read_shard_meta(c[0]) for c in corpora]
    # per-corpus native rate + wire scale: shard metadata by default
    # (written by `cli export-shards`), flags override for plain shards
    if args.stream_raw_fqs:
        raw_fqs = [int(v) for v in args.stream_raw_fqs.split(',')]
    else:
        raw_fqs = [m.get('fqs', 250) for m in metas]
    if args.stream_wire_scale:
        wire_scale = [(None if v in ('', 'none') else float(v))
                      for v in args.stream_wire_scale.split(',')]
    else:
        wire_scale = [m.get('wire_scale') for m in metas]
    weights = ([float(v) for v in args.stream_weights.split(',')]
               if args.stream_weights else None)
    for name, seq in (('--stream-raw-fqs', raw_fqs),
                      ('--stream-wire-scale', wire_scale),
                      ('--stream-weights', weights or raw_fqs)):
        if len(seq) != len(corpora):
            raise SystemExit(f'{name}: {len(seq)} values for '
                             f'{len(corpora)} corpora')
    model_cfg = _model_cfg_for(args)
    # train_data=None makes steps_per_epoch 1, so the LR schedule spans
    # exactly --stream-steps optimizer steps
    cfg = TrainConfig(
        num_train_epoch=args.stream_steps, train_batch_size=args.batch_size,
        eval_batch_size=args.batch_size, learning_rate=args.lr,
        weight_decay=args.weight_decay, schedule=args.schedule,
        warmup_ratio=args.warmup_ratio, grad_accum=args.grad_accum,
        ema_decay=args.ema_decay, mesh_model=args.mesh_model, fsdp=args.fsdp,
        seed=args.seed)
    stats = PTBXL_TRAIN_STATS[args.stats] if args.stats else None
    tr = MaeTrainer(model_cfg, MaeConfig(mask_ratio=args.mask_ratio), cfg,
                    norm_stats=stats,
                    output_dir=args.output_dir or 'runs/mae-stream')
    stream = MixedRecordStream(corpora, batch_size=args.batch_size,
                               weights=weights, seed=args.seed, dtype=None)
    res = tr.train_stream(
        prefetch_to_device(iter(stream), depth=2),
        total_steps=args.stream_steps, raw_fqs=raw_fqs,
        wire_scale=wire_scale, log_every=args.log_every,
        ckpt_every=args.ckpt_every,
        resume=getattr(args, 'resume_from', None) or args.resume)
    ckpt = tr.latest_checkpoint() or tr.save_checkpoint(tag='final')
    print(json.dumps({'pretrain_loss': res['loss'], 'steps': res['steps'],
                      'mix_counts': res['mix_counts'],
                      'corpora': [len(c) for c in corpora],
                      'checkpoint': ckpt}))


def cmd_pretrain(args):
    from .configs import ContrastiveConfig, MaeConfig, TrainConfig
    from .registry import PTBXL_TRAIN_STATS
    from .train.contrastive import ContrastiveTrainer
    from .train.pretrain import MaeTrainer
    if getattr(args, 'stream', None):
        return _cmd_pretrain_stream(args)
    splits = _load_splits(args)
    model_cfg = _model_cfg_for(args)
    cfg = TrainConfig(
        num_train_epoch=args.epochs, train_batch_size=args.batch_size,
        eval_batch_size=args.batch_size, learning_rate=args.lr,
        weight_decay=args.weight_decay, schedule=args.schedule,
        warmup_ratio=args.warmup_ratio, patience=args.patience,
        grad_accum=args.grad_accum, ema_decay=args.ema_decay,
        mesh_model=args.mesh_model, fsdp=args.fsdp, seed=args.seed)
    stats = PTBXL_TRAIN_STATS[args.stats] if args.stats else None
    if getattr(args, 'objective', 'mae') == 'contrastive':
        tr = ContrastiveTrainer(
            model_cfg, ContrastiveConfig(temperature=args.temperature), cfg,
            train_data=splits.train, eval_data=splits.eval, norm_stats=stats,
            output_dir=args.output_dir or 'runs/contrastive')
    else:
        tr = MaeTrainer(model_cfg, MaeConfig(mask_ratio=args.mask_ratio), cfg,
                        train_data=splits.train, eval_data=splits.eval,
                        norm_stats=stats,
                        output_dir=args.output_dir or 'runs/mae')
    result = tr.train(resume=bool(getattr(args, 'resume_from', None))
                      and args.resume_from)
    print(json.dumps({'pretrain_loss': result['loss'],
                      'best_eval_loss': result.get('best_eval_loss'),
                      'checkpoint': result['checkpoint']}))


def cmd_evaluate(args):
    from .configs import TrainConfig
    from .registry import PTBXL_TRAIN_STATS
    from .train import Trainer
    from .train.evaluate import evaluate_trained
    splits = _load_splits(args)
    model_cfg = _model_cfg_for(args)
    # ema_decay threads through so a --ema-decay-trained checkpoint's EMA
    # weights are restored and served (TrainConfig(ema_decay=0) would drop
    # them and silently evaluate the raw params)
    tr = Trainer(model_cfg, TrainConfig(ema_decay=args.ema_decay),
                 train_data=None, eval_data=splits.eval,
                 norm_stats=PTBXL_TRAIN_STATS[args.stats] if args.stats else None)
    tr.init_state()
    _maybe_port(args, tr)
    if args.checkpoint:
        _load_ckpt(tr, args)
    results = evaluate_trained(tr, {'eval': splits.eval, 'test': splits.test},
                               out_dir=args.out)
    if getattr(args, 'pick_edge_samples', False):
        from .train.evaluate import pick_eval_eg
        pick_eval_eg(tr, {'eval': splits.eval, 'test': splits.test},
                     out_dir=args.out)
    print(json.dumps({k: v.get('macro_auc') for k, v in results.items()
                      if isinstance(v, dict)}))


def cmd_visualize(args):
    """Render an attention-rollout figure for one sample (reference
    EcgVitVisualizer workflow, ecg_vit.py:164-265)."""
    import matplotlib
    matplotlib.use('Agg')
    import numpy as np
    import jax
    from .configs import TrainConfig
    from .registry import PTBXL_TRAIN_STATS
    from .train import Trainer
    from .utils import EcgVitVisualizer
    splits = _load_splits(args)
    model_cfg = _model_cfg_for(args)
    tr = Trainer(model_cfg, TrainConfig(ema_decay=args.ema_decay),
                 eval_data=splits.eval,
                 norm_stats=PTBXL_TRAIN_STATS[args.stats] if args.stats else None)
    tr.init_state()
    if args.checkpoint:
        _load_ckpt(tr, args)
    data = {'eval': splits.eval, 'test': splits.test}[args.split]
    sig = np.asarray(data.signals[args.index], np.float32)
    # apply the same normalize+pad the model expects
    mean = np.asarray(tr.mean).reshape(-1, 1)
    std = np.asarray(tr.std).reshape(-1, 1)
    sig = (sig - mean) / std
    n_pad = model_cfg.patch_size - (sig.shape[-1] % model_cfg.patch_size)
    sig = np.pad(sig, [(0, 0), (0, n_pad)])[:, :model_cfg.max_signal_length]
    # _eval_params resolves to the EMA weights when --ema-decay was given --
    # the visualized attention must come from the weights actually served
    viz = EcgVitVisualizer(tr.model, tr._eval_params())
    path = viz(sig, data.labels[args.index], save=True)
    print(json.dumps({'figure': path}))


def cmd_infer(args):
    """Batch inference on an unlabeled combined HDF5: per-record sigmoid
    probabilities + top-k PTB-XL codes to JSON (the serving-side counterpart
    of ``evaluate``, which needs labels)."""
    import numpy as np
    from .configs import TrainConfig
    from .data import EcgDataset
    from .registry import PTBXL_ID2CODE, PTBXL_TRAIN_STATS
    from .train import Trainer
    model_cfg = _model_cfg_for(args)
    sigs = EcgDataset(args.hdf5).load()
    tr = Trainer(model_cfg, TrainConfig(eval_batch_size=args.batch_size,
                                        ema_decay=args.ema_decay),
                 norm_stats=PTBXL_TRAIN_STATS[args.stats] if args.stats else None)
    tr.init_state()
    _maybe_port(args, tr)
    if args.checkpoint:
        _load_ckpt(tr, args)
    if args.int8:
        tr.enable_int8_inference()
    # predict_long: records longer than the model input are auto-windowed
    # (sliding windows + per-class max); short records pass straight through
    probs = tr.predict_long(sigs)
    k = args.top_k
    top = np.argsort(-probs, axis=1)[:, :k]
    records = [
        {'record': int(i),
         'top': [{'code': PTBXL_ID2CODE[int(c)], 'prob': float(probs[i, c])}
                 for c in top[i]]}
        for i in range(probs.shape[0])
    ]
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump({'n_records': len(records), 'top_k': k,
                   'records': records}, f)
    print(json.dumps({'out': args.out, 'n_records': len(records)}))


def cmd_serve(args):
    """Run the batch-inference HTTP server (serving.py): model loaded once,
    resident on the accelerator; JSON in/out."""
    from .configs import TrainConfig
    from .registry import PTBXL_TRAIN_STATS
    from .serving import serve
    from .train import Trainer
    model_cfg = _model_cfg_for(args)
    tr = Trainer(model_cfg, TrainConfig(eval_batch_size=args.batch_size,
                                        ema_decay=args.ema_decay),
                 norm_stats=PTBXL_TRAIN_STATS[args.stats] if args.stats else None)
    tr.init_state()
    _maybe_port(args, tr)
    if args.checkpoint:
        _load_ckpt(tr, args)
    if args.int8:
        tr.enable_int8_inference()
    httpd = serve(tr, host=args.host, port=args.port)
    print(json.dumps({'serving': f'http://{args.host}:{args.port}',
                      'endpoints': ['/health', '/predict']}), flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()


def cmd_export_model(args):
    """Export the trained model as a portable StableHLO serving artifact
    (models/export_artifact.py): normalization + pad + forward + sigmoid in
    one program, weights embedded, symbolic batch."""
    from .configs import TrainConfig
    from .models.export_artifact import export_model
    from .registry import PTBXL_TRAIN_STATS
    from .train import Trainer
    model_cfg = _model_cfg_for(args)
    tr = Trainer(model_cfg, TrainConfig(ema_decay=args.ema_decay),
                 norm_stats=PTBXL_TRAIN_STATS[args.stats] if args.stats else None)
    tr.init_state()
    _maybe_port(args, tr)
    if args.checkpoint:
        _load_ckpt(tr, args)
    platforms = args.platforms.split(',') if args.platforms else None
    meta = export_model(tr, args.out, signal_length=args.signal_length,
                        int8=args.int8, platforms=platforms)
    print(json.dumps({'out': args.out, 'bytes': meta['bytes'],
                      'platforms': meta['platforms'],
                      'signal_length': meta['wire']['signal_length'],
                      'int8': meta['int8']}))


def cmd_tokenize(args):
    import numpy as np
    from .models.tokenizer import EcgTokenizer
    from .utils.check_args import ca
    ca(pad_mode=args.pad)
    if args.hdf5:
        from .data import EcgDataset
        sigs = EcgDataset(args.hdf5).load()
    else:
        from .data import synth_ptbxl
        sigs, _, _ = synth_ptbxl(n=args.synth_n)
    tok = EcgTokenizer(k=args.k, pad=args.pad).fit(
        sigs, n_clusters=args.clusters, n_iter=args.iters, seed=args.seed)
    path = tok.save(args.out)
    rf = tok.rank_frequency()
    print(json.dumps({'tokenizer': path, 'n_clusters': int(tok.centers.shape[0]),
                      'power_law_exponent': rf['exponent']}))


def cmd_port(args):
    """One-time conversion: reference torch EcgVit state_dict (.pt) -> an
    orbax checkpoint usable with --checkpoint/--resume-from (no torch needed
    afterwards)."""
    from .configs import TrainConfig
    from .train import Trainer
    model_cfg = _model_cfg_for(args)  # --port-checkpoint forces patch_norm=False
    tr = Trainer(model_cfg, TrainConfig(), output_dir=args.out)
    tr.init_state()
    _maybe_port(args, tr)
    path = tr.save_checkpoint(tag='ported')
    print(json.dumps({'checkpoint': path, 'size': args.size,
                      'note': 'load with a patch_norm=False config '
                              '(models.port.reference_vit_config)'}))


def cmd_synth(args):
    from .data import synth_ptbxl, write_combined_hdf5
    import pandas as pd
    signals, labels, folds = synth_ptbxl(
        n=args.n, seed=args.seed, n_marker_classes=args.marker_classes,
        hard=args.hard)
    h5 = write_combined_hdf5(os.path.join(args.out, 'PTB-XL-combined.hdf5'), signals)
    df = pd.DataFrame({'strat_fold': folds, 'labels': [str(l) for l in labels]})
    csv = os.path.join(args.out, 'ptb-xl-labels.csv')
    df.to_csv(csv, index=False)
    print(json.dumps({'hdf5': h5, 'labels_csv': csv, 'n': args.n}))


def main(argv=None):
    p = argparse.ArgumentParser(prog='ecg-tpu')
    p.add_argument('--platform', default=None, choices=['cpu', 'tpu', 'axon'],
                   help='force a JAX backend (overrides site config)')
    p.add_argument('--host-devices', type=int, default=None,
                   help='virtual CPU device count (for multi-chip dry runs)')
    sub = p.add_subparsers(dest='cmd', required=True)

    pe = sub.add_parser('export', help='raw corpora -> unified 250 Hz HDF5')
    pe.add_argument('--dataset', default=None)
    pe.add_argument('--data-root', required=True)
    pe.add_argument('--out', required=True)
    pe.set_defaults(fn=cmd_export)

    pes = sub.add_parser('export-shards',
                         help='raw corpus -> native-rate int16 pretrain '
                              'shards (cli pretrain --stream input)')
    pes.add_argument('--dataset', required=True)
    pes.add_argument('--data-root', required=True)
    pes.add_argument('--out', required=True)
    pes.add_argument('--records-per-shard', type=int, default=256)
    pes.add_argument('--wire', default='int16', choices=['int16', 'float32'],
                     help='shard storage dtype (int16 counts halve the '
                          'host->HBM wire; decoded on device)')
    pes.add_argument('--wire-scale', type=float, default=1000.0,
                     help='counts per physical unit for int16 shards')
    pes.set_defaults(fn=cmd_export_shards)

    pd_ = sub.add_parser('denoise', help='combined HDF5 -> denoised HDF5')
    pd_.add_argument('--input', required=True)
    pd_.add_argument('--out', default=None)
    pd_.add_argument('--batch', type=int, default=64)
    pd_.add_argument('--nlm-search-width', type=int, default=None)
    pd_.add_argument('--loess-robust-iters', type=int, default=5,
                     help='bisquare iterations (5 = MATLAB-exact; 2 stays '
                          'within the reference export tolerance at ~2.4x '
                          'the rloess speed)')
    pd_.add_argument('--no-resume', action='store_true')
    pd_.set_defaults(fn=cmd_denoise)

    for name, fn in (('train', cmd_train), ('pretrain', cmd_pretrain),
                     ('evaluate', cmd_evaluate), ('visualize', cmd_visualize)):
        sp = sub.add_parser(name)
        _add_common_train_flags(sp)
        sp.add_argument('--hdf5', default=None)
        sp.add_argument('--labels-csv', default=None)
        sp.add_argument('--synth-n', type=int, default=512)
        sp.add_argument('--stats', default=None, choices=[None, 'original', 'denoised'])
        if name in ('train', 'evaluate'):
            sp.add_argument('--port-checkpoint', default=None, metavar='PT_FILE',
                            help='initialize from a reference torch EcgVit '
                                 'state_dict (.pt) via models/port.py')
        if name in ('train', 'pretrain'):
            sp.add_argument('--resume-from', default=None)
        if name == 'train':
            sp.add_argument('--mesh-stage', type=int, default=1,
                            help='pipeline-parallel stage count (>1 stages '
                                 'the transformer stack over a stage mesh '
                                 'axis; GPipe microbatches)')
            sp.add_argument('--init-encoder', default=None, metavar='SSL_CKPT',
                            help='initialize the encoder trunk from a '
                                 'pretrain checkpoint (cli pretrain output; '
                                 'MAE or contrastive, auto-detected)')
            sp.add_argument('--probe', action='store_true',
                            help='linear probe: freeze the pretrained trunk, '
                                 'train only the classification head')
        if name == 'pretrain':
            sp.add_argument('--objective', default='mae',
                            choices=['mae', 'contrastive'],
                            help='self-supervised objective: masked-patch '
                                 'reconstruction (MAE) or two-view NT-Xent '
                                 '(SimCLR-style; negatives are the global '
                                 'batch, all-gathered over the data axis)')
            sp.add_argument('--mask-ratio', type=float, default=0.75)
            sp.add_argument('--temperature', type=float, default=0.1,
                            help='NT-Xent temperature (contrastive only)')
            sp.add_argument('--stream', action='append', default=None,
                            metavar='SHARDS',
                            help='streaming multi-corpus pretrain (BASELINE '
                                 'config 5): repeat once per corpus; each '
                                 'value is a shard directory, glob, or file '
                                 '(cli export-shards output). Batches mix '
                                 'across corpora by --stream-weights; each '
                                 'corpus is preprocessed on device at its '
                                 'own native rate (shard metadata)')
            sp.add_argument('--stream-steps', type=int, default=1000,
                            help='total optimizer steps of the streaming job '
                                 '(the LR schedule spans exactly this)')
            sp.add_argument('--stream-weights', default=None,
                            help='comma-separated per-corpus mixing weights '
                                 '(default: uniform)')
            sp.add_argument('--stream-raw-fqs', default=None,
                            help='comma-separated per-corpus native sampling '
                                 'rates; default: read from shard metadata')
            sp.add_argument('--stream-wire-scale', default=None,
                            help="comma-separated per-corpus int16 wire "
                                 "scales ('none' = float shards); default: "
                                 "shard metadata")
            sp.add_argument('--ckpt-every', type=int, default=0,
                            help='save a step-tagged checkpoint every N '
                                 'stream steps (crash-exact resume)')
            sp.add_argument('--resume', action='store_true',
                            help='resume the streaming job from the newest '
                                 'committed checkpoint under --output-dir '
                                 '(bit-identical to an uninterrupted run '
                                 'over the deterministic stream)')
            sp.add_argument('--log-every', type=int, default=50)
        if name in ('evaluate', 'visualize'):
            sp.add_argument('--checkpoint', default=None)
        if name == 'evaluate':
            sp.add_argument('--out', default='eval')
            sp.add_argument('--pick-edge-samples', action='store_true',
                            help='also dump low/median/high-loss sample indices')
        if name == 'visualize':
            sp.add_argument('--split', default='test', choices=['eval', 'test'])
            sp.add_argument('--index', type=int, default=0)
        sp.set_defaults(fn=fn)

    pi = sub.add_parser('infer', help='unlabeled HDF5 -> per-record top-k '
                                      'code probabilities (JSON)')
    _add_common_train_flags(pi)
    pi.add_argument('--hdf5', required=True)
    pi.add_argument('--stats', default=None, choices=[None, 'original', 'denoised'])
    pi.add_argument('--checkpoint', default=None)
    pi.add_argument('--port-checkpoint', default=None, metavar='PT_FILE')
    pi.add_argument('--top-k', type=int, default=5)
    pi.add_argument('--int8', action='store_true',
                    help='weight-only int8 quantized inference '
                         '(models/quantize.py; ~4x smaller weights, '
                         'dequant fused into the matmuls)')
    pi.add_argument('--out', default='predictions.json')
    pi.set_defaults(fn=cmd_infer)

    psv = sub.add_parser('serve', help='HTTP batch-inference server '
                                       '(GET /health, POST /predict)')
    _add_common_train_flags(psv)
    psv.add_argument('--stats', default=None,
                     choices=[None, 'original', 'denoised'])
    psv.add_argument('--checkpoint', default=None)
    psv.add_argument('--port-checkpoint', default=None, metavar='PT_FILE')
    psv.add_argument('--int8', action='store_true',
                     help='serve weight-only int8 quantized weights')
    psv.add_argument('--host', default='127.0.0.1')
    psv.add_argument('--port', type=int, default=8000)
    psv.set_defaults(fn=cmd_serve)

    pem = sub.add_parser('export-model',
                         help='trained checkpoint -> self-contained StableHLO '
                              'serving artifact (weights embedded; runs on '
                              'any jax/XLA runtime without this package)')
    _add_common_train_flags(pem)
    pem.add_argument('--stats', default=None,
                     choices=[None, 'original', 'denoised'])
    pem.add_argument('--checkpoint', default=None)
    pem.add_argument('--port-checkpoint', default=None, metavar='PT_FILE')
    pem.add_argument('--int8', action='store_true',
                     help='bake weight-only int8 tensors + dequant into the '
                          'program (~4x smaller artifact)')
    pem.add_argument('--signal-length', type=int, default=None,
                     help='wire length L of requests (default: model input '
                          'minus one patch)')
    pem.add_argument('--platforms', default=None,
                     help="comma-separated lowering targets, e.g. 'tpu,cpu' "
                          '(default: this machine)')
    pem.add_argument('--out', default='exported_model')
    pem.set_defaults(fn=cmd_export_model)

    pt = sub.add_parser('tokenize')
    pt.add_argument('--hdf5', default=None)
    pt.add_argument('--synth-n', type=int, default=128)
    pt.add_argument('--k', type=int, default=8)
    pt.add_argument('--pad', default='shift', choices=['zero', 'shift'])
    pt.add_argument('--clusters', type=int, default=256)
    pt.add_argument('--iters', type=int, default=64)
    pt.add_argument('--seed', type=int, default=77)
    pt.add_argument('--out', default='tokenizer.pickle')
    pt.set_defaults(fn=cmd_tokenize)

    pp = sub.add_parser('port', help='torch EcgVit .pt -> orbax checkpoint')
    _add_common_train_flags(pp)
    pp.add_argument('--port-checkpoint', required=True, metavar='PT_FILE')
    pp.add_argument('--out', default='ported')
    pp.set_defaults(fn=cmd_port)

    ps = sub.add_parser('synth', help='write a synthetic PTB-XL-shaped corpus')
    ps.add_argument('--n', type=int, default=512)
    ps.add_argument('--seed', type=int, default=77)
    ps.add_argument('--marker-classes', type=int, default=0,
                    help='>0: mark that many classes with frequency-band '
                         'markers (multi-class quality benchmark)')
    ps.add_argument('--hard', action='store_true',
                    help='discriminating variant: overlapping bands, noisy '
                         'amplitudes, confounders, long-tailed prevalence')
    ps.add_argument('--out', default='data')
    ps.set_defaults(fn=cmd_synth)

    args = p.parse_args(argv)
    if args.host_devices:
        flags = os.environ.get('XLA_FLAGS', '')
        os.environ['XLA_FLAGS'] = \
            f'{flags} --xla_force_host_platform_device_count={args.host_devices}'.strip()
    from .runtime import enable_compilation_cache, force_platform
    force_platform(args.platform)
    enable_compilation_cache()
    return args.fn(args)


if __name__ == '__main__':
    main()
