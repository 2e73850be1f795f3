"""Portable serving artifacts: the full inference program as StableHLO.

The reference's only deployment unit is a pickled torch checkpoint that
needs the exact training code to load (reference models/train.py:439-468
``load_trained``); serving it anywhere else means re-installing the repo.
This module instead serializes the COMPLETE inference program -- on-device
normalization + always-pad + ViT forward + sigmoid, with the trained
weights baked in as constants -- via ``jax.export`` to StableHLO bytes.
The artifact is self-contained: any jax/XLA runtime can deserialize and
run it without this package, flax, or the checkpoint; XLA's compatibility
guarantees (jax.export's documented backward-compat window) make it a
durable deployment unit for a TPU serving fleet.

The batch dimension is exported symbolically, so one artifact serves any
request size; the signal length is static (XLA wants static shapes on the
hot path -- pick the wire length at export time, the server pads to it).

Weight-only int8 export bakes the quantized tensors + per-output-channel
dequant (models/quantize.py) INTO the program: the artifact shrinks ~4x
and small-batch serving stays weight-bandwidth-bound.

Layout on disk (a directory):
  model.stablehlo   -- jax.export serialization (weights embedded)
  metadata.json     -- model config, wire shapes, class codes/descriptions,
                       normalization stats, jax/export versions
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

ARTIFACT_VERSION = 1
_MODEL_FILE = 'model.stablehlo'
_META_FILE = 'metadata.json'
_WEIGHTS_FILE = 'weights.npz'


def _infer_fn(model, params, mean, std, patch_size):
    """The standalone serving program: raw (B, C, L) float32 at the native
    250 Hz grid -> per-class sigmoid probabilities.  Mirrors the Trainer's
    eval path (trainer.py eval_step) minus labels/loss."""
    def fn(signals):
        sig = (signals - mean.reshape((-1, 1))) / std.reshape((-1, 1))
        from ..ops.pad import time_end_pad
        sig = time_end_pad(sig, patch_size)
        out = model.apply(params, sig, deterministic=True)
        return jax.nn.sigmoid(out.logits.astype(jnp.float32))
    return fn


def export_model(
    trainer,
    path: str,
    signal_length: Optional[int] = None,
    int8: bool = False,
    platforms: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    """Export ``trainer``'s served model (EMA weights when tracked, int8
    when asked) as a self-contained StableHLO artifact at ``path``.

    ``signal_length`` is the wire length L of requests (default: the
    model's input minus one patch, so the always-pad lands exactly on
    ``max_signal_length``).  ``platforms`` lowers for several backends in
    one artifact (e.g. ``['tpu', 'cpu']`` for fleet + canary); default is
    the exporting machine's backend.  Returns the metadata dict.
    """
    from ..registry import PTBXL_CODE2DESCRIPTION, PTBXL_ID2CODE
    cfg = trainer.model_cfg
    params = trainer._eval_params()
    assert params is not None, 'trainer has no params: init/load a checkpoint first'
    L = signal_length or (cfg.max_signal_length - cfg.patch_size)
    # time_end_pad always pads (a full extra patch when L is already a
    # multiple): the padded length must not exceed the position table
    padded = L + (cfg.patch_size - L % cfg.patch_size
                  if L % cfg.patch_size else cfg.patch_size)
    assert padded <= cfg.max_signal_length, \
        f'signal_length {L} pads to {padded} > max_signal_length ' \
        f'{cfg.max_signal_length}'

    model = trainer.model
    mean, std = np.asarray(trainer.mean), np.asarray(trainer.std)
    weight_leaves: list = []
    if int8:
        # the int8 tensors must enter the program as ARGUMENTS, not closure
        # consts: jnp ops on concrete values run eagerly at trace time, so a
        # closed-over dequant would embed the re-expanded f32 weights.  The
        # quantized leaves ship in a sidecar npz (~4x smaller than f32) and
        # are bound at load; dequant stays in the traced program where XLA
        # fuses it into each matmul's operand read.
        from .quantize import dequantize_params, quantize_params_int8
        qp, sc = quantize_params_int8(params)
        weight_leaves, treedef = jax.tree.flatten(
            (jax.tree.map(np.asarray, qp), {k: np.asarray(v)
                                            for k, v in sc.items()}))

        def fn(signals, *ws):
            qp_, sc_ = jax.tree.unflatten(treedef, list(ws))
            return _infer_fn(model, dequantize_params(qp_, sc_), mean, std,
                             cfg.patch_size)(signals)
    else:
        host_params = jax.tree.map(np.asarray, params)
        fn = _infer_fn(model, host_params, mean, std, cfg.patch_size)

    (b,) = jax.export.symbolic_shape('batch')
    spec = jax.ShapeDtypeStruct((b, cfg.num_channels, L), jnp.float32)
    wspecs = [jax.ShapeDtypeStruct(w.shape, w.dtype) for w in weight_leaves]
    kwargs: Dict[str, Any] = {}
    if platforms:
        kwargs['platforms'] = list(platforms)
    exported = jax.export.export(jax.jit(fn), **kwargs)(spec, *wspecs)
    blob = exported.serialize()

    n_code = len(PTBXL_ID2CODE)
    meta = {
        'artifact_version': ARTIFACT_VERSION,
        'model': trainer.name,
        'model_config': {
            'size': getattr(cfg, 'size', None),
            'num_class': cfg.num_class,
            'num_channels': cfg.num_channels,
            'max_signal_length': cfg.max_signal_length,
            'patch_size': cfg.patch_size,
        },
        'wire': {'signal_length': L, 'dtype': 'float32',
                 'layout': '(batch, leads, samples) @ 250 Hz raw',
                 'batch': 'symbolic'},
        'output': {'shape': f'(batch, {cfg.num_class})',
                   'semantics': 'per-class sigmoid probabilities'},
        'classes': [
            {'id': i, 'code': PTBXL_ID2CODE[i],
             'description': PTBXL_CODE2DESCRIPTION.get(PTBXL_ID2CODE[i], '')}
            for i in range(min(cfg.num_class, n_code))
        ],
        'norm_stats': {'mean': np.asarray(trainer.mean).tolist(),
                       'std': np.asarray(trainer.std).tolist()},
        'int8': bool(int8),
        'weights_file': _WEIGHTS_FILE if int8 else None,
        'platforms': list(exported.platforms),
        'jax_version': jax.__version__,
        'bytes': len(blob),
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _MODEL_FILE), 'wb') as f:
        f.write(blob)
    if int8:
        np.savez(os.path.join(path, _WEIGHTS_FILE),
                 **{f'w{i}': w for i, w in enumerate(weight_leaves)})
        meta['bytes'] += os.path.getsize(os.path.join(path, _WEIGHTS_FILE))
    with open(os.path.join(path, _META_FILE), 'w') as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedModel:
    """Load + run a serialized artifact.  Deliberately tiny: everything it
    needs is in the two files -- no flax module, no checkpoint, no config
    reconstruction."""

    def __init__(self, exported, metadata: Dict[str, Any], weights=()):
        self.exported = exported
        self.metadata = metadata
        self.weights = tuple(weights)   # int8 artifacts: sidecar tensors
        w = metadata['wire']
        self.num_channels = metadata['model_config']['num_channels']
        self.signal_length = w['signal_length']

    @classmethod
    def load(cls, path: str) -> 'ExportedModel':
        with open(os.path.join(path, _MODEL_FILE), 'rb') as f:
            exported = jax.export.deserialize(f.read())
        with open(os.path.join(path, _META_FILE)) as f:
            meta = json.load(f)
        assert meta.get('artifact_version') == ARTIFACT_VERSION, \
            f"artifact version {meta.get('artifact_version')} != {ARTIFACT_VERSION}"
        weights = ()
        if meta.get('weights_file'):
            z = np.load(os.path.join(path, meta['weights_file']))
            weights = tuple(z[f'w{i}'] for i in range(len(z.files)))
        return cls(exported, meta, weights)

    def predict(self, signals: np.ndarray) -> np.ndarray:
        """Raw (N, C, L) or (C, L) float32 -> (N, num_class) probabilities.
        Shorter records are padded to the wire length with the per-lead
        normalization MEAN: the program z-normalizes before its own
        time_end_pad, so mean-valued samples normalize to exactly the zero
        tail training saw (raw zeros would become -mean/std under non-zero
        stats, e.g. --stats original)."""
        sig = np.asarray(signals, np.float32)
        if sig.ndim == 2:
            sig = sig[None]
        assert sig.ndim == 3 and sig.shape[1] == self.num_channels, \
            f'want (N, {self.num_channels}, L), got {sig.shape}'
        L = self.signal_length
        assert sig.shape[2] <= L, \
            f'record length {sig.shape[2]} > wire length {L}: window it ' \
            f'(Trainer.predict_long) or re-export with a larger signal_length'
        if sig.shape[2] < L:
            mean = np.asarray(self.metadata['norm_stats']['mean'],
                              np.float32).reshape(1, -1, 1)
            tail = np.broadcast_to(
                mean, (sig.shape[0], sig.shape[1], L - sig.shape[2]))
            sig = np.concatenate([sig, tail], axis=2)
        return np.asarray(self.exported.call(sig, *self.weights))
