"""Torch -> flax weight porter for reference EcgVit checkpoints.

The reference trains ``EcgVit`` = a thin wrapper around ``vit_pytorch.ViT``
(models/ecg_vit.py:95-161, vit-pytorch pinned at 0.33.2 in requirements.txt:174)
and persists plain ``state_dict()`` files (``load_trained``, ecg_vit.py:152-161).
This module maps that state_dict into this package's flax ``EcgVit`` params so
the published checkpoint can be evaluated / fine-tuned on TPU, proving
macro-AUROC quality parity without retraining.

vit-pytorch 0.33.2 layout (keys as stored; the wrapper prefixes them ``vit.``):

    to_patch_embedding.1.{weight,bias}      Rearrange -> Linear(patch_dim, dim)
    pos_embedding                           (1, n_patches+1, dim)
    cls_token                               (1, 1, dim)
    transformer.layers.{i}.0.norm.{w,b}     PreNorm LN before attention
    transformer.layers.{i}.0.fn.to_qkv.weight      (3*inner, dim), no bias
    transformer.layers.{i}.0.fn.to_out.0.{w,b}     (dim, inner)
    transformer.layers.{i}.1.norm.{w,b}     PreNorm LN before the MLP
    transformer.layers.{i}.1.fn.net.0.{w,b}        Linear(dim, mlp_dim)
    transformer.layers.{i}.1.fn.net.3.{w,b}        Linear(mlp_dim, dim)
    mlp_head.0.{weight,bias}                LayerNorm(dim)
    mlp_head.1.{weight,bias}                Linear(dim, num_classes)

Mapping notes (each is exercised by tests/test_weight_port.py):

  * vit-pytorch's Rearrange ``b c (h p1) (w p2) -> b (h w) (p1 p2 c)`` with
    h = p1 = 1 orders each patch vector time-major / channel-minor; this
    package's ``PatchEmbed1D`` orders channel-major / time-minor, so the patch
    projection weight is permuted, not just transposed.
  * 0.33.2 has no LayerNorms around the patch projection (those arrived in
    vit-pytorch >= 0.35), so the target ``VitConfig`` must set
    ``patch_norm=False``.
  * For cls pooling, ``mlp_head.0`` (a per-token LayerNorm applied after
    pooling) is equivalent to this package's pre-pool ``final_norm``; it is
    ported there, and ``mlp_head.1`` becomes the ``head`` Dense.
  * qkv column order is q|k|v blocks, head-major within a block, in both
    implementations -- a plain transpose suffices.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

from ..configs import VitConfig

Array = np.ndarray


def reference_vit_config(model_key: str = 'ecg-vit-base', **overrides) -> VitConfig:
    """A ``VitConfig`` whose forward matches the reference wrapper of
    vit-pytorch 0.33.2 exactly (no patch norms, exact-erf GELU, cls pool)."""
    kw = {'patch_norm': False, 'dtype': 'float32', **overrides}
    return VitConfig.from_defined(model_key, **kw)


def _np(t) -> Array:
    """torch.Tensor | np.ndarray -> float32 numpy."""
    if hasattr(t, 'detach'):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def strip_wrapper_prefix(state_dict: Mapping[str, object]) -> Dict[str, object]:
    """Drop the reference wrapper's ``vit.`` prefix (EcgVit.vit, ecg_vit.py:116)
    and its buffer-free extras, leaving bare vit-pytorch keys."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith('vit.'):
            k = k[len('vit.'):]
        out[k] = v
    return out


def port_vit_pytorch_state_dict(state_dict: Mapping[str, object],
                                cfg: VitConfig) -> Dict:
    """vit-pytorch 0.33.2 ``state_dict`` -> flax ``{'params': ...}`` for
    this package's ``EcgVit`` (models/vit.py).

    ``cfg`` must have ``patch_norm=False`` (use :func:`reference_vit_config`).
    Raises ``KeyError`` on missing keys and ``ValueError`` on shape mismatch,
    so silent partial ports are impossible.
    """
    if cfg.patch_norm:
        raise ValueError('reference checkpoints need patch_norm=False '
                         '(vit-pytorch 0.33.2 has no patch-embedding norms); '
                         'build the config via reference_vit_config()')
    sd = strip_wrapper_prefix(state_dict)
    d, h = cfg.hidden_size, cfg.num_attention_heads
    c, p = cfg.num_channels, cfg.patch_size
    patch_dim = c * p

    def take(key: str, shape) -> Array:
        arr = _np(sd[key])
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(f'{key}: expected shape {tuple(shape)}, '
                             f'got {tuple(arr.shape)}')
        return arr

    # patch projection: torch rows are (dim, patch_dim) with columns ordered
    # (time, channel); ours is a (patch_dim, dim) kernel with rows ordered
    # (channel, time)
    w = take('to_patch_embedding.1.weight', (d, patch_dim))
    w = w.reshape(d, p, c).transpose(2, 1, 0).reshape(patch_dim, d)
    patch_embed = {'proj': {'kernel': w,
                            'bias': take('to_patch_embedding.1.bias', (d,))}}

    encoder: Dict = {
        'patch_embed': patch_embed,
        'cls_token': take('cls_token', (1, 1, d)),
        'pos_embed': take('pos_embedding', (1, cfg.num_patches + 1, d)),
        'final_norm': {'scale': take('mlp_head.0.weight', (d,)),
                       'bias': take('mlp_head.0.bias', (d,))},
    }
    for i in range(cfg.num_hidden_layers):
        pre = f'transformer.layers.{i}'
        qkv_w = take(f'{pre}.0.fn.to_qkv.weight', (3 * d, d))
        encoder[f'block_{i}'] = {
            'norm1': {'scale': take(f'{pre}.0.norm.weight', (d,)),
                      'bias': take(f'{pre}.0.norm.bias', (d,))},
            'attn': {
                'qkv': {'kernel': qkv_w.T},           # q|k|v, head-major: same order
                'out': {'kernel': take(f'{pre}.0.fn.to_out.0.weight', (d, d)).T,
                        'bias': take(f'{pre}.0.fn.to_out.0.bias', (d,))},
            },
            'norm2': {'scale': take(f'{pre}.1.norm.weight', (d,)),
                      'bias': take(f'{pre}.1.norm.bias', (d,))},
            'mlp': {
                'fc1': {'kernel': take(f'{pre}.1.fn.net.0.weight',
                                       (cfg.intermediate_size, d)).T,
                        'bias': take(f'{pre}.1.fn.net.0.bias',
                                     (cfg.intermediate_size,))},
                'fc2': {'kernel': take(f'{pre}.1.fn.net.3.weight',
                                       (d, cfg.intermediate_size)).T,
                        'bias': take(f'{pre}.1.fn.net.3.bias', (d,))},
            },
        }
    params = {
        'encoder': encoder,
        'head': {'kernel': take('mlp_head.1.weight', (cfg.num_class, d)).T,
                 'bias': take('mlp_head.1.bias', (cfg.num_class,))},
    }
    return {'params': params}


def export_vit_pytorch_state_dict(params, cfg: VitConfig,
                                  wrapper_prefix: bool = True) -> Dict[str, Array]:
    """Inverse of :func:`port_vit_pytorch_state_dict`: flax ``EcgVit`` params
    -> a vit-pytorch-0.33.2 state_dict (numpy values; pass through
    ``torch.from_numpy`` to load into the reference ``EcgVit``).

    ``wrapper_prefix=True`` emits the reference wrapper's ``vit.`` key prefix
    (EcgVit.vit, ecg_vit.py:116) so ``model.load_state_dict(...)`` works
    directly.  Round-trip tested (tests/test_weight_port.py).
    """
    if cfg.patch_norm:
        raise ValueError('only patch_norm=False models map onto the '
                         'vit-pytorch 0.33.2 layout')
    p = params['params'] if 'params' in params else params
    enc = p['encoder']
    d, c, ps = cfg.hidden_size, cfg.num_channels, cfg.patch_size
    out: Dict[str, Array] = {}

    def put(key: str, arr):
        out[('vit.' if wrapper_prefix else '') + key] = np.asarray(arr, np.float32)

    w = np.asarray(enc['patch_embed']['proj']['kernel'], np.float32)
    # (C*P, dim) rows ordered (channel, time) -> (dim, P*C) cols ordered (time, channel)
    put('to_patch_embedding.1.weight',
        w.reshape(c, ps, d).transpose(2, 1, 0).reshape(d, ps * c))
    put('to_patch_embedding.1.bias', enc['patch_embed']['proj']['bias'])
    put('cls_token', enc['cls_token'])
    put('pos_embedding', enc['pos_embed'])
    for i in range(cfg.num_hidden_layers):
        b = enc[f'block_{i}']
        pre = f'transformer.layers.{i}'
        put(f'{pre}.0.norm.weight', b['norm1']['scale'])
        put(f'{pre}.0.norm.bias', b['norm1']['bias'])
        put(f'{pre}.0.fn.to_qkv.weight', np.asarray(b['attn']['qkv']['kernel']).T)
        put(f'{pre}.0.fn.to_out.0.weight', np.asarray(b['attn']['out']['kernel']).T)
        put(f'{pre}.0.fn.to_out.0.bias', b['attn']['out']['bias'])
        put(f'{pre}.1.norm.weight', b['norm2']['scale'])
        put(f'{pre}.1.norm.bias', b['norm2']['bias'])
        put(f'{pre}.1.fn.net.0.weight', np.asarray(b['mlp']['fc1']['kernel']).T)
        put(f'{pre}.1.fn.net.0.bias', b['mlp']['fc1']['bias'])
        put(f'{pre}.1.fn.net.3.weight', np.asarray(b['mlp']['fc2']['kernel']).T)
        put(f'{pre}.1.fn.net.3.bias', b['mlp']['fc2']['bias'])
    put('mlp_head.0.weight', enc['final_norm']['scale'])
    put('mlp_head.0.bias', enc['final_norm']['bias'])
    put('mlp_head.1.weight', np.asarray(p['head']['kernel']).T)
    put('mlp_head.1.bias', p['head']['bias'])
    return out


def load_reference_checkpoint(path: str, model_key: str = 'ecg-vit-base',
                              **overrides):
    """One call from a reference ``.pt`` state_dict file to a runnable flax
    model: returns ``(model, params, cfg)``.

    Mirrors the reference ``load_trained`` (ecg_vit.py:152-161), but instead of
    a hardcoded run directory takes the checkpoint path explicitly::

        model, params, cfg = load_reference_checkpoint('ep8.pt', 'ecg-vit-base')
        logits = model.apply(params, signals).logits
    """
    import torch
    from .vit import EcgVit
    cfg = reference_vit_config(model_key, **overrides)
    sd = torch.load(path, map_location='cpu')
    if isinstance(sd, dict) and 'state_dict' in sd:   # PL-style wrapper dicts
        sd = sd['state_dict']
    params = port_vit_pytorch_state_dict(sd, cfg)
    return EcgVit(cfg), params, cfg
