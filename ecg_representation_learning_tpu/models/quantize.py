"""Weight-only int8 quantization for serving.

The reference has no quantized-inference story (its deployment surface is a
notebook that loads the fp16 checkpoint, ecg_vit.py:152-161).  This module is
a TPU-first serving feature: matmul weights are stored in HBM as int8 with
per-output-channel float32 scales and dequantized INSIDE the jitted eval
program -- XLA fuses the ``convert(int8->f32) * scale`` producer into each
dot's operand read, so the dequantized tree is never materialized in HBM.
Small-batch inference is weight-bandwidth-bound, so halving (vs bf16) or
quartering (vs f32) the bytes-per-weight moves latency nearly
proportionally; the MXU still computes in the model's compute dtype, so
there is no activation-quantization accuracy cliff.

Scheme: symmetric per-output-channel (axis -2 reduced, so stacked MoE
expert weights (E, d, f) get per-expert per-channel scales), round-to-
nearest, clip to [-127, 127].  LayerNorms, biases, embeddings, and anything
smaller than ``MIN_QUANT_SIZE`` stay in float32 -- they are a rounding error
of the weight bytes and carry the calibration-sensitive statistics.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

# leaves smaller than this stay unquantized (scales + padding would eat the
# saving; tiny tensors also carry outsized accuracy weight)
MIN_QUANT_SIZE = 4096


def _path_str(kp) -> str:
    return '/'.join(getattr(k, 'key', str(k)) for k in kp)


def _quantizable(path: str, leaf) -> bool:
    if not hasattr(leaf, 'ndim') or leaf.ndim < 2 or leaf.size < MIN_QUANT_SIZE:
        return False
    # Dense kernels + stacked MoE expert weights; embeddings/norms/biases stay
    return path.endswith('kernel') or path.endswith('/w1') or path.endswith('/w2')


def quantize_params_int8(params) -> Tuple[Any, Dict[str, jax.Array]]:
    """(int8 param tree, {path: scale}) -- structure matches ``params``;
    unquantized leaves pass through unchanged."""
    scales: Dict[str, jax.Array] = {}

    def q(kp, leaf):
        path = _path_str(kp)
        if not _quantizable(path, leaf):
            return leaf
        w = jnp.asarray(leaf, jnp.float32)
        s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-12)
        scales[path] = s
        return jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)

    qparams = jax.tree_util.tree_map_with_path(q, params)
    return qparams, scales


def dequantize_params(qparams, scales: Dict[str, Any]):
    """Rebuild a float32 param tree.  Called INSIDE the jitted eval program:
    XLA fuses the convert+scale into each consumer matmul, so weights are
    read from HBM as int8."""
    def dq(kp, leaf):
        s = scales.get(_path_str(kp))
        return leaf.astype(jnp.float32) * s if s is not None else leaf

    return jax.tree_util.tree_map_with_path(dq, qparams)


def quantized_bytes(qparams) -> int:
    """Total parameter bytes of a (possibly mixed) tree -- the serving-memory
    headline number."""
    return sum(leaf.size * leaf.dtype.itemsize
               for leaf in jax.tree.leaves(qparams)
               if hasattr(leaf, 'dtype'))
