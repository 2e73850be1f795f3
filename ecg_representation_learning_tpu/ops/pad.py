"""Padding ops: pad-to-multiple along time, and the tokenizer's segment padder.

Reference: ``TimeEndPad`` (transform.py:140-154) and ``EcgPadder``
(models/ecg_tokenizer.py:88-137) with 'zero' and 'shift' (repeat the last
k-window) modes.
"""
from __future__ import annotations

import jax.numpy as jnp


def time_end_pad(x: jnp.ndarray, k: int, value: float = 0.0) -> jnp.ndarray:
    """Pad the last axis at the end up to the next multiple of ``k``.

    Quirk kept for parity: like the reference (transform.py:148-151), an
    already-aligned length is padded by a full extra ``k`` (n_pad = k - L%k is
    never 0) -- e.g. 2500 -> 2560 with k=64, and 2560 -> 2624.
    """
    length = x.shape[-1]
    n_pad = k - (length % k)
    pads = [(0, 0)] * (x.ndim - 1) + [(0, n_pad)]
    return jnp.pad(x, pads, constant_values=value)


def pad_to_multiple(x: jnp.ndarray, k: int, mode: str = 'zero') -> jnp.ndarray:
    """Tokenizer segment padding (EcgPadder, ecg_tokenizer.py:88-137).

    Same always-pad quirk as the reference (``n_pad = k - L % k``, never 0 --
    ecg_tokenizer.py:109; the ``n_pad == 0`` early-return there is dead code).
    mode 'zero' pads with zeros; 'shift' repeats the last ``n_pad`` real
    samples (ecg_tokenizer.py:121: ``a[-end:] = a[-2*end:-end]``), preserving
    morphology at the boundary.
    """
    length = x.shape[-1]
    n_pad = k - (length % k)
    if mode == 'zero':
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_pad)])
    if mode == 'shift':
        tail = x[..., length - n_pad:length]      # last n_pad real samples
        return jnp.concatenate([x, tail], axis=-1)
    raise ValueError(f'Unknown pad mode {mode!r}')
