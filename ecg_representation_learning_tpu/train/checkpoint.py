"""Checkpoint save/restore of the full train state via orbax.

Fixes the reference's checkpoint gap: it saves only ``model.state_dict()``
(train.py:297-300, 319) with no optimizer state and no mid-training resume
(SURVEY.md §5 "resume = retrain").  Here the whole (step, params, opt_state,
rng) pytree round-trips exactly, plus a small JSON of host-side extras.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(path: str, state, extra: Optional[Dict[str, Any]] = None) -> str:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, _to_pytree(state)), force=True)
    ckptr.wait_until_finished()
    with open(path + '.meta.json', 'w') as f:
        json.dump(extra or {}, f)
    return path


def restore_checkpoint(path: str, like_state) -> Tuple[Any, Dict[str, Any]]:
    """Restore into the structure of ``like_state`` (an initialized TrainState).

    If the saved ``opt_state`` tree does not match (e.g. a linear-probe-trained
    checkpoint loaded by a plain trainer for inference or full fine-tune),
    fall back to restoring params/step/rng and keep the freshly initialized
    optimizer state -- exact resume needs matching optimizers, inference and
    transfer do not."""
    import logging

    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = jax.tree.map(np.asarray, _to_pytree(like_state))
    try:
        restored = ckptr.restore(path, template)
    except Exception:
        raw = ckptr.restore(path)  # saved structure, no template
        restored = {'step': raw['step'], 'params': raw['params'],
                    'rng': raw['rng'], 'opt_state': template['opt_state']}
        logging.getLogger(__name__).warning(
            'optimizer state in %s does not match this trainer '
            '(different optimizer chain, e.g. linear-probe vs full); '
            'restored params/step/rng and reinitialized the optimizer', path)
    state = _from_pytree(like_state, restored)
    extra = {}
    meta = path + '.meta.json'
    if os.path.exists(meta):
        with open(meta) as f:
            extra = json.load(f)
    return state, extra


def _to_pytree(state):
    return {'step': state.step, 'params': state.params,
            'opt_state': state.opt_state, 'rng': state.rng}


def _from_pytree(like_state, tree):
    return like_state.replace(
        step=jax.numpy.asarray(tree['step']),
        params=jax.tree.map(jax.numpy.asarray, tree['params']),
        opt_state=jax.tree.map(jax.numpy.asarray, tree['opt_state']),
        rng=jax.numpy.asarray(tree['rng']),
    )
