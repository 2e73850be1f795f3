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


# one process-wide async checkpointer: orbax serializes/writes in a
# background thread; the device->host transfer still happens inside save()
# (so the training loop's buffer donation never races the snapshot)
_ASYNC_CKPTR = None
# .meta.json sidecars for in-flight async saves: written to a .pending name
# immediately, renamed to the final name only once the checkpoint itself has
# committed -- so a sidecar never advertises a checkpoint that isn't there
_PENDING_META: list = []


def _async_ckptr():
    import orbax.checkpoint as ocp
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def _flush_pending_meta() -> None:
    while _PENDING_META:
        tmp, final = _PENDING_META.pop(0)
        if os.path.exists(tmp):
            os.replace(tmp, final)


def wait_for_checkpoints() -> None:
    """Block until any in-flight async checkpoint save has committed (then
    publish its .meta.json sidecar).  Call before reading a just-saved
    checkpoint or at process exit."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
    _flush_pending_meta()


def save_checkpoint(path: str, state, extra: Optional[Dict[str, Any]] = None,
                    async_save: bool = False) -> str:
    """Write the full train state.  ``async_save=True`` returns as soon as
    the state is snapshotted to host memory and lets orbax serialize/write
    in the background (``TrainConfig.async_checkpoint``); only one save is
    in flight at a time -- a new save first waits for the previous one."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if async_save:
        ckptr = _async_ckptr()
        ckptr.wait_until_finished()   # previous save committed ...
        _flush_pending_meta()         # ... so its sidecar can publish
        ckptr.save(path, args=ocp.args.StandardSave(_to_pytree(state)),
                   force=True)
        # sidecar ordering: the save above is still uncommitted, so park the
        # meta under a .pending name; wait_for_checkpoints()/the next save
        # renames it after orbax finalizes the checkpoint dir
        with open(path + '.meta.json.pending', 'w') as f:
            json.dump(extra or {}, f)
        _PENDING_META.append((path + '.meta.json.pending',
                              path + '.meta.json'))
    else:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.tree.map(np.asarray, _to_pytree(state)), force=True)
        ckptr.wait_until_finished()
        with open(path + '.meta.json', 'w') as f:
            json.dump(extra or {}, f)
    return path


def committed_checkpoints(output_dir: str) -> list:
    """Finalized ``ckpt-*`` dirs under ``output_dir``, oldest first.  Orbax
    writes into a ``*.orbax-checkpoint-tmp-*`` sibling and renames on commit,
    so a final-named dir IS committed; tmp dirs (a kill mid-save) are skipped
    instead of crashing a resume.  ``ckpt-step{N}`` names order by step,
    everything else by mtime."""
    import glob
    import re
    out = []
    for p in glob.glob(os.path.join(output_dir, 'ckpt-*')):
        base = os.path.basename(p)
        if not os.path.isdir(p) or '.orbax-checkpoint-tmp' in base:
            continue
        m = re.match(r'ckpt-step(\d+)$', base)
        out.append((int(m.group(1)) if m else -1, os.path.getmtime(p), p))
    return [p for _, _, p in sorted(out)]


def latest_committed_checkpoint(output_dir: str) -> Optional[str]:
    """Newest finalized ``ckpt-*`` dir (crash-recovery restart target)."""
    cands = committed_checkpoints(output_dir)
    return cands[-1] if cands else None


def prune_checkpoints(output_dir: str, keep: int = 2) -> None:
    """Drop all but the newest ``keep`` committed step-tagged checkpoints.
    Only ``ckpt-step{N}`` names are pruned (best/final/epoch tags are user-
    facing artifacts); an in-flight async save is tmp-named, hence never a
    deletion target."""
    import re
    import shutil
    steps = [p for p in committed_checkpoints(output_dir)
             if re.match(r'ckpt-step\d+$', os.path.basename(p))]
    for p in steps[:-keep] if keep else steps:
        shutil.rmtree(p, ignore_errors=True)
        for side in (p + '.meta.json', p + '.meta.json.pending'):
            if os.path.exists(side):
                os.remove(side)


def restore_checkpoint(path: str, like_state) -> Tuple[Any, Dict[str, Any]]:
    """Restore into the structure of ``like_state`` (an initialized TrainState).

    If the saved ``opt_state`` tree does not match (e.g. a linear-probe-trained
    checkpoint loaded by a plain trainer for inference or full fine-tune),
    fall back to restoring params/step/rng and keep the freshly initialized
    optimizer state -- exact resume needs matching optimizers, inference and
    transfer do not.  The fallback is taken ONLY when the raw restore succeeds
    AND its params match the template exactly (structure + leaf shapes) while
    the opt_state structure differs; anything else -- a corrupt checkpoint, a
    wrong model size, an orbax I/O error -- re-raises loudly instead of
    masquerading as an optimizer-chain mismatch."""
    import logging

    import orbax.checkpoint as ocp
    wait_for_checkpoints()   # the path may still be an in-flight async save
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = jax.tree.map(np.asarray, _to_pytree(like_state))
    dropped_ema = False   # surfaced in ``extra`` so callers (CLI) can hint
    try:
        restored = ckptr.restore(path, template)
    except Exception:
        # diagnose with a raw (template-free) restore; a failure THERE is
        # genuine corruption / a missing checkpoint and propagates
        raw = ckptr.restore(path)
        log = logging.getLogger(__name__)
        if _tree_shapes(raw.get('params')) != _tree_shapes(template['params']):
            raise ValueError(
                f'checkpoint {path} params do not match this model: saved '
                f'{_shape_summary(raw.get("params"))} vs expected '
                f'{_shape_summary(template["params"])} -- wrong model '
                f'size/config?') from None
        # EMA layout skew is benign in both directions (resolved here so it
        # never masquerades as -- or hides -- an optimizer mismatch)
        ema_missing = 'ema_params' in template and 'ema_params' not in raw
        ema_extra = 'ema_params' not in template and 'ema_params' in raw
        if ema_missing:
            log.warning('checkpoint %s predates EMA tracking; seeding the '
                        'EMA from the restored params', path)
        if ema_extra:
            log.warning('checkpoint %s carries EMA params this trainer does '
                        'not track (ema_decay=0); dropping them', path)
            dropped_ema = True
        opt_shapes_match = (_tree_shapes(raw.get('opt_state'))
                            == _tree_shapes(template['opt_state']))
        # shapes alone are not enough to restructure in place: an EMA-layout-
        # skewed checkpoint saved under a different mu_dtype would silently
        # install mismatched-dtype Adam moments (donated-step recompile +
        # changed moment HBM footprint) -- _migrate_adam_state below already
        # bails on dtype skew, so this path must too
        if opt_shapes_match and (_tree_dtypes(raw.get('opt_state'))
                                 != _tree_dtypes(template['opt_state'])):
            log.warning(
                'optimizer state in %s matches this trainer in shape but not '
                'dtype (e.g. a different adam_mu_dtype); reinitializing the '
                'optimizer instead of installing mismatched moments', path)
            opt_shapes_match = False
        if opt_shapes_match:
            if not (ema_missing or ema_extra):
                raise  # params AND opt_state match -- the failure is something else
            # the raw restore returns plain nested dicts where the live state
            # has tuples/namedtuples (FusedAdamWState, optax chains): rebuild
            # the template's container types so training can resume on it
            opt = _restructure_like(template['opt_state'], raw['opt_state'])
        else:
            migrated = _migrate_adam_state(raw.get('opt_state'),
                                           template['opt_state'],
                                           _tree_shapes(template['params']))
            if migrated is not None:
                # a pre-FusedAdamW checkpoint (optax chain layout): the Adam
                # moments and count carry over -- exact resume survives the
                # optimizer-implementation upgrade
                log.warning(
                    'migrated optimizer state in %s from the optax-chain '
                    'layout to FusedAdamWState (moments and count preserved)',
                    path)
                opt = migrated
            else:
                log.warning(
                    'optimizer state in %s does not match this trainer '
                    '(different optimizer chain, e.g. linear-probe vs full); '
                    'restored params/step/rng and reinitialized the optimizer',
                    path)
                opt = template['opt_state']
        restored = {'step': raw['step'], 'params': raw['params'],
                    'rng': raw['rng'], 'opt_state': opt}
        if 'ema_params' in template:
            restored['ema_params'] = raw.get('ema_params', raw['params'])
    # orbax can return the SAVED shapes without raising when the template
    # disagrees -- catch wrong-model checkpoints loudly (the fallback branch
    # above already verified its params, so this is a no-op there)
    if _tree_shapes(restored['params']) != _tree_shapes(template['params']):
        raise ValueError(
            f'checkpoint {path} params do not match this model: saved '
            f'{_shape_summary(restored["params"])} vs expected '
            f'{_shape_summary(template["params"])} -- wrong model size/config?')
    state = _from_pytree(like_state, restored)
    extra = {}
    meta = path + '.meta.json'
    if os.path.exists(meta):
        with open(meta) as f:
            extra = json.load(f)
    if dropped_ema:
        extra['dropped_ema'] = True
    return state, extra


def _raw_child(raw, key):
    """Fetch a child from orbax's raw-restored tree, which renders sequences
    either as lists or as dicts keyed by stringified indices/fields."""
    if isinstance(raw, dict):
        return raw[key] if key in raw else raw[str(key)]
    return raw[key]  # a genuine list index


def _restructure_like(template, raw):
    """Rebuild ``raw`` (orbax's template-free restore: plain nested dicts /
    lists) into ``template``'s container types (tuples, optax namedtuples,
    FusedAdamWState).  Leaf values come from ``raw``; the caller must have
    verified structural/shape agreement (``_tree_shapes`` equality) first."""
    fields = getattr(type(template), '_fields', None)
    if fields is not None:   # namedtuple (optimizer states)
        return type(template)(*(
            _restructure_like(getattr(template, f), _raw_child(raw, f))
            for f in fields))
    if isinstance(template, dict):
        return {k: _restructure_like(v, _raw_child(raw, k))
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        return type(template)(
            _restructure_like(v, _raw_child(raw, i))
            for i, v in enumerate(template))
    return raw   # leaf


def _find_adam_subtree(raw_opt, param_shapes):
    """Locate a {'count','mu','nu'} dict whose mu leaf shapes match the param
    tree in a raw-restored optax state (tuples come back as lists,
    namedtuples as field dicts), depth-first."""
    if isinstance(raw_opt, dict):
        if {'count', 'mu', 'nu'} <= set(raw_opt) \
                and _tree_shapes(raw_opt['mu']) == param_shapes:
            return raw_opt
        children = raw_opt.values()
    elif isinstance(raw_opt, (list, tuple)):
        children = raw_opt
    else:
        return None
    for v in children:
        hit = _find_adam_subtree(v, param_shapes)
        if hit is not None:
            return hit
    return None


def _migrate_adam_state(raw_opt, template_opt, param_shapes):
    """Checkpoint-layout migration: an optax-chain state
    ``(clip, (scale_by_adam, wd, lr))`` saved before the FusedAdamW default
    restores into a ``FusedAdamWState(count, mu, nu)`` template with its
    moments and count intact.  Returns the migrated state or None."""
    if getattr(type(template_opt), '_fields', None) != ('count', 'mu', 'nu'):
        return None   # only chain -> FusedAdamWState is supported
    adam = _find_adam_subtree(raw_opt, param_shapes)
    if adam is None or _tree_shapes(adam['nu']) != param_shapes:
        return None
    if _tree_shapes(template_opt.mu) != _tree_shapes(adam['mu']):
        return None   # a probe/masked subtree: bail out
    if _tree_dtypes(template_opt.mu) != _tree_dtypes(adam['mu']):
        return None   # mu_dtype change (e.g. f32 chain -> bf16 fused):
                      # migrating would silently double the moment HBM
                      # footprint and recompile the donated step
    return type(template_opt)(count=adam['count'], mu=adam['mu'],
                              nu=adam['nu'])


def _norm_key(k) -> str:
    """Container-agnostic path entry: orbax's raw restore returns plain
    nested dicts where the live tree has tuples / optax namedtuples, so
    SequenceKey(0) and DictKey('0') (or GetAttrKey('mu') and DictKey('mu'))
    must compare equal."""
    for attr in ('idx', 'key', 'name'):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def _tree_shapes(tree):
    """{normalized path: shape} map of a pytree's array leaves (None-safe)."""
    if tree is None:
        return None
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {'/'.join(_norm_key(k) for k in path): np.shape(leaf)
            for path, leaf in flat}


def _tree_dtypes(tree):
    """{normalized path: dtype} map of a pytree's array leaves (None-safe)."""
    if tree is None:
        return None
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {'/'.join(_norm_key(k) for k in path): np.asarray(leaf).dtype
            for path, leaf in flat}


def _shape_summary(tree, limit: int = 4) -> str:
    shapes = _tree_shapes(tree)
    if shapes is None:
        return '<missing>'
    items = list(shapes.items())
    head = ', '.join(f'{k}:{v}' for k, v in items[:limit])
    return f'{{{head}{", ..." if len(items) > limit else ""}}} ({len(items)} leaves)'


def _to_pytree(state):
    tree = {'step': state.step, 'params': state.params,
            'opt_state': state.opt_state, 'rng': state.rng}
    # param EMA (TrainConfig.ema_decay): saved only when carried, so non-EMA
    # checkpoints keep their historical layout
    if getattr(state, 'ema_params', None) is not None:
        tree['ema_params'] = state.ema_params
    return tree


def _from_pytree(like_state, tree):
    kw = dict(
        step=jax.numpy.asarray(tree['step']),
        params=jax.tree.map(jax.numpy.asarray, tree['params']),
        opt_state=jax.tree.map(jax.numpy.asarray, tree['opt_state']),
        rng=jax.numpy.asarray(tree['rng']),
    )
    if getattr(like_state, 'ema_params', None) is not None:
        # pre-EMA checkpoint loaded by an EMA-enabled trainer: seed the
        # average from the restored params (restore_checkpoint warns)
        kw['ema_params'] = jax.tree.map(jax.numpy.asarray,
                                        tree.get('ema_params', tree['params']))
    return like_state.replace(**kw)
