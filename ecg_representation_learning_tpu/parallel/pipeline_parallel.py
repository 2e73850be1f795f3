"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

The parity models fit one chip (SURVEY §2.3 scopes PP out for parity), but a
complete TPU framework should scale depth across chips too.  This module
pipelines a homogeneous block stack (the ViT transformer, params stacked
(L, ...) exactly like ``VitConfig.scan_blocks``) over a ``'stage'`` mesh axis:

  * layer ``l`` lives on stage ``l // (L / S)``: the stacked params are
    sharded ``P('stage')`` on their leading axis, so each device HOLDS only
    its own layers — model memory scales 1/S per chip;
  * inside a ``shard_map``, every stage runs the same program: a
    ``lax.scan`` over the GPipe schedule (M microbatches -> M + S - 1 steps);
    at each step a stage applies its local layers (an inner scan) to the
    activation received from its neighbor via ``jax.lax.ppermute`` — the
    point-to-point transfer rides ICI;
  * bubbles compute on garbage and are masked at the output; their cotangents
    are zero, so plain autodiff through (scan ∘ ppermute) gives the correct
    pipelined backward schedule for free;
  * outputs are accumulated on the last stage and ``psum``-broadcast.

``pipeline_apply`` is the functional core (differentiable); it composes with
data parallelism by adding a batch axis to the mesh and sharding microbatches
over it.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STAGE_AXIS = 'stage'


def stack_stage_params(stacked_params, n_stage: int):
    """(L, ...)-stacked block params -> (S, L/S, ...) for P('stage') sharding
    of the leading axis (each device holds its own stage's layers)."""
    def reshape(a):
        l = a.shape[0]
        assert l % n_stage == 0, (l, n_stage)
        return a.reshape(n_stage, l // n_stage, *a.shape[1:])
    return jax.tree.map(reshape, stacked_params)


def pipeline_apply(
    stage_params,
    x_micro: jnp.ndarray,
    block_fn: Callable,
    mesh: Mesh,
    axis: str = STAGE_AXIS,
    x_spec: P = P(),
    rng=None,
):
    """Pipelined forward over the stage axis.

    ``stage_params``: (S, L/S, ...) pytree, sharded P(axis) on axis 0.
    ``x_micro``: (M, ...) microbatched input, laid out per ``x_spec``
    (``P()`` replicated, or e.g. ``P(None, 'data')`` to compose with data
    parallelism: microbatch dim first, per-microbatch batch dim sharded over
    the mesh's 'data' axis -- every data shard then runs its own pipeline).
    ``block_fn(layer_params, activation) -> activation`` applies ONE block;
    when ``rng`` is given the signature is ``(layer_params, activation, key)``
    and each (pipeline-step, stage, layer) gets a distinct folded key
    (per-microbatch dropout).
    Returns the (M, ...) outputs, laid out per ``x_spec``.  Differentiable:
    grads w.r.t. ``stage_params`` come back sharded P(axis).
    """
    n_stage = mesh.shape[axis]
    m = x_micro.shape[0]
    n_steps = m + n_stage - 1

    def local(params_s, x_all, *rng_arg):
        # params_s: (1, L/S, ...) -- this device's layers
        params_local = jax.tree.map(lambda a: a[0], params_s)
        sid = jax.lax.axis_index(axis)
        dev_rng = None
        if rng_arg:
            # decorrelate the other mesh axes too: on a DP x PP mesh every
            # data shard must draw independent dropout masks for its own
            # samples (rng enters replicated, so without this fold devices
            # (d=0,s) and (d=1,s) would mask different samples identically)
            dev_rng = rng_arg[0]
            for ax_name in mesh.axis_names:
                if ax_name != axis:
                    dev_rng = jax.random.fold_in(
                        dev_rng, jax.lax.axis_index(ax_name))
        perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]
        act0 = jnp.zeros_like(x_all[0])
        out0 = jnp.zeros_like(x_all)
        pcast = getattr(jax.lax, 'pcast', None)
        if pcast is not None:
            act0 = pcast(act0, axis, to='varying')
            out0 = pcast(out0, axis, to='varying')
        elif hasattr(jax.lax, 'pvary'):
            act0 = jax.lax.pvary(act0, axis)
            out0 = jax.lax.pvary(out0, axis)

        def apply_stage(act, t):
            if rng_arg:
                # distinct dropout stream per (pipeline step, stage, layer)
                base = jax.random.fold_in(dev_rng, t * n_stage + sid)

                def layer(carry, lp_i):
                    lp, i = lp_i
                    return block_fn(lp, carry,
                                    jax.random.fold_in(base, i)), None
                n_local = jax.tree.leaves(params_local)[0].shape[0]
                h, _ = jax.lax.scan(
                    layer, act,
                    (params_local, jnp.arange(n_local, dtype=jnp.int32)))
                return h

            def layer(h, lp):
                return block_fn(lp, h), None
            h, _ = jax.lax.scan(layer, act, params_local)
            return h

        def step(carry, t):
            act_in, out = carry
            # stage 0 injects microbatch t (garbage once t >= m: masked later)
            mb = jax.lax.dynamic_index_in_dim(x_all, jnp.minimum(t, m - 1),
                                              keepdims=False)
            act = jnp.where(sid == 0, mb, act_in)
            act = apply_stage(act, t)
            # the last stage finished microbatch (t - S + 1) at this step
            done_idx = t - (n_stage - 1)
            valid = jnp.logical_and(sid == n_stage - 1,
                                    jnp.logical_and(done_idx >= 0, done_idx < m))
            upd = jax.lax.dynamic_update_index_in_dim(
                out, act.astype(out.dtype), jnp.maximum(done_idx, 0), axis=0)
            out = jnp.where(valid, upd, out)
            # hand the activation to the next stage
            act_next = jax.lax.ppermute(act, axis, perm)
            return (act_next, out), None

        (_, out), _ = jax.lax.scan(step, (act0, out0),
                                   jnp.arange(n_steps, dtype=jnp.int32))
        # only the last stage holds real outputs; broadcast them
        out = jnp.where(sid == n_stage - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, axis)

    pspec = jax.tree.map(lambda _: P(axis), stage_params)
    if rng is not None:
        fn = jax.shard_map(local, mesh=mesh,
                           in_specs=(pspec, x_spec, P()), out_specs=x_spec,
                           check_vma=False)
        return fn(stage_params, x_micro, rng)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(pspec, x_spec),
                       out_specs=x_spec, check_vma=False)
    return fn(stage_params, x_micro)


def place_stage_params(stage_params, mesh: Mesh, axis: str = STAGE_AXIS):
    """Shard a (S, L/S, ...) stage-stacked pytree over the stage axis, so
    each device physically holds only its own layers."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), stage_params)
