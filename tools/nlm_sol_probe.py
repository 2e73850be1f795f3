"""Speed-of-light attribution probe for the fused NLM kernel.

Measures where ops/nlm_pallas.py's time goes by running structurally
identical kernel variants with individual components disabled (the same
grid, block shapes, VMEM scratch and accumulator traffic), then differencing
the timings.  The components map 1:1 to lines of the real kernel:

  shift    -- the dynamic x[k+s] rotate + masked SSD
  boxtree  -- the 21-tap Darbon window (log-tree of static rolls)
  exp      -- the weight transcendental
  accum    -- +s masked FMA accumulation
  mirror   -- the -s direction (2 rolls + masked FMAs)

Every component is semantically irreducible for Darbon/Zheng NLM
(data_preprocessor.py:83-148): the SSD needs the shifted signal, the
distance IS the 21-tap window, the weight IS exp(-d/h), and both shift
directions must accumulate.  So the sum of attributed costs is an
empirical speed-of-light for this algorithm on this VPU -- the headroom
is (full kernel time) - (sum of parts overlap), reported at the end.

Usage: python tools/nlm_sol_probe.py   (needs the TPU chip; ~2 min)
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, '.')
from bench import _per_iter_seconds  # noqa: E402


def _variant_kernel(x_ref, hinv_ref, out_ref, num_ref, z_ref, *,
                    n_real, n_pairs, patch_wd, lp,
                    boxtree, use_exp, mirror, accum):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        num_ref[...] = jnp.zeros_like(num_ref)
        z_ref[...] = jnp.zeros_like(z_ref)

    x = x_ref[...]
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    valid_tail = (pos + s) < n_real
    xs = pltpu.roll(x, (-s) % lp, 1)
    ssd = jnp.where(valid_tail, (x - xs) ** 2, 0.0)

    if boxtree:
        w_taps = 2 * patch_wd + 1
        sums = {1: ssd}
        width = 1
        while width * 2 <= w_taps:
            sums[width * 2] = sums[width] + pltpu.roll(
                sums[width], -width % lp, 1)
            width *= 2
        dist0 = None
        offset = 0
        for p in sorted(sums, reverse=True):
            if w_taps - offset >= p:
                term = (sums[p] if offset == 0
                        else pltpu.roll(sums[p], -offset % lp, 1))
                dist0 = term if dist0 is None else dist0 + term
                offset += p
        dist = pltpu.roll(dist0, patch_wd, 1)
    else:
        dist = ssd

    if use_exp:
        w = jnp.exp(-dist * hinv_ref[:, :1])
    else:
        w = dist * hinv_ref[:, :1]
    interior = (pos >= patch_wd + 1) & (pos < n_real - patch_wd)

    if accum:
        wp = jnp.where(interior & valid_tail, w, 0.0)
        num_ref[...] += wp * xs
        z_ref[...] += wp

        if mirror:
            @pl.when(s > 0)
            def _mirror():
                wm = pltpu.roll(w, s, 1)
                xm = pltpu.roll(x, s, 1)
                wmv = jnp.where(interior & (pos - s > 0), wm, 0.0)
                num_ref[...] += wmv * xm
                z_ref[...] += wmv
    else:
        # keep the output dependent on w so nothing dead-code-eliminates
        num_ref[...] += w
        z_ref[...] += w

    @pl.when(s == n_pairs - 1)
    def _finalize():
        den = num_ref[...] / (z_ref[...] + 1e-12)
        out_ref[...] = jnp.where(interior, den, x)


@functools.partial(jax.jit, static_argnames=('sch_wd', 'patch_wd',
                                             'block_rows', 'flags'))
def _run_variant(x, h, sch_wd, patch_wd, block_rows=64, flags=()):
    fl = dict(flags)
    r, n = x.shape
    lp = -(-(n + patch_wd) // 128) * 128
    rp = -(-r // block_rows) * block_rows
    xp = jnp.pad(x, ((0, rp - r), (0, lp - n)))
    hp = jnp.broadcast_to(
        jnp.pad(1.0 / h, (0, rp - r), constant_values=1.0).reshape(rp, 1),
        (rp, 128))
    kernel = functools.partial(
        _variant_kernel, n_real=n, n_pairs=sch_wd, patch_wd=patch_wd, lp=lp,
        boxtree=fl.get('boxtree', True), use_exp=fl.get('exp', True),
        mirror=fl.get('mirror', True), accum=fl.get('accum', True))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rp, lp), x.dtype),
        grid=(rp // block_rows, sch_wd),
        in_specs=[pl.BlockSpec((block_rows, lp), lambda rb, si: (rb, 0)),
                  pl.BlockSpec((block_rows, 128), lambda rb, si: (rb, 0))],
        out_specs=pl.BlockSpec((block_rows, lp), lambda rb, si: (rb, 0)),
        scratch_shapes=[pltpu.VMEM((block_rows, lp), jnp.float32),
                        pltpu.VMEM((block_rows, lp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
    )(xp, hp)
    return out[:r, :n]


def main():
    rng = np.random.default_rng(0)
    r, n, sch, pw = 768, 2500, 128, 10   # = (64 recs, 12 leads) bounded search
    xs = [jnp.asarray(rng.standard_normal((r, n)).astype(np.float32))
          for _ in range(2)]
    h = jnp.ones((r,), jnp.float32)

    variants = [
        ('full', {}),
        ('-mirror', {'mirror': False}),
        ('-exp', {'exp': False}),
        ('-boxtree', {'boxtree': False}),
        ('-accum(mirror too)', {'accum': False}),
    ]
    times = {}
    for name, fl in variants:
        fn = lambda a, fl=tuple(sorted(fl.items())): _run_variant(
            a, h, sch, pw, flags=fl)
        dt = _per_iter_seconds(fn, xs)
        times[name] = dt
        print(f'{name:22s}: {dt * 1e3:7.2f} ms')

    full = times['full']
    print('\nattribution (component = full - variant-without-it):')
    for name in list(times)[1:]:
        print(f'  {name[1:]:20s}: {(full - times[name]) * 1e3:6.2f} ms '
              f'({100 * (full - times[name]) / full:4.1f}%)')
    elems = r * -(-(n + pw) // 128) * 128
    print(f'\nper-pair element volume: {elems:,} elems x {sch} pairs '
          f'= {elems * sch / 1e9:.2f} G elem-visits')
    print(f'full kernel: {elems * sch / full / 1e12:.3f} T elem-visits/s')


if __name__ == '__main__':
    main()
