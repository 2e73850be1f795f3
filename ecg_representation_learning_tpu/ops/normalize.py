"""Per-lead normalization schemes, as pure jnp transforms.

Reference: ``preprocess/transform.py`` -- fixed-stat ``Normalize``
(transform.py:18-35) and the ``_DynamicNormalize``/``DynamicNormalize`` family
(transform.py:38-137) with schemes 'global' (min/max), 'std' (mean/k*std),
'norm' (percentile range from a normal quantile), 'none', chainable in
sequence.  Statistics are computed once over a (N, C, L) fitting array and the
resulting (subtract, divide) pairs are baked into a jit-able transform, so the
whole normalization is a fused elementwise op on device.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NormStats:
    """A single (subtract, divide) normalization, per lead.  Shapes (C,)."""
    sub: Tuple[float, ...]
    div: Tuple[float, ...]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        sub = jnp.asarray(self.sub, x.dtype).reshape((-1, 1))
        div = jnp.asarray(self.div, x.dtype).reshape((-1, 1))
        return (x - sub) / div


def normalize_fixed(x: jnp.ndarray, mean: Sequence[float], std: Sequence[float]) -> jnp.ndarray:
    """Fixed per-lead (x - mean) / std (reference Normalize, transform.py:29-35).

    ``x``: (..., C, L); mean/std length C.
    """
    mean_a = jnp.asarray(mean, x.dtype).reshape((-1, 1))
    std_a = jnp.asarray(std, x.dtype).reshape((-1, 1))
    return (x - mean_a) / std_a


NormScheme = Union[str, Tuple[str, float]]


def fit_dynamic_norm(arr: np.ndarray, schemes: Union[NormScheme, List[NormScheme]]
                     ) -> List[NormStats]:
    """Fit a (sequence of) dynamic normalization(s) on an (N, C, L) array.

    Mirrors ``DynamicNormalize`` (transform.py:109-134): each scheme's stats
    are computed on the array *after* the previous schemes were applied.
    Scheme arg defaults: std->1, norm->2 (transform.py:57-59).
    """
    from scipy.stats import norm as _norm
    # a bare string or a single ('std', 1)-style tuple is one scheme; a list is a chain
    if isinstance(schemes, (str, tuple)):
        schemes = [schemes]
    out: List[NormStats] = []
    a = np.asarray(arr, np.float64)
    for sch in schemes:
        if isinstance(sch, str):
            name, arg = sch, None
        else:
            name, arg = sch[0], (sch[1] if len(sch) > 1 else None)
        if name == 'none':
            sub = np.zeros(a.shape[1])
            div = np.ones(a.shape[1])
        elif name == 'global':
            mi = np.nanmin(a, axis=(0, 2))
            ma = np.nanmax(a, axis=(0, 2))
            sub, div = mi, ma - mi
        elif name == 'std':
            arg = 1.0 if arg is None else float(arg)
            sub = np.nanmean(a, axis=(0, 2))
            div = np.nanstd(a, axis=(0, 2)) * arg
        elif name == 'norm':
            arg = 2.0 if arg is None else float(arg)
            p = _norm().cdf(arg) * 100.0
            lo = np.nanpercentile(a, 100 - p, axis=(0, 2))
            hi = np.nanpercentile(a, p, axis=(0, 2))
            sub, div = lo, hi - lo
        else:
            raise ValueError(f'Unknown normalization scheme {name!r}')
        stats = NormStats(tuple(sub.astype(np.float32).tolist()),
                          tuple(div.astype(np.float32).tolist()))
        out.append(stats)
        a = (a - sub.reshape((1, -1, 1))) / div.reshape((1, -1, 1))
    return out


def apply_norms(x: jnp.ndarray, norms: List[NormStats]) -> jnp.ndarray:
    for nrm in norms:
        x = nrm(x)
    return x
