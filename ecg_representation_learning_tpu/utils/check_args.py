"""Enumerated-argument validation (reference util/check_args.py:6-69).

The reference's ``CheckArg``/``ca`` singleton validates dataset / model /
optimizer / schedule names against hard-coded lists.  Here the accepted
values derive from the registry and configs, and the validator raises
``ValueError`` with the full accepted set (same contract, single source of
truth)."""
from __future__ import annotations

from typing import Dict, Sequence

from ..configs import VitConfig
from ..registry import DATASETS


class CheckArg:
    """``ca(model_name='ecg-vit-base')``-style keyword validation."""

    def __init__(self):
        self.d_name2accepted: Dict[str, Sequence[str]] = {}
        self.cache_mismatch('dataset_name', list(DATASETS))
        self.cache_mismatch('model_name',
                            [f'ecg-vit-{s}' for s in VitConfig._SIZES])
        self.cache_mismatch('model_size', list(VitConfig._SIZES))
        self.cache_mismatch('optimizer', ['AdamW', 'Adam'])
        self.cache_mismatch('schedule', ['constant', 'cosine'])
        self.cache_mismatch('ptbxl_type', ['original', 'denoised'])
        self.cache_mismatch('pad_mode', ['zero', 'shift'])
        self.cache_mismatch('norm_scheme', ['global', 'std', 'norm', 'none'])
        self.cache_mismatch('loss_reduction', ['mean', 'none'])

    def cache_mismatch(self, name: str, accepted: Sequence[str]):
        self.d_name2accepted[name] = list(accepted)

    def check_mismatch(self, display_name: str, value, accepted: Sequence[str]):
        if value not in accepted:
            raise ValueError(
                f'Unexpected {display_name}: expected one of {sorted(accepted)}, '
                f'got {value!r}')

    def __call__(self, **kwargs):
        for name, value in kwargs.items():
            if name not in self.d_name2accepted:
                raise ValueError(f'Unknown argument category {name!r}; known: '
                                 f'{sorted(self.d_name2accepted)}')
            self.check_mismatch(name, value, self.d_name2accepted[name])


ca = CheckArg()
