"""Per-code AUROC report plots (reference chore/plot.py:13-113).

``PtbxlAucVisualizer.grouped_plot``: per-class AUROC bars grouped by the
PTB-XL taxonomy (diagnostic superclass rows NORM/HYP/MI/CD/STTC, then form
and rhythm rows); ``sorted_plot``: all codes sorted by AUROC with aspect +
description labels.  Taxonomy comes from the frozen registry instead of the
generated config.json.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..registry import (
    PTBXL_CODE2DESCRIPTION, PTBXL_DIAGNOSTIC_TAXONOMY, PTBXL_FORM_CODES,
    PTBXL_RHYTHM_CODES, PTBXL_SUBCLASS_DESCRIPTION, ptbxl_code_aspects,
)
from .viz import barplot, save_fig, set_color_bar, vals2colors

_SUPERCLASS_DESC = {
    'NORM': 'normal ECG', 'HYP': 'hypertrophy', 'MI': 'myocardial infarction',
    'CD': 'conduction disturbance', 'STTC': 'ST/T changes',
}


class PtbxlAucVisualizer:
    def __init__(self, code2auc: Dict[str, float]):
        # percentages, one decimal, like the reference (plot.py:15)
        self.code2auc = {c: round(v * 100, 1) for c, v in code2auc.items()}

    def _auc(self, code: str) -> float:
        return self.code2auc.get(code, float('nan'))

    def grouped_plot(self, save: bool = True, title: Optional[str] = None,
                     color_by: str = 'class', color_palette: Optional[str] = None):
        import matplotlib.pyplot as plt
        import seaborn as sns
        assert color_by in ('class', 'score')
        sup_order = ['NORM', 'HYP', 'MI', 'CD', 'STTC']
        groups = []
        for sup in sup_order:
            codes = [c for sub in PTBXL_DIAGNOSTIC_TAXONOMY[sup].values() for c in sub]
            groups.append((f'Diagnostic: {_SUPERCLASS_DESC[sup]} ({sup})', codes))
        groups.append(('Form', list(PTBXL_FORM_CODES)))
        groups.append(('Rhythm', list(PTBXL_RHYTHM_CODES)))

        codes_all = [c for _, cs in groups for c in cs]
        aucs_all = [self._auc(c) for c in codes_all]

        fig, axes = plt.subplots(len(groups), 1, figsize=(16, 2.2 * len(groups)))
        if color_by == 'class':
            cs_full = sns.color_palette(color_palette or 'husl',
                                        n_colors=len(codes_all) + 4 * len(groups))
        else:
            cs_full = vals2colors(aucs_all, color_palette or 'Spectral_r')
        count = 0
        for ax, (desc, codes) in zip(np.atleast_1d(axes), groups):
            vals = [self._auc(c) for c in codes]
            cs = cs_full[count:count + len(codes)]
            count += len(codes) + (4 if color_by == 'class' else 0)
            barplot(x=[c.replace('/', '/\n') for c in codes], y=vals, ax=ax,
                    palette=list(cs), width=0.375)
            ax.set_xlabel(desc, style='italic')
            finite = [v for v in vals if np.isfinite(v)]
            if finite:
                ax.set_ylim([max(min(finite) - 10, 0), min(max(finite) + 10, 105)])
        fig.supylabel('Binary Classification AUROC (%)')
        fig.supxlabel('SCP code')
        title = title or 'PTB-XL per-code AUROC bar plot by group'
        fig.suptitle(title)
        fig.tight_layout()
        if save:
            return save_fig(title)
        plt.show()

    def sorted_plot(self, save: bool = True, title: Optional[str] = None):
        import matplotlib.pyplot as plt
        codes = sorted(self.code2auc, key=self.code2auc.get, reverse=True)

        def label(code: str) -> str:
            # aspects + capitalized description, matching the reference's
            # sorted-plot labels (chore/plot.py:101-113)
            aspects = ', '.join(a.capitalize() for a in ptbxl_code_aspects(code))
            desc = PTBXL_CODE2DESCRIPTION.get(code, code)
            return f'{aspects}: {code} - {desc.capitalize()}'

        plt.figure(figsize=(14, max(6, 0.2 * len(codes))))
        import seaborn as sns
        palette = sns.color_palette('mako_r', n_colors=len(codes))
        barplot(x=[label(c) for c in codes], y=[self.code2auc[c] for c in codes],
                palette=list(palette), orient='h', xlabel='SCP code',
                ylabel='AUROC (%)', ax=plt.gca())
        title = title or 'PTB-XL per-code AUROC sorted bar plot'
        plt.title(title)
        if save:
            return save_fig(title)
        plt.show()
