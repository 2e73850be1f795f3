"""Offline evaluation reports (reference models/evaluate.py).

``evaluate_trained``: run the trainer's evaluate() on eval+test splits and
write a JSON report per split (evaluate.py:18-28).  ``pick_eval_eg``: sample
low/median/high per-sample-loss examples per split for qualitative
visualization (evaluate.py:31-55).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np


def evaluate_trained(trainer, splits: Dict[str, object],
                     out_dir: str = 'eval') -> Dict[str, Dict]:
    """splits: name -> SplitData.  Writes ``{out_dir}/evaluation, <ts>.json``."""
    os.makedirs(out_dir, exist_ok=True)
    results = {}
    for name, data in splits.items():
        m = trainer.evaluate(data)
        results[name] = {k: v for k, v in m.items()
                         if k not in ('per_sample_loss', 'predictions')}
    import datetime
    ts = datetime.datetime.now().strftime('%Y-%m-%d_%H-%M-%S')
    path = os.path.join(out_dir, f'evaluation, {ts}.json')
    with open(path, 'w') as f:
        json.dump(results, f, indent=2)
    results['_path'] = path
    return results


def pick_eval_eg(trainer, splits: Dict[str, object], n_each: int = 3,
                 out_dir: str = 'eval') -> Dict[str, Dict[str, list]]:
    """Pick indices of lowest / median / highest per-sample eval loss
    (reference pick_eval_eg, evaluate.py:31-55)."""
    import pickle
    out: Dict[str, Dict[str, list]] = {}
    for name, data in splits.items():
        m = trainer.evaluate(data, loss_reduction='none')
        losses = m['per_sample_loss']
        order = np.argsort(losses)
        n = losses.size
        mid0 = max(n // 2 - n_each // 2, 0)
        out[name] = {
            'low': order[:n_each].tolist(),
            'med': order[mid0:mid0 + n_each].tolist(),
            'high': order[-n_each:].tolist(),
        }
    os.makedirs(out_dir, exist_ok=True)
    import datetime
    ts = datetime.datetime.now().strftime('%Y-%m-%d_%H-%M-%S')
    with open(os.path.join(out_dir, f'eval_edge_example_samples, {ts}.pkl'), 'wb') as f:
        pickle.dump(out, f)
    return out
