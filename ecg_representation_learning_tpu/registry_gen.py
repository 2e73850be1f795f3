"""Registry generators: rebuild the PTB-XL taxonomy from source metadata.

The reference generates its taxonomy by parsing ``scp_statements.csv``
(util/config.py:105-271 ``extract_ptb_codes``); the shipped :mod:`.registry`
freezes that output as data.  This module regenerates it from the same CSV so
the registry can be audited / refreshed when PhysioNet updates PTB-XL --
without the reference's import cycle (config.py:11).

Usage::

    python -m ecg_representation_learning_tpu.registry_gen \
        --scp-statements ~/datasets/PTB-XL/scp_statements.csv
"""
from __future__ import annotations

from typing import Dict, List, Tuple


def extract_ptb_codes(scp_statements_csv: str) -> Dict[str, object]:
    """Parse scp_statements.csv -> the taxonomy structures of the registry.

    Codes are kept in CSV row order restricted to rows flagged diagnostic,
    form, or rhythm (the reference's id assignment); returns id2code,
    aspect memberships, the diagnostic class->subclass->code map, and
    per-code descriptions.
    """
    import pandas as pd
    df = pd.read_csv(scp_statements_csv, index_col=0)
    id2code: List[str] = []
    form_codes: List[str] = []
    rhythm_codes: List[str] = []
    diag: Dict[str, Dict[str, List[str]]] = {}
    code2description: Dict[str, str] = {}
    for code, row in df.iterrows():
        is_diag = bool(row.get('diagnostic', 0) == 1)
        is_form = bool(row.get('form', 0) == 1)
        is_rhythm = bool(row.get('rhythm', 0) == 1)
        if not (is_diag or is_form or is_rhythm):
            continue
        id2code.append(str(code))
        code2description[str(code)] = str(row.get('description', ''))
        if is_form:
            form_codes.append(str(code))
        if is_rhythm:
            rhythm_codes.append(str(code))
        if is_diag:
            sup = str(row.get('diagnostic_class', '')) or 'UNK'
            sub = str(row.get('diagnostic_subclass', '')) or str(code)
            diag.setdefault(sup, {}).setdefault(sub, []).append(str(code))
    return {
        'id2code': id2code,
        'code2id': {c: i for i, c in enumerate(id2code)},
        'form_codes': form_codes,
        'rhythm_codes': rhythm_codes,
        'diagnostic_taxonomy': diag,
        'code2description': code2description,
    }


def verify_against_registry(extracted: Dict[str, object]) -> List[str]:
    """Diff the extracted taxonomy against the frozen registry; returns a list
    of human-readable discrepancies (empty = registry is current)."""
    from . import registry as R
    problems = []
    if list(extracted['id2code']) != list(R.PTBXL_ID2CODE):
        problems.append('id2code order differs from registry.PTBXL_ID2CODE')
    if set(extracted['form_codes']) != set(R.PTBXL_FORM_CODES):
        problems.append('form code set differs')
    if set(extracted['rhythm_codes']) != set(R.PTBXL_RHYTHM_CODES):
        problems.append('rhythm code set differs')
    reg_diag = {sup: {sub: set(cs) for sub, cs in subs.items()}
                for sup, subs in R.PTBXL_DIAGNOSTIC_TAXONOMY.items()}
    ext_diag = {sup: {sub: set(cs) for sub, cs in subs.items()}
                for sup, subs in extracted['diagnostic_taxonomy'].items()}
    if reg_diag != ext_diag:
        problems.append('diagnostic taxonomy differs')
    ext_desc = dict(extracted['code2description'])
    if ext_desc != dict(R.PTBXL_CODE2DESCRIPTION):
        diff = [c for c in ext_desc
                if ext_desc.get(c) != R.PTBXL_CODE2DESCRIPTION.get(c)]
        diff += [c for c in R.PTBXL_CODE2DESCRIPTION if c not in ext_desc]
        problems.append(f'code2description differs for: {sorted(set(diff))}')
    return problems


if __name__ == '__main__':
    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument('--scp-statements', required=True)
    p.add_argument('--verify', action='store_true',
                   help='diff against the frozen registry instead of printing')
    args = p.parse_args()
    ext = extract_ptb_codes(args.scp_statements)
    if args.verify:
        problems = verify_against_registry(ext)
        print(json.dumps({'ok': not problems, 'problems': problems}))
    else:
        print(json.dumps(ext, indent=2))
