"""Taxonomy regeneration from a synthetic scp_statements.csv."""
import pandas as pd

from ecg_representation_learning_tpu.registry_gen import extract_ptb_codes


def test_extract_ptb_codes(tmp_path):
    df = pd.DataFrame({
        'code': ['NORM', 'IMI', 'SR', 'NDT', 'XX'],
        'diagnostic': [1, 1, 0, 1, 0],
        'form': [0, 0, 0, 1, 0],
        'rhythm': [0, 0, 1, 0, 0],
        'diagnostic_class': ['NORM', 'MI', '', 'STTC', ''],
        'diagnostic_subclass': ['NORM', 'IMI', '', 'STTC', ''],
        'description': ['normal', 'inferior MI', 'sinus rhythm', 'non-diag T', 'junk'],
    }).set_index('code')
    p = tmp_path / 'scp.csv'
    df.to_csv(p)
    ext = extract_ptb_codes(str(p))
    assert ext['id2code'] == ['NORM', 'IMI', 'SR', 'NDT']  # XX has no aspect
    assert ext['form_codes'] == ['NDT']
    assert ext['rhythm_codes'] == ['SR']
    assert ext['diagnostic_taxonomy']['MI']['IMI'] == ['IMI']
    assert ext['code2description']['SR'] == 'sinus rhythm'
