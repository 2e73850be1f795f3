"""Registry invariants (reference config.py:125, 170-172, 262 label-set checks)."""
from ecg_representation_learning_tpu import registry as R


def test_71_codes_bijective():
    assert len(R.PTBXL_ID2CODE) == 71
    assert len(R.PTBXL_CODE2ID) == 71
    for i, c in enumerate(R.PTBXL_ID2CODE):
        assert R.PTBXL_CODE2ID[c] == i


def test_taxonomy_covers_diagnostic_codes():
    diag = {c for sup in R.PTBXL_DIAGNOSTIC_TAXONOMY.values()
            for codes in sup.values() for c in codes}
    assert diag <= set(R.PTBXL_ID2CODE)
    # diagnostic + form + rhythm cover all 71 codes
    all_codes = diag | set(R.PTBXL_FORM_CODES) | set(R.PTBXL_RHYTHM_CODES)
    assert all_codes == set(R.PTBXL_ID2CODE)


def test_every_code_has_an_aspect():
    for c in R.PTBXL_ID2CODE:
        assert R.ptbxl_code_aspects(c), c


def test_train_stats_are_12_lead():
    for typ in ('original', 'denoised'):
        assert len(R.PTBXL_TRAIN_STATS[typ]['mean']) == 12
        assert len(R.PTBXL_TRAIN_STATS[typ]['std']) == 12
        assert all(s > 0 for s in R.PTBXL_TRAIN_STATS[typ]['std'])


def test_export_datasets_registered():
    for key in R.EXPORT_DATASETS:
        assert key in R.DATASETS
        assert R.DATASETS[key].fqs is not None


def test_model_ladder():
    from ecg_representation_learning_tpu.configs import VitConfig
    base = VitConfig.from_defined('ecg-vit-base')
    assert (base.hidden_size, base.num_hidden_layers, base.num_attention_heads,
            base.intermediate_size) == (768, 12, 12, 3072)
    assert base.num_patches == 40
    tiny = VitConfig.from_defined('tiny')
    assert tiny.hidden_size == 256
    large = VitConfig.from_defined('ecg-vit-large')
    assert large.num_hidden_layers == 24
