import pytest

from mmtrack_tpu.config import ConfigNode, vipt_default_config, vipt_experiment_config


def test_attribute_access_and_clone():
    cfg = vipt_default_config()
    assert cfg.MODEL.BACKBONE.STRIDE == 16
    c2 = cfg.clone()
    c2.MODEL.BACKBONE.STRIDE = 8
    assert cfg.MODEL.BACKBONE.STRIDE == 16


def test_strict_unknown_key_rejected():
    cfg = vipt_default_config()
    with pytest.raises(KeyError):
        cfg.merge_from_dict({"MODEL": {"NOT_A_KEY": 1}})
    with pytest.raises(KeyError):
        cfg.merge_from_dict({"TYPO_TOP": {}})


def test_yaml_roundtrip(tmp_path):
    cfg = vipt_experiment_config("deep_rgbd")
    p = tmp_path / "c.yaml"
    cfg.dump_yaml(str(p))
    cfg2 = vipt_default_config()
    cfg2.merge_from_yaml(str(p))
    assert cfg2.to_dict() == cfg.to_dict()


def test_experiment_presets_match_reference_yaml():
    # values from ViPT/experiments/vipt/deep_rgbd.yaml:1-79
    cfg = vipt_experiment_config("deep_rgbd")
    assert cfg.DATA.SEARCH.SIZE == 256
    assert cfg.DATA.SEARCH.FACTOR == 4.0
    assert cfg.DATA.TEMPLATE.SIZE == 128
    assert cfg.MODEL.BACKBONE.CE_LOC == [3, 6, 9]
    assert cfg.MODEL.BACKBONE.CE_KEEP_RATIO == [0.7, 0.7, 0.7]
    assert cfg.MODEL.BACKBONE.CE_TEMPLATE_RANGE == "CTR_POINT"
    assert cfg.TRAIN.PROMPT.TYPE == "vipt_deep"
    assert cfg.TRAIN.EPOCH == 60 and cfg.TRAIN.LR_DROP_EPOCH == 48
    assert vipt_experiment_config("shaw_rgbt").TRAIN.PROMPT.TYPE == "vipt_shaw"
    assert vipt_experiment_config("deep_rgbe").DATA.TRAIN.DATASETS_NAME == ["VisEvent_train"]


def test_shipped_experiment_yamls_load():
    """configs/vipt/*.yaml must overlay cleanly onto the default tree and
    reproduce the code presets (the reference ships these as files,
    ViPT/experiments/vipt/)."""
    import glob
    import os

    from mmtrack_tpu.config import vipt_default_config, vipt_experiment_config

    paths = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                          "configs", "vipt", "*.yaml")))
    assert len(paths) == 6
    for p in paths:
        name = os.path.splitext(os.path.basename(p))[0]
        cfg = vipt_default_config()
        cfg.merge_from_yaml(p)
        assert cfg.to_dict() == vipt_experiment_config(name).to_dict()
