import json

import pytest

from cullavo_tpu.config import Config, apply_overrides, load_config, merge_dotted


def test_merge_dotted_creates_nesting():
    cfg = {}
    merge_dotted(cfg, {"MODEL.BACKBONE.NAME": "focal", "LR": 1e-4})
    assert cfg == {"MODEL": {"BACKBONE": {"NAME": "focal"}}, "LR": 1e-4}


def test_merge_later_file_wins(tmp_path):
    a = tmp_path / "a.yaml"
    b = tmp_path / "b.yaml"
    a.write_text("MODEL:\n  NAME: xdecoder_model\n  DIM: 512\nLR: 0.001\n")
    b.write_text("MODEL:\n  NAME: cullavo_model\n")
    cfg = load_config([str(a), str(b)])
    assert cfg.MODEL.NAME == "cullavo_model"
    assert cfg.MODEL.DIM == 512  # untouched keys survive the merge
    assert cfg.LR == 0.001


def test_override_type_coercion():
    cfg = {"LR": 0.001, "EPOCHS": 3, "FLAG": True, "NAME": "x", "LIST": [1, 2]}
    apply_overrides(cfg, ["LR", "0.01", "EPOCHS", "7", "FLAG", "False",
                          "NAME", "y", "LIST", "[3,4]"])
    assert cfg["LR"] == 0.01 and isinstance(cfg["LR"], float)
    assert cfg["EPOCHS"] == 7 and isinstance(cfg["EPOCHS"], int)
    assert cfg["FLAG"] is False  # the "False"-string hack
    assert cfg["NAME"] == "y"
    assert cfg["LIST"] == [3, 4]


def test_override_dotted_new_key():
    cfg = {}
    apply_overrides(cfg, ["A.B.C", "42"])
    assert cfg == {"A": {"B": {"C": 42}}}


def test_config_immutable():
    cfg = Config({"A": {"B": 1}})
    with pytest.raises(TypeError):
        cfg.A = 2
    with pytest.raises(TypeError):
        cfg["A"] = 2
    assert cfg.A.B == 1
    assert cfg.get("MISSING") is None
    assert "A" in cfg


def test_config_overrides_json(tmp_path):
    a = tmp_path / "a.yaml"
    a.write_text("MODEL:\n  DIM: 512\n")
    cfg = load_config([str(a)], config_overrides_json=json.dumps({"MODEL.DIM": 256}))
    assert cfg.MODEL.DIM == 256


def test_constants_load():
    from cullavo_tpu.utils import constants

    assert len(constants.COCO_PANOPTIC_CLASSES) == 133
    assert len(constants.IMAGENET_CLASSES) == 1000
    assert len(constants.get_prompt_templates()) == 81
    assert constants.class_names_for("coco_2017_val_panoptic")[0] == "person"
    out = constants.prompt_engineering("dog", topk=1)
    assert out == "dog."
