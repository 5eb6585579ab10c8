"""Unit tests for the config/utility layer."""

import textwrap

from multimodal_content_moderation_tpu.utils.config import (
    infer_size,
    load_config,
    merge_configs,
    parse_label_list,
)


def test_parse_label_list_forms():
    assert parse_label_list(None) == []
    assert parse_label_list("") == []
    assert parse_label_list("a,b , c") == ["a", "b", "c"]
    assert parse_label_list("['a', 'b']") == ["a", "b"]
    assert parse_label_list(["a", " b ", ""]) == ["a", "b"]
    assert parse_label_list("racist") == ["racist"]


def test_infer_size_variants():
    assert infer_size({"size": {"height": 224, "width": 196}}) == (224, 196)
    assert infer_size({"size": {"shortest_edge": 256}}) == (256, 256)
    assert infer_size({"size": 160}) == (160, 160)
    assert infer_size({"size": (100, 120)}) == (100, 120)
    assert infer_size({}) == (224, 224)


def test_merge_configs_deep():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    override = {"a": {"y": 20, "z": 30}, "c": 4}
    merged = merge_configs(base, override)
    assert merged == {"a": {"x": 1, "y": 20, "z": 30}, "b": 3, "c": 4}
    assert base == {"a": {"x": 1, "y": 2}, "b": 3}  # no mutation


def test_load_config_base_inheritance(tmp_path):
    (tmp_path / "base.yaml").write_text(
        textwrap.dedent(
            """
            model:
              backend: clip
              fusion_dim: 512
            training:
              lr_head: 5.0e-4
            """
        )
    )
    (tmp_path / "child.yaml").write_text(
        textwrap.dedent(
            """
            _base_: base.yaml
            model:
              backend: siglip
            """
        )
    )
    cfg = load_config(str(tmp_path / "child.yaml"))
    assert cfg["model"]["backend"] == "siglip"
    assert cfg["model"]["fusion_dim"] == 512
    assert cfg["training"]["lr_head"] == 5.0e-4
