"""Tests for the config system: typed fields, precedence, registries, arch zoo."""

import os

import pytest
import yaml

from pasero_tpu.config import (
    Config, DecodingAPIConfig, TrainingConfig, TransformerConfig, argument,
    get_model_cls, get_model_config_cls, MODEL_CONFIG_REGISTRY,
)
from pasero_tpu.config.core import merge_config_sources


class DemoConfig(Config):
    lr: float = argument(0.1, help="learning rate")
    steps: int = argument(100)
    name: str = argument("x", choices=["x", "y"])
    langs: list[str] = argument(["en"])
    flag: bool = argument(False)
    opt: int = argument()


class DemoSub(DemoConfig):
    lr: float = 0.5  # plain override of the default


def test_defaults_and_kwargs():
    cfg = DemoConfig()
    assert cfg.lr == 0.1 and cfg.steps == 100 and cfg.opt is None
    cfg = DemoConfig(lr=0.2, steps="7", flag="true")
    assert cfg.lr == 0.2 and cfg.steps == 7 and cfg.flag is True


def test_unknown_option_raises():
    with pytest.raises(TypeError):
        DemoConfig(nonexistent=1)
    DemoConfig(strict=False, nonexistent=1)  # tolerated when not strict


def test_choices_checked():
    with pytest.raises(ValueError):
        DemoConfig(name="z")


def test_subclass_default_override():
    assert DemoSub().lr == 0.5
    assert DemoSub().steps == 100


def test_list_coercion():
    cfg = DemoConfig(langs="de en fr")
    assert cfg.langs == ["de", "en", "fr"]
    assert DemoConfig().langs == ["en"]  # default not shared between instances
    a, b = DemoConfig(), DemoConfig()
    a.langs.append("zz")
    assert b.langs == ["en"]


def test_cli_parsing():
    cfg = DemoConfig.parse_args(["--lr", "0.3", "--langs", "a", "b", "--flag"])
    assert cfg.lr == 0.3 and cfg.langs == ["a", "b"] and cfg.flag is True


def test_merge_precedence():
    cfg = merge_config_sources(
        DemoConfig,
        cli={"lr": 0.9},
        kwargs={"lr": 0.5, "steps": 5},
        yaml_cfg={"lr": 0.1, "steps": 1, "name": "y"},
    )
    assert cfg.lr == 0.9       # CLI wins
    assert cfg.steps == 5      # kwargs beat YAML
    assert cfg.name == "y"     # YAML beats defaults


def test_arch_zoo_resolution():
    assert len(MODEL_CONFIG_REGISTRY) >= 60
    llama = get_model_config_cls("llama_7b")()
    assert llama.rms_norm and llama.activation_fn == "swiglu"
    assert llama.model_type == "decoder"
    mixtral = get_model_config_cls("mixtral_7b")()
    assert mixtral.decoder_expert_count == 8
    assert mixtral.sliding_window is None  # Mixtral disables Mistral's window
    small = get_model_config_cls("transformer_small")()
    assert small.encoder_ffn_dim == 1024 and small.encoder_attention_heads == 4
    # fairseq alias
    assert get_model_config_cls("transformer_iwslt_de_en") is type(small)


def test_task_defaults():
    cfg = TransformerConfig()
    assert cfg.label_smoothing is None
    cfg.set_defaults("translation")
    assert cfg.label_smoothing == 0.1
    assert cfg.model_type == "encoder_decoder"
    cfg2 = TransformerConfig().set_defaults("language_modeling")
    assert cfg2.label_smoothing == 0.0 and cfg2.model_type == "decoder"


def test_training_config_composition(tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    yaml_path = tmp_path / "train.yaml"
    yaml_path.write_text(yaml.safe_dump({
        "arch": "transformer_small",
        "dropout": 0.3,
        "max_steps": 1000,
        "valid_interval": 500,
        "lang_pairs": ["de-en"],
    }))
    cfg = TrainingConfig(
        "--config", str(yaml_path),
        "--data-dir", str(data_dir),
        "-o", str(tmp_path / "model"),
        "--lr", "0.001",
        "--dropout", "0.2",   # CLI beats YAML
    )
    assert cfg.model_cfg.dropout == 0.2
    assert cfg.model_cfg.encoder_ffn_dim == 1024
    assert cfg.lr == 0.001
    assert cfg.max_steps == 1000
    assert cfg.save_interval == 500  # defaults to valid_interval
    assert cfg.task_cfg.lang_pairs == ["de-en"]
    assert cfg.task_cfg.replace_placeholders("x.{pair}") == "x.de-en"
    assert cfg.model_cfg.label_smoothing == 0.1  # task default applied
    assert cfg.seed is not None
    # sub-config options are flattened in as_dict
    d = cfg.as_dict()
    assert d["dropout"] == 0.2 and d["lr"] == 0.001


def test_training_config_placeholders(tmp_path):
    (tmp_path / "dd").mkdir()
    cfg = TrainingConfig(
        "--data-dir", str(tmp_path / "dd"),
        "-o", str(tmp_path / "model.{pair}"),
        "-s", "de", "-t", "en",
        "--max-steps", "10", "--valid-interval", "10", "--log-interval", "10",
    )
    assert cfg.model_dir.endswith("model.de-en")
    assert cfg.task_cfg.max_source_len == cfg.model_cfg.encoder_max_len


def test_training_config_unknown_yaml_key(tmp_path):
    (tmp_path / "dd").mkdir()
    yaml_path = tmp_path / "bad.yaml"
    yaml_path.write_text(yaml.safe_dump({"max_steps": 1, "valid_interval": 1,
                                         "bogus_option": 1}))
    with pytest.raises(TypeError):
        TrainingConfig("--config", str(yaml_path),
                       "--data-dir", str(tmp_path / "dd"), "-o", str(tmp_path / "m"))


def test_inference_options(tmp_path):
    (tmp_path / "dd").mkdir()
    cfg = TrainingConfig(
        "--data-dir", str(tmp_path / "dd"), "-o", str(tmp_path / "m"),
        "--max-steps", "10", "--valid-interval", "10", "--log-interval", "10",
        "--beam-size", "4", "--task", "translation",
    )
    opts = cfg.inference_options
    assert opts["beam_size"] == 4
    assert "max_output_len" not in opts  # defaults excluded
