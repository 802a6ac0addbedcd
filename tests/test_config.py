"""Config tree tests incl. loading reference config files."""

from gpt_sovits_tpu.utils.config import (
    S1Config,
    S2Config,
    inference_config_from_reference_yaml,
    s1_config_from_reference_yaml,
    s2_config_for_version,
    s2_config_from_reference_json,
)

REF = "/root/reference/GPT_SoVITS/configs"


def test_versions():
    assert s2_config_for_version("v2ProPlus").upsample_initial_channel == 768
    assert s2_config_for_version("v2Pro").gin_channels == 1024
    assert s2_config_for_version("v3").is_cfm


def test_s2_config_from_reference_json():
    cfg = s2_config_from_reference_json(f"{REF}/s2.json")
    assert cfg.spec_channels == 1025
    assert cfg.segment_size == 32
    assert cfg.upsample_rates == (10, 8, 2, 2, 2)
    assert cfg.gin_channels == 512
    assert cfg.freeze_quantizer


def test_s1_config_from_reference_yaml():
    cfg = s1_config_from_reference_yaml(f"{REF}/s1longer-v2.yaml")
    assert cfg.num_layers == 24
    assert cfg.num_heads == 16
    assert cfg.phoneme_vocab_size == 732
    assert cfg.eos_id == 1024


def test_inference_config_from_reference_yaml():
    cfg = inference_config_from_reference_yaml(f"{REF}/tts_infer.yaml", "v2")
    assert cfg.version in ("v2", "v1")
