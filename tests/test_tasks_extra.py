"""Tests for speech / doc-level / dialogue / NLLB tasks."""

import json

import numpy as np
import pytest

from pasero_tpu.config import get_model_config_cls
from pasero_tpu.config.tasks import (DialogueTaskConfig,
                                     DocumentLevelTranslationTaskConfig,
                                     SpeechTranslationTaskConfig)
from pasero_tpu.tasks import (DialogueTask, DocumentLevelTranslationTask,
                              SpeechTranslationTask)
from pasero_tpu.tokenizers import PaseroTokenizer

TEXT = ["the dog jumps", "a yellow submarine", "welcome to the jungle",
        "the cat sleeps"] * 10


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    (d / "corpus.txt").write_text("\n".join(TEXT) + "\n")
    model, vocabs = PaseroTokenizer.train([str(d / "corpus.txt")],
                                          output=str(d / "bpecodes"),
                                          num_symbols=80, inline_case=True)
    items = PaseroTokenizer.build_dict(
        vocabs, padding_factor=1,
        extra_tokens=["<T>", "<U>", "<mask>", "<|im_start|>",
                      "<|im_end|>"])  # <sep> is auto-prepended (fairseq format)
    with open(d / "dict.txt", "w") as f:
        for token, count in items:
            print(token, count, file=f)
    return str(d)


def make_model_cfg(task, arch="transformer"):
    cfg = get_model_config_cls(arch)()
    cfg.set_defaults(task)
    return cfg


def test_speech_task(data_dir):
    cfg = SpeechTranslationTaskConfig(source_lang="x", target_lang="en")
    cfg.set_defaults("speech_translation")
    model_cfg = make_model_cfg("translation", "whisper_base")
    cfg.set_max_length(model_cfg)
    cfg.finalize()
    task = SpeechTranslationTask(data_dir, cfg)
    task.setup_for_model(model_cfg)
    feats = np.random.default_rng(0).normal(size=(50, 80)).astype(np.float32)
    out = task.preprocess({"source": feats, "target": TEXT[0],
                           "meta": task.make_meta()}, append_eos=True)
    assert out["encoder_input"].shape == (50, 80)
    assert out["decoder_input"][-1] == task.eos_idx
    batch = task.collate([out])
    assert batch["src_tokens"].ndim == 3  # feature batch


def test_doc_level_task(data_dir):
    cfg = DocumentLevelTranslationTaskConfig(
        source_lang="de", target_lang="en", max_doc_size=3)
    cfg.set_defaults("doc_level_translation")
    model_cfg = make_model_cfg("translation")
    cfg.set_max_length(model_cfg)
    cfg.finalize()
    task = DocumentLevelTranslationTask(data_dir, cfg)
    task.setup_for_model(model_cfg)
    doc = {"source": ("the dog jumps", "a yellow submarine"),
           "target": ("the dog jumps", "a yellow submarine"),
           "meta": task.make_meta()}
    out = task.preprocess(doc, append_eos=True)
    tokens = task.debinarize(out["decoder_input"])
    assert "<sep>" in tokens
    # postprocess keeps only the last sentence
    text = task.postprocess(out["decoder_input"][1:])
    assert text == "a yellow submarine"


def test_dialogue_task(data_dir):
    cfg = DialogueTaskConfig(chat_template="chatml")
    cfg.set_defaults("dialogue")
    model_cfg = make_model_cfg("language_modeling")
    cfg.set_max_length(model_cfg)
    cfg.finalize()
    task = DialogueTask(data_dir, cfg)
    task.setup_for_model(model_cfg)
    sample = task.input_to_sample(
        "User: the dog jumps\nAssistant: a yellow submarine")
    assert [m["role"] for m in sample["target"]] == ["user", "assistant"]
    out = task.preprocess(sample, append_eos=True)
    pm = out["prompt_mask"]
    # the user turn is prompt, the assistant answer is not
    assert pm[0] and not pm.all()
    # inference: last user turn adds the generation prompt
    inf = task.preprocess(task.input_to_sample("User: the cat sleeps"))
    assert inf["prompt_mask"].all()
    tokens = task.debinarize(inf["decoder_input"])
    assert tokens[-1] != "<|im_end|>"  # ends with the assistant start


def test_dialogue_message_list(data_dir):
    cfg = DialogueTaskConfig(chat_template="zephyr",
                             system_prompt="the jungle")
    cfg.set_defaults("dialogue")
    model_cfg = make_model_cfg("language_modeling")
    cfg.set_max_length(model_cfg)
    cfg.finalize()
    task = DialogueTask(data_dir, cfg)
    task.setup_for_model(model_cfg)
    sample = task.input_to_sample(["the dog jumps", "a yellow submarine"])
    out = task.preprocess(sample, append_eos=True)
    assert not out["prompt_mask"].all()
    assert task.get_reference(sample) == "a yellow submarine"


def test_nllb_expert_hotswap(tmp_path, data_dir):
    import jax.numpy as jnp
    from pasero_tpu.config.tasks import NLLBTranslationTaskConfig
    from pasero_tpu.tasks import NLLBTranslationTask

    # two synthetic experts
    for i in range(2):
        np.savez(tmp_path / f"expert_{i:04}.npz", **{
            "decoder/layers_0/ffn/experts_in":
                np.full((8, 16), float(i), np.float32),
            "decoder/layers_0/ffn/experts_out":
                np.full((16, 8), float(i), np.float32),
        })
    (tmp_path / "experts.json").write_text(json.dumps({"de-en": [0, 1],
                                                       "fr-en": [1, 0]}))
    cfg = NLLBTranslationTaskConfig(
        lang_pairs=["de-en", "fr-en"], expert_json=str(tmp_path / "experts.json"),
        expert_dir=str(tmp_path))
    cfg.set_defaults("nllb_translation")
    model_cfg = make_model_cfg("translation")
    cfg.set_max_length(model_cfg)
    cfg.finalize()
    task = NLLBTranslationTask(data_dir, cfg)
    params = {"decoder": {"layers_0": {"ffn": {
        "experts_in": jnp.zeros((2, 8, 16)),
        "experts_out": jnp.zeros((2, 16, 8))}}}}
    swapped = task.load_experts(params, "de", "en")
    arr = np.asarray(swapped["decoder"]["layers_0"]["ffn"]["experts_in"])
    assert arr[0].mean() == 0.0 and arr[1].mean() == 1.0
    # swapping to another pair reorders the experts
    swapped2 = task.load_experts(swapped, "fr", "en")
    arr2 = np.asarray(swapped2["decoder"]["layers_0"]["ffn"]["experts_in"])
    assert arr2[0].mean() == 1.0 and arr2[1].mean() == 0.0
    # same pair: no-op
    assert task.load_experts(swapped2, "fr", "en") is swapped2
