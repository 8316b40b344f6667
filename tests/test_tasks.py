"""Task-level tests: translation & LM preprocessing, collation, corpora."""

import numpy as np
import pytest
import yaml

from pasero_tpu.config import get_model_config_cls
from pasero_tpu.config.tasks import (LanguageModelingTaskConfig,
                                     TranslationTaskConfig)
from pasero_tpu.tasks import LanguageModelingTask, TranslationTask
from pasero_tpu.tokenizers import PaseroTokenizer

SRC = ["Willkommen im Dschungel", "der Hund springt", "ein gelbes U-Boot",
       "die Katze schläft auf dem Sofa"] * 10
TGT = ["Welcome to the jungle", "the dog jumps", "a yellow submarine",
       "the cat sleeps on the couch"] * 10


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mt_data")
    (d / "train.de").write_text("\n".join(SRC) + "\n")
    (d / "train.en").write_text("\n".join(TGT) + "\n")
    (d / "valid.de").write_text("\n".join(SRC[:4]) + "\n")
    (d / "valid.en").write_text("\n".join(TGT[:4]) + "\n")
    model, vocabs = PaseroTokenizer.train(
        [str(d / "train.de"), str(d / "train.en")],
        output=str(d / "bpecodes"), num_symbols=100, inline_case=True)
    items = PaseroTokenizer.build_dict(
        vocabs, padding_factor=8,
        extra_tokens=["<T>", "<U>", "<mask>", "<lang:de>", "<lang:en>"])
    with open(d / "dict.txt", "w") as f:
        for token, count in items:
            print(token, count, file=f)
    return str(d)


def make_task(data_dir, arch="transformer_small", **kwargs):
    cfg = TranslationTaskConfig(source_lang="de", target_lang="en", **kwargs)
    cfg.set_defaults("translation")
    model_cfg = get_model_config_cls(arch)()
    model_cfg.set_defaults("translation")
    cfg.set_max_length(model_cfg)
    cfg.finalize()
    task = TranslationTask(data_dir, cfg)
    task.setup_for_model(model_cfg)
    return task


def test_translation_preprocess(data_dir):
    task = make_task(data_dir)
    sample = {"source": SRC[0], "target": TGT[0],
              "meta": task.make_meta(corpus_id="test")}
    out = task.preprocess(sample, append_eos=True)
    assert out["encoder_input"][-1] == task.eos_idx
    assert out["decoder_input"][0] == task.bos_idx
    assert out["decoder_input"][-1] == task.eos_idx
    assert out["prompt_mask"][0] and not out["prompt_mask"][-1]
    # roundtrip
    text = task.postprocess(out["decoder_input"][1:],)
    assert text == TGT[0]


def test_translation_lang_code(data_dir):
    task = make_task(data_dir, lang_code=True)
    sample = {"source": SRC[0], "target": TGT[0], "meta": task.make_meta()}
    out = task.preprocess(sample)
    first_token = task.src_preprocessor.debinarize(out["encoder_input"][:1])[0]
    assert first_token == "<lang:en>"


def test_decoder_only_concatenation(data_dir):
    task = make_task(data_dir, arch="llama_7b")
    assert task.model_type == "decoder"
    sample = {"source": SRC[1], "target": TGT[1], "meta": task.make_meta()}
    out = task.preprocess(sample, append_eos=True)
    assert "encoder_input" not in out
    pm = out["prompt_mask"]
    # the source part (incl. separator EOS) is prompt, the target is not
    assert pm[0] and not pm[-1]
    eos_pos = int(np.argmax(out["decoder_input"] == task.eos_idx))
    assert pm[: eos_pos + 1].all()


def test_collate_fixed_shapes(data_dir):
    task = make_task(data_dir)
    samples = [task.preprocess({"source": s, "target": t,
                                "meta": task.make_meta()}, append_eos=True)
               for s, t in zip(SRC[:5], TGT[:5])]
    batch = task.collate(samples)
    assert batch["decoder_input"].shape[0] % 8 == 0
    assert batch["src_tokens"].shape == batch["src_mask"].shape
    assert batch["num_real_rows"] == 5
    assert (batch["decoder_input"][5:] == task.padding_idx).all()
    # prompt_length covers bos
    assert (batch["prompt_length"][:5] >= 1).all()


def test_build_batches_token_budget(data_dir):
    task = make_task(data_dir)
    samples = [task.preprocess({"source": s, "target": t,
                                "meta": task.make_meta()}, append_eos=True)
               for s, t in zip(SRC, TGT)]
    batches = task.build_batches(samples, shuffle=False, batch_size=64)
    assert len(batches) > 1
    for b in batches:
        max_len = max(max(len(s["encoder_input"]), len(s["decoder_input"]))
                      for s in b)
        assert max_len * len(b) <= 64


def test_corpus_resolution(data_dir):
    cfg = TranslationTaskConfig(lang_pairs=["de-en"])
    cfg.set_defaults("translation")
    corpora = TranslationTask.get_train_corpora(
        cfg, data_dir, [{"paths": ["train"]}])
    assert len(corpora) == 1
    assert corpora[0].source_path.endswith("train.de")
    valid = TranslationTask.get_valid_corpora(
        cfg, data_dir, [{"paths": ["valid"]}])
    assert valid[0].target_path.endswith("valid.en")


def test_corpus_resolution_missing_raises(data_dir):
    cfg = TranslationTaskConfig(lang_pairs=["de-fr"])
    cfg.set_defaults("translation")
    with pytest.raises(FileNotFoundError):
        TranslationTask.get_train_corpora(cfg, data_dir, [{"paths": ["train"]}])
    # flexible skips missing corpora
    out = TranslationTask.get_train_corpora(
        cfg, data_dir, [{"paths": ["train"], "flexible": True}])
    assert out == []


def test_lm_task(data_dir):
    cfg = LanguageModelingTaskConfig(langs=["en"])
    cfg.set_defaults("language_modeling")
    model_cfg = get_model_config_cls("transformer")()
    model_cfg.set_defaults("language_modeling")
    cfg.set_max_length(model_cfg)
    cfg.finalize()
    task = LanguageModelingTask(data_dir, cfg)
    task.setup_for_model(model_cfg)
    out = task.preprocess({"target": TGT[0], "meta": task.make_meta()},
                          append_eos=True)
    assert out["decoder_input"][-1] == task.eos_idx
    assert task.postprocess(out["decoder_input"]) == TGT[0]
    # prompt preprocessing at inference
    prompt = task.preprocess(task.input_to_sample("the dog", task.make_meta()))
    assert prompt["prompt_mask"].all()


def test_shard_batch_lockstep(data_dir):
    task = make_task(data_dir)
    samples = [task.preprocess({"source": s, "target": t,
                                "meta": task.make_meta()}, append_eos=True)
               for s, t in zip(SRC[:3], TGT[:3])]
    batch = task.collate(samples, rows_multiple=1)
    shard0 = task.shard_batch(batch, 0, 2)
    shard1 = task.shard_batch(batch, 1, 2)
    total = len(shard0["decoder_input"]) + len(shard1["decoder_input"])
    assert total == len(batch["decoder_input"])
    # rank with no rows gets a dummy batch
    tiny = task.collate(samples[:1], rows_multiple=1)
    s1 = task.shard_batch(tiny, 1, 4)
    assert s1["dummy"] and len(s1["decoder_input"]) == 1
