"""Dictionary + TextPreprocessor tests."""

import json

import numpy as np
import pytest

from pasero_tpu.config import PreprocessingConfig
from pasero_tpu.preprocessing import (Dictionary, TextPreprocessor,
                                      get_domain_tag, get_lang_code, is_tag,
                                      mask_padding, split_tags)
from pasero_tpu.tokenizers import PaseroTokenizer

CORPUS = [
    "welcome to the jungle",
    "the jungle is dark but full of diamonds",
    "we all live in a yellow submarine",
    "the quick brown fox jumps over the lazy dog",
] * 5


def test_fairseq_dictionary():
    d = Dictionary(["a", "b", "c"])
    # specials prepended: <sep>=0 <pad>=1 </s>=2 <unk>=3, first real token = 4
    assert d.idx("a") == 4 and d.idx("c") == 6
    assert d.padding_idx == 1 and d.eos_idx == 2 and d.unk_idx == 3
    assert d.bos_idx == d.eos_idx  # <s> falls back to </s>
    assert d.idx("zzz") == d.unk_idx


def test_custom_dictionary():
    d = Dictionary(["<pad>", "<s>", "</s>", "x", "y"])
    assert d.padding_idx == 0 and d.bos_idx == 1 and d.eos_idx == 2
    assert d.idx("x") == 3
    assert d.unk_idx == d.padding_idx  # no <unk> -> falls back to pad


def test_json_dictionary(tmp_path):
    path = tmp_path / "dict.json"
    path.write_text(json.dumps({"</s>": 0, "<pad>": 1, "hello": 2, "world": 3}))
    d = Dictionary.build(str(path))
    assert d.idx("world") == 3 and d.eos_idx == 0


def test_dictionary_extend_and_save(tmp_path):
    d = Dictionary(["a", "b"])
    d.extend(16)
    assert len(d) == 16
    d.save(str(tmp_path / "dict.txt"), counts={"a": 5})
    d2 = Dictionary.build(str(tmp_path / "dict.txt"))
    assert d2.idx("a") == d.idx("a") and len(d2) == len(d)


def test_to_indices_truncation():
    d = Dictionary(["a", "b", "c"])
    ids = d.to_indices(["a", "b", "c"], max_len=3, append_eos=True)
    assert len(ids) == 3 and ids[-1] == d.eos_idx
    left = d.to_indices(["a", "b", "c"], max_len=3, append_eos=True, truncate_left=True)
    assert list(left[:2]) == [d.idx("b"), d.idx("c")]


def test_tags():
    assert is_tag("<lang:de>") and is_tag("<domain:medical>")
    assert not is_tag("<mask>")
    assert get_lang_code("fr") == "<lang:fr>"
    assert get_domain_tag("it") == "<domain:it>"
    parts = split_tags("<lang:de> <domain:med> hello world")
    assert parts == ["<lang:de>", "<domain:med>", "hello world"]


def test_mask_padding():
    # eos=2 pad=1: everything after eos counts as padding
    assert mask_padding([5, 6, 2, 1, 1], eos_idx=2, padding_idx=1) == [0, 0, 0, 1, 1]


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    corpus = d / "corpus.txt"
    corpus.write_text("\n".join(CORPUS) + "\n")
    model, vocabs = PaseroTokenizer.train([str(corpus)], output=str(d / "bpecodes"),
                                          num_symbols=60, inline_case=True)
    items = PaseroTokenizer.build_dict(vocabs, padding_factor=1,
                                       extra_tokens=["<T>", "<U>", "<mask>", "<lang:de>"])
    with open(d / "dict.txt", "w") as f:
        for token, count in items:
            print(token, count, file=f)
    return str(d)


def test_preprocessor_end_to_end(data_dir):
    cfg = PreprocessingConfig(tokenizer="pasero", inline_case=True)
    cfg.set_defaults("translation")
    pp = TextPreprocessor(cfg, data_dir)
    line = "Welcome to the Jungle"
    tokens = pp.tokenize(line)
    ids = pp.binarize(tokens)
    assert ids.dtype == np.int32 and ids[-1] == pp.eos_idx
    back = pp.debinarize(ids)
    assert pp.detokenize(back) == line


def test_preprocessor_protected_tokens(data_dir):
    cfg = PreprocessingConfig(tokenizer="pasero", inline_case=True,
                              protect_tokens=["<lang:de>"])
    cfg.set_defaults("translation")
    pp = TextPreprocessor(cfg, data_dir)
    tokens = pp.tokenize("<lang:de> the jungle </s> rest")
    assert "<lang:de>" in tokens and "</s>" in tokens


def test_preprocessor_oov_and_unk(data_dir):
    cfg = PreprocessingConfig(tokenizer="pasero")
    cfg.set_defaults("translation")
    pp = TextPreprocessor(cfg, data_dir)
    tokens = pp.tokenize("xylophone")  # chars not all in the tiny vocab
    counts, oov = pp.get_oov(tokens)
    ids = pp.binarize(tokens)
    if oov:
        assert pp.unk_idx in ids


def test_preprocessor_special_ids_override(data_dir):
    cfg = PreprocessingConfig(tokenizer="pasero")
    cfg.set_defaults("translation")
    pp = TextPreprocessor(cfg, data_dir)
    pp.padding_idx = 7  # model overrides the tokenizer's ids
    assert pp.dictionary.padding_idx == 7
    assert pp.dictionary[7] == "<pad>"


def test_detokenize_on_the_fly(data_dir):
    cfg = PreprocessingConfig(tokenizer="pasero", inline_case=True)
    cfg.set_defaults("translation")
    pp = TextPreprocessor(cfg, data_dir)
    line = "Welcome to the Jungle"
    tokens = pp.tokenize(line)
    words = list(pp.detokenize_on_the_fly(iter(tokens + ["</s>"])))
    text = "".join(w for w, _ in words)
    assert text.replace("  ", " ").strip() == line
    # every input token accounted for exactly once (minus the special)
    flat = [t for _, ts in words for t in ts]
    assert flat == tokens


def test_inference_options(data_dir):
    cfg = PreprocessingConfig(tokenizer="pasero", inline_case=True)
    cfg.set_defaults("translation")
    pp = TextPreprocessor(cfg, data_dir)
    opts = pp.inference_options
    assert opts["tokenizer_path"] == "bpecodes"
    assert opts["dict"] == "dict.txt"
    assert opts.get("inline_case") is True
    assert "char_noise" not in opts  # training-only noise excluded
