"""Optimizer helpers: freeze/train regex semantics on dotted names
(reference cli/train.py:229-243)."""

from pasero_tpu.optimization import trainable_mask

TREE = {"encoder": {"layers_0": {"q_proj": {"kernel": 1.0}},
                    "subsample": {"conv_0": {"kernel": 2.0}}},
        "decoder": {"layers_0": {"adapters_0": {"w": 3.0},
                                 "ffn": {"w": 4.0}}}}


def flat(mask):
    return {
        "enc.q": mask["encoder"]["layers_0"]["q_proj"]["kernel"],
        "enc.conv": mask["encoder"]["subsample"]["conv_0"]["kernel"],
        "dec.adapter": mask["decoder"]["layers_0"]["adapters_0"]["w"],
        "dec.ffn": mask["decoder"]["layers_0"]["ffn"]["w"],
    }


def test_freeze_regex_dotted_names():
    """`^encoder` must anchor on the dotted name (it silently matched
    nothing against jax's raw keystr format)."""
    m = flat(trainable_mask(TREE, freeze_regex="^encoder"))
    assert m == {"enc.q": False, "enc.conv": False,
                 "dec.adapter": True, "dec.ffn": True}


def test_train_regex_reference_style():
    """A reference-style parameter-efficient regex (IWSLT2023 recipe:
    subsampler + bottom encoder layers + adapters)."""
    m = flat(trainable_mask(
        TREE, train_regex=r"(\.subsample|encoder\.layers_[0-2]\.|\.adapters)"))
    assert m == {"enc.q": True, "enc.conv": True,
                 "dec.adapter": True, "dec.ffn": False}


def test_default_trainable_fallback():
    m = flat(trainable_mask(TREE,
                            default_trainable=lambda n: "adapters_" in n))
    assert m == {"enc.q": False, "enc.conv": False,
                 "dec.adapter": True, "dec.ffn": False}
