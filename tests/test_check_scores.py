"""expected_scores regression checking (reference cli/train.py:604-660):
the YAML-declared score floor/ceiling kills the run on regression."""

import pytest

from cli.train import check_scores


class Cfg:
    def __init__(self, specs):
        self.expected_scores = specs


SPEC = [{"corpus": "valid.de-en", "steps": 100,
         "metrics": {"bleu": 30.0, "wer": 12.0}}]


def test_passes_when_scores_meet_expectations():
    check_scores(Cfg(SPEC), {"valid.de-en": {"bleu": 31.2, "wer": 11.0}}, 100)


def test_raises_on_higher_is_better_regression():
    with pytest.raises(RuntimeError, match="bleu"):
        check_scores(Cfg(SPEC), {"valid.de-en": {"bleu": 28.0}}, 100)


def test_raises_on_lower_is_better_regression():
    with pytest.raises(RuntimeError, match="wer"):
        check_scores(Cfg(SPEC), {"valid.de-en": {"bleu": 31.0, "wer": 14.5}},
                     100)


def test_only_checks_the_declared_step():
    # same regression at a different step: not checked yet
    check_scores(Cfg(SPEC), {"valid.de-en": {"bleu": 5.0}}, 50)


def test_epsilon_tolerance():
    check_scores(Cfg(SPEC), {"valid.de-en": {"bleu": 29.995}}, 100)


def test_missing_metric_is_skipped():
    check_scores(Cfg(SPEC), {"valid.de-en": {"chrf": 50.0}}, 100)
    check_scores(Cfg(None), {}, 100)
