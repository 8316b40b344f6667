"""Tasks: preprocessing/collation/corpora/metrics per task type."""

from .task import Corpus, InferenceCorpus, Task
from .translation import (InferenceParallelCorpus, ParallelCorpus,
                          TranslationTask)
from .language_modeling import (InferenceMonolingualCorpus, MonolingualCorpus,
                                LanguageModelingTask)
