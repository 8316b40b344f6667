"""Tasks: preprocessing/collation/corpora/metrics per task type."""

from .task import Corpus, InferenceCorpus, Task
from .translation import (InferenceParallelCorpus, ParallelCorpus,
                          TranslationTask)
from .language_modeling import (InferenceMonolingualCorpus, MonolingualCorpus,
                                LanguageModelingTask)
from .speech_translation import SpeechCorpus, SpeechTranslationTask
from .doc_level_translation import (DocumentCorpus,
                                    DocumentLevelTranslationTask)
from .dialogue import DialogueTask
from .nllb_translation import NLLBTranslationTask
