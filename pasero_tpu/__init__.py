"""pasero_tpu: a TPU-native (JAX/XLA/Pallas) text-generation framework.

From-scratch re-design of the capabilities of naver/pasero (machine translation,
speech translation, language modeling, dialogue) for TPU: GSPMD sharding over a
(data, tensor, expert) mesh, Pallas kernels for attention and the speech
frontend, on-device beam search, and a declarative config system with a model
zoo. See SURVEY.md at the repo root for the capability blueprint.
"""

__version__ = "0.1.0"

# populate the task/dataset registries (jax-free imports)
from . import tasks as _tasks  # noqa: E402,F401
from . import datasets as _datasets  # noqa: E402,F401
