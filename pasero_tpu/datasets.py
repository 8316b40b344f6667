"""Training and validation datasets: the host-side input pipeline.

Re-design of pasero/datasets.py:515-1147 for per-host TPU feeding:

- the reference's process tree (reader proc -> tokenizer workers -> batcher ->
  per-GPU mp.Queues, datasets.py:794-964) becomes one background *thread*
  pipeline per host feeding a bounded prefetch queue: the heavy lifting
  (BPE, numpy ops) releases the GIL rarely but tokenization is cheap relative
  to TPU steps, and a thread avoids pickling/fork issues with JAX;
- batches are length-sorted inside a large buffer then token-budget batched
  (same buffered_batching semantics incl. --batch-by homogeneous grouping,
  datasets.py:708-730), and padded to bucketed shapes for XLA;
- ValidationDataset preprocesses once and yields deterministic batches,
  sharded round-robin with dummy batches for DP lockstep
  (datasets.py:515-607).
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Iterator, Optional

import numpy as np

from .config import register_dataset
from .data.line_index import LineIndex
from .data.samplers import LineSampler
from .utils.metrics import Metrics

logger = logging.getLogger("data")


def batch_sort_key(batch_by, sample) -> tuple:
    meta = sample.get("meta", {})
    key = tuple(meta.get(k) for k in batch_by or ())
    # multimodal batches must also be homogeneous in dtype/rank
    enc = sample.get("encoder_input")
    if enc is not None:
        key += (enc.ndim, str(enc.dtype))
    return key


class TrainingDatasetBase:
    def __init__(self, cfg, dist_cfg, task, corpora, rng=None):
        self.cfg = cfg
        self.dist_cfg = dist_cfg
        self.task = task
        self.corpora = corpora
        self.rng = rng or np.random.default_rng(dist_cfg.seed)
        self.metrics = Metrics(window=None)
        task.register_corpora(*corpora)

    def _sample_stream(self) -> Iterator[dict]:
        index = LineIndex.build(self.cfg, self.corpora)
        sampler = LineSampler(
            self.corpora, index, lang_temperature=self.cfg.lang_temperature,
            store_files_under=self.cfg.store_files_under,
            shuffle=self.cfg.shuffle, max_lines=self.cfg.max_lines,
            close_files=self.cfg.close_files, rng=self.rng)
        skipped = 0
        for raw in sampler:
            sample = self.task.preprocess(raw, truncate=self.cfg.truncate,
                                          append_eos=True)
            if not sample:
                skipped += 1
                if skipped % 10000 == 0:
                    logger.info(f"skipped {skipped} too-long/filtered samples")
                continue
            yield sample

    def _batched_stream(self) -> Iterator[dict]:
        """buffer -> (group by batch_by) -> length-sort -> token-budget batches."""
        buffer: list = []
        for sample in self._sample_stream():
            buffer.append(sample)
            if len(buffer) < self.cfg.buffer_size:
                continue
            yield from self._flush(buffer)
            buffer = []

    def _flush(self, buffer: list) -> Iterator[dict]:
        groups: dict = {}
        for sample in buffer:
            groups.setdefault(batch_sort_key(self.cfg.batch_by, sample),
                              []).append(sample)
        all_batches = []
        for group in groups.values():
            all_batches += self.task.build_batches(group, shuffle=True,
                                                   rng=self.rng)
        if self.cfg.shuffle:
            order = self.rng.permutation(len(all_batches))
        else:
            order = np.arange(len(all_batches))
        for i in order:
            batch = self.task.collate(all_batches[i])
            if batch is not None:
                yield batch

    def endless_iterator(self) -> Iterator[dict]:
        raise NotImplementedError


@register_dataset("simple")
@register_dataset("debug")
class DebugTrainingDataset(TrainingDatasetBase):
    """Synchronous pipeline — breakpoint-friendly (--debug,
    pasero/config.py:1730-1732)."""

    def endless_iterator(self) -> Iterator[dict]:
        while True:
            yield from self._batched_stream()


@register_dataset("dynamic")
class DynamicTrainingDataset(TrainingDatasetBase):
    """Background-thread pipeline with a bounded prefetch queue."""

    QUEUE_SIZE = 16

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._queue: queue.Queue = queue.Queue(maxsize=self.QUEUE_SIZE)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def _worker(self):
        try:
            while not self._stop.is_set():
                for batch in self._batched_stream():
                    if self._stop.is_set():
                        return
                    self._queue.put(batch)
        except BaseException as e:  # propagate pipeline crashes to the consumer
            self._error = e
            self._queue.put(None)

    def endless_iterator(self) -> Iterator[dict]:
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker, daemon=True,
                                            name="data-pipeline")
            self._thread.start()
        while True:
            batch = self._queue.get()
            if batch is None:
                raise RuntimeError("data pipeline crashed") from self._error
            yield batch

    def close(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass


class ValidationDataset:
    """Whole-corpus, preprocessed once, deterministic batches
    (pasero/datasets.py:515-607)."""

    def __init__(self, cfg, task, corpus, max_lines: Optional[int] = None):
        self.task = task
        self.corpus = corpus
        self.samples = []
        files = corpus.open_files()
        count = 0
        while True:
            line_tuple = []
            try:
                for f in files:
                    line_tuple.append(next(f))
            except StopIteration:
                break
            line_tuple = tuple(line_tuple)
            if not all(len(x) > 0 for x in line_tuple):
                continue
            raw = corpus.tuple_to_dict(line_tuple)
            sample = task.preprocess(raw, truncate=True, append_eos=True)
            if sample:
                sample["index"] = count
                sample["raw"] = raw
                self.samples.append(sample)
            count += 1
            if max_lines and count >= max_lines:
                break
        for f in files:
            f.close()
        task.register_corpora(corpus)

    def __len__(self):
        return len(self.samples)

    def batches(self, shard_id: int = 0, shard_count: int = 1) -> Iterator[dict]:
        batches = self.task.build_batches(list(self.samples), shuffle=False)
        for i, batch_samples in enumerate(batches):
            if i % shard_count != shard_id:
                continue
            batch = self.task.collate(batch_samples)
            if batch is not None:
                yield batch

    @property
    def references(self) -> list:
        return [self.task.get_reference(s["raw"]) for s in self.samples]
