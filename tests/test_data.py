"""Data pipeline tests: files, line index, samplers, batching."""

import numpy as np
import pytest

from pasero_tpu.data import (CorpusSampler, File, LineIndex, LineReader,
                             LineSampler, NumpyFile, build_batches,
                             length_buckets, pad_to_bucket)
from pasero_tpu.tasks.translation import ParallelCorpus


@pytest.fixture
def parallel_corpus(tmp_path):
    n = 600
    src = tmp_path / "train.de"
    tgt = tmp_path / "train.en"
    src.write_text("\n".join(f"quelle {i}" for i in range(n)) + "\n")
    tgt.write_text("\n".join(f"target {i}" for i in range(n)) + "\n")
    return ParallelCorpus(str(src), str(tgt), "de", "en")


def test_file_positions(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("aa\nbbb\n\ncccc\n")
    f = File(str(p))
    positions, lengths = f.get_positions()
    assert len(positions) == 4 and lengths.tolist() == [2, 3, 0, 4]
    f.seek(positions[3])
    assert next(f) == "cccc"


def test_numpy_file_roundtrip(tmp_path):
    feats = [np.random.default_rng(i).normal(size=(5 + i, 8)).astype(np.float16)
             for i in range(4)]
    path = str(tmp_path / "feats.bin")
    NumpyFile.build(path, feats, dtype="float16")
    f = NumpyFile(path)
    idx, lengths = f.get_positions()
    assert lengths.tolist() == [5, 6, 7, 8]
    for i, expected in enumerate(feats):
        f.seek(i)
        np.testing.assert_array_equal(next(f), expected)


def test_line_index_and_reader(parallel_corpus, tmp_path):
    index = LineIndex([parallel_corpus], block_size=64,
                      index_path=str(tmp_path / "idx.bin"))
    blocks, block_size, size, _ = index[parallel_corpus]
    assert size == 600 and block_size == 64
    assert len(blocks) == 10  # ceil(600/64)

    # cached reload
    index2 = LineIndex([parallel_corpus], block_size=64,
                       index_path=str(tmp_path / "idx.bin"))
    assert not index2.changed

    reader = LineReader(parallel_corpus, line_index=index, shuffle=False,
                        endless=False, rng=np.random.default_rng(0))
    samples = [next(reader) for _ in range(600)]
    assert samples[0]["source"] == "quelle 0"
    assert samples[0]["target"] == "target 0"
    assert samples[0]["meta"]["source_lang"] == "de"
    # endless reader wraps around
    reader2 = LineReader(parallel_corpus, line_index=index, shuffle=False,
                         endless=True, rng=np.random.default_rng(0))
    for _ in range(610):
        s = next(reader2)
    assert s["source"].startswith("quelle")


def test_reader_sharding(parallel_corpus, tmp_path):
    index = LineIndex([parallel_corpus], block_size=64)
    readers = [LineReader(parallel_corpus, line_index=index, shuffle=False,
                          shard_id=i, shard_count=2, endless=False,
                          rng=np.random.default_rng(0)) for i in range(2)]
    seen = set()
    for r in readers:
        for s in iter(r._iter):
            seen.add(s["source"])
    assert len(seen) >= 550  # all blocks covered across shards (last remainder ok)


def test_corpus_sampler_temperature(parallel_corpus, tmp_path):
    # two corpora with very different sizes
    small_src = tmp_path / "small.de"
    small_tgt = tmp_path / "small.en"
    small_src.write_text("\n".join(f"klein {i}" for i in range(10)) + "\n")
    small_tgt.write_text("\n".join(f"small {i}" for i in range(10)) + "\n")
    small = ParallelCorpus(str(small_src), str(small_tgt), "fr", "en")

    sampler1 = CorpusSampler([parallel_corpus, small], [600, 10],
                             lang_temperature=1.0,
                             rng=np.random.default_rng(0))
    assert sampler1.probs[0] > 0.9
    samplerU = CorpusSampler([parallel_corpus, small], [600, 10],
                             lang_temperature=100,
                             rng=np.random.default_rng(0))
    np.testing.assert_allclose(samplerU.probs, [0.5, 0.5])
    sampler5 = CorpusSampler([parallel_corpus, small], [600, 10],
                             lang_temperature=5.0,
                             rng=np.random.default_rng(0))
    assert 0.5 < sampler5.probs[0] < sampler1.probs[0]


def test_fixed_probability(parallel_corpus, tmp_path):
    small_src = tmp_path / "s.de"; small_src.write_text("a\nb\n")
    small_tgt = tmp_path / "s.en"; small_tgt.write_text("a\nb\n")
    small = ParallelCorpus(str(small_src), str(small_tgt), "de", "en",
                           probability=0.25)
    sampler = CorpusSampler([parallel_corpus, small], [600, 2],
                            rng=np.random.default_rng(0))
    np.testing.assert_allclose(sampler.probs, [0.75, 0.25])


def test_build_batches_semantics():
    sizes = [1000, 2000, 4000, 500, 1000, 1000]
    batches = build_batches(np.arange(6), sizes.__getitem__, batch_size=4000,
                            batch_size_multiple=1, max_lines=2)
    assert batches == [[0, 1], [2], [3, 4], [5]]
    # oversized elements are skipped
    batches = build_batches([0, 1], [5000, 10].__getitem__, batch_size=4000)
    assert batches == [[1]]


def test_build_batches_multiple():
    sizes = [100] * 10
    batches = build_batches(np.arange(10), sizes.__getitem__, batch_size=500,
                            batch_size_multiple=4)
    for b in batches[:-1]:
        assert len(b) % 4 == 0


def test_length_buckets_and_padding():
    buckets = length_buckets(256, min_len=16)
    assert buckets[0] == 16 and buckets[-1] == 256
    arrays = [np.arange(5, dtype=np.int32), np.arange(20, dtype=np.int32)]
    batch, mask = pad_to_bucket(arrays, buckets, pad_value=1, rows_multiple=8)
    assert batch.shape[0] == 8            # rows padded to multiple
    assert batch.shape[1] in buckets      # time snapped to a bucket
    assert mask[0].sum() == 5 and mask[1].sum() == 20
    assert (batch[2:] == 1).all()         # dummy rows fully padded
