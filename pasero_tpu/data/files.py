"""Streaming file readers: text, JSONL, and the binary 'numpy' feature format.

On-disk format parity with the reference (pasero/files.py): the 'numpy' format
is a pickled header ``{positions, lengths, dim, dtype}`` followed by raw
``array.tobytes()`` payloads — chosen over np.save/np.load for speed
(files.py:30-33). Files under ``store_files_under`` bytes are kept in memory.
"""

from __future__ import annotations

import io
import json
import logging
import os
import pickle
from typing import Iterable, Iterator, Optional

import numpy as np

logger = logging.getLogger("files")


class File:
    """Seekable line iterator over a text file (bytes positions)."""

    def __init__(self, path: str, store_files_under: Optional[int] = None):
        self._begin = self._position = 0
        self._path = path
        self._file = open(path, "rb")
        if store_files_under:
            self._file.seek(0, io.SEEK_END)
            size = self._file.tell()
            self._file.seek(0)
            if size <= store_files_under:
                content = self._file.read()
                self._file.close()
                self._file = io.BytesIO(content)

    @classmethod
    def get_formats(cls) -> dict:
        return {"numpy": NumpyFile, "txt": File, "jsonl": JSONLFile}

    @classmethod
    def open(cls, *args, format: str = "txt", **kwargs) -> "File":
        return cls.get_formats().get(format, File)(*args, **kwargs)

    def get_positions(self) -> tuple[np.ndarray, np.ndarray]:
        """(start position, length) of every line; costly (full read)."""
        pos = 0
        positions, lengths = [], []
        for line in self:
            positions.append(pos)
            lengths.append(len(line))
            pos = self._file.tell()
        self._file.seek(self._begin)
        return (np.array(positions, dtype=np.int64),
                np.array(lengths, dtype=np.int64))

    def __next__(self) -> str:
        self.reopen()
        return next(self._file).strip().decode()

    def __iter__(self) -> Iterator:
        while True:
            try:
                yield next(self)
            except StopIteration:
                return

    def close(self):
        if not isinstance(self._file, io.BytesIO) and not self._file.closed:
            self._position = self.tell()
            self._file.close()

    def reopen(self):
        if self._file.closed:
            self._file = open(self._path, "rb")
            self._file.seek(self._position)

    def seek(self, offset, whence=0):
        self._position = offset
        self.reopen()
        self._file.seek(offset, whence)

    def tell(self) -> int:
        self.reopen()
        return self._file.tell()


class JSONLFile(File):
    def __next__(self):
        return json.loads(super().__next__())


class NumpyFile(File):
    """Random-access reader over the binary feature format. Positions for this
    format are array indices, not byte offsets (files.py NumpyFile)."""

    def __init__(self, path: str, store_files_under: Optional[int] = None):
        super().__init__(path, store_files_under=store_files_under)
        header = pickle.load(self._file)
        self._dim = int(header["dim"])
        self._dtype = np.dtype(header["dtype"])
        self._itemsize = max(self._dim, 1) * self._dtype.itemsize
        keep = header["positions"] > 0  # zero positions = unwritten slots
        self._positions = np.asarray(header["positions"])[keep].astype(np.int64)
        self._lengths = np.asarray(header["lengths"])[keep].astype(np.int64)
        self._index = 0

    @classmethod
    def build(cls, path: str, features: Iterable[np.ndarray],
              dtype: str = "float16",
              num_feats: Optional[int] = None) -> "NumpyFile":
        if num_feats is None:
            assert hasattr(features, "__len__")
            num_feats = len(features)
        dirname = os.path.dirname(path)
        if dirname:
            os.makedirs(dirname, exist_ok=True)

        def write_header(f, positions, lengths, dim):
            pickle.dump({"positions": positions, "lengths": lengths,
                         "dim": np.array(dim, dtype=np.int64), "dtype": dtype}, f)

        with open(path, "wb") as f:
            positions = np.zeros(num_feats, dtype=np.int64)
            lengths = np.zeros(num_feats, dtype=np.int64)
            dim = 0
            write_header(f, positions, lengths, dim)
            for i, x in enumerate(features):
                x = np.asarray(x).astype(dtype)
                positions[i] = f.tell()
                lengths[i] = x.shape[0]
                dim = x.shape[1] if x.ndim > 1 else 0
                f.write(x.tobytes())
            f.seek(0)
            write_header(f, positions, lengths, dim)
        return cls(path)

    def get_positions(self):
        return np.arange(len(self._positions)), self._lengths

    def __next__(self) -> np.ndarray:
        self.reopen()
        if self._index >= len(self._positions):
            raise StopIteration
        length = int(self._lengths[self._index])
        raw = self._file.read(length * self._itemsize)
        x = np.frombuffer(raw, dtype=self._dtype).copy()
        if self._dim > 1:
            x = x.reshape(length, self._dim)
        self._index += 1
        return x

    def close(self):
        if not isinstance(self._file, io.BytesIO) and not self._file.closed:
            self._file.close()

    def reopen(self):
        if self._file.closed:
            self._file = open(self._path, "rb")
            if self._index < len(self._positions):
                self._file.seek(self._positions[self._index])

    def seek(self, offset, whence=0):
        self._index = int(offset)
        self.reopen()
        if self._index < len(self._positions):
            self._file.seek(self._positions[self._index], whence)

    def tell(self) -> int:
        return self._index
