"""Logging setup + train.log parsing + attention heatmaps
(pasero/utils.py:175-216, 1298-1358, 1435-1469)."""

from __future__ import annotations

import logging
import os
import re
import sys
from typing import Optional

COLORS = {"DEBUG": "\x1b[38;20m", "INFO": "\x1b[34;20m",
          "WARNING": "\x1b[33;20m", "ERROR": "\x1b[31;20m"}
RESET = "\x1b[0m"


class ColorFormatter(logging.Formatter):
    def format(self, record):
        message = super().format(record)
        if sys.stderr.isatty():
            color = COLORS.get(record.levelname, "")
            return f"{color}{message}{RESET}"
        return message


def setup_logging(model_dir: Optional[str] = None,
                  log_file: Optional[str] = None, verbose: bool = False):
    """Colored console logging + optional file logging."""
    level = logging.DEBUG if verbose else logging.INFO
    fmt = "%(asctime)s | %(name)s | %(message)s"
    console = logging.StreamHandler()
    console.setFormatter(ColorFormatter(fmt))
    handlers = [console]
    if model_dir and log_file:
        os.makedirs(model_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(model_dir, log_file))
        fh.setFormatter(logging.Formatter(fmt))
        handlers.append(fh)
    logging.basicConfig(level=level, handlers=handlers, force=True)


_TRAIN_LINE = re.compile(
    r"step (\d+) \| (.*)")
_VALID_LINE = re.compile(
    r"valid \| (\S+) \| (.*)")
_KV = re.compile(r"(\w+) ([\d.eE+-]+)")


def parse_log_lines(lines) -> dict:
    """Parse train.log lines into {corpus: {step: {metric: value}}}
    (pasero/utils.py:1435-1469). Training lines go under corpus 'train'."""
    out: dict = {}
    last_step = 0
    for line in lines:
        m = _TRAIN_LINE.search(line)
        if m:
            step = int(m.group(1))
            last_step = step
            metrics = {k: float(v) for k, v in _KV.findall(m.group(2))}
            out.setdefault("train", {})[step] = metrics
            continue
        m = _VALID_LINE.search(line)
        if m:
            corpus = m.group(1)
            metrics = {k: float(v) for k, v in _KV.findall(m.group(2))}
            out.setdefault(corpus, {})[last_step] = metrics
    return out


def parse_logs(path: str) -> dict:
    with open(path) as f:
        return parse_log_lines(f)


def heatmap(weights, x_labels: list, y_labels: list,
            output_path: Optional[str] = None):
    """Attention-alignment heatmap (pasero/utils.py:1298-1358); returns the
    matplotlib figure."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    weights = np.asarray(weights, dtype=np.float32)
    fig, ax = plt.subplots(
        figsize=(max(4, len(x_labels) * 0.5), max(3, len(y_labels) * 0.4)))
    ax.imshow(weights, cmap="viridis", aspect="auto")
    ax.set_xticks(range(len(x_labels)))
    ax.set_xticklabels(x_labels, rotation=90, fontsize=8)
    ax.set_yticks(range(len(y_labels)))
    ax.set_yticklabels(y_labels, fontsize=8)
    fig.tight_layout()
    if output_path:
        fig.savefig(output_path, dpi=120)
    return fig
