#!/usr/bin/env python3
"""Plot training curves from train.log files (pasero/scripts/plot-logs.py).

Usage: python scripts/plot_logs.py model_dir/train.log [more.log ...]
           --metric nll_loss [--corpus train] [-o curves.png]

Supports the reference's presentation flags (--model-names, --title, axis
labels/limits, step range, figure size, markers, sort, baseline line) and
reading logs from a remote machine with --host (ssh cat).
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("logs", nargs="*", help="train.log paths")
    parser.add_argument("--models", nargs="+",
                        help="model directories (reads DIR/train.log)")
    parser.add_argument("--model-names", nargs="+",
                        help="legend names, one per log")
    parser.add_argument("--root-dir", default="",
                        help="prefix prepended to every log/model path")
    parser.add_argument("--host",
                        help="read the logs from this ssh host")
    parser.add_argument("--metric", default="nll_loss")
    parser.add_argument("--corpus", default=None,
                        help="corpus to plot (default: all valid corpora, or "
                             "'train' for training curves)")
    parser.add_argument("--min-steps", type=int)
    parser.add_argument("--max-steps", type=int)
    parser.add_argument("--max-points", type=int,
                        help="subsample each curve to at most this many points")
    parser.add_argument("--min-y", type=float)
    parser.add_argument("--max-y", type=float)
    parser.add_argument("--start-at-zero", action="store_true",
                        help="force the y axis to start at 0")
    parser.add_argument("--baseline", type=float,
                        help="draw a horizontal baseline at this value")
    parser.add_argument("--baseline-name", default="baseline")
    parser.add_argument("--title")
    parser.add_argument("--xlabel", default="step")
    parser.add_argument("--ylabel")
    parser.add_argument("--fig-size", nargs=2, type=float, default=None)
    parser.add_argument("--legend-loc", default="best")
    parser.add_argument("--markers", nargs="*", default=None)
    parser.add_argument("--linestyles", nargs="*", default=None)
    parser.add_argument("--colors", nargs="*", default=None)
    parser.add_argument("--sort", action="store_true",
                        help="sort curves by their last value")
    parser.add_argument("-o", "--output", default="curves.png")
    args = parser.parse_args(argv)

    logs = list(args.logs)
    logs += [os.path.join(m, "train.log") for m in args.models or []]
    if args.root_dir:
        logs = [os.path.join(args.root_dir, p) for p in logs]
    if not logs:
        parser.error("no logs given (positional paths or --models)")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from pasero_tpu.utils.logging_utils import parse_logs, parse_log_lines

    names = args.model_names or logs
    fig, ax = plt.subplots(figsize=tuple(args.fig_size)
                           if args.fig_size else None)
    curves = []
    for name, path in zip(names, logs):
        if args.host:
            text = subprocess.run(["ssh", args.host, "cat", path],
                                  capture_output=True, text=True,
                                  check=True).stdout
            data = parse_log_lines(text.splitlines())
        else:
            data = parse_logs(path)
        corpora = [args.corpus] if args.corpus else sorted(data)
        for corpus in corpora:
            series = data.get(corpus, {})
            points = [(step, m[args.metric])
                      for step, m in sorted(series.items())
                      if args.metric in m
                      and (args.min_steps is None or step >= args.min_steps)
                      and (args.max_steps is None or step <= args.max_steps)]
            if args.max_points and len(points) > args.max_points:
                stride = max(1, len(points) // args.max_points)
                points = points[::stride]
            if points:
                label = name if len(corpora) == 1 else f"{name}:{corpus}"
                curves.append((label, points))
    if args.sort:
        curves.sort(key=lambda c: c[1][-1][1])
    for i, (label, points) in enumerate(curves):
        steps, values = zip(*points)
        style = {}
        if args.markers:
            style["marker"] = args.markers[i % len(args.markers)]
        if args.linestyles:
            style["linestyle"] = args.linestyles[i % len(args.linestyles)]
        if args.colors:
            style["color"] = args.colors[i % len(args.colors)]
        ax.plot(steps, values, label=label, **style)
    if args.baseline is not None:
        ax.axhline(args.baseline, linestyle="--", color="gray",
                   label=args.baseline_name)
    ax.set_xlabel(args.xlabel)
    ax.set_ylabel(args.ylabel or args.metric)
    if args.title:
        ax.set_title(args.title)
    bottom = 0 if args.start_at_zero else args.min_y
    if bottom is not None or args.max_y is not None:
        ax.set_ylim(bottom=bottom, top=args.max_y)
    ax.legend(fontsize=7, loc=args.legend_loc)
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
