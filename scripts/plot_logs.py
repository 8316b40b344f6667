#!/usr/bin/env python3
"""Plot training curves from train.log files (pasero/scripts/plot-logs.py).

Usage: python scripts/plot_logs.py model_dir/train.log [more.log ...]
           --metric nll_loss [--corpus train] [-o curves.png]
"""

import argparse
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("logs", nargs="+")
    parser.add_argument("--metric", default="nll_loss")
    parser.add_argument("--corpus", default=None,
                        help="corpus to plot (default: all valid corpora, or "
                             "'train' for training curves)")
    parser.add_argument("-o", "--output", default="curves.png")
    args = parser.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from pasero_tpu.utils.logging_utils import parse_logs

    fig, ax = plt.subplots()
    for path in args.logs:
        data = parse_logs(path)
        corpora = [args.corpus] if args.corpus else sorted(data)
        for corpus in corpora:
            series = data.get(corpus, {})
            points = [(step, m[args.metric]) for step, m in sorted(series.items())
                      if args.metric in m]
            if points:
                steps, values = zip(*points)
                ax.plot(steps, values, label=f"{path}:{corpus}")
    ax.set_xlabel("step")
    ax.set_ylabel(args.metric)
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
