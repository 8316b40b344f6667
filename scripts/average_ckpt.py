#!/usr/bin/env python3
"""Average the weights of several checkpoints (pasero/scripts/average-ckpt.py).

Usage: python scripts/average_ckpt.py ckpt1.npz ckpt2.npz ... -o out.npz
"""

import argparse
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoints", nargs="+")
    parser.add_argument("-o", "--output", required=True)
    args = parser.parse_args(argv)
    from pasero_tpu.checkpoints import average_checkpoints
    avg = average_checkpoints(args.checkpoints)
    with open(args.output, "wb") as f:
        np.savez(f, **avg)
    print(f"averaged {len(args.checkpoints)} checkpoints -> {args.output}")


if __name__ == "__main__":
    main()
