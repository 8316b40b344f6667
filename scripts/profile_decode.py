#!/usr/bin/env python3
"""Per-op profile of the decode benchmark (beam/greedy search overhead
attribution — the round-3 review's beam-decode demand): runs
scripts/bench_decode.py under jax.profiler and prints device time by op
class (xprof_util).

Usage: python scripts/profile_decode.py [bench_decode args...]
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)


def main():
    from pasero_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax

    import bench_decode
    import xprof_util

    trace_dir = os.environ.get("PASERO_TRACE_DIR", "/tmp/prof_decode")
    os.makedirs(trace_dir, exist_ok=True)
    argv = sys.argv[1:] + ["--repeats", "1"]
    with jax.profiler.trace(trace_dir):
        bench_decode.main(argv)
    xprof_util.report(trace_dir)


if __name__ == "__main__":
    main()
