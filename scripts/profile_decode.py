#!/usr/bin/env python3
"""Capture a device trace of beam decode and print the per-op time table.

Usage: python scripts/profile_decode.py [--out /tmp/beamprof] [--permute]
Parses the captured xplane with tensorboard_plugin_profile (present in this
image) and prints the top HLO ops by self time.

NOTE: requires a locally-attached TPU. Over the remote-TPU ("axon")
tunnel, jax.profiler.trace blocks forever waiting for a device trace the
remote backend never delivers — on such hosts use the ablation benches
(scripts/bench_lineage_step.py, bench_decode.py) instead.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/beamprof")
    parser.add_argument("--permute", action="store_true",
                        help="profile the cache-permute path instead of lineage")
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--beam", type=int, default=5)
    parser.add_argument("--max-new", type=int, default=64)
    parser.add_argument("--top", type=int, default=40)
    args = parser.parse_args()

    from pasero_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pasero_tpu.config import get_model_config_cls
    from pasero_tpu.models import Transformer
    from pasero_tpu.decoding.search import beam_search

    B, K, N, S, P, V = args.batch, args.beam, args.max_new, 32, 1, 32768
    cfg = get_model_config_cls("transformer")()
    cfg.set_defaults("translation")
    model = Transformer(cfg, src_vocab_size=V, self_cache_len=P + N,
                        cross_cache_len=S)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, V, (B, S)), jnp.int32)
    prompt = jnp.full((B, P), 2, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src_tokens=src,
                        decoder_input=prompt)["params"]
    encoder_out, encoder_mask = model.apply(
        {"params": params}, src, method=Transformer.encode)

    fn = jax.jit(lambda p: beam_search(
        model, p, prompt, jnp.ones((B, P), bool), beam_size=K, max_new=N,
        eos_idx=cfg.eos_idx, pad_idx=cfg.padding_idx,
        encoder_out=encoder_out, encoder_mask=encoder_mask,
        lineage=not args.permute))
    out = fn(params)
    np.asarray(out["tokens"])                     # warm + force

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(2):
            out = fn(params)
            np.asarray(out["tokens"])

    xplanes = sorted(glob.glob(
        os.path.join(args.out, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    assert xplanes, f"no xplane captured under {args.out}"
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([xplanes[-1]], "framework_op_stats", {})
    import csv
    import io
    rows = list(csv.DictReader(io.StringIO(
        data.decode() if isinstance(data, bytes) else data)))
    dev = [r for r in rows if r.get("host_or_device") == "Device"]
    dev.sort(key=lambda r: -float(r.get("total_self_time_us") or 0))
    total = sum(float(r.get("total_self_time_us") or 0) for r in dev)
    print(f"device self time total: {total/1e3:.2f} ms (2 beam searches of "
          f"{N} steps => {total/1e3/2/N:.3f} ms/step)")
    print(f"{'op':60s} {'self_ms':>9s} {'%':>6s} {'occ':>6s}")
    for r in dev[:args.top]:
        t = float(r.get("total_self_time_us") or 0)
        print(f"{r.get('operation', r.get('op_name', '?'))[:60]:60s} "
              f"{t/1e3:9.3f} {100*t/total:6.2f} "
              f"{r.get('occurrences', ''):>6s}")


if __name__ == "__main__":
    main()
