#!/usr/bin/env python3
"""MoE training-step benchmark: target tokens/s/chip for the moe_transformer
arch (top-2 gating + capacity-bounded dispatch einsums, ops/moe.py), single
chip (EP shards experts over the mesh on real multi-chip hardware)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--seq", type=int, default=128)
    parser.add_argument("--experts", type=int, default=8)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--dispatch", default="auto",
                        choices=["auto", "gather", "einsum"],
                        help="MoE token dispatch A/B (PERFORMANCE.md)")
    parser.add_argument("--arch", default="moe_transformer",
                        help="'transformer' gives the dense no-MoE baseline "
                             "for dispatch-cost attribution")
    args = parser.parse_args(argv)

    from pasero_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from pasero_tpu.config import get_model_cls
    from pasero_tpu.models.transformer import cross_entropy_loss
    from pasero_tpu.training.trainer import shift_targets

    jax.config.update("jax_default_prng_impl", "rbg")
    model_cls, cfg_cls = get_model_cls(args.arch)
    cfg = cfg_cls()
    cfg.set_defaults("translation")
    is_moe = hasattr(cfg, "decoder_expert_count")
    if is_moe:
        cfg.encoder_expert_count = args.experts
        cfg.decoder_expert_count = args.experts
        cfg.moe_dispatch = args.dispatch
    V = 32768
    B, S, T = args.batch, args.seq, args.seq

    model = model_cls(cfg, src_vocab_size=V)
    rng = np.random.default_rng(0)
    batch = {
        "src_tokens": jnp.asarray(rng.integers(4, V, (B, S)), jnp.int32),
        "src_mask": jnp.ones((B, S), bool),
        "decoder_input": jnp.asarray(rng.integers(4, V, (B, T)), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(5e-4))
    opt_state = tx.init(params)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    def loss_fn(params, batch, drng):
        targets = shift_targets(batch["decoder_input"], cfg.padding_idx)
        out, mutated = model.apply(
            {"params": params}, deterministic=False, rngs={"dropout": drng},
            mutable=["losses"], **batch)
        w = (targets != cfg.padding_idx).astype(jnp.float32)
        loss, _, denom = cross_entropy_loss(out["logits"], targets, w, 0.1)
        aux = sum(jax.tree_util.tree_leaves(mutated.get("losses", {})))
        return loss / jnp.maximum(denom, 1) + aux

    @jax.jit
    def step(params, opt_state, batch, i):
        drng = jax.random.fold_in(jax.random.PRNGKey(1), i)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, drng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state, batch, 0)
    float(loss)  # compile + completion barrier
    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, batch, i + 1)
    float(loss)
    dt = (time.perf_counter() - t0) / args.steps
    tokens = B * T
    label = (f"{args.arch} ({args.experts} experts, dispatch "
             f"{args.dispatch}" if is_moe
             else f"{args.arch} (dense baseline")
    print(f"{label}, {n_params / 1e6:.0f}M params): "
          f"{tokens / dt / 1000:.1f}k target tokens/s/chip "
          f"({dt * 1000:.1f} ms/step)")


if __name__ == "__main__":
    main()
