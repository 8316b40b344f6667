"""Benchmark: training throughput (tokens/sec/chip) on Transformer-base MT.

Runs on the real TPU chip. Measures the full jitted training step (forward +
backward + Adam) on the north-star config (BASELINE.json: Transformer-base MT,
bf16, batch ~8k tokens). ``vs_baseline`` compares against the reference
stack's ballpark for the same model: PyTorch+flash-attn transformer-base MT
training sustains roughly 50k target tokens/sec on a V100-class GPU (the
hardware implied by the reference's examples, BASELINE.md) — the reference
publishes no throughput table, so this is the documented comparison anchor.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import functools
import json
import sys
import time

import numpy as np

REFERENCE_TOKENS_PER_SEC = 50_000.0  # PyTorch+flash-attn transformer-base, V100-class


def main():
    import jax
    # hardware rng_bit_generator for dropout (trainer default, --prng-impl):
    # ~25% faster steps than the threefry default on this chip
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import optax

    from pasero_tpu.config import get_model_config_cls
    from pasero_tpu.models import Transformer
    from pasero_tpu.training.trainer import shift_targets

    vocab = 32_000
    B, S, T = 128, 128, 128  # ~16k target tokens per batch
    cfg = get_model_config_cls("transformer")()
    cfg.set_defaults("translation")
    cfg.dropout = 0.1

    model = Transformer(cfg, src_vocab_size=vocab)
    rng = np.random.default_rng(0)
    batch = {
        "src_tokens": jnp.asarray(rng.integers(4, vocab, (B, S)), jnp.int32),
        "decoder_input": jnp.asarray(rng.integers(4, vocab, (B, T)), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(5e-4, b1=0.9, b2=0.98))
    opt_state = tx.init(params)

    def loss_fn(params, batch, dropout_rng):
        # the production loss path: flash CE inside the model
        # (ops/fused_ce.py pallas kernel on TPU) — the fp32 (B,T,V)
        # logits never hit HBM (cfg.fused_ce, default on)
        targets = shift_targets(batch["decoder_input"], cfg.padding_idx)
        out = model.apply({"params": params}, deterministic=False,
                          targets=targets,
                          rngs={"dropout": dropout_rng}, **batch)
        return out["loss_sum"] / jnp.maximum(out["num_tokens"], 1.0)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, step):
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(1), step)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, dropout_rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # warmup / compile; float() forces a device->host transfer, which is the
    # only reliable completion barrier through the remote-TPU tunnel
    # (block_until_ready returns early on this backend)
    for i in range(3):
        params, opt_state, loss = train_step(params, opt_state, batch,
                                             jnp.asarray(i))
    _ = float(loss)

    steps = 20
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss = train_step(params, opt_state, batch,
                                             jnp.asarray(i + 3))
    _ = float(loss)  # the last loss depends on the whole parameter chain
    elapsed = time.perf_counter() - t0

    tokens_per_step = B * T  # target tokens, matching the reference's wps log
    value = tokens_per_step * steps / elapsed
    n_chips = max(1, len(jax.devices()))
    value_per_chip = value / n_chips
    print(json.dumps({
        "metric": "train_tokens_per_sec_per_chip",
        "value": round(value_per_chip, 1),
        "unit": "target tokens/s/chip (transformer-base MT, bf16, fwd+bwd+adam)",
        "vs_baseline": round(value_per_chip / REFERENCE_TOKENS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
