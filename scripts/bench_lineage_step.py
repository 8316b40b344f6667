#!/usr/bin/env python3
"""Microbench: full model decode_step with vs without beam_lineage, isolated
from the search bookkeeping (fori_loop of chained decoder calls)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pasero_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from pasero_tpu.config import get_model_config_cls
    from pasero_tpu.models import Transformer

    B, K, S, N, P, V = 64, 5, 32, 64, 1, 32768
    ITERS = 30
    cfg = get_model_config_cls("transformer")()
    cfg.set_defaults("translation")
    L = P + N

    model = Transformer(cfg, src_vocab_size=V, self_cache_len=L,
                        cross_cache_len=S)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, V, (B * K, S)), jnp.int32)
    prompt = jnp.full((B * K, P), 2, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src_tokens=src,
                        decoder_input=prompt)["params"]
    encoder_out, encoder_mask = model.apply(
        {"params": params}, src, method=Transformer.encode)
    # prime the cache
    _, cache = model.apply(
        {"params": params}, prompt, encoder_out=encoder_out,
        encoder_mask=encoder_mask,
        positions=jnp.zeros((B * K, P), jnp.int32),
        tgt_mask=jnp.ones((B * K, P), bool),
        self_kv_mask=jnp.ones((B * K, L), bool),
        method=Transformer.decode_step, mutable=["cache"])
    tok = jnp.full((B * K, 1), 5, jnp.int32)
    kv_mask = jnp.ones((B * K, L), bool)
    lineage = jnp.zeros((B, K, L), jnp.int32)

    def run(with_lineage):
        kw = {"beam_lineage": lineage} if with_lineage else {}

        @jax.jit
        def loop(tok, cache):
            def body(i, carry):
                tok, cache = carry
                scores, cache = model.apply(
                    {"params": params, **cache}, tok,
                    encoder_out=encoder_out, encoder_mask=encoder_mask,
                    positions=jnp.full((B * K, 1), P, jnp.int32),
                    tgt_mask=jnp.ones((B * K, 1), bool),
                    self_kv_mask=kv_mask, method=Transformer.decode_step,
                    mutable=["cache"], **kw)
                tok = jnp.argmax(scores[:, -1], -1)[:, None].astype(jnp.int32)
                return tok, cache
            return lax.fori_loop(0, ITERS, body, (tok, cache))

        out = loop(tok, cache)
        np.asarray(out[0]).ravel()[0]
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(tok, cache)[0]).ravel()[0]
            best = min(best, time.perf_counter() - t0)
        return best * 1000 / ITERS

    t_plain = run(False)
    t_lin = run(True)
    print(f"decode_step plain {t_plain:6.3f} ms   lineage {t_lin:6.3f} ms  "
          f"({t_lin / t_plain:.2f}x)")


if __name__ == "__main__":
    main()
