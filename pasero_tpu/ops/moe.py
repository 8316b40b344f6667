"""Mixture-of-Experts gating and dispatch math.

TPU-native equivalent of the reference's Top2Gate + Tutel dispatch
(pasero/models/mixture_of_experts.py:32-310). Instead of Tutel's CUDA kernels
and explicit NCCL all-to-all, tokens are dispatched with capacity-bounded
one-hot einsums; under GSPMD with the expert axis of the stacked weights
sharded over the 'expert' mesh axis, XLA lowers these einsums to the same
all-to-all communication pattern over ICI (SURVEY.md §2.9 EP row).

Static shapes: every expert processes exactly ``capacity`` token slots;
overflow tokens are dropped from the expert path (residual connection keeps
their activations), matching Tutel's capacity-factor semantics
(mixture_of_experts.py:225-260).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def top2_gating(logits: jnp.ndarray, pad_mask: Optional[jnp.ndarray] = None,
                capacity: Optional[int] = None,
                capacity_factor: float = 0.0,
                second_expert_policy: str = "all",
                compact: bool = False):
    """Top-2 gating (GShard-style, matching Top2Gate semantics).

    logits: (T, E) router outputs (float32 recommended);
    pad_mask: (T,) True at REAL tokens (padding gets no expert).

    Returns dict with:
      dispatch (T, E, C) bool, combine (T, E, C) float32,
      aux_loss (scalar), stats {top1_share, load, mean_gate}.

    With ``compact=True`` the O(T·E·C) dispatch/combine one-hots are not
    built; instead a 'routing' dict of (T,) arrays (expert ids, capacity
    slots, keep flags, normalized gates) drives the gather-based dispatch
    (dispatch_tokens_gather) — same semantics, ~T× fewer dispatch FLOPs
    on a single chip (PERFORMANCE.md MoE dispatch A/B).
    """
    T, E = logits.shape
    gates = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if pad_mask is not None:
        gates = gates * pad_mask.astype(jnp.float32)[:, None]

    if capacity is None:
        factor = capacity_factor if capacity_factor and capacity_factor > 0 else 1.0
        capacity = max(4, int(2 * factor * T / E))
    C = capacity

    index1 = jnp.argmax(gates, axis=-1)                        # (T,)
    mask1 = jax.nn.one_hot(index1, E, dtype=jnp.float32)
    gates_wo1 = gates * (1.0 - mask1)
    index2 = jnp.argmax(gates_wo1, axis=-1)
    mask2 = jax.nn.one_hot(index2, E, dtype=jnp.float32)
    if pad_mask is not None:
        real = pad_mask.astype(jnp.float32)[:, None]
        mask1 = mask1 * real
        mask2 = mask2 * real

    # load-balancing loss: E * sum_e fraction_tokens_e * mean_gate_e
    # (mixture_of_experts.py:56-75)
    if pad_mask is not None:
        denom = jnp.maximum(pad_mask.astype(jnp.float32).sum(), 1.0)
    else:
        denom = float(T)
    me = jnp.sum(gates, axis=0) / denom
    ce = jnp.sum(mask1, axis=0) / denom
    aux_loss = E * jnp.sum(me * ce)

    # capacity assignment: position of each token within its expert
    pos1 = (jnp.cumsum(mask1, axis=0) - mask1)                 # (T, E)
    mask1 = mask1 * (pos1 < C)
    pos2 = (jnp.cumsum(mask2, axis=0) - mask2) + jnp.sum(mask1, axis=0)
    mask2 = mask2 * (pos2 < C)

    gate1 = jnp.sum(gates * mask1, axis=-1)                    # (T,)
    gate2 = jnp.sum(gates * mask2, axis=-1)
    norm = jnp.maximum(gate1 + gate2, 1e-9)
    gate1, gate2 = gate1 / norm, gate2 / norm

    slot1 = jnp.sum(pos1 * mask1, axis=-1).astype(jnp.int32)   # (T,)
    slot2 = jnp.sum(pos2 * mask2, axis=-1).astype(jnp.int32)

    stats = {
        "load": jnp.sum(mask1 + mask2, axis=0),                # tokens per expert
        "mean_gate": me,
        "top1_share": ce,
    }
    out = {"aux_loss": aux_loss, "capacity": C, "stats": stats}
    if compact:
        out["routing"] = {
            "expert1": index1.astype(jnp.int32),
            "expert2": index2.astype(jnp.int32),
            "slot1": slot1, "slot2": slot2,
            "keep1": jnp.sum(mask1, axis=-1) > 0,              # (T,) bool
            "keep2": jnp.sum(mask2, axis=-1) > 0,
            "gate1": gate1, "gate2": gate2,
        }
        return out

    onehot_c1 = jax.nn.one_hot(slot1, C, dtype=jnp.float32)    # (T, C)
    onehot_c2 = jax.nn.one_hot(slot2, C, dtype=jnp.float32)
    combine = (gate1[:, None, None] * mask1[:, :, None] * onehot_c1[:, None, :]
               + gate2[:, None, None] * mask2[:, :, None] * onehot_c2[:, None, :])
    out["dispatch"] = combine > 0
    out["combine"] = combine.astype(jnp.float32)
    return out


def dispatch_tokens(x: jnp.ndarray, dispatch: jnp.ndarray) -> jnp.ndarray:
    """(T, D), (T, E, C) -> (E, C, D) expert inputs.

    One-hot einsum: O(T·E·C·D) MXU FLOPs. Under GSPMD with experts sharded
    over the 'expert' mesh axis this contraction lowers to the Tutel-style
    all-to-all over ICI, which is why the sharded impls use it."""
    return jnp.einsum("tec,td->ecd", dispatch.astype(x.dtype), x)


def combine_tokens(expert_out: jnp.ndarray, combine: jnp.ndarray) -> jnp.ndarray:
    """(E, C, D), (T, E, C) -> (T, D)."""
    return jnp.einsum("tec,ecd->td", combine.astype(expert_out.dtype), expert_out)


def _slot_destinations(routing, E: int, C: int):
    """(dest1, dest2): each kept token's flat slot id in [0, E·C); dropped
    tokens point at the trash slot E·C.  Slot ids are unique by construction
    (cumsum positions within an expert; second-choice positions offset past
    the first-choice count), so scatters below never collide."""
    trash = E * C
    dest1 = jnp.where(routing["keep1"],
                      routing["expert1"] * C + routing["slot1"], trash)
    dest2 = jnp.where(routing["keep2"],
                      routing["expert2"] * C + routing["slot2"], trash)
    return dest1, dest2


def dispatch_tokens_gather(x: jnp.ndarray, routing: dict, E: int,
                           C: int) -> jnp.ndarray:
    """(T, D), routing -> (E, C, D) expert inputs via scatter/gather.

    O(T·D) memory traffic instead of the einsum's O(T·E·C·D) FLOPs — on a
    single chip the dispatch cost drops from 'as expensive as the expert
    FFN itself' to a reshuffle at HBM bandwidth.  Empty slots read a zero
    sentinel row.  The backward of the gather is a scatter-add back into
    token order (exact, since slots are unique)."""
    T, D = x.shape
    dest1, dest2 = _slot_destinations(routing, E, C)
    token_ids = jnp.arange(T, dtype=jnp.int32)
    # slot -> source token (T = zero-sentinel row of xpad)
    src = jnp.full((E * C + 1,), T, jnp.int32)
    src = src.at[dest1].set(token_ids, mode="drop")
    src = src.at[dest2].set(token_ids, mode="drop")
    src = src[:E * C]
    xpad = jnp.concatenate([x, jnp.zeros((1, D), x.dtype)], axis=0)
    return jnp.take(xpad, src, axis=0).reshape(E, C, D)


def combine_tokens_gather(expert_out: jnp.ndarray, routing: dict) -> jnp.ndarray:
    """(E, C, D), routing -> (T, D): gather each token's two expert outputs
    and mix with the normalized gates (combine_tokens semantics)."""
    E, C, D = expert_out.shape
    flat = jnp.concatenate(
        [expert_out.reshape(E * C, D),
         jnp.zeros((1, D), expert_out.dtype)], axis=0)   # trash slot reads 0
    dest1, dest2 = _slot_destinations(routing, E, C)
    y1 = jnp.take(flat, dest1, axis=0)
    y2 = jnp.take(flat, dest2, axis=0)
    g1 = (routing["gate1"] * routing["keep1"]).astype(flat.dtype)[:, None]
    g2 = (routing["gate2"] * routing["keep2"]).astype(flat.dtype)[:, None]
    return y1 * g1 + y2 * g2
