"""Candidate elimination: attention-guided search-token pruning, static-shape.

Rebuild of ViPT/lib/models/layers/attn_blocks.py:21-75 for XLA: the number of
kept tokens is a compile-time constant (ceil(keep_ratio * L_s)), ranking uses
argsort (stable, full ordering gives both kept and removed indices in one op),
and the template-mask reduction is a weighted mean instead of boolean fancy
indexing so shapes stay static for any mask.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def ce_keep_lengths(lens_s: int, ce_loc: list[int], keep_ratio: float, depth: int) -> list[int]:
    """Static search-token length ENTERING each block (length `depth`).

    The post-CE kept counts come from the single canonical schedule
    (models/vipt.py::ce_keep_schedule, ceil semantics of
    attn_blocks.py:40) so the two views cannot drift apart."""
    from mmtrack_tpu.models.vipt import ce_keep_schedule

    kept = ce_keep_schedule(lens_s, tuple(ce_loc),
                            [keep_ratio] * len(ce_loc))
    lengths, cur, k = [], lens_s, 0
    for i in range(depth):
        lengths.append(cur)
        if i in ce_loc:
            cur = kept[k]
            k += 1
    return lengths


def candidate_elimination(
    attn: jnp.ndarray,
    tokens: jnp.ndarray,
    lens_t: int,
    lens_keep: int,
    global_index: jnp.ndarray,
    box_mask_z: jnp.ndarray | None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Keep the `lens_keep` search tokens most attended by the template.

    Args:
      attn: (B, H, L_t+L_s, L_t+L_s) attention probabilities.
      tokens: (B, L_t+L_s, C) token stream.
      lens_t: template token count (static).
      lens_keep: kept search-token count (static; caller computes ceil).
      global_index: (B, L_s) original search-grid index of each live token.
      box_mask_z: (B, L_t) float/bool weights restricting which template rows
        vote (reference's CTR_POINT/CTR_REC/GT_BOX masks); None = all rows.

    Returns:
      (tokens_new (B, L_t+lens_keep, C), keep_index (B, lens_keep),
       removed_index (B, L_s - lens_keep)).
    """
    lens_s = attn.shape[-1] - lens_t
    attn_t = attn[:, :, :lens_t, lens_t:]  # (B, H, L_t, L_s)

    if box_mask_z is not None:
        w = box_mask_z.astype(attn_t.dtype)  # (B, L_t)
        denom = jnp.maximum(w.sum(axis=1, keepdims=True), 1e-9)  # (B, 1)
        # weighted mean over template rows == mean over selected rows
        score = jnp.einsum("bhts,bt->bhs", attn_t, w) / denom[:, None, :]
        score = score.mean(axis=1)  # (B, L_s)
    else:
        score = attn_t.mean(axis=2).mean(axis=1)  # (B, L_s)

    order = jnp.argsort(-score, axis=1)  # descending
    topk_idx = order[:, :lens_keep]
    non_topk_idx = order[:, lens_keep:]

    keep_index = jnp.take_along_axis(global_index, topk_idx, axis=1)
    removed_index = jnp.take_along_axis(global_index, non_topk_idx, axis=1)

    tokens_t = tokens[:, :lens_t]
    tokens_s = tokens[:, lens_t:]
    kept = jnp.take_along_axis(tokens_s, topk_idx[..., None], axis=1)
    tokens_new = jnp.concatenate([tokens_t, kept], axis=1)
    return tokens_new, keep_index, removed_index


def recover_search_tokens(tokens_s: jnp.ndarray, global_index: jnp.ndarray,
                          lens_x: int) -> jnp.ndarray:
    """Scatter surviving search tokens back to the full (B, lens_x, C) grid.

    Pruned positions become zeros — the padding convention of the reference's
    recovery scatter (vit_ce_prompt.py:276-283, 325-334).
    """
    B, _, C = tokens_s.shape
    out = jnp.zeros((B, lens_x, C), tokens_s.dtype)
    bidx = jnp.arange(B)[:, None]
    return out.at[bidx, global_index].set(tokens_s)


def gather_search_tokens(tokens_s_full: jnp.ndarray, global_index: jnp.ndarray) -> jnp.ndarray:
    """Inverse of recover_search_tokens: pick live tokens from the full grid.

    Used by the deep-prompt re-elimination (candidate_elimination_prompt,
    attn_blocks.py:9-18).
    """
    return jnp.take_along_axis(tokens_s_full, global_index[..., None], axis=1)
