"""Stage-2 matcher losses: MNN NLL and LightGlue deep-supervision NLL.

Functional parity with reference `core/loss/matcher_loss.py` (MNNLoss:11,
NLLLoss:68) and the LightGlue loss (`core/modules/matchers/lightglue.py:
weight_loss:66, NLLLoss.nll_loss:122, LightGlue.loss:751`). Pure jnp over the
model's training outputs (`all_log_assignments`, `confidence_logits*`)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def mnn_loss(pred_match: Dict, gt_match: Dict,
             weight: float = 1.0) -> Tuple[jax.Array, Dict]:
    """NLL of dual-softmax similarity at GT-assigned pairs
    (reference MNNLoss; similarity -> "2 - chordal distance" scores)."""
    sim = pred_match["similarity"]
    assignment = gt_match["assignment"].astype(sim.dtype)
    scores = 2.0 - jnp.sqrt(jnp.maximum(2.0 * (1.0 - sim), 1e-6))
    prob0 = jax.nn.log_softmax(scores, axis=2)
    prob1 = jax.nn.log_softmax(scores, axis=1)
    num = jnp.maximum(jnp.sum(assignment, axis=(1, 2)), 1.0)
    nll0 = jnp.sum(prob0 * assignment, axis=(1, 2)) / num
    nll1 = jnp.sum(prob1 * assignment, axis=(1, 2)) / num
    nll = -(nll0 + nll1) / 2.0
    loss = jnp.mean(nll) * weight
    return loss, {
        "matcher_n_pair_nll": loss,
        "matcher_total": loss,
        "matcher_num_matchable": jnp.mean(num),
    }


def nll_weights_from_gt(la_shape, gt_matches0: jax.Array,
                        gt_matches1: jax.Array,
                        gt_assignment: jax.Array) -> jax.Array:
    """Build the (B, N+1, M+1) weight tensor from GT labels: positives in
    the core, unmatched (-1) in the dustbin row/col; ignore (-2) nowhere
    (reference lightglue.py NLLLoss.nll_loss:122)."""
    B, Np1, Mp1 = la_shape
    N, M = Np1 - 1, Mp1 - 1
    w = jnp.zeros((B, Np1, Mp1), jnp.float32)
    w = w.at[:, :N, :M].set(gt_assignment.astype(jnp.float32))
    w = w.at[:, :N, -1].set((gt_matches0 == -1).astype(jnp.float32))
    w = w.at[:, -1, :M].set((gt_matches1 == -1).astype(jnp.float32))
    return w


def _weighted_nll(log_assignment: jax.Array, weights: jax.Array,
                  nll_balancing: float):
    """Positive/negative-balanced NLL (reference weight_loss,
    lightglue.py:66)."""
    N, M = log_assignment.shape[-2] - 1, log_assignment.shape[-1] - 1
    loss_sc = log_assignment * weights
    num_neg0 = jnp.maximum(jnp.sum(weights[:, :N, -1], -1), 1.0)
    num_neg1 = jnp.maximum(jnp.sum(weights[:, -1, :M], -1), 1.0)
    num_pos = jnp.maximum(jnp.sum(weights[:, :N, :M], (-1, -2)), 1.0)
    nll_pos = -jnp.sum(loss_sc[:, :N, :M], (-1, -2)) / num_pos
    nll_neg0 = -jnp.sum(loss_sc[:, :N, -1], -1)
    nll_neg1 = -jnp.sum(loss_sc[:, -1, :M], -1)
    nll_neg = (nll_neg0 + nll_neg1) / (num_neg0 + num_neg1)
    nll = nll_balancing * nll_pos + (1.0 - nll_balancing) * nll_neg
    return nll, nll_pos, nll_neg, num_pos, (num_neg0 + num_neg1) / 2.0


def nll_matcher_loss(log_assignment: jax.Array, gt_matches0: jax.Array,
                     gt_matches1: jax.Array, gt_assignment: jax.Array,
                     weight: float = 1.0,
                     nll_balancing: float = 0.5) -> Tuple[jax.Array, Dict]:
    """Single-layer assignment NLL (reference matcher_loss.py NLLLoss)."""
    w = nll_weights_from_gt(log_assignment.shape, gt_matches0, gt_matches1,
                            gt_assignment)
    nll, nll_pos, nll_neg, num_pos, num_neg = _weighted_nll(
        log_assignment, w, nll_balancing)
    loss = jnp.mean(nll) * weight
    return loss, {
        "matcher_n_pair_nll": loss,
        "matcher_nll_positive": jnp.mean(nll_pos),
        "matcher_nll_negtive": jnp.mean(nll_neg),
        "matcher_num_matchable": jnp.mean(num_pos),
        "matcher_num_unmatchable": jnp.mean(num_neg),
    }


def lightglue_loss(pred: Dict, gt: Dict, gamma: float = 1.0,
                   nll_balancing: float = 0.5,
                   training: bool = True) -> Tuple[jax.Array, Dict]:
    """Deep-supervision NLL over all layers + token-confidence loss
    (reference LightGlue.loss, lightglue.py:751-800).

    pred: model outputs with `all_log_assignments` (B, L, N+1, M+1) and
    `confidence_logits0/1` (B, L-1, N|M); gt: matches0/matches1/assignment.
    Layer weights: gamma^(L-1-i) (final layer weight 1), normalized by the
    weight sum; confidence targets are per-layer argmax agreement with the
    final layer.
    """
    all_la = pred["all_log_assignments"]
    B, L = all_la.shape[0], all_la.shape[1]
    final_la = all_la[:, -1]
    weights = nll_weights_from_gt(final_la.shape, gt["matches0"],
                                  gt["matches1"], gt["assignment"])

    nll_final, nll_pos, nll_neg, num_pos, num_neg = _weighted_nll(
        final_la, weights, nll_balancing)
    total = nll_final
    sum_weights = 1.0
    confidence = jnp.zeros((B,), final_la.dtype)

    # final-layer argmax targets for the confidence heads
    fin_max0 = jnp.argmax(final_la[:, :-1, :], axis=-1)
    fin_max1 = jnp.argmax(final_la[:, :, :-1], axis=-2)

    for i in range(L - 1):
        la_i = all_la[:, i]
        nll_i, *_ = _weighted_nll(la_i, weights, nll_balancing)
        w_i = gamma ** (L - i - 1) if gamma > 0.0 else float(i + 1)
        sum_weights += w_i
        total = total + nll_i * w_i

        # token confidence BCE (reference TokenConfidence.loss:190)
        correct0 = (jnp.argmax(la_i[:, :-1, :], axis=-1) == fin_max0)
        correct1 = (jnp.argmax(la_i[:, :, :-1], axis=-2) == fin_max1)
        logit0 = pred["confidence_logits0"][:, i]
        logit1 = pred["confidence_logits1"][:, i]
        bce0 = _bce_with_logits(logit0, correct0[:, :logit0.shape[1]]
                                .astype(logit0.dtype)).mean(-1)
        bce1 = _bce_with_logits(logit1, correct1[:, :logit1.shape[1]]
                                .astype(logit1.dtype)).mean(-1)
        confidence = confidence + (bce0 + bce1) / 2.0 / (L - 1)

    total = total / sum_weights
    if training:
        total = total + confidence

    row_norm = jnp.mean(
        jnp.sum(jnp.exp(final_la)[:, :-1], axis=2), axis=1)
    loss = jnp.mean(total)
    return loss, {
        "matcher_total": loss,
        "matcher_last": jnp.mean(nll_final),
        "matcher_nll_positive": jnp.mean(nll_pos),
        "matcher_nll_negtive": jnp.mean(nll_neg),
        "matcher_num_matchable": jnp.mean(num_pos),
        "matcher_num_unmatchable": jnp.mean(num_neg),
        "matcher_confidence": jnp.mean(confidence),
        "matcher_row_norm": jnp.mean(row_norm),
    }


def _bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
