"""Metric-learning losses for ReID training, in pure jnp.

Functional counterparts of the reference loss zoo
(boxmot/reid/training/losses.py:12-271): cross-entropy with label
smoothing, batch-hard triplet, Multi-Similarity, Circle; plus flax-module
heads for ArcFace / CosFace / Center losses (which carry parameters).
All functions take batched arrays and return scalar losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def cross_entropy_label_smooth(logits, targets, epsilon: float = 0.1):
    """CE with label smoothing (losses.py:12-31): mean over batch of the
    smoothed one-hot cross-entropy, summed over classes."""
    num_classes = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(targets, num_classes)
    smooth = (1 - epsilon) * one_hot + epsilon / num_classes
    return jnp.sum(jnp.mean(-smooth * log_probs, axis=0))


def _pairwise_dist(feats):
    sq = jnp.sum(feats**2, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * feats @ feats.T
    return jnp.sqrt(jnp.clip(d2, 1e-12, None))


def triplet_loss(feats, targets, margin: float = 0.3, soft_margin: bool = False):
    """Batch-hard triplet (losses.py:33-74)."""
    dist = _pairwise_dist(feats)
    same = targets[:, None] == targets[None, :]
    dist_ap = jnp.max(jnp.where(same, dist, -jnp.inf), axis=1)
    dist_an = jnp.min(jnp.where(~same, dist, jnp.inf), axis=1)
    # guard degenerate batches (no positive / no negative for an anchor)
    dist_ap = jnp.where(jnp.isfinite(dist_ap), dist_ap, 0.0)
    dist_an = jnp.where(jnp.isfinite(dist_an), dist_an, dist_ap + margin)
    if soft_margin:
        return jnp.mean(jax.nn.softplus(dist_ap - dist_an + margin))
    return jnp.mean(jnp.maximum(0.0, dist_ap - dist_an + margin))


def multi_similarity_loss(
    feats,
    targets,
    alpha: float = 2.0,
    beta: float = 50.0,
    thresh: float = 0.5,
    mining_margin: float = 0.1,
):
    """Multi-Similarity loss (Wang et al., CVPR 2019; losses.py:76-150),
    vectorized with masked mining."""
    f = feats / jnp.clip(jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
    sim = f @ f.T
    n = sim.shape[0]
    eye = jnp.eye(n, dtype=bool)
    pos = (targets[:, None] == targets[None, :]) & ~eye
    neg = targets[:, None] != targets[None, :]

    # pair mining: keep positives below hardest-negative + eps,
    # negatives above hardest-positive - eps
    max_neg = jnp.max(jnp.where(neg, sim, -jnp.inf), axis=1)
    min_pos = jnp.min(jnp.where(pos, sim, jnp.inf), axis=1)
    pos_m = pos & (sim < (max_neg + mining_margin)[:, None])
    neg_m = neg & (sim > (min_pos - mining_margin)[:, None])

    pos_term = jnp.sum(jnp.where(pos_m, jnp.exp(-alpha * (sim - thresh)), 0.0), axis=1)
    neg_term = jnp.sum(jnp.where(neg_m, jnp.exp(beta * (sim - thresh)), 0.0), axis=1)
    loss = jnp.log1p(pos_term) / alpha + jnp.log1p(neg_term) / beta
    any_pair = jnp.any(pos_m, axis=1) | jnp.any(neg_m, axis=1)
    return jnp.sum(jnp.where(any_pair, loss, 0.0)) / jnp.maximum(
        jnp.sum(any_pair), 1
    )


def circle_loss(feats, targets, margin: float = 0.25, gamma: float = 64.0):
    """Circle loss (Sun et al., CVPR 2020; losses.py:152-196)."""
    f = feats / jnp.clip(jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
    sim = f @ f.T
    n = sim.shape[0]
    eye = jnp.eye(n, dtype=bool)
    pos = (targets[:, None] == targets[None, :]) & ~eye
    neg = targets[:, None] != targets[None, :]

    ap = jnp.maximum(0.0, 1 + margin - sim)
    an = jnp.maximum(0.0, sim + margin)
    delta_p = 1 - margin
    delta_n = margin
    logit_p = -gamma * ap * (sim - delta_p)
    logit_n = gamma * an * (sim - delta_n)
    lse_p = jax.nn.logsumexp(jnp.where(pos, logit_p, -jnp.inf), axis=1)
    lse_n = jax.nn.logsumexp(jnp.where(neg, logit_n, -jnp.inf), axis=1)
    valid = jnp.isfinite(lse_p) & jnp.isfinite(lse_n)
    loss = jax.nn.softplus(jnp.where(valid, lse_p + lse_n, 0.0))
    return jnp.sum(jnp.where(valid, loss, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


class ArcFaceHead(nn.Module):
    """Additive-angular-margin classifier head (losses.py:198-228)."""

    num_classes: int
    scale: float = 30.0
    margin: float = 0.5

    @nn.compact
    def __call__(self, feats, targets):
        w = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (feats.shape[-1], self.num_classes),
        )
        f = feats / jnp.clip(jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
        wn = w / jnp.clip(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
        cos = jnp.clip(f @ wn, -1 + 1e-7, 1 - 1e-7)
        theta = jnp.arccos(cos)
        marg = jnp.cos(theta + self.margin)
        one_hot = jax.nn.one_hot(targets, self.num_classes)
        logits = self.scale * (one_hot * marg + (1 - one_hot) * cos)
        return cross_entropy_label_smooth(logits, targets, epsilon=0.0)


class CosFaceHead(nn.Module):
    """Large-margin cosine classifier head (losses.py:230-256)."""

    num_classes: int
    scale: float = 30.0
    margin: float = 0.35

    @nn.compact
    def __call__(self, feats, targets):
        w = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (feats.shape[-1], self.num_classes),
        )
        f = feats / jnp.clip(jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
        wn = w / jnp.clip(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
        cos = f @ wn
        one_hot = jax.nn.one_hot(targets, self.num_classes)
        logits = self.scale * (cos - one_hot * self.margin)
        return cross_entropy_label_smooth(logits, targets, epsilon=0.0)


class CenterHead(nn.Module):
    """Center loss head with learned per-class centers (losses.py:258-271)."""

    num_classes: int
    feat_dim: int

    @nn.compact
    def __call__(self, feats, targets):
        centers = self.param(
            "centers", nn.initializers.normal(1.0), (self.num_classes, self.feat_dim)
        )
        diff = feats - centers[targets]
        return 0.5 * jnp.mean(jnp.sum(diff**2, axis=1))


LOSS_REGISTRY = {
    "ce_smooth": cross_entropy_label_smooth,
    "triplet": triplet_loss,
    "multi_similarity": multi_similarity_loss,
    "circle": circle_loss,
}

HEAD_REGISTRY = {
    "arcface": ArcFaceHead,
    "cosface": CosFaceHead,
    "center": CenterHead,
}
