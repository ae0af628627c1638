"""Loss blocks in pure JAX (contrastive self-supervision, classification).

Behavioral ports of the reference losses:
- ``ConVIRTLoss`` bidirectional NT-Xent with tau/lambda
  (reference blocks/losses/selfsup/ConVIRTLoss.py:5-40),
- ``InfoNCELoss`` symmetric cross-entropy over the similarity matrix
  (reference selfsup/InfoNCELoss.py:5-25),
- ``GLoRIALoss`` global + attention-weighted local contrastive loss
  (reference selfsup/GLoRIALoss.py:14-190) — re-designed with **static shapes**:
  the per-sample variable caption-length python loop becomes a word-mask batched
  einsum, so the whole loss jits to one XLA program,
- ``VICREGLoss`` invariance/variance/covariance (reference selfsup/VICREGLoss.py:6),
- ``LabelSmoothingCrossEntropy``, ``SuperLoss``, ``MixUpLoss``
  (reference mvqa/LabelSmoothingCrossEntropyLoss.py:8-102),
- plus plain ``CrossEntropyLoss``/``BCEWithLogitsLoss`` equivalents (the reference
  re-exports all ``torch.nn`` losses, losses/__init__.py:6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..registry import register

EPS = 1e-8


def cross_entropy(logits, labels, reduction="mean", ignore_index=-100):
    """torch.nn.CrossEntropyLoss semantics incl. ignore_index."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(log_probs, safe_labels[..., None], axis=-1).squeeze(-1)
    nll = jnp.where(valid, nll, 0.0)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def binary_cross_entropy_with_logits(logits, targets, reduction="mean"):
    logits = logits.astype(jnp.float32)
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    return jnp.mean(loss)


@register("loss", "CrossEntropyLoss")
class CrossEntropyLoss:
    def __init__(self, reduction="mean", ignore_index=-100, **kwargs):
        self.reduction = reduction
        self.ignore_index = ignore_index

    def __call__(self, logits, labels, **kwargs):
        return cross_entropy(logits, labels, self.reduction, self.ignore_index)


@register("loss", "BCEWithLogitsLoss")
class BCEWithLogitsLoss:
    def __init__(self, reduction="mean", **kwargs):
        self.reduction = reduction

    def __call__(self, logits, targets, **kwargs):
        return binary_cross_entropy_with_logits(logits, targets, self.reduction)


@register("loss", "LabelSmoothingCrossEntropy")
class LabelSmoothingCrossEntropy:
    """reference mvqa/LabelSmoothingCrossEntropyLoss.py:33-48."""

    def __init__(self, smoothing=0.1, reduction="mean", **kwargs):
        self.smoothing = smoothing
        self.reduction = reduction

    def __call__(self, output, target, **kwargs):
        c = output.shape[-1]
        log_preds = jax.nn.log_softmax(output.astype(jnp.float32), axis=-1)
        if self.reduction == "sum":
            loss = -jnp.sum(log_preds)
        else:
            loss = -jnp.sum(log_preds, axis=-1)
            if self.reduction == "mean":
                loss = jnp.mean(loss)
        nll = cross_entropy(output, target, self.reduction)
        return loss * self.smoothing / c + (1 - self.smoothing) * nll


@register("loss", "SuperLoss")
class SuperLoss:
    """Confidence-aware loss via the Lambert-W closed form
    (reference mvqa/LabelSmoothingCrossEntropyLoss.py:8-30). The Lambert-W is
    evaluated with a few Newton iterations so it stays jittable on device."""

    def __init__(self, C, lam=0.25, **kwargs):
        self.tau = float(jnp.log(jnp.asarray(float(C))))
        self.lam = lam

    @staticmethod
    def _lambertw(y, iters=8):
        # Newton iterations for w e^w = y on the principal branch, y >= -1/e
        w = jnp.where(y > 0, jnp.log1p(y), -0.5 * jnp.ones_like(y))
        for _ in range(iters):
            ew = jnp.exp(w)
            w = w - (w * ew - y) / (ew * (w + 1) + EPS)
        return w

    def __call__(self, l_i, **kwargs):
        l_det = jax.lax.stop_gradient(l_i)
        x = -2.0 / jnp.e
        y = 0.5 * jnp.maximum(x, (l_det - self.tau) / self.lam)
        sigma = jnp.exp(-self._lambertw(y))
        loss = (l_i - self.tau) * sigma + self.lam * jnp.log(sigma) ** 2
        return jnp.mean(loss)


@register("loss", "MixUpLoss")
class MixUpLoss:
    """reference mvqa/LabelSmoothingCrossEntropyLoss.py:84-102."""

    def __init__(self, criterion="CrossEntropyLoss", **kwargs):
        from .. import registry

        self.criterion = registry.get("loss", criterion)(**kwargs)

    def __call__(self, pred, label, label_mixed, lam, **kwargs):
        return lam * self.criterion(pred, label) + (1 - lam) * self.criterion(
            pred, label_mixed
        )


# ---------------------------------------------------------------------------
# Self-supervised contrastive losses
# ---------------------------------------------------------------------------

def _l2_normalize(x, axis=-1):
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), EPS, None)


@register("loss", "ConVIRTLoss")
class ConVIRTLoss:
    """Bidirectional NT-Xent (reference selfsup/ConVIRTLoss.py:5-40)."""

    def __init__(self, tau, lambda_, **kwargs):
        self.tau = tau
        self.lambda_ = lambda_

    def __call__(self, linguistic, visual, **kwargs):
        ln = _l2_normalize(linguistic.astype(jnp.float32))
        vn = _l2_normalize(visual.astype(jnp.float32))
        paired = jnp.sum(ln * vn, axis=-1)  # cos(l_i, v_i)
        nominator = jnp.exp(paired / self.tau)

        pairwise = ln @ vn.T  # (B, B)
        denominator_l = jnp.sum(jnp.exp(pairwise / self.tau), axis=1)
        loss_l = -jnp.log(nominator / denominator_l)

        denominator_v = jnp.sum(jnp.exp(pairwise.T / self.tau), axis=1)
        loss_v = -jnp.log(nominator / denominator_v)

        loss = jnp.mean(self.lambda_ * loss_v + (1 - self.lambda_) * loss_l)
        return loss, loss_l, loss_v


@register("loss", "InfoNCELoss")
class InfoNCELoss:
    """Symmetric InfoNCE (reference selfsup/InfoNCELoss.py:5-25)."""

    def __init__(self, tau=1.0, **kwargs):
        self.tau = tau

    def __call__(self, linguistic, visual, **kwargs):
        n = linguistic.shape[0]
        logits = linguistic.astype(jnp.float32) @ visual.astype(jnp.float32).T
        labels = jnp.arange(n)
        loss_t = cross_entropy(logits, labels, reduction="none")
        loss_i = cross_entropy(logits.T, labels, reduction="none")
        loss = jnp.mean((loss_i + loss_t) / 2)
        return loss, loss_t, loss_i


@register("loss", "VICREGLoss")
class VICREGLoss:
    """reference selfsup/VICREGLoss.py:6-."""

    def __init__(self, sim_loss_weight=25.0, var_loss_weight=25.0,
                 cov_loss_weight=1.0, **kwargs):
        self.sim_loss_weight = sim_loss_weight
        self.var_loss_weight = var_loss_weight
        self.cov_loss_weight = cov_loss_weight

    def __call__(self, z1, z2, **kwargs):
        z1 = z1.astype(jnp.float32)
        z2 = z2.astype(jnp.float32)
        sim = jnp.mean((z1 - z2) ** 2)

        def var_term(z):
            std = jnp.sqrt(jnp.var(z, axis=0) + 1e-4)
            return jnp.mean(jax.nn.relu(1.0 - std))

        var = var_term(z1) + var_term(z2)

        def cov_term(z):
            n, d = z.shape
            zc = z - z.mean(axis=0)
            cov = (zc.T @ zc) / (n - 1)
            off = cov - jnp.diag(jnp.diag(cov))
            return jnp.sum(off ** 2) / d

        cov = cov_term(z1) + cov_term(z2)
        return self.sim_loss_weight * sim + self.var_loss_weight * var + self.cov_loss_weight * cov


def gloria_attention(word, context, temp1, word_mask=None):
    """Static-shape port of ``gloria_attention_fn`` (reference GLoRIALoss.py:14-51).

    word: (B, T, D) queries, context: (B, S, D) image regions.
    Returns weighted context (B, T, D) and attention (B, T, S).

    ``word_mask`` (B, T) excludes padded word slots from the FIRST softmax
    (over words): the reference slices each caption to its true length before
    attending, so padded slots must not appear in that denominator — without
    the mask, region attention for the *valid* words drifts from the
    reference whenever captions are padded.
    """
    attn = jnp.einsum("bsd,btd->bst", context, word)  # (B, S, T)
    if word_mask is not None:
        # large-finite (not -inf) so an all-masked caption degrades to a
        # uniform softmax instead of propagating NaN into the loss; kept
        # lanes still dominate masked ones (exp underflows to exact 0)
        attn = jnp.where(word_mask[:, None, :] > 0, attn, -1e9)
    attn = jax.nn.softmax(attn, axis=-1)  # over words
    attn = jnp.swapaxes(attn, 1, 2)  # (B, T, S)
    attn = jax.nn.softmax(attn * temp1, axis=-1)  # over regions
    weighted = jnp.einsum("bts,bsd->btd", attn, context)
    return weighted, attn


@register("loss", "GLoRIALoss")
class GLoRIALoss:
    """Global + local contrastive loss (reference GLoRIALoss.py:132-190).

    The reference loops over samples with python-level caption lengths; here the
    local loss is fully batched over the (B_text, B_image) grid with a word mask,
    which is mathematically identical and one XLA program.
    """

    def __init__(self, local_loss_weight=1.0, global_loss_weight=1.0,
                 temp1=4.0, temp2=5.0, temp3=10.0, **kwargs):
        self.local_loss_weight = local_loss_weight
        self.global_loss_weight = global_loss_weight
        self.temp1, self.temp2, self.temp3 = temp1, temp2, temp3

    def global_loss(self, cnn_code, rnn_code):
        cn = _l2_normalize(cnn_code.astype(jnp.float32))
        rn = _l2_normalize(rnn_code.astype(jnp.float32))
        scores = cn @ rn.T * self.temp3
        labels = jnp.arange(scores.shape[0])
        return (
            cross_entropy(scores, labels),
            cross_entropy(scores.T, labels),
        )

    def local_loss(self, img_features, words_emb, words_mask):
        """img_features: (B, S, D); words_emb: (B, T, D); words_mask: (B, T)."""
        b = img_features.shape[0]

        def sim_row(word, mask):
            # word (T, D) vs every image in the batch
            word_b = jnp.broadcast_to(word[None], (b,) + word.shape)
            mask_b = jnp.broadcast_to(mask[None], (b,) + mask.shape)
            weighted, _ = gloria_attention(
                word_b, img_features.astype(jnp.float32), self.temp1,
                word_mask=mask_b,
            )
            cos = jnp.sum(
                _l2_normalize(word_b) * _l2_normalize(weighted), axis=-1
            )  # (B, T)
            row = jnp.exp(cos * self.temp2) * mask[None, :]
            return jnp.log(jnp.clip(jnp.sum(row, axis=-1), EPS, None))  # (B,)

        # similarities[i, j] = sim(text_i, image_j)
        sims = jax.vmap(sim_row)(words_emb.astype(jnp.float32), words_mask)
        sims = sims * self.temp3
        labels = jnp.arange(b)
        return cross_entropy(sims, labels), cross_entropy(sims.T, labels)

    def __call__(self, global_features, local_features, word_embeddings,
                 sent_embeddings, words_mask, **kwargs):
        l0, l1 = self.local_loss(local_features, word_embeddings, words_mask)
        g0, g1 = self.global_loss(global_features, sent_embeddings)
        return (l0 + l1) * self.local_loss_weight + (g0 + g1) * self.global_loss_weight
