"""Loss + metric math (reference classifier/trainer.py:270-308,
train.py:51: MONAI FocalLoss(γ=1, α=0.5) and hand-computed macro P/R/F1/Fβ)."""

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
               gamma: float = 1.0, alpha: float = 0.5) -> jnp.ndarray:
    """Multi-class focal loss FL = α·(1-p_t)^γ · CE, mean over batch."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    labels = labels.astype(jnp.int32)
    ll = jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    pt = jnp.exp(ll)
    return jnp.mean(-alpha * (1.0 - pt) ** gamma * ll)


def classification_metrics(preds: np.ndarray, labels: np.ndarray,
                           num_classes: int, beta: float = 2.0
                           ) -> Dict[str, np.ndarray]:
    """Per-class + macro precision/recall/F1/Fβ (trainer.py:270-308)."""
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    precision = np.zeros(num_classes)
    recall = np.zeros(num_classes)
    f1 = np.zeros(num_classes)
    fbeta = np.zeros(num_classes)
    for c in range(num_classes):
        tp = np.sum((preds == c) & (labels == c))
        fp = np.sum((preds == c) & (labels != c))
        fn = np.sum((preds != c) & (labels == c))
        p = tp / (tp + fp) if (tp + fp) else 0.0
        r = tp / (tp + fn) if (tp + fn) else 0.0
        precision[c], recall[c] = p, r
        f1[c] = 2 * p * r / (p + r) if (p + r) else 0.0
        b2 = beta * beta
        fbeta[c] = ((1 + b2) * p * r / (b2 * p + r)) if (b2 * p + r) else 0.0
    return {
        "precision": precision, "recall": recall, "f1": f1, "fbeta": fbeta,
        "macro_precision": precision.mean(), "macro_recall": recall.mean(),
        "macro_f1": f1.mean(), "macro_fbeta": fbeta.mean(),
        "accuracy": float(np.mean(preds == labels)) if len(labels) else 0.0,
    }


def make_optimizer(lr: float = 5e-4, epochs: int = 100,
                   steps_per_epoch: int = 100,
                   weight_decay: float = 1e-4) -> optax.GradientTransformation:
    """AdamW + cosine annealing (reference train.py:41-42)."""
    schedule = optax.cosine_decay_schedule(lr, epochs * steps_per_epoch)
    return optax.adamw(schedule, weight_decay=weight_decay)
