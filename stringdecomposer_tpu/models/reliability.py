"""Reliability classification of monomer assignments (K3).

A pretrained 3-coefficient logistic regression on
[1, identity, identity - second_best_identity] flags low-confidence blocks
with '?' (reference: main.py:22-26, 95-104 + models/ont_logreg_model.txt).
The decision is sign(X @ coef) > 0; the coefficient file is reused verbatim.

Also provides a from-scratch trainer (optax logistic regression) so users can
refit the model for new basecallers/chemistries — the reference ships only
frozen coefficients.
"""

from __future__ import annotations

import os

import numpy as np

_MODEL_FILE = os.path.join(os.path.dirname(__file__), "ont_logreg_model.txt")


def load_coefficients(path: str | None = None) -> np.ndarray:
    with open(path or _MODEL_FILE) as f:
        return np.array([float(x) for x in f.readline().split()], dtype=np.float64)


def classify(
    scores: np.ndarray, second_best_scores: np.ndarray, coef: np.ndarray | None = None
) -> np.ndarray:
    """Returns a bool array: True = reliable ('+'), False = '?'.

    Mirrors main.py:95-104: X = [1, idnt, idnt - second], flag '?' unless
    X @ coef > 0. In light mode second_best_scores is -1 everywhere, so the
    difference feature becomes idnt + 1 — same quirk as the reference.
    """
    if coef is None:
        coef = load_coefficients()
    idnt = np.asarray(scores, dtype=np.float64)
    diff = idnt - np.asarray(second_best_scores, dtype=np.float64)
    return (coef[0] + idnt * coef[1] + diff * coef[2]) > 0


def train_logreg(
    features: np.ndarray,  # [N, 2]: identity, identity-diff
    labels: np.ndarray,  # [N] {0, 1}
    steps: int = 2000,
    lr: float = 0.05,
    seed: int = 0,
) -> np.ndarray:
    """Fit new [intercept, w_idnt, w_diff] coefficients with optax/JAX."""
    import jax
    import jax.numpy as jnp
    import optax

    X = jnp.concatenate(
        [jnp.ones((features.shape[0], 1)), jnp.asarray(features, jnp.float32)], axis=1
    )
    y = jnp.asarray(labels, jnp.float32)
    w = jnp.zeros(3, jnp.float32)
    opt = optax.adam(lr)
    state = opt.init(w)

    @jax.jit
    def step(w, state):
        def loss(w):
            logits = X @ w
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))

        g = jax.grad(loss)(w)
        updates, state = opt.update(g, state)
        return optax.apply_updates(w, updates), state

    for _ in range(steps):
        w, state = step(w, state)
    return np.asarray(w, dtype=np.float64)


def save_coefficients(coef: np.ndarray, path: str) -> None:
    with open(path, "w") as f:
        f.write(" ".join(f"{c:.8f}" for c in coef) + "\n")


def main(argv=None) -> int:
    """Refit the reliability model from labeled blocks.

    Usage:
        python -m stringdecomposer_tpu.models.reliability data.tsv out.txt

    data.tsv rows: identity <TAB> second_best_identity <TAB> label
    (label: '+'/'1' reliable, '?'/'0' unreliable — the final-TSV columns 5,
    7 and 12 of a curated run produce this directly).
    """
    import sys

    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print(main.__doc__)
        return 2
    feats, labels = [], []
    with open(argv[0]) as f:
        for ln in f:
            if not ln.strip():
                continue
            idnt, second, label = ln.rstrip("\n").split("\t")[:3]
            idnt, second = float(idnt), float(second)
            feats.append([idnt, idnt - second])
            labels.append(1.0 if label in ("+", "1") else 0.0)
    import numpy as _np

    coef = train_logreg(_np.asarray(feats), _np.asarray(labels))
    save_coefficients(coef, argv[1])
    acc = (classify(_np.asarray(feats)[:, 0],
                    _np.asarray(feats)[:, 0] - _np.asarray(feats)[:, 1],
                    coef) == (_np.asarray(labels) > 0.5)).mean()
    print(f"saved {argv[1]}; train accuracy {acc:.3f}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
