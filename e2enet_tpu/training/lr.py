"""Learning-rate schedules.

Parity: reference e2enet/training/learning_rate/poly_lr.py (poly_lr) and the
per-epoch update in nnUNetTrainer_simple.maybe_update_lr (:756-771).
"""


def poly_lr(epoch: int, max_epochs: int, initial_lr: float,
            exponent: float = 0.9) -> float:
    return initial_lr * (1 - epoch / max_epochs) ** exponent
