"""Training-schedule utilities — the reference's extension hooks (SURVEY
§2.9): adversarial-weight warmup and early stopping, re-expressed without
torch.

  * ``WarmupWeight`` (/root/reference/weight_scheduler.py:6-35): scales the
    adversarial loss weight over warmup iterations — linear, exponential
    (``(e^(x*a)-1)/(e^a-1)``) or constant style; after ``warmup_iter`` the
    full ``start_lr`` applies.
  * ``EarlyStopping`` (/root/reference/pytorchtools.py:8-60): patience
    counter on validation loss with a min-delta; the reference saves a
    torch checkpoint on improvement — here the hook takes an arbitrary
    ``save_fn`` (e.g. ``state.model.save_weights``), keeping the control
    logic exact and the sink pluggable.

Both are pure driver-side control flow: in a Ray training loop they run
between epochs (each epoch itself a Dataset pass, see
pipelines/neural.neural_epoch_loss) — nothing here ships to workers.
"""

from __future__ import annotations

import math
from typing import Callable


def _exp_warmup(x: float, alpha: float) -> float:
    """weight_scheduler.f: (e^(x*alpha) - 1) / (e^alpha - 1)."""
    return (math.exp(x * alpha) - 1) / (math.exp(1 * alpha) - 1)


class WarmupWeight:
    """Reference-exact warmup schedule (weight_scheduler.py:6-35)."""

    WARMUP_STYLES = ["linear", "exponential", "constant"]

    def __init__(
        self,
        start_lr: float,
        warmup_iter: int,
        num_iters: int,
        warmup_style: str | None = None,
        last_iter: int = -1,
        alpha: float = 1.0,
    ):
        self.start_lr = start_lr
        self.warmup_iter = warmup_iter
        self.num_iters = last_iter + 1
        self.end_iter = num_iters
        self.warmup_style = (
            warmup_style.lower() if isinstance(warmup_style, str) else None
        )
        self.alpha = alpha

    def get_lr(self) -> float:
        if self.warmup_iter > 0 and self.num_iters <= self.warmup_iter:
            if self.warmup_style == self.WARMUP_STYLES[0]:
                return float(self.start_lr) * self.num_iters / self.warmup_iter
            if self.warmup_style == self.WARMUP_STYLES[1]:
                return float(self.start_lr) * _exp_warmup(
                    self.num_iters / self.warmup_iter, self.alpha
                )
            return self.start_lr
        return self.start_lr

    def step(self, step_num: int | None = None) -> float:
        if step_num is None:
            step_num = self.num_iters + 1
        self.num_iters = step_num
        return self.get_lr()


class EarlyStopping:
    """Reference-exact patience logic (pytorchtools.py:8-60); ``save_fn``
    replaces the torch checkpoint write (e.g. ``lambda:
    save_weights(path, w)``)."""

    def __init__(
        self,
        patience: int = 7,
        verbose: bool = False,
        delta: float = 0.0,
        save_fn: Callable[[], None] | None = None,
        trace_func: Callable[[str], None] = print,
    ):
        self.patience = patience
        self.verbose = verbose
        self.counter = 0
        self.best_score: float | None = None
        self.early_stop = False
        self.val_loss_min = math.inf
        self.delta = delta
        self.save_fn = save_fn
        self.trace_func = trace_func

    def __call__(self, val_loss: float) -> None:
        score = -val_loss
        if self.best_score is None:
            self.best_score = score
            self._save(val_loss)
        elif score < self.best_score + self.delta:
            self.counter += 1
            self.trace_func(
                f"EarlyStopping counter: {self.counter} out of {self.patience}"
            )
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = score
            self._save(val_loss)
            self.counter = 0

    def _save(self, val_loss: float) -> None:
        if self.verbose:
            self.trace_func(
                f"Validation loss decreased ({self.val_loss_min:.6f} --> "
                f"{val_loss:.6f}).  Saving model ..."
            )
        if self.save_fn is not None:
            self.save_fn()
        self.val_loss_min = val_loss
