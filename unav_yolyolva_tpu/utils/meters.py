"""Running-average meter (train_utils.py:197-225)."""

from __future__ import annotations


class AverageMeter:
    def __init__(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0.0
        self.initialized = False

    def update(self, val: float, n: int = 1):
        if not self.initialized:
            self.val = val
            self.avg = val
            self.sum = val * n
            self.count = n
            self.initialized = True
        else:
            self.val = val
            self.sum += val * n
            self.count += n
            self.avg = self.sum / self.count
