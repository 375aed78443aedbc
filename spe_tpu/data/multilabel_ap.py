"""Multilabel average precision meter (reference cams_deit.py:493-574
AveragePrecisionMeter): per-class AP over image-level multilabel scores,
used to monitor the weak classification heads."""

from __future__ import annotations

import numpy as np


class AveragePrecisionMeter:
    def __init__(self, difficult_examples: bool = False):
        self.difficult_examples = difficult_examples
        self.reset()

    def reset(self):
        self._scores = []
        self._targets = []

    def add(self, scores: np.ndarray, targets: np.ndarray):
        """scores (N, C) real-valued; targets (N, C) in {0, 1} (or -1 for
        difficult when enabled)."""
        self._scores.append(np.asarray(scores, np.float64))
        self._targets.append(np.asarray(targets, np.float64))

    @staticmethod
    def average_precision(scores: np.ndarray, targets: np.ndarray,
                          difficult_examples: bool = False) -> float:
        order = np.argsort(-scores, kind="stable")
        pos, total, precision_sum = 0.0, 0.0, 0.0
        for i in order:
            t = targets[i]
            if difficult_examples and t == -1:
                continue
            total += 1.0
            if t >= 1:
                pos += 1.0
                precision_sum += pos / total
        return precision_sum / max(pos, 1.0)

    def value(self) -> np.ndarray:
        scores = np.concatenate(self._scores, axis=0)
        targets = np.concatenate(self._targets, axis=0)
        C = scores.shape[1]
        ap = np.zeros(C)
        for c in range(C):
            ap[c] = self.average_precision(scores[:, c], targets[:, c],
                                           self.difficult_examples)
        return ap

    def mean(self) -> float:
        return float(self.value().mean())
