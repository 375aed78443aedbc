"""Metric logging (reference util/misc.py SmoothedValue :34-93 and
MetricLogger :166-253): windowed median/avg meters, ETA, step timing.

Cross-rank syncing uses jax process_allgather when multiple processes exist
(replacing the reference's torch.distributed all_reduce of count/total).
"""

from __future__ import annotations

import collections
import datetime
import time
from typing import Dict, Iterable, Optional

import numpy as np


class SmoothedValue:
    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        arr = multihost_utils.process_allgather(np.array([self.count, self.total]))
        self.count = int(arr[:, 0].sum())
        self.total = float(arr[:, 1].sum())

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, value=self.value)


class MetricLogger:
    def __init__(self, delimiter: str = "  ", print_fn=print):
        self.meters: Dict[str, SmoothedValue] = collections.defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print = print_fn

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def synchronize_between_processes(self):
        # sorted keys: every process must issue the collectives in the same
        # order (reference reduce_dict sorts keys, util/misc.py:155)
        for k in sorted(self.meters):
            self.meters[k].synchronize_between_processes()

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int, header: str = "",
                  total: Optional[int] = None):
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                if total:
                    eta = datetime.timedelta(seconds=int(iter_time.global_avg * (total - i)))
                    self.print(f"{header} [{i}/{total}] eta: {eta} {self} "
                               f"time: {iter_time} data: {data_time}")
                else:
                    self.print(f"{header} [{i}] {self} time: {iter_time} data: {data_time}")
            i += 1
            end = time.time()
        elapsed = str(datetime.timedelta(seconds=int(time.time() - start)))
        self.print(f"{header} Total time: {elapsed}")
