"""Additional streaming statistics (reference util/runningstats.py:787-1345:
Quantile, TopK, Bincount, IoU, History).  Only SecondMoment/Mean/NormMean
feed the main editing path (reference layer_stats.py:26-30); these complete
the statistics library surface.  npz state schemas follow the same
conventions as stats.running."""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from emcid_tpu.stats.running import Stat


class Quantile(Stat):
    """Streaming randomized quantile estimation via reservoir subsampling
    (same contract as the reference's sorted-sample sketch,
    runningstats.py:787-1160: ~0.1% accuracy with bounded memory)."""

    def __init__(self, r: int = 3072, state=None, seed: int = 0):
        self.r = r
        self.count = 0
        self.depth: Optional[int] = None
        self._samples: Optional[np.ndarray] = None  # (depth, <=cap)
        self._rng = np.random.RandomState(seed)
        super().__init__(state)

    @property
    def _cap(self) -> int:
        return self.r * 16

    def add(self, a):
        a = np.asarray(a)
        if a.ndim == 1:
            a = a[:, None]
        a = a.reshape(a.shape[0], -1).T  # (depth, n)
        if self.depth is None:
            self.depth = a.shape[0]
            self._samples = np.empty((self.depth, 0), a.dtype)
        n_new = a.shape[1]
        old_count = self.count
        self.count += n_new
        merged = np.concatenate([self._samples, a], axis=1)
        if merged.shape[1] > self._cap:
            # uniform reservoir-style subsample back to cap, weighted by
            # stream position via random choice (unbiased in expectation)
            idx = self._rng.choice(merged.shape[1], self._cap, replace=False)
            merged = merged[:, np.sort(idx)]
        self._samples = merged

    def quantiles(self, q) -> np.ndarray:
        q = np.atleast_1d(np.asarray(q, np.float64))
        out = np.quantile(self._samples, q, axis=1).T  # (depth, len(q))
        return out.squeeze()

    def quantile(self, q):
        return self.quantiles(q)

    def median(self):
        return self.quantiles(0.5)

    def size(self):
        return self.count

    def state_dict(self):
        return dict(
            constructor=self._constructor_name(),
            r=self.r, count=self.count, depth=self.depth,
            samples=np.asarray(self._samples),
        )

    def load_state_dict(self, state):
        self.r = int(state["r"])
        self.count = int(state["count"])
        self.depth = int(state["depth"])
        self._samples = np.asarray(state["samples"])


class TopK(Stat):
    """Running top-k values (+ stream indexes) per feature component
    (reference runningstats.py:1164-1260)."""

    def __init__(self, k: int = 100, largest: bool = True, state=None):
        self.k = k
        self.largest = largest
        self.count = 0
        self._values: Optional[np.ndarray] = None  # (depth, k)
        self._indexes: Optional[np.ndarray] = None
        super().__init__(state)

    def add(self, a, index=None):
        a = np.asarray(a)
        if a.ndim == 1:
            a = a[:, None]
        a = a.reshape(a.shape[0], -1).T  # (depth, n)
        depth, n = a.shape
        idx = (np.arange(self.count, self.count + n) if index is None
               else np.asarray(index))
        idx = np.broadcast_to(idx, (depth, n))
        self.count += n
        if self._values is None:
            self._values = np.empty((depth, 0), a.dtype)
            self._indexes = np.empty((depth, 0), np.int64)
        vals = np.concatenate([self._values, a], axis=1)
        idxs = np.concatenate([self._indexes, idx], axis=1)
        order = np.argsort(-vals if self.largest else vals, axis=1)[:, :self.k]
        self._values = np.take_along_axis(vals, order, axis=1)
        self._indexes = np.take_along_axis(idxs, order, axis=1)

    def result(self):
        return self._values, self._indexes

    def topk(self):
        return self.result()

    def state_dict(self):
        return dict(
            constructor=self._constructor_name(),
            k=self.k, largest=self.largest, count=self.count,
            values=np.asarray(self._values),
            indexes=np.asarray(self._indexes),
        )

    def load_state_dict(self, state):
        self.k = int(state["k"])
        self.largest = bool(state["largest"])
        self.count = int(state["count"])
        self._values = np.asarray(state["values"])
        self._indexes = np.asarray(state["indexes"])


class Bincount(Stat):
    """Running bincount over non-negative integer data
    (reference runningstats.py:514-560)."""

    def __init__(self, state=None):
        self.count = 0
        self._bincount: Optional[np.ndarray] = None
        super().__init__(state)

    def add(self, a, size=None):
        a = np.asarray(a).reshape(-1)
        bc = np.bincount(a)
        if self._bincount is None:
            self._bincount = bc.astype(np.int64)
        elif len(self._bincount) < len(bc):
            bc = bc.astype(np.int64)
            bc[: len(self._bincount)] += self._bincount
            self._bincount = bc
        else:
            self._bincount[: len(bc)] += bc
        self.count += len(a) if size is None else size

    def bincount(self):
        return self._bincount

    def size(self):
        return self.count

    def state_dict(self):
        return dict(constructor=self._constructor_name(), count=self.count,
                    bincount=np.asarray(self._bincount))

    def load_state_dict(self, state):
        self.count = int(state["count"])
        self._bincount = np.asarray(state["bincount"])


class History(Stat):
    """Concatenated history of added batches (reference runningstats.py:1278-1345)."""

    def __init__(self, state=None):
        self._data = []
        super().__init__(state)

    def add(self, a):
        self._data.append(np.asarray(a))

    def history(self):
        return np.concatenate(self._data) if self._data else np.empty((0,))

    def state_dict(self):
        return dict(constructor=self._constructor_name(),
                    data=self.history())

    def load_state_dict(self, state):
        self._data = [np.asarray(state["data"])]


class IoU(Stat):
    """Running intersection-over-union of boolean feature columns
    (reference runningstats.py:675-720): accumulates ``a^T a`` over 0/1
    batches; iou = intersection / (union + eps)."""

    def __init__(self, state=None):
        self.count = 0
        self._intersection = None
        super().__init__(state)

    def add(self, a):
        a = np.asarray(a)
        assert a.ndim == 2
        a = a.astype(np.float32)
        if self._intersection is None:
            self._intersection = a.T @ a
        else:
            self._intersection += a.T @ a
        self.count += len(a)

    def size(self):
        return self.count

    def intersection(self):
        return self._intersection

    def union(self):
        total = np.diagonal(self._intersection)
        return total[:, None] + total[None, :] - self._intersection

    def iou(self):
        return self.intersection() / (self.union() + 1e-20)

    def state_dict(self):
        return dict(constructor=self._constructor_name(),
                    count=self.count,
                    intersection=np.asarray(self._intersection))

    def load_state_dict(self, state):
        self.count = int(state["count"])
        self._intersection = np.asarray(state["intersection"])
