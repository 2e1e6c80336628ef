"""Streaming statistics over datasets, with npz caching.

TPU-native re-implementation of the reference's ``util/runningstats.py``
(reference lines: tally 54-121, Mean 234-293, Variance 306-384,
Covariance 386-467, SecondMoment 469-511, CombinedStat 1347-1384,
nan-boxed npz persistence 1409-1512, FixedRandomSubsetSampler 1543-1572).

Differences from the reference, by design:

* Accumulation runs as jit-compiled JAX ops (``SecondMoment.add`` is a single
  fused ``a.T @ a`` accumulate on the accelerator) instead of torch in-place
  math; state is held as ``jax.Array`` and materialized to numpy only for
  persistence.
* The ``.npz`` *state schema is identical* — same keys (``count``, ``mom2``,
  ``mean``, ``cmom2``, ``data_shape``, ``constructor``, prefix-dotted keys for
  ``CombinedStat``, ``sample_size`` check arg) and the same NaN-boxed-null
  encoding — so covariance caches produced by the reference load here
  unchanged, and vice versa.
* The loader protocol is plain python iterables; no torch DataLoader.
"""

from __future__ import annotations

import os
import random
import struct
from contextlib import nullcontext as _nullcontext
from typing import Any, Dict, Iterable, Iterator, Optional, Sequence

import numpy as np

try:  # accumulate on accelerator when jax is available; fall back to numpy
    import jax
    import jax.numpy as jnp

    _HAVE_JAX = True
except Exception:  # pragma: no cover
    _HAVE_JAX = False


def _to_np(x) -> np.ndarray:
    return np.asarray(x)


def _normalize_add_shape(data_shape, a):
    """Flatten input to 2D (N, features): reference runningstats.py:168-186.

    Returns (data_shape, a2d).  ``data_shape`` remembers the trailing feature
    shape so results can be restored.
    """
    a = jnp.asarray(a) if _HAVE_JAX else np.asarray(a)
    if a.ndim == 1:
        a = a[:, None]
    elif a.ndim != 2:
        if data_shape is None:
            data_shape = tuple(a.shape[1:])
        a = a.reshape(a.shape[0], -1)
    return data_shape, a


def _restore_result_shape(data_shape, a):
    if data_shape is None or a is None:
        return a
    return a.reshape(a.shape[:-1] + tuple(data_shape))



def _load_data_shape(ds):
    """None / NaN-boxed-null / array → tuple or None (robust to raw npz
    loads that skipped unbox_numpy_null)."""
    if ds is None:
        return None
    arr = np.atleast_1d(np.asarray(ds))
    if arr.dtype.kind == "f" and np.isnan(arr).any():
        return None
    return tuple(int(d) for d in arr)


class Stat:
    """Abstract streaming statistic (reference runningstats.py:144-231)."""

    def __init__(self, state=None):
        if state is not None:
            self.load_state_dict(resolve_state_dict(state))

    def add(self, a):
        raise NotImplementedError

    def state_dict(self) -> Dict[str, Any]:
        raise NotImplementedError

    def load_state_dict(self, state: Dict[str, Any]):
        raise NotImplementedError

    def to_(self, device=None):
        """Materialize accumulator state to host numpy ("cpu") or leave on
        device.  Kept for API parity; JAX manages placement itself."""
        pass

    def save(self, filename):
        save_cached_state(filename, self, {})

    def load(self, filename):
        self.load_state_dict(resolve_state_dict(filename))

    def _constructor_name(self) -> str:
        # Written as the reference module path so reference-side loads
        # recognize the cache (the reference never actually imports it).
        return f"util.runningstats.{self.__class__.__name__}()"


class Mean(Stat):
    """Chan-stable running mean (reference runningstats.py:234-293)."""

    def __init__(self, state=None):
        self.count = 0
        self.batchcount = 0
        self._mean = None
        self.data_shape = None
        super().__init__(state)

    def add(self, a):
        self.data_shape, a = _normalize_add_shape(self.data_shape, a)
        if a.shape[0] == 0:
            return
        batch_count = a.shape[0]
        batch_mean = a.sum(0) / batch_count
        self.batchcount += 1
        if self._mean is None:
            self.count = batch_count
            self._mean = batch_mean
            return
        self.count += batch_count
        frac = float(batch_count) / self.count
        self._mean = self._mean + (batch_mean - self._mean) * frac

    def size(self):
        return self.count

    def mean(self):
        return _restore_result_shape(self.data_shape, self._mean)

    def to_(self, device=None):
        if self._mean is not None:
            self._mean = _to_np(self._mean)

    def state_dict(self):
        return dict(
            constructor=self._constructor_name(),
            count=self.count,
            data_shape=self.data_shape and tuple(self.data_shape),
            batchcount=self.batchcount,
            mean=_to_np(self._mean),
        )

    def load_state_dict(self, state):
        self.count = int(state["count"])
        self.batchcount = int(state["batchcount"])
        self._mean = np.asarray(state["mean"])
        self.data_shape = _load_data_shape(state.get("data_shape"))


class NormMean(Mean):
    """Running mean of vector L2 norms (reference runningstats.py:294-303)."""

    def add(self, a):
        a = jnp.asarray(a) if _HAVE_JAX else np.asarray(a)
        norms = (jnp if _HAVE_JAX else np).linalg.norm(a, axis=-1)
        super().add(norms)


class Variance(Stat):
    """Chan-stable running mean + variance (reference runningstats.py:306-384)."""

    def __init__(self, state=None):
        self.count = 0
        self.batchcount = 0
        self._mean = None
        self.v_cmom2 = None
        self.data_shape = None
        super().__init__(state)

    def add(self, a):
        self.data_shape, a = _normalize_add_shape(self.data_shape, a)
        if a.shape[0] == 0:
            return
        batch_count = a.shape[0]
        batch_mean = a.sum(0) / batch_count
        centered = a - batch_mean
        batch_cmom2 = (centered * centered).sum(0)
        self.batchcount += 1
        if self._mean is None:
            self.count = batch_count
            self._mean = batch_mean
            self.v_cmom2 = batch_cmom2
            return
        old_count = self.count
        self.count += batch_count
        frac = float(batch_count) / self.count
        delta = batch_mean - self._mean
        self._mean = self._mean + delta * frac
        # Chan parallel update of the centered second moment.
        self.v_cmom2 = (
            self.v_cmom2
            + batch_cmom2
            + delta * delta * (frac * old_count)
        )

    def size(self):
        return self.count

    def mean(self):
        return _restore_result_shape(self.data_shape, self._mean)

    def variance(self, unbiased=True):
        return _restore_result_shape(
            self.data_shape, self.v_cmom2 / (self.count - (1 if unbiased else 0))
        )

    def stdev(self, unbiased=True):
        xp = jnp if _HAVE_JAX else np
        return xp.sqrt(self.variance(unbiased=unbiased))

    def to_(self, device=None):
        if self._mean is not None:
            self._mean = _to_np(self._mean)
            self.v_cmom2 = _to_np(self.v_cmom2)

    def state_dict(self):
        return dict(
            constructor=self._constructor_name(),
            count=self.count,
            data_shape=self.data_shape and tuple(self.data_shape),
            batchcount=self.batchcount,
            mean=_to_np(self._mean),
            cmom2=_to_np(self.v_cmom2),
        )

    def load_state_dict(self, state):
        self.count = int(state["count"])
        self.batchcount = int(state["batchcount"])
        self._mean = np.asarray(state["mean"])
        self.v_cmom2 = np.asarray(state["cmom2"])
        self.data_shape = _load_data_shape(state.get("data_shape"))


class Covariance(Stat):
    """Chan-stable running mean + full covariance (reference runningstats.py:386-467)."""

    def __init__(self, state=None):
        self.count = 0
        self._mean = None
        self.cmom2 = None
        self.data_shape = None
        super().__init__(state)

    def add(self, a):
        self.data_shape, a = _normalize_add_shape(self.data_shape, a)
        if a.shape[0] == 0:
            return
        # full-f32 matmul precision on TPU (see _mom2_accumulate); no-op
        # for numpy inputs and on CPU backends
        with (jax.default_matmul_precision("highest") if _HAVE_JAX
              else _nullcontext()):
            batch_count = a.shape[0]
            if self._mean is None:
                self.count = batch_count
                self._mean = a.sum(0) / batch_count
                centered = a - self._mean
                self.cmom2 = centered.T @ centered
                return
            self.count += batch_count
            delta = a - self._mean
            self._mean = self._mean + delta.sum(0) / self.count
            delta2 = a - self._mean
            self.cmom2 = self.cmom2 + delta.T @ delta2

    def mean(self):
        return _restore_result_shape(self.data_shape, self._mean)

    def covariance(self, unbiased=True):
        return self.cmom2 / (self.count - (1 if unbiased else 0))

    def correlation(self, unbiased=True):
        xp = jnp if _HAVE_JAX else np
        cov = self.covariance(unbiased=unbiased)
        rstdev = 1.0 / xp.sqrt(xp.diagonal(cov))
        return rstdev[:, None] * cov * rstdev[None, :]

    def variance(self, unbiased=True):
        xp = jnp if _HAVE_JAX else np
        return _restore_result_shape(
            self.data_shape,
            xp.diagonal(self.cmom2) / (self.count - (1 if unbiased else 0)),
        )

    def stdev(self, unbiased=True):
        xp = jnp if _HAVE_JAX else np
        return xp.sqrt(self.variance(unbiased=unbiased))

    def to_(self, device=None):
        if self._mean is not None:
            self._mean = _to_np(self._mean)
            self.cmom2 = _to_np(self.cmom2)

    def state_dict(self):
        return dict(
            constructor=self._constructor_name(),
            count=self.count,
            data_shape=self.data_shape and tuple(self.data_shape),
            mean=_to_np(self._mean),
            cmom2=_to_np(self.cmom2),
        )

    def load_state_dict(self, state):
        self.count = int(state["count"])
        self._mean = np.asarray(state["mean"])
        self.cmom2 = np.asarray(state["cmom2"])
        self.data_shape = _load_data_shape(state.get("data_shape"))


if _HAVE_JAX:

    @jax.jit
    def _mom2_accumulate(mom2, a):
        """One fused MXU accumulate: mom2 + a^T a in float32.

        Precision pin: the TPU MXU's DEFAULT handling of f32 matmul inputs
        is a single bf16-rounded pass (~0.4% relative) — measured on-chip
        as a systematic bias in exactly this sum-of-products shape (PERF.md
        round 4, prof_gn2); CPU runs are exact either way.  The statistic
        feeds the closed-form solve, so it gets full f32 fidelity."""
        with jax.default_matmul_precision("highest"):
            a32 = a.astype(jnp.float32)
            return mom2 + jnp.dot(a32.T, a32,
                                  preferred_element_type=jnp.float32)


class SecondMoment(Stat):
    """Running non-centered second moment E-proportional ``sum a^T a``
    (reference runningstats.py:469-511).  This is the statistic behind the
    covariance cache ``C`` used by the closed-form solve.

    The accumulate is a single jit'd f32 matmul on the accelerator; the
    ``.npz`` state (keys ``count``, ``mom2``) is identical to the reference's.
    """

    def __init__(self, split_batch=True, state=None):
        self.count = 0
        self.mom2 = None
        self.split_batch = split_batch
        self.data_shape = None
        super().__init__(state)

    def add(self, a, n_valid=None):
        """Accumulate ``a^T a``.  ``n_valid`` overrides the observation count
        for batches padded with all-zero rows (zero rows contribute nothing
        to the moment, so only the count needs masking — this keeps shapes
        static for jit/sharding instead of gathering real rows on host)."""
        self.data_shape, a = _normalize_add_shape(self.data_shape, a)
        if a.shape[0] == 0:
            return
        if self.count == 0:
            xp = jnp if _HAVE_JAX else np
            self.mom2 = xp.zeros((a.shape[1], a.shape[1]), dtype=xp.float32)
        self.count += int(n_valid) if n_valid is not None else a.shape[0]
        if _HAVE_JAX:
            self.mom2 = _mom2_accumulate(self.mom2, a)
        else:
            a32 = a.astype(np.float32)
            self.mom2 = self.mom2 + a32.T @ a32

    def moment(self):
        return self.mom2 / self.count

    def to_(self, device=None):
        if self.mom2 is not None:
            self.mom2 = _to_np(self.mom2)

    def state_dict(self):
        return dict(
            constructor=self._constructor_name(),
            count=self.count,
            mom2=_to_np(self.mom2),
        )

    def load_state_dict(self, state):
        self.count = int(state["count"])
        self.mom2 = np.asarray(state["mom2"])


class CombinedStat(Stat):
    """Bundle of named stats sharing one add/save (reference runningstats.py:1347-1384)."""

    def __init__(self, state=None, **kwargs):
        self._objs = kwargs
        super().__init__(state)

    def __getattr__(self, k):
        objs = self.__dict__.get("_objs", {})
        if k in objs:
            return objs[k]
        raise AttributeError(k)

    def add(self, d, *args, **kwargs):
        for obj in self._objs.values():
            obj.add(d, *args, **kwargs)

    def load_state_dict(self, state):
        for prefix, obj in self._objs.items():
            obj.load_state_dict(pull_key_prefix(prefix, state))

    def state_dict(self):
        result = {}
        for prefix, obj in self._objs.items():
            result.update(push_key_prefix(prefix, obj.state_dict()))
        return result

    def to_(self, device=None):
        for v in self._objs.values():
            v.to_(device)


def push_key_prefix(prefix: str, d: Dict[str, Any]) -> Dict[str, Any]:
    return {prefix + "." + k: v for k, v in d.items()}


def pull_key_prefix(prefix: str, d: Dict[str, Any]) -> Dict[str, Any]:
    pd = prefix + "."
    return {k[len(pd):]: v for k, v in d.items() if k.startswith(pd)}


# --- NaN-boxed null npz persistence (reference runningstats.py:1409-1454) ---
# None is encoded as the IEEE-754 NaN bit pattern 0xfff8000000000002 so npz
# files never need allow_pickle.

null_numpy_value = np.array(
    struct.unpack(">d", struct.pack(">Q", 0xFFF8000000000002))[0], dtype=np.float64
)


def is_null_numpy_value(v) -> bool:
    return (
        isinstance(v, np.ndarray)
        and np.ndim(v) == 0
        and v.dtype == np.float64
        and np.isnan(v)
        and 0xFFF8000000000002 == struct.unpack(">Q", struct.pack(">d", v))[0]
    )


def box_numpy_null(d):
    try:
        return {k: box_numpy_null(v) for k, v in d.items()}
    except Exception:
        return null_numpy_value if d is None else d


def unbox_numpy_null(d):
    try:
        return {k: unbox_numpy_null(v) for k, v in d.items()}
    except Exception:
        return None if is_null_numpy_value(d) else d


def resolve_state_dict(s):
    if isinstance(s, (str, os.PathLike)):
        return unbox_numpy_null(dict(np.load(s)))
    return s


_global_load_cache_enabled = True


class cache_load_enabled:
    """Context manager: ``with cache_load_enabled(False):`` forces recompute
    (reference runningstats.py:123-141)."""

    def __init__(self, enabled=True):
        self.enabled = enabled
        self.prev = True

    def __enter__(self):
        global _global_load_cache_enabled
        self.prev = _global_load_cache_enabled
        _global_load_cache_enabled = self.enabled
        return self

    def __exit__(self, *exc):
        global _global_load_cache_enabled
        _global_load_cache_enabled = self.prev


def load_cached_state(cachefile, args: Dict[str, Any], quiet=False, throw=False):
    """Load an npz state if present and its check-args match
    (reference runningstats.py:1515-1540)."""
    if not _global_load_cache_enabled or cachefile is None:
        return None
    try:
        if isinstance(cachefile, dict):
            dat = cachefile
            cachefile = "state"
        else:
            dat = unbox_numpy_null(dict(np.load(cachefile)))
        for a, v in args.items():
            if a not in dat or dat[a] != v:
                if not quiet:
                    print(f"{cachefile} {a} changed from {dat.get(a)} to {v}")
                return None
    except (FileNotFoundError, ValueError) as e:
        if throw:
            raise e
        return None
    if not quiet:
        print(f"Loading cached {cachefile}")
    return dat


def save_cached_state(cachefile, obj, args: Dict[str, Any]):
    if cachefile is None:
        return
    dat = obj.state_dict()
    for a, v in args.items():
        if a in dat:
            assert dat[a] == v
        dat[a] = v
    if isinstance(cachefile, dict):
        cachefile.clear()
        cachefile.update(dat)
    else:
        dirname = os.path.dirname(str(cachefile))
        if dirname:
            os.makedirs(dirname, exist_ok=True)
        np.savez(cachefile, **box_numpy_null(dat))


class FixedRandomSubsetSampler:
    """Deterministic pseudorandom subset of dataset indices
    (reference runningstats.py:1543-1600): shuffle range(len) with a fixed
    seed, take the first ``sample_size``."""

    def __init__(self, data_source_len: int, sample_size: Optional[int] = None,
                 seed: int = 1):
        indices = list(range(data_source_len))
        rng = random.Random(seed)
        rng.shuffle(indices)
        if sample_size is not None:
            indices = indices[:sample_size]
        self.indices = indices

    def __iter__(self) -> Iterator[int]:
        return iter(self.indices)

    def __len__(self) -> int:
        return len(self.indices)


def make_loader(dataset, sample_size=None, random_sample=None, batch_size=1,
                collate_fn=None, **_ignored) -> Iterable:
    """Minimal loader: dataset (sequence or callable returning one) →
    iterator of collated batches.  Mirrors reference runningstats.py:1574-1603
    without torch DataLoader; ``random_sample`` is the fixed shuffle seed."""
    if callable(dataset) and not hasattr(dataset, "__getitem__"):
        dataset = dataset()
    n = len(dataset)
    if random_sample is not None:
        sampler = FixedRandomSubsetSampler(n, sample_size, seed=random_sample)
        indices = sampler.indices
    else:
        indices = list(range(n if sample_size is None else min(n, sample_size)))

    def batches():
        buf = []
        for i in indices:
            buf.append(dataset[i])
            if len(buf) == batch_size:
                yield collate_fn(buf) if collate_fn else _default_collate(buf)
                buf.clear()
        if buf:
            yield collate_fn(buf) if collate_fn else _default_collate(buf)

    return batches()


def _default_collate(items: Sequence):
    first = items[0]
    if isinstance(first, dict):
        return {k: _default_collate([it[k] for it in items]) for k in first}
    if isinstance(first, (list, tuple)):
        return type(first)(_default_collate(list(col)) for col in zip(*items))
    arrs = [np.asarray(it) for it in items]
    return np.stack(arrs)


def tally(stat: Stat, dataset, cache=None, quiet=False, **kwargs):
    """Stream a dataset through a Stat with npz caching
    (reference runningstats.py:54-121).

    Returns an iterable of batches; iterate it fully and the stat is brought
    to host + saved.  If the cache loads, the stat is filled and the iterable
    is empty.
    """
    assert isinstance(stat, Stat)
    args = {k: kwargs[k] for k in ("sample_size",) if k in kwargs}
    cached_state = load_cached_state(cache, args, quiet=quiet)
    if cached_state is not None:
        stat.load_state_dict(cached_state)

        def empty_loader():
            return
            yield

        return empty_loader()

    loader = make_loader(dataset, **kwargs)

    def wrapped_loader():
        yield from loader
        stat.to_("cpu")
        if cache is not None:
            save_cached_state(cache, stat, args)

    return wrapped_loader()
