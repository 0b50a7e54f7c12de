"""Labeled series containers (TSeries / FSeries / TFSeries).

TPU-native redesign of the reference's xarray-backed ``Signal`` hierarchy
(reference: core.py:53-1179). Instead of wrapping ``xarray.DataArray``, these
are light pytree dataclasses over ``jax.numpy`` arrays:

- registered as JAX pytrees, so they flow through jit/vmap/shard_map;
- arithmetic/ufunc/reduction surface mirrors the reference's numpy-protocol
  dispatch (core.py:10-50, 150-264) but maps onto jnp ops;
- all fixed-shape numerics execute through the kernels in
  ``periodicity_tpu.ops`` (peaks, splines, filters) — the same kernels the
  jitted estimator hot paths use;
- methods whose *output shape* depends on data (dropna, split, join,
  fill_gaps, find_peaks index extraction...) are eager conveniences; the
  static-shape equivalents used inside jitted loops live in ops/ with
  capacity+mask idioms.

Behavioral parity notes (kept deliberately):
- constructors sort by coordinate (reference core.py:473-477, tested in the
  reference's tests/test_core.py);
- ``dt``/``df``/``dp`` raise on non-uniform grids (core.py:513-519);
- reductions are nan-aware (core.py:192-264);
- ``max()``/``min()`` return 1-element slices (core.py:217-240); binary ops
  broadcast size-1 operands by value.
"""

import warnings
from numbers import Number

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import filters as _filters
from ..ops import peaks as _peaks
from ..ops import spline as _spline
from ..ops import optimize as _optimize

__all__ = ["Signal", "TSeries", "FSeries", "TFSeries"]


def _uniform_spacing(coord):
    """Median spacing when the grid is uniform up to dtype rounding, else
    None. Constructed-uniform grids (rfftfreq, arange) accumulate up to a
    few ulps of the COORDINATE magnitude in float32, so the tolerance is
    dtype-aware — but capped at a fraction of the spacing itself:
    otherwise a float32 time axis with a large epoch (|t| ~ 2.45e6 gives
    8*eps*|t| ~ 2.3 time units) would classify genuinely irregular
    sampling as uniform and silently return median_dt."""
    c = np.asarray(coord)
    d = np.diff(c)
    md = np.median(d)
    atol = 0.0
    if np.issubdtype(c.dtype, np.floating):
        atol = 8 * np.finfo(c.dtype).eps * float(np.max(np.abs(c)))
        atol = min(atol, 0.25 * float(np.abs(md)))
    if np.allclose(d, md, rtol=1e-5, atol=atol):
        return md
    return None


def _scalar(x):
    """Return 0-d jnp scalars as-is; they behave like python floats."""
    return x


class Signal:
    """Base container: named-coordinate array with numpy-like semantics."""

    _HANDLED_TYPES = (Number, np.ndarray, jnp.ndarray)
    __array_priority__ = 100

    # -- subclass interface -------------------------------------------------
    @property
    def dims(self):
        raise NotImplementedError

    def _coord_arrays(self):
        raise NotImplementedError

    def _replace_data(self, data):
        raise NotImplementedError

    # -- shared surface ------------------------------------------------------
    @property
    def values(self):
        return self._values

    @values.setter
    def values(self, new):
        new = jnp.asarray(new)
        if new.shape != self._values.shape:
            raise ValueError("values assignment must preserve shape")
        self._values = new

    def __len__(self):
        return self._values.shape[0]

    @property
    def size(self):
        return int(np.prod(self._values.shape))

    @property
    def shape(self):
        return self._values.shape

    @property
    def ndim(self):
        return self._values.ndim

    @property
    def dtype(self):
        return self._values.dtype

    @property
    def coords(self):
        """dims -> coordinate arrays (reference core.py:72-74)."""
        return dict(zip(self.dims, self._coord_arrays()))

    @property
    def index(self):
        """Same mapping as :attr:`coords`: every coordinate here is an
        index coordinate (the reference core.py:90-92 filters xarray
        IndexVariables; this library has no non-index coordinates)."""
        return self.coords

    def get_axis(self, dim):
        """Positional axis of the named dimension (reference
        core.py:76-80)."""
        try:
            return self.dims.index(dim)
        except ValueError:
            raise ValueError(f"{dim} not found in {self.dims}.") from None

    def from_xray(self, xray, **kwargs):
        """Build a same-type container from an xarray.DataArray-like
        object — duck-typed on ``.dims``/``.values``/``.coords[d].values``
        so xarray itself is not required (reference core.py:147-148,
        496-502, 904-910). 0-d input degrades to a python scalar;
        extra kwargs (e.g. ``assume_sorted``) forward to the
        constructor."""
        if getattr(xray, "ndim", None) == 0:
            return xray.item()
        src_dims = tuple(xray.dims)
        if set(src_dims) != set(self.dims):
            raise ValueError(
                f"dims {src_dims} do not match {tuple(self.dims)}"
            )
        coords = {d: np.asarray(xray.coords[d].values) for d in src_dims}
        vals = np.asarray(xray.values)
        if src_dims != tuple(self.dims):
            # align the value axes with this container's dim order
            vals = vals.transpose([src_dims.index(d) for d in self.dims])
        new = type(self)(values=vals, **coords, **kwargs)
        new.attrs.update(dict(getattr(xray, "attrs", {}) or {}))
        return new

    def copy(self):
        new = self._replace_data(self._values)
        new.attrs.update(self.attrs)
        return new

    def __repr__(self):
        return (
            f"<{type(self).__name__} {dict(zip(self.dims, self.shape))}>\n"
            f"{np.asarray(self._values)!r}"
        )

    def __array__(self, dtype=None, copy=None):
        arr = np.asarray(self._values)
        return arr.astype(dtype) if dtype is not None else arr

    # -- arithmetic ----------------------------------------------------------
    def _extract(self, other):
        if isinstance(other, Signal):
            return other._values
        return other

    def _binop(self, other, op, reflexive=False):
        if not isinstance(other, self._HANDLED_TYPES + (Signal, list)):
            # let Python fall back (e.g. `ts == "foo"` -> identity False,
            # the reference's NDArrayOperatorsMixin behavior)
            return NotImplemented
        ov = self._extract(other)
        a, b = (ov, self._values) if reflexive else (self._values, ov)
        return self._replace_data(op(a, b))

    def __add__(self, o):
        return self._binop(o, jnp.add)

    def __radd__(self, o):
        return self._binop(o, jnp.add, True)

    def __sub__(self, o):
        return self._binop(o, jnp.subtract)

    def __rsub__(self, o):
        return self._binop(o, jnp.subtract, True)

    def __mul__(self, o):
        return self._binop(o, jnp.multiply)

    def __rmul__(self, o):
        return self._binop(o, jnp.multiply, True)

    def __truediv__(self, o):
        return self._binop(o, jnp.divide)

    def __rtruediv__(self, o):
        return self._binop(o, jnp.divide, True)

    def __floordiv__(self, o):
        return self._binop(o, jnp.floor_divide)

    def __mod__(self, o):
        return self._binop(o, jnp.mod)

    def __pow__(self, o):
        return self._binop(o, jnp.power)

    def __rpow__(self, o):
        return self._binop(o, jnp.power, True)

    def __neg__(self):
        return self._replace_data(-self._values)

    def __pos__(self):
        return self._replace_data(+self._values)

    def __abs__(self):
        return self._replace_data(jnp.abs(self._values))

    def __lt__(self, o):
        return self._binop(o, jnp.less)

    def __le__(self, o):
        return self._binop(o, jnp.less_equal)

    def __gt__(self, o):
        return self._binop(o, jnp.greater)

    def __ge__(self, o):
        return self._binop(o, jnp.greater_equal)

    def __eq__(self, o):  # noqa: intentional value semantics like xarray
        return self._binop(o, jnp.equal)

    def __ne__(self, o):
        return self._binop(o, jnp.not_equal)

    __hash__ = None

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != "__call__" or kwargs.get("out"):
            return NotImplemented
        vals = [x._values if isinstance(x, Signal) else x for x in inputs]
        jf = getattr(jnp, ufunc.__name__, None)
        if jf is None:
            res = ufunc(*[np.asarray(v) for v in vals], **kwargs)
        else:
            res = jf(*vals, **kwargs)
        if jnp.ndim(res) == 0:
            return res
        ref = next(x for x in inputs if isinstance(x, Signal))
        if jnp.shape(res) == ref.shape:
            return ref._replace_data(res)
        return res

    _ARRAY_FUNCS = {}

    def __array_function__(self, func, types, args, kwargs):
        name = getattr(func, "__name__", None)
        impl = Signal._ARRAY_FUNCS.get(name)
        if impl is None:
            return NotImplemented
        return impl(*args, **kwargs)

    # -- reductions (nan-aware like the reference core.py:192-264) -----------
    def all(self, **kw):
        return jnp.all(self._values, **kw)

    def any(self, **kw):
        return jnp.any(self._values, **kw)

    def argmax(self, **kw):
        return jnp.nanargmax(self._values, **kw)

    def argmin(self, **kw):
        return jnp.nanargmin(self._values, **kw)

    def amax(self, **kw):
        return _scalar(jnp.nanmax(self._values, **kw))

    def amin(self, **kw):
        return _scalar(jnp.nanmin(self._values, **kw))

    def mean(self, dim=None, **kw):
        return self._reduce(jnp.nanmean, dim, **kw)

    def median(self, dim=None, **kw):
        return self._reduce(jnp.nanmedian, dim, **kw)

    def sum(self, dim=None, **kw):
        return self._reduce(jnp.nansum, dim, **kw)

    def prod(self, dim=None, **kw):
        return self._reduce(jnp.nanprod, dim, **kw)

    def std(self, dim=None, **kw):
        return self._reduce(jnp.nanstd, dim, **kw)

    def var(self, dim=None, **kw):
        return self._reduce(jnp.nanvar, dim, **kw)

    def _reduce(self, fn, dim=None, **kw):
        if dim is None and "axis" in kw and kw["axis"] is not None:
            # numpy-protocol callers (np.mean(tfs, axis=0)) reduce by axis
            # number; translate to the named dim so the result is wrapped
            # with its surviving coordinate (reference core.py:23-35)
            axis_kw = kw.pop("axis")
            if isinstance(axis_kw, (tuple, list)) and len(axis_kw) == 1:
                axis_kw = axis_kw[0]
            if isinstance(axis_kw, (int, np.integer)):
                dim = self.dims[int(axis_kw) % self.ndim]
            elif isinstance(axis_kw, (tuple, list)) and len(axis_kw) >= self.ndim:
                kw["axis"] = tuple(axis_kw)  # full reduce below
            else:
                # a partial tuple reduction would return a bare array with
                # no coordinate attached — refuse rather than silently
                # dropping the surviving dim's labels
                raise NotImplementedError(
                    f"partial tuple-axis reduction {axis_kw!r} on "
                    f"{type(self).__name__}; reduce one named dim at a time"
                )
        if dim is None:
            return _scalar(fn(self._values, **kw))
        axis = self.dims.index(dim)
        data = fn(self._values, axis=axis, **kw)
        return self._wrap_reduced(axis, data)

    def _wrap_reduced(self, axis, data):
        raise NotImplementedError

    def max(self):
        idx = np.unravel_index(int(self.argmax()), self.shape)
        return self[tuple(slice(i, i + 1) for i in idx)]

    def min(self):
        idx = np.unravel_index(int(self.argmin()), self.shape)
        return self[tuple(slice(i, i + 1) for i in idx)]

    def roll(self, shift):
        return self._replace_data(jnp.roll(self._values, shift))

    def isnull(self):
        if jnp.issubdtype(self.dtype, jnp.inexact):
            return self._replace_data(jnp.isnan(self._values))
        return self._replace_data(jnp.zeros_like(self._values, bool))

    def count(self, axis=None):
        return jnp.sum(~jnp.isnan(self._values), axis=axis)

    # -- peak finding (reference core.py:283-367) ----------------------------
    def find_peaks(self, include_edges=False, prominence=0.0, height=None,
                   **peak_kwargs):
        """Local maxima with prominences; eager (dynamic count extraction).

        Returns a container of the peak samples; ``attrs`` carries
        ``prominences``, ``left_bases``, ``right_bases``, ``indices`` (and
        the scipy property arrays for any criterion given) like the
        reference, which forwards kwargs to scipy.signal.find_peaks
        (core.py:283-317). The on-device kernel implements every scipy
        criterion — ``height``, ``threshold``, ``distance``,
        ``prominence``, ``width`` (with ``wlen``/``rel_height``) and
        ``plateau_size`` — as static scalars or (min, max) pairs;
        per-sample criterion arrays are not supported.
        """
        allowed = {
            "threshold", "distance", "width", "wlen", "rel_height",
            "plateau_size",
        }
        unknown = set(peak_kwargs) - allowed
        if unknown:
            raise TypeError(
                f"find_peaks got unknown criteria {sorted(unknown)}; "
                f"supported: height, prominence, {sorted(allowed)}"
            )
        if self.ndim != 1:
            raise NotImplementedError("'find_peaks' is only implemented for 1D arrays.")

        def _hashable(v):
            return tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v

        kwargs = {k: _hashable(v) for k, v in peak_kwargs.items()}
        idx, cnt, props = _peaks.find_peaks_full(
            self._values, height=_hashable(height),
            prominence=_hashable(prominence) if np.ndim(prominence) or prominence else None,
            **kwargs,
        )
        k = int(cnt)
        res = {key: np.asarray(v[:k]) for key, v in props.items()}
        if "prominences" not in res:
            # peak-ranking surfaces (psort_by_prominence, FSeries FWHM...)
            # always expect prominence metadata, criterion or not; computed
            # at static capacity to keep the kernel cache warm
            proms, lb, rb = _peaks.peak_prominences(self._values, idx)
            res["prominences"] = np.asarray(proms[:k])
            res["left_bases"] = np.asarray(lb[:k])
            res["right_bases"] = np.asarray(rb[:k])
        idx = np.asarray(idx[:k])
        maxima = idx
        if include_edges:
            maxima = np.hstack([0, maxima, -1])
            for key, vals in res.items():
                fillv = np.nan if vals.dtype.kind == "f" else -1
                res[key] = np.hstack([fillv, vals, fillv])
        res["indices"] = maxima
        peaks = self[maxima]
        peaks.attrs.update(res)
        return peaks

    def find_dips(self, include_edges=False, prominence=0.0, **kw):
        if self.ndim != 1:
            raise NotImplementedError("'find_dips' is only implemented for 1D arrays.")
        inner = (-self).find_peaks(include_edges, prominence, **kw)
        dips = -inner
        # arithmetic returns a fresh container; restore the peak metadata
        # the reference propagates through _replace_data (core.py:123-126)
        dips.attrs.update(inner.attrs)
        return dips

    def find_zero_crossings(self, height=None, delta=0.0):
        if self.ndim != 1:
            raise NotImplementedError(
                "'find_zero_crossings' is only implemented for 1D arrays."
            )
        if height is None:
            return np.where(np.asarray(_peaks.zero_crossings_mask(self._values)))[0]
        idx, cnt, _, _, _ = _peaks.find_peaks(
            -jnp.abs(self._values), height=-height,
            prominence=delta if delta else None,
        )
        return np.asarray(idx[: int(cnt)])

    # -- noise / smoothing (reference core.py:369-457) ------------------------
    def estimate_noise(self, sigma=3.0, n_iter=3):
        """Median-filter residue + k-sigma clip noise estimate
        (reference core.py:369-399, incl. the 1D/2D correction factors)."""
        x = np.asarray(self._values)
        if self.ndim == 1:
            xp = np.pad(x, 1, mode="symmetric")
            med = np.median(np.stack([xp[:-2], xp[1:-1], xp[2:]]), axis=0)
        elif self.ndim == 2:
            xp = np.pad(x, 1, mode="symmetric")
            stack = [
                xp[i : i + x.shape[0], j : j + x.shape[1]]
                for i in range(3)
                for j in range(3)
            ]
            med = np.median(np.stack(stack), axis=0)
        else:
            raise NotImplementedError(
                "'estimate_noise' is only implemented for 1D or 2D arrays."
            )
        residue = x - med
        sd = np.std(residue)
        index = np.isfinite(residue)
        for _ in range(n_iter):
            mu = np.mean(residue[index])
            sd = np.std(residue[index])
            index = np.abs(residue - mu) < sigma * sd
        return sd / (0.893421 if self.ndim == 1 else 0.969684)

    def smooth(self, width, kernel="gaussian", **kwargs):
        """Low-pass FIR filter (reference core.py:401-440)."""
        if kernel == "gaussian":
            xf = _filters.gaussian_filter(self._values, sigma=width, **kwargs)
        elif kernel == "boxcar":
            k1 = _filters.boxcar_kernel1d(width, dtype=self._values.dtype)
            if self.ndim == 1:
                xf = _filters.convolve1d(self._values, k1)
            else:
                xf = _filters.convolve2d(self._values, jnp.outer(k1, k1))
        elif kernel == "triangle":
            k1 = _filters.triangle_kernel1d(width, dtype=self._values.dtype)
            if self.ndim == 1:
                xf = _filters.convolve1d(self._values, k1)
            else:
                # the reference composes the INTEGER ramp (w_i + w_j - 1,
                # core.py:430-436) before normalizing — composing the
                # normalized 1-D weights instead inverts the pyramid
                half = int(width // 2)
                ramp = np.asarray(
                    list(range(1, half + 2)) + list(range(half, 0, -1)),
                    float,
                )
                k2 = ramp[:, None] + ramp[None, :] - 1.0
                k2 = k2 / k2.sum()
                xf = _filters.convolve2d(
                    self._values, jnp.asarray(k2, self._values.dtype)
                )
        else:
            raise ValueError(f"Kernel type '{kernel}' is unknown.")
        return self._replace_data(xf)

    def convolve(self, kernel):
        kernel = jnp.asarray(kernel)
        if self.ndim == 1:
            xf = _filters.convolve1d(self._values, kernel, mode="mirror")
        else:
            xf = _filters.convolve2d(self._values, kernel, mode="mirror")
        return self._replace_data(xf)

    def plot(self, *args, **kwargs):
        import matplotlib.pyplot as plt

        xs = self._coord_arrays()[0]
        return plt.plot(np.asarray(xs), np.asarray(self._values), *args, **kwargs)

    def hist(self, *args, **kwargs):
        import matplotlib.pyplot as plt

        return plt.hist(np.asarray(self._values).ravel(), *args, **kwargs)

    def to_pandas(self):
        """pandas view (reference core.py:189-190)."""
        import pandas as pd

        coords = self._coord_arrays()
        if self.ndim == 1:
            return pd.Series(
                np.asarray(self._values), index=np.asarray(coords[0])
            )
        return pd.DataFrame(
            np.asarray(self._values),
            index=np.asarray(coords[0]),
            columns=np.asarray(coords[1]),
        )


def implements(numpy_function):
    """Register an ``__array_function__`` implementation for Signal
    objects (reference core.py:13-20) — the public extension point for
    teaching numpy-protocol functions about these containers. The
    implementation is keyed by the numpy function's name."""

    def decorator(func):
        Signal._ARRAY_FUNCS[numpy_function.__name__] = func
        return func

    return decorator


def wrap_reduce(func):
    """Lift a raw-array reduction into a Signal-aware one (reference
    core.py:23-35): a named ``dim`` translates to the positional axis,
    full reductions return scalars, shape-preserving results rewrap in
    the same container, and single-axis reductions of 2-D containers
    wrap with the surviving coordinate."""

    def wrapped_func(signal, dim=None, **kwargs):
        if dim is not None:
            kwargs["axis"] = signal.get_axis(dim)
        axis = kwargs.pop("axis", None)
        keepdims = kwargs.get("keepdims", False)
        if axis is None:
            result = func(signal.values, **kwargs)
            if keepdims and jnp.size(result) == 1:
                # kept size-1 dims carry no coordinate; degrade to scalar
                result = jnp.reshape(result, ())
            if jnp.ndim(result) == 0:
                return _scalar(result)
            if jnp.shape(result) == signal.shape:
                return signal._replace_data(result)
            return result
        axis = axis % signal.ndim
        result = func(signal.values, axis=axis, **kwargs)
        if keepdims and jnp.shape(result)[axis] == 1:
            result = jnp.squeeze(result, axis=axis)
        if jnp.shape(result) == signal.shape:
            return signal._replace_data(result)
        return signal._wrap_reduced(axis, result)

    return wrapped_func


def _register_array_funcs():
    def reduce_entry(np_name, method):
        def impl(sig, *args, **kwargs):
            return getattr(sig, method)(*args, **kwargs)

        Signal._ARRAY_FUNCS[np_name] = impl

    for np_name, method in [
        ("all", "all"),
        ("any", "any"),
        ("argmax", "argmax"),
        ("argmin", "argmin"),
        ("amax", "amax"),
        ("max", "amax"),
        ("nanmax", "amax"),
        ("amin", "amin"),
        ("min", "amin"),
        ("nanmin", "amin"),
        ("mean", "mean"),
        ("nanmean", "mean"),
        ("median", "median"),
        ("nanmedian", "median"),
        ("sum", "sum"),
        ("nansum", "sum"),
        ("prod", "prod"),
        ("std", "std"),
        ("nanstd", "std"),
        ("var", "var"),
        ("nanvar", "var"),
        ("roll", "roll"),
    ]:
        reduce_entry(np_name, method)

    Signal._ARRAY_FUNCS["full_like"] = lambda sig, fill, **kw: sig._replace_data(
        jnp.full_like(sig._values, fill, **kw)
    )
    Signal._ARRAY_FUNCS["zeros_like"] = lambda sig, **kw: sig._replace_data(
        jnp.zeros_like(sig._values, **kw)
    )
    Signal._ARRAY_FUNCS["ones_like"] = lambda sig, **kw: sig._replace_data(
        jnp.ones_like(sig._values, **kw)
    )


_register_array_funcs()


def full_like(signal, fill_value, **kwargs):
    """Same-type container filled with ``fill_value`` (reference
    core.py:38-40; also reachable as ``np.full_like(signal, v)`` through
    the numpy function protocol)."""
    return Signal._ARRAY_FUNCS["full_like"](signal, fill_value, **kwargs)


def zeros_like(signal, **kwargs):
    """Reference core.py:43-45; also ``np.zeros_like(signal)``."""
    return Signal._ARRAY_FUNCS["zeros_like"](signal, **kwargs)


def ones_like(signal, **kwargs):
    """Reference core.py:48-50; also ``np.ones_like(signal)``."""
    return Signal._ARRAY_FUNCS["ones_like"](signal, **kwargs)


@jax.tree_util.register_pytree_node_class
class TSeries(Signal):
    """1-D time-indexed series (reference core.py:460-856)."""

    def __init__(self, time=None, values=None, assume_sorted=False):
        if time is None and values is None:
            raise ValueError("Either time or values must be given.")
        if values is None:
            values = jnp.ones(len(time))
        values = jnp.asarray(values)
        if time is None:
            time = jnp.arange(values.shape[0])
        time = jnp.asarray(time)
        if time.shape[0] != values.shape[0]:
            raise ValueError("Input arrays have incompatible lengths.")
        if not assume_sorted:
            order = jnp.argsort(time)
            time = time[order]
            values = values[order]
        self._time = time
        self._values = values
        self.attrs = {}

    # pytree protocol
    def tree_flatten(self):
        return (self._time, self._values), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._time, obj._values = children
        obj.attrs = {}
        return obj

    @property
    def dims(self):
        return ("time",)

    @property
    def time(self):
        return self._time

    def _coord_arrays(self):
        return (self._time,)

    def _replace_data(self, data):
        new = TSeries(self._time, data, assume_sorted=True)
        return new

    def _wrap_reduced(self, axis, data):
        return _scalar(data)

    def __getitem__(self, key):
        if isinstance(key, tuple):
            (key,) = key
        time = np.asarray(self._time)[key]
        values = np.asarray(self._values)[key]
        if np.ndim(values) < 1:
            return jnp.asarray(values)
        return TSeries(time, values)

    # -- time-grid properties -------------------------------------------------
    @property
    def baseline(self):
        return _scalar(self._time[-1] - self._time[0])

    @property
    def median_dt(self):
        return _scalar(jnp.median(jnp.diff(self._time)))

    @property
    def dt(self):
        if _uniform_spacing(self._time) is not None:
            return self.median_dt
        raise AttributeError(
            "The sampling period is only strictly defined for "
            "uniformly sampled signals. Use median_dt for a median value."
        )

    def tmax(self):
        return self.max().time[0]

    # -- calculus -------------------------------------------------------------
    @property
    def derivative(self):
        """Second-order nonuniform central differences with first-order
        edges (== np.gradient(values, time) / xarray differentiate)."""
        t, v = self._time, self._values
        dt = jnp.diff(t)
        h1, h2 = dt[:-1], dt[1:]
        interior = (
            v[2:] * h1**2 - v[:-2] * h2**2 + v[1:-1] * (h2**2 - h1**2)
        ) / (h1 * h2 * (h1 + h2))
        first = (v[1] - v[0]) / dt[0]
        last = (v[-1] - v[-2]) / dt[-1]
        g = jnp.concatenate([first[None], interior, last[None]])
        return TSeries(t, g, assume_sorted=True)

    @property
    def TEO(self):
        """Teager Energy Operator (reference core.py:528-535)."""
        d = self.derivative
        return d * d - self * d.derivative

    # -- coordinate transforms --------------------------------------------------
    def timeshift(self, t0):
        return TSeries(self._time + t0, self._values, assume_sorted=True)

    def timescale(self, alpha):
        return TSeries(self._time * alpha, self._values)

    def fold(self, period, t0=0):
        """Phase-fold onto [0, 1); result sorted by phase
        (reference core.py:543-544)."""
        return TSeries(((self._time - t0) / period) % 1, self._values)

    # -- spectra ------------------------------------------------------------
    def fft(self, oversample=1.0, dt=None):
        nfft = int(oversample * self.size)
        if dt is None:
            dt = self.dt
        freqs = jnp.fft.rfftfreq(n=nfft, d=float(dt))
        coefs = jnp.fft.rfft(self._values, n=nfft)
        return FSeries(freqs, coefs, assume_sorted=True)

    def psd(self, *args, **kwargs):
        f = self.fft(*args, **kwargs)
        return FSeries(f.frequency, jnp.square(jnp.abs(f.values)), assume_sorted=True)

    def acf(self, max_lag=None, unbias=False):
        """FFT autocorrelation (reference core.py:578-608): IFFT of the
        2x-oversampled PSD of the mean-subtracted signal, normalized to
        lag 0, with optional mask-effect unbiasing."""
        if max_lag is None:
            max_lag = self.size // 2
        lags = self._time - self._time.min()
        # a float-VALUED max_lag means a time span (reference semantics);
        # np.float64 subclasses float but jnp/np 0-d float arrays do not,
        # so test the dtype rather than the Python type
        is_time = (
            isinstance(max_lag, float)
            or (hasattr(max_lag, "dtype")
                and np.issubdtype(np.asarray(max_lag).dtype, np.floating))
        )
        if is_time:
            max_lag = int(
                np.searchsorted(np.asarray(lags), float(max_lag)) + 1
            )
        max_lag = min(int(max_lag), self.size)
        ryy = (self - self.mean()).psd(oversample=2.0, dt=self.median_dt).ifft()
        if unbias:
            correction = (self / self).psd(oversample=2.0, dt=self.median_dt).ifft()
            ryy = ryy / correction
        vals = ryy.values[:max_lag] / ryy.values[0]
        return TSeries(lags[:max_lag], vals, assume_sorted=True)

    # -- combination / resampling (eager conveniences) -----------------------
    def dropna(self):
        good = ~np.isnan(np.asarray(self._values))
        return TSeries(
            np.asarray(self._time)[good], np.asarray(self._values)[good],
            assume_sorted=True,
        )

    def cov(self, other):
        a = np.asarray(self._values)
        b = np.asarray(other._values)
        return np.cov(a, b)[0, 1]

    def corr(self, other):
        a = np.asarray(self._values)
        b = np.asarray(other._values)
        return np.corrcoef(a, b)[0, 1]

    def polyfit(self, degree):
        coefs = np.polyfit(np.asarray(self._time), np.asarray(self._values), degree)
        fit = self._replace_data(jnp.asarray(np.poly1d(coefs)(np.asarray(self._time))))
        fit.attrs.update(coefficients=coefs)
        return fit

    def curvefit(self, fun, p0, **kwargs):
        t = self._time

        def residual(p):
            return fun(t, *p) - self._values

        popt, pcov = _optimize.levenberg_marquardt(residual, jnp.asarray(p0), **kwargs)
        fit = self._replace_data(fun(t, *popt))
        fit.attrs.update(coefficients=popt, covariance=pcov)
        return fit

    def join(self, other, **kwargs):
        st, ot = np.asarray(self._time), np.asarray(other._time)
        if len(np.intersect1d(st, ot)) > 0:
            warnings.warn(
                "There are overlapping timestamps. The corresponding "
                "timestamps in the returned TSeries have both samples."
            )
        time = np.concatenate([st, ot])
        values = np.concatenate([np.asarray(self._values), np.asarray(other._values)])
        return TSeries(time, values)

    def split(self, max_gap=None):
        if max_gap is None:
            max_gap = 1.5 * float(self.median_dt)
        t = np.asarray(self._time)
        ids = np.where(np.diff(t) > max_gap)[0]
        ids = np.hstack([0, ids + 1, self.size])
        return [self[ids[i] : ids[i + 1]] for i in range(len(ids) - 1)]

    def downsample(self, dt, func=None):
        """Bin-reduce onto a uniform grid (reference core.py:629-634).

        The default nan-mean reduction is two bincounts (O(N), no Python
        loop over bins); a custom ``func`` is applied per nonempty bin via
        one split of the already-sorted samples.
        """
        t = np.asarray(self._time)
        v = np.asarray(self._values)
        labels = np.arange(t.min(), t.max(), dt)
        edges = np.linspace(t.min(), t.max(), labels.size + 1)
        edges[0] -= 1e-9 * (t.max() - t.min())
        which = np.clip(np.searchsorted(edges, t, side="left") - 1, 0, labels.size - 1)
        good = ~np.isnan(v)
        out = np.full(labels.size, np.nan)
        if func is None or func is np.mean:
            sums = np.bincount(which[good], weights=v[good], minlength=labels.size)
            counts = np.bincount(which[good], minlength=labels.size)
            np.divide(sums, counts, out=out, where=counts > 0)
        else:
            # time is sorted, so bin ids are nondecreasing: one split gives
            # the per-bin sample groups
            ids = which[good]
            vals = v[good]
            if ids.size:
                starts = np.flatnonzero(np.r_[True, np.diff(ids) > 0])
                out[ids[starts]] = [
                    func(g) for g in np.split(vals, starts[1:])
                ]
        return TSeries(labels, out).dropna()

    def interp(self, new_time=None, method="linear", **kwargs):
        """Interpolation onto a new grid (reference core.py:636-662);
        method='spline' is splrep/splev-equivalent (not-a-knot cubic).

        Points outside the data range are NaN for the xarray-backed
        methods (linear/slinear/nearest/zero/quadratic/cubic — the
        reference's interp1d uses fill_value=nan); method='spline'
        EXTRAPOLATES the boundary polynomial like FITPACK splev (ext=0),
        matching the reference's splrep/splev path."""
        if new_time is None:
            new_time = np.arange(
                float(self._time.min()), float(self._time.max()), float(self.median_dt)
            )
        new_time = jnp.asarray(new_time)
        if method == "quadratic":
            new_values = _spline.quadratic_spline_interp(
                self._time, self._values, new_time
            )
        elif method in ("spline", "cubic"):
            s = kwargs.pop("s", 0)
            if s:
                new_values = _spline.smoothing_spline_interp(
                    self._time, self._values, new_time, s=s,
                    w=kwargs.pop("w", None),
                )
            else:
                new_values = _spline.spline_interp(
                    self._time, self._values, new_time
                )
        elif method in ("linear", "slinear"):
            new_values = jnp.interp(new_time, self._time, self._values)
        elif method == "nearest":
            idx = jnp.clip(
                jnp.searchsorted(self._time, new_time, side="left"), 0, self.size - 1
            )
            left = jnp.clip(idx - 1, 0, self.size - 1)
            d_left = jnp.abs(new_time - self._time[left])
            d_right = jnp.abs(self._time[idx] - new_time)
            pick = jnp.where(d_left <= d_right, left, idx)
            new_values = self._values[pick]
        elif method == "zero":
            idx = jnp.clip(
                jnp.searchsorted(self._time, new_time, side="right") - 1, 0, self.size - 1
            )
            new_values = self._values[idx]
        else:
            raise NotImplementedError(f"interp method '{method}'")
        if method in ("linear", "slinear", "nearest", "zero", "quadratic",
                      "cubic"):
            # xarray's interp does not extrapolate: points outside the data
            # range are NaN (reference core.py:636-662); the kernels above
            # clamp/extrapolate instead. method='spline' keeps FITPACK
            # splev's boundary-polynomial extrapolation (see docstring).
            outside = (new_time < self._time[0]) | (new_time > self._time[-1])
            new_values = jnp.where(outside, jnp.nan, new_values)
        return TSeries(new_time, new_values, assume_sorted=True)

    def interpolate_na(self, method="linear", **kwargs):
        """Fill NaNs (reference core.py:664-701)."""
        v = np.asarray(self._values).copy()
        t = np.asarray(self._time)
        bad = np.isnan(v)
        if method == "constant":
            v[bad] = kwargs.pop("k", 0.0)
        elif method == "bfill":
            idx = np.where(~bad, np.arange(v.size), v.size - 1)
            idx = np.minimum.accumulate(idx[::-1])[::-1]
            v = v[idx]
        elif method == "ffill":
            idx = np.where(~bad, np.arange(v.size), 0)
            idx = np.maximum.accumulate(idx)
            v = v[idx]
        elif method == "random":
            mu = kwargs.pop("mu", float(self.mean()))
            sd = kwargs.pop("sd", None)
            if sd is None:
                sd = float(self.estimate_noise())
            rng = np.random.default_rng(kwargs.pop("random_seed", None))
            v[bad] = rng.normal(mu, sd, bad.sum())
        elif method == "mirror":
            ids = np.where(np.diff(bad))[0] + 1
            n_gaps = ids.size // 2
            for i in range(n_gaps):
                start, end = ids[2 * i], ids[2 * i + 1]
                gap = end - start
                left_ids = np.arange(start, start + gap // 2)
                right_ids = np.arange(end - gap // 2, end)
                v[left_ids] = v[2 * start - left_ids - 1]
                v[right_ids] = v[2 * end - right_ids - 1]
                if gap % 2 == 1:
                    center = (start + end - 1) // 2
                    v[center] = 0.5 * (v[center - 1] + v[center + 1])
        else:
            good = ~bad
            v[bad] = np.asarray(
                TSeries(t[good], v[good], assume_sorted=True).interp(
                    t[bad], method=method, **kwargs
                ).values
            )
        return TSeries(t, v, assume_sorted=True)

    def fill_gaps(self, dt=None, **kwargs):
        """Insert timestamps where gaps exceed 1.2*dt, then interpolate
        (reference core.py:703-715)."""
        if dt is None:
            dt = float(self.median_dt)
        t = np.asarray(self._time)
        # per-gap insert counts: k steps of dt from the left edge until the
        # remaining gap is <= 1.2*dt (same semantics as stepping a cursor
        # through each gap, but O(N) vectorized)
        gaps = np.diff(t)
        counts = np.maximum(np.ceil((gaps - 1.2 * dt) / dt), 0).astype(int)
        total = int(counts.sum())
        if total:
            base = np.repeat(t[:-1], counts)
            group_start = np.repeat(np.cumsum(counts) - counts, counts)
            step = np.arange(total) - group_start + 1
            t_new = base + dt * step
        else:
            t_new = np.empty(0, t.dtype)
        t_new = t_new[~np.isin(t_new, t)]
        if t_new.size:
            result = self.join(TSeries(t_new, np.full(t_new.size, np.nan)))
        else:
            result = self.copy()
        return result.interpolate_na(**kwargs)

    def drop(self, index=None):
        if index is None:
            index = []
        return TSeries(
            np.delete(np.asarray(self._time), index),
            np.delete(np.asarray(self._values), index),
            assume_sorted=True,
        )

    def pad(self, pad_width, **kwargs):
        """np.pad with separate time/value kwargs (reference core.py:726-739):
        list-valued kwargs apply [0] to time and [1] to values."""
        time_kwargs, data_kwargs = {}, {}
        for key, arg in kwargs.items():
            arg = np.asarray(arg, dtype=object) if isinstance(arg, (list, tuple)) else arg
            if np.size(arg) == 1:
                val = arg.item() if isinstance(arg, np.ndarray) else arg
                time_kwargs[key] = val
                data_kwargs[key] = val
            else:
                time_kwargs[key] = arg[0]
                data_kwargs[key] = arg[1]
        for kw in (time_kwargs, data_kwargs):
            if kw.get("reflect_type", "x") is None:
                kw["reflect_type"] = "even"
        t_new = np.pad(np.asarray(self._time), pad_width, **time_kwargs)
        v_new = np.pad(np.asarray(self._values), pad_width, **data_kwargs)
        return TSeries(t_new, v_new)

    def get_envelope(self, pad_width=0, **peak_kwargs):
        """Upper/lower cubic-spline envelopes through padded extrema
        (reference core.py:741-774)."""
        peaks = self.find_peaks(include_edges=True, **peak_kwargs)
        dips = self.find_dips(include_edges=True, **peak_kwargs)
        if peaks.size < (2 + pad_width) or dips.size < (2 + pad_width):
            raise ValueError("Signal doesn't have enough extrema for padding.")
        peaks = peaks.pad(pad_width, mode="reflect", reflect_type=["odd", None]).drop(
            [pad_width, -pad_width - 1]
        )
        dips = dips.pad(pad_width, mode="reflect", reflect_type=["odd", None]).drop(
            [pad_width, -pad_width - 1]
        )
        if peaks.size < 4 or dips.size < 4:
            raise ValueError(
                "Signal doesn't have enough extrema for envelope interpolation."
            )
        upper = peaks.interp(new_time=self._time, method="spline")
        lower = dips.interp(new_time=self._time, method="spline")
        return upper, lower

    def butterworth(self, fmin=None, fmax=None, order=5):
        """Zero-phase butterworth band/low/high-pass
        (reference core.py:776-807)."""
        nyq = 0.5 / float(self.median_dt)
        if fmin is not None and fmax is None:
            wn, btype = fmin / nyq, "highpass"
        elif fmin is None and fmax is not None:
            wn, btype = fmax / nyq, "lowpass"
        elif fmin is not None and fmax is not None:
            wn, btype = [fmin / nyq, fmax / nyq], "bandpass"
        else:
            raise ValueError("At least one of 'fmin' and 'fmax' must be given!")
        sos = _filters.butter_sos(order, wn, btype)
        return self._replace_data(_filters.sosfiltfilt(sos, self._values))

    def acf_period_quality(self, p_min, p_max):
        """Band-pass -> ACF -> boxcar smooth -> exp-cosine fit quality
        (reference core.py:809-853)."""
        t = np.asarray(self._time)
        ml = int(np.searchsorted(t - t[0], 2 * p_max))
        rxx = self.butterworth(1 / p_max, 1 / p_min).acf(max_lag=ml)
        if p_max >= 20:
            width = int(p_max // 10)
            rxx = rxx.smooth(width, kernel="boxcar")
            rxx = rxx / rxx.amax()
        peaks = rxx.find_peaks()
        proms = peaks.attrs["prominences"]
        best_per = float(np.asarray(peaks.time)[proms.argmax()])
        height = float(proms.max())
        tau_max = 20 * p_max / best_per
        rt = np.asarray(rxx.time)
        rv = np.asarray(rxx.values)

        def rss(params):
            log_aa, log_tt = params
            model = (
                np.exp(log_aa)
                * np.exp(-rt / np.exp(log_tt))
                * np.cos(2 * np.pi * rt / best_per)
            )
            return np.sum(np.square(rv - model))

        (log_amp, log_tau), _ = _optimize.nelder_mead(rss, [0.0, np.log(best_per * 2)])
        tau = min(np.exp(log_tau), tau_max)
        quality = (tau / best_per) * (ml * height / rss([log_amp, np.log(tau)]))
        return best_per, height, quality


@jax.tree_util.register_pytree_node_class
class FSeries(Signal):
    """1-D frequency-indexed series with a dual period coordinate
    (reference core.py:859-1027)."""

    def __init__(self, frequency=None, values=None, assume_sorted=False):
        if frequency is None:
            raise ValueError("frequency must be given.")
        frequency = jnp.asarray(frequency)
        if values is None:
            values = jnp.ones(frequency.shape[0])
        values = jnp.asarray(values)
        if frequency.shape[0] != values.shape[0]:
            raise ValueError("Input arrays have incompatible lengths.")
        if not assume_sorted:
            order = jnp.argsort(frequency)
            frequency = frequency[order]
            values = values[order]
        self._frequency = frequency
        self._values = values
        self.attrs = {}

    def tree_flatten(self):
        return (self._frequency, self._values), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._frequency, obj._values = children
        obj.attrs = {}
        return obj

    @property
    def dims(self):
        return ("frequency",)

    @property
    def frequency(self):
        return self._frequency

    @property
    def period(self):
        with np.errstate(divide="ignore", invalid="ignore"):
            return 1.0 / self._frequency

    def _coord_arrays(self):
        return (self._frequency,)

    def _replace_data(self, data):
        return FSeries(self._frequency, data, assume_sorted=True)

    def _wrap_reduced(self, axis, data):
        return _scalar(data)

    def __getitem__(self, key):
        if isinstance(key, tuple):
            (key,) = key
        freq = np.asarray(self._frequency)[key]
        values = np.asarray(self._values)[key]
        if np.ndim(values) < 1:
            return jnp.asarray(values)
        return FSeries(freq, values)

    @property
    def median_df(self):
        return _scalar(jnp.median(jnp.diff(self._frequency)))

    @property
    def df(self):
        if _uniform_spacing(self._frequency) is not None:
            return self.median_df
        raise AttributeError(
            "The sampling period is only strictly defined for "
            "uniform frequency grids. Use median_df for a median value."
        )

    @property
    def median_dp(self):
        return _scalar(-jnp.median(jnp.diff(self.period)))

    @property
    def dp(self):
        d = np.diff(np.asarray(self.period))
        if np.allclose(d, np.median(d)):
            return self.median_dp
        raise AttributeError(
            "The sampling period is only strictly defined for "
            "uniform period grids. Use median_dp for a median value."
        )

    def fmax(self):
        return self.max().frequency[0]

    def pmax(self):
        return self.max().period[0]

    def psort_by_peak(self):
        peaks = self.find_peaks()
        return peaks.period[np.argsort(np.asarray(peaks.values))[::-1]]

    def psort_by_prominence(self):
        peaks = self.find_peaks()
        return peaks.period[peaks.attrs["prominences"].argsort()[::-1]]

    @property
    def period_at_highest_peak(self):
        return self.find_peaks().pmax()

    @property
    def period_at_highest_prominence(self):
        peaks = self.find_peaks()
        return peaks.period[np.nanargmax(peaks.attrs["prominences"])]

    def periods_at_half_max(self, peak_order=1, use_prominence=False):
        """FWHM period interval around the k-th peak
        (reference core.py:963-978)."""
        peaks = self.find_peaks()
        indices = peaks.attrs["indices"]
        heights = (
            peaks.attrs["prominences"] if use_prominence else np.asarray(peaks.values)
        )
        jmax = heights.argsort()[-peak_order]
        idmax = int(indices[jmax])
        height = heights[jmax]
        half = float(np.asarray(self._values)[idmax]) - height / 2
        hi = (self[:idmax] - half).find_zero_crossings()[-1]
        lo = (self[idmax:] - half).find_zero_crossings()[0]
        upper = np.asarray(self[:idmax].period)[hi]
        lower = np.asarray(self[idmax:].period)[lo]
        return lower, upper

    def ifft(self, nfft=None):
        coefs = jnp.fft.irfft(self._values, n=nfft)
        dt = 1.0 / (coefs.shape[0] * float(self.df))
        time = jnp.arange(coefs.shape[0]) * dt
        return TSeries(time, coefs, assume_sorted=True)

    def dropna(self):
        good = ~np.isnan(np.asarray(self._values))
        return FSeries(
            np.asarray(self._frequency)[good],
            np.asarray(self._values)[good],
            assume_sorted=True,
        )

    def polyfit(self, degree, use_period=False):
        xdata = np.asarray(self.period if use_period else self._frequency)
        coefs = np.polyfit(xdata, np.asarray(self._values), degree)
        fit = self._replace_data(jnp.asarray(np.poly1d(coefs)(xdata)))
        fit.attrs.update(coefficients=coefs)
        return fit

    def curvefit(self, fun, p0, use_period=False, **kwargs):
        xdata = jnp.asarray(self.period if use_period else self._frequency)

        def residual(p):
            return fun(xdata, *p) - self._values

        popt, pcov = _optimize.levenberg_marquardt(residual, jnp.asarray(p0), **kwargs)
        fit = self._replace_data(fun(xdata, *popt))
        fit.attrs.update(coefficients=popt, covariance=pcov)
        return fit

    def downsample(self, df=None, dp=None, func=None):
        if df is None and dp is None:
            raise ValueError("At least one of df or dp must be given.")
        if df is not None and dp is not None:
            raise ValueError("Can't make a uniform grid at both frequency and period!")
        v = np.asarray(self._values)
        if df is not None:
            x = np.asarray(self._frequency)
            labels = np.arange(x.min(), x.max(), df)
        else:
            p = np.asarray(self.period)
            labels = 1.0 / np.arange(p.min(), p.max(), dp)
            x = p
        lo, hi = x.min(), x.max()
        edges = np.linspace(lo, hi, labels.size + 1)
        edges[0] -= 1e-9 * (hi - lo)
        which = np.clip(np.searchsorted(edges, x, "left") - 1, 0, labels.size - 1)
        good = ~np.isnan(v)
        out = np.full(labels.size, np.nan)
        if func is None or func is np.mean:
            # two bincounts, O(N) — same vectorization as TSeries.downsample
            sums = np.bincount(which[good], weights=v[good],
                               minlength=labels.size)
            counts = np.bincount(which[good], minlength=labels.size)
            np.divide(sums, counts, out=out, where=counts > 0)
        else:
            order = np.argsort(which[good], kind="stable")
            ids = which[good][order]
            vals = v[good][order]
            if ids.size:
                starts = np.flatnonzero(np.r_[True, np.diff(ids) > 0])
                out[ids[starts]] = [
                    func(g) for g in np.split(vals, starts[1:])
                ]
        return FSeries(labels, out).dropna()


@jax.tree_util.register_pytree_node_class
class TFSeries(Signal):
    """2-D (frequency x time) spectrogram container
    (reference core.py:1030-1179)."""

    def __init__(self, time=None, frequency=None, values=None):
        values = jnp.asarray(values)
        time = jnp.asarray(time)
        frequency = jnp.asarray(frequency)
        if time.shape[0] != values.shape[1] or frequency.shape[0] != values.shape[0]:
            raise ValueError("Input arrays have incompatible lengths.")
        self._time = time
        self._frequency = frequency
        self._values = values
        self.attrs = {}

    def tree_flatten(self):
        return (self._time, self._frequency, self._values), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._time, obj._frequency, obj._values = children
        obj.attrs = {}
        return obj

    @property
    def dims(self):
        return ("frequency", "time")

    @property
    def time(self):
        return self._time

    @property
    def frequency(self):
        return self._frequency

    @property
    def period(self):
        with np.errstate(divide="ignore", invalid="ignore"):
            return 1.0 / self._frequency

    def _coord_arrays(self):
        return (self._frequency, self._time)

    def _replace_data(self, data):
        return TFSeries(self._time, self._frequency, data)

    def _wrap_reduced(self, axis, data):
        if axis == 0:
            return TSeries(self._time, data, assume_sorted=True)
        return FSeries(self._frequency, data, assume_sorted=True)

    def __len__(self):
        return self._values.shape[0]

    def __getitem__(self, key):
        if not isinstance(key, tuple):
            key = (key,)
        key = key + (slice(None),) * (2 - len(key))
        k1, k2 = key
        freq = np.asarray(self._frequency)[k1]
        time = np.asarray(self._time)[k2]
        values = np.asarray(self._values)[key]
        if values.ndim < 1:
            return jnp.asarray(values)
        if values.ndim == 1:
            if np.ndim(time) == 0:
                return FSeries(freq, values)
            return TSeries(time, values)
        return TFSeries(time, freq, values)

    @property
    def median_dt(self):
        return _scalar(jnp.median(jnp.diff(self._time)))

    @property
    def dt(self):
        if _uniform_spacing(self._time) is not None:
            return self.median_dt
        raise AttributeError(
            "The sampling period is only strictly defined for "
            "uniformly sampled signals. Use median_dt for a median value."
        )

    @property
    def median_df(self):
        return _scalar(jnp.median(jnp.diff(self._frequency)))

    @property
    def df(self):
        if _uniform_spacing(self._frequency) is not None:
            return self.median_df
        raise AttributeError(
            "The sampling period is only strictly defined for "
            "uniform frequency grids. Use median_df for a median value."
        )

    @property
    def median_dp(self):
        return _scalar(-jnp.median(jnp.diff(self.period)))

    @property
    def dp(self):
        d = np.diff(np.asarray(self.period))
        if np.allclose(d, np.median(d)):
            return self.median_dp
        raise AttributeError(
            "The sampling period is only strictly defined for "
            "uniform period grids. Use median_dp for a median value."
        )

    @staticmethod
    def _bin_reduce(x, V, labels, func):
        """Bin the leading axis of V [N, M] by coordinate x [N] onto
        ``labels`` bins shared across ALL M columns, then drop bins with
        any NaN column (xarray ``dropna(dim, how="any")`` semantics —
        per-column dropna could drop DIFFERENT bins per column and
        misalign or break the stack). Returns (labels_kept, out [B, M])."""
        n_bins = labels.size
        lo, hi = x.min(), x.max()
        edges = np.linspace(lo, hi, n_bins + 1)
        edges[0] -= 1e-9 * (hi - lo)
        which = np.clip(
            np.searchsorted(edges, x, "left") - 1, 0, n_bins - 1
        )
        m = V.shape[1]
        out = np.full((n_bins, m), np.nan)
        good = ~np.isnan(V)
        rows, cols = np.nonzero(good)
        if func is None or func is np.mean:
            sums = np.zeros((n_bins, m))
            counts = np.zeros((n_bins, m))
            np.add.at(sums, (which[rows], cols), V[rows, cols])
            np.add.at(counts, (which[rows], cols), 1.0)
            np.divide(sums, counts, out=out, where=counts > 0)
        else:
            for j in range(m):
                gj = good[:, j]
                ids = which[gj]
                vals = V[gj, j]
                order = np.argsort(ids, kind="stable")
                ids, vals = ids[order], vals[order]
                if ids.size:
                    starts = np.flatnonzero(np.r_[True, np.diff(ids) > 0])
                    out[ids[starts], j] = [
                        func(g) for g in np.split(vals, starts[1:])
                    ]
        keep = ~np.isnan(out).any(axis=1)
        return labels[keep], out[keep]

    def downsample(self, dt=None, df=None, dp=None, func=None):
        if df is not None and dp is not None:
            raise ValueError("Can't make a uniform grid at both frequency and period!")
        tf = self
        if df is not None:
            x = np.asarray(tf._frequency)
            labels = np.arange(x.min(), x.max(), df)
            flabels, vals = self._bin_reduce(
                x, np.asarray(tf._values), labels, func
            )
            tf = TFSeries(tf._time, flabels, vals)
        if dp is not None:
            x = np.asarray(tf.period)
            labels = 1.0 / np.arange(x.min(), x.max(), dp)
            flabels, vals = self._bin_reduce(
                x, np.asarray(tf._values), labels, func
            )
            tf = TFSeries(tf._time, flabels, vals)
        if dt is not None:
            x = np.asarray(tf._time)
            labels = np.arange(x.min(), x.max(), dt)
            tlabels, vals = self._bin_reduce(
                x, np.asarray(tf._values).T, labels, func
            )
            tf = TFSeries(tlabels, tf._frequency, vals.T)
        return tf

    def _plot2d(self, fn_name, *args, **kwargs):
        """2-D plot with xarray-style coordinate selection: ``y`` may name
        the vertical coordinate ('frequency' default, or 'period')."""
        import matplotlib.pyplot as plt

        y_coord = kwargs.pop("y", "frequency")
        if y_coord == "period":
            y_vals = 1.0 / np.asarray(self._frequency)
        elif y_coord == "frequency":
            y_vals = np.asarray(self._frequency)
        else:
            raise ValueError(f"unknown y coordinate {y_coord!r}")
        fn = getattr(plt, fn_name)
        return fn(
            np.asarray(self._time), y_vals,
            np.asarray(self._values), *args, **kwargs,
        )

    def pcolormesh(self, *args, **kwargs):
        return self._plot2d("pcolormesh", *args, **kwargs)

    def imshow(self, *args, **kwargs):
        import matplotlib.pyplot as plt

        return plt.imshow(np.asarray(self._values), *args, **kwargs)

    def contour(self, *args, **kwargs):
        return self._plot2d("contour", *args, **kwargs)

    def contourf(self, *args, **kwargs):
        return self._plot2d("contourf", *args, **kwargs)

    def surface(self, *args, **kwargs):
        """3-D surface plot of the spectrogram (reference core.py:1177)."""
        import matplotlib.pyplot as plt

        ax = plt.gcf().add_subplot(projection="3d")
        t_mesh, f_mesh = np.meshgrid(
            np.asarray(self._time), np.asarray(self._frequency)
        )
        return ax.plot_surface(
            t_mesh, f_mesh, np.asarray(self._values), *args, **kwargs
        )
