"""Pure-numpy reimplementation of the published ``scipy.signal.find_peaks``
semantics (local maxima + height / threshold / prominence / width
filters), written from the SciPy public documentation and papers — no
scipy available in this environment.

Needed because the reference's spike/valley detector
(metevents/events.py:199-248) is defined directly in terms of
``find_peaks(series, height, threshold, prominence, width)`` and its
``widths`` property. Verified against the reference's golden
expectations (11 events on flv.csv, /root/reference/tests/test_events.py:118-176).
"""

from __future__ import annotations

import numpy as np


def local_maxima(x: np.ndarray) -> np.ndarray:
    """Indices of strict local maxima; flat peaks yield their midpoint
    (left_edge + right_edge) // 2. First/last samples never qualify."""
    n = len(x)
    mids: list[int] = []
    i = 1
    i_max = n - 1
    while i < i_max:
        if x[i - 1] < x[i]:
            i_ahead = i + 1
            while i_ahead < i_max and x[i_ahead] == x[i]:
                i_ahead += 1
            if x[i_ahead] < x[i]:
                left_edge = i
                right_edge = i_ahead - 1
                mids.append((left_edge + right_edge) // 2)
                i = i_ahead
        i += 1
    return np.asarray(mids, dtype=np.intp)


def _unpack_interval(val) -> tuple[float | None, float | None]:
    if val is None:
        return None, None
    if np.isscalar(val):
        return float(val), None
    lo, hi = val
    return (None if lo is None else float(lo)), (None if hi is None else float(hi))


def peak_prominences(
    x: np.ndarray, peaks: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Prominence of each peak: height above the higher of the two
    bases, where each base is the minimum between the peak and the
    nearest strictly-higher sample (or signal border) on that side."""
    n = len(x)
    prom = np.empty(len(peaks), dtype=np.float64)
    left_bases = np.empty(len(peaks), dtype=np.intp)
    right_bases = np.empty(len(peaks), dtype=np.intp)
    for k, p in enumerate(peaks):
        i = p
        left_min = x[p]
        left_bases[k] = p
        while i >= 0 and x[i] <= x[p]:
            if x[i] < left_min:
                left_min = x[i]
                left_bases[k] = i
            i -= 1
        i = p
        right_min = x[p]
        right_bases[k] = p
        while i < n and x[i] <= x[p]:
            if x[i] < right_min:
                right_min = x[i]
                right_bases[k] = i
            i += 1
        prom[k] = x[p] - max(left_min, right_min)
    return prom, left_bases, right_bases


def peak_widths(
    x: np.ndarray,
    peaks: np.ndarray,
    prominences: np.ndarray,
    left_bases: np.ndarray,
    right_bases: np.ndarray,
    rel_height: float = 0.5,
) -> np.ndarray:
    """Width of each peak at ``peak_height - prominence * rel_height``,
    with linear interpolation at the crossing points."""
    widths = np.empty(len(peaks), dtype=np.float64)
    for k, p in enumerate(peaks):
        height = x[p] - prominences[k] * rel_height
        i_min = left_bases[k]
        i_max = right_bases[k]
        i = p
        while i_min < i and height < x[i]:
            i -= 1
        left_ip = float(i)
        if x[i] < height:
            left_ip += (height - x[i]) / (x[i + 1] - x[i])
        i = p
        while i < i_max and height < x[i]:
            i += 1
        right_ip = float(i)
        if x[i] < height:
            right_ip -= (height - x[i]) / (x[i - 1] - x[i])
        widths[k] = right_ip - left_ip
    return widths


def find_peaks(
    x: np.ndarray,
    height=None,
    threshold=None,
    prominence=None,
    width=None,
) -> tuple[np.ndarray, dict]:
    """Subset of the scipy ``find_peaks`` contract the reference uses:
    filters applied in order height -> threshold -> prominence ->
    width; returns surviving peak indices + properties incl. widths."""
    x = np.asarray(x, dtype=np.float64)
    peaks = local_maxima(x)
    props: dict = {}

    if height is not None:
        hmin, hmax = _unpack_interval(height)
        ph = x[peaks]
        keep = np.ones(len(peaks), dtype=bool)
        if hmin is not None:
            keep &= ph >= hmin
        if hmax is not None:
            keep &= ph <= hmax
        peaks = peaks[keep]
        props["peak_heights"] = x[peaks]

    if threshold is not None:
        tmin, tmax = _unpack_interval(threshold)
        lt = x[peaks] - x[peaks - 1]
        rt = x[peaks] - x[peaks + 1]
        mins = np.minimum(lt, rt)
        maxs = np.maximum(lt, rt)
        keep = np.ones(len(peaks), dtype=bool)
        if tmin is not None:
            keep &= mins >= tmin
        if tmax is not None:
            keep &= maxs <= tmax
        peaks = peaks[keep]

    need_prominence = prominence is not None or width is not None
    if need_prominence:
        prom, lb, rb = peak_prominences(x, peaks)
        if prominence is not None:
            pmin, pmax = _unpack_interval(prominence)
            keep = np.ones(len(peaks), dtype=bool)
            if pmin is not None:
                keep &= prom >= pmin
            if pmax is not None:
                keep &= prom <= pmax
            peaks = peaks[keep]
            prom, lb, rb = prom[keep], lb[keep], rb[keep]
        props["prominences"] = prom
        props["left_bases"] = lb
        props["right_bases"] = rb

    if width is not None:
        widths = peak_widths(x, peaks, prom, lb, rb)
        wmin, wmax = _unpack_interval(width)
        keep = np.ones(len(peaks), dtype=bool)
        if wmin is not None:
            keep &= widths >= wmin
        if wmax is not None:
            keep &= widths <= wmax
        peaks = peaks[keep]
        widths = widths[keep]
        for key in ("prominences", "left_bases", "right_bases"):
            props[key] = props[key][keep]
        props["widths"] = widths

    return peaks, props
