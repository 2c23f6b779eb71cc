"""Small numerical routines (no scipy in this environment).

Standard algorithms from public numerical-methods literature:
regularized incomplete gamma (series + continued fraction) for the
chi-square survival function, and the asymptotic Kolmogorov-Smirnov
tail sum.
"""

from __future__ import annotations

import math


def _gamma_series(a: float, x: float) -> float:
    ap = a
    summ = 1.0 / a
    delta = summ
    for _ in range(500):
        ap += 1.0
        delta *= x / ap
        summ += delta
        if abs(delta) < abs(summ) * 1e-12:
            break
    return summ * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gamma_cf(a: float, x: float) -> float:
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-12:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def gammainc_upper(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("bad arguments")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gamma_series(a, x)
    return _gamma_cf(a, x)


def chi2_sf(stat: float, dof: int) -> float:
    """Chi-square survival function P(X >= stat)."""
    if dof <= 0:
        return 1.0
    return max(0.0, min(1.0, gammainc_upper(dof / 2.0, stat / 2.0)))


def ks_sf(lam: float) -> float:
    """Asymptotic KS tail Q_KS(lambda) = 2 sum (-1)^{j-1} exp(-2 j^2 lam^2)."""
    if lam <= 0:
        return 1.0
    total = 0.0
    for j in range(1, 101):
        term = 2.0 * ((-1.0) ** (j - 1)) * math.exp(-2.0 * j * j * lam * lam)
        total += term
        if abs(term) < 1e-12:
            break
    return max(0.0, min(1.0, total))


def ks_pvalue(d_stat: float, n_obs: float) -> float:
    en = math.sqrt(n_obs)
    return ks_sf((en + 0.12 + 0.11 / en) * d_stat)


def frac_e6(num, den):
    """floor(num * 1e6 / den + 0.5) as int64 numpy arrays; 0 where
    den <= 0 — THE parity-critical rounded-division expression every
    e6-fraction oracle mirrors as ``(2*num*1000000 + den) //
    (2*den)``. Single definition so the Ray side can never drift from
    itself."""
    import numpy as np

    safe = np.where(den > 0, den, 1)
    out = (2 * num * 1_000_000 + safe) // (2 * safe)
    return np.where(den > 0, out, 0).astype(np.int64)


def merge_constant_windows(pos, k: int):
    """Merge sorted k-wide windows starting at ``pos`` into maximal
    half-open spans: windows overlap or touch when the next start is
    <= previous start + k (constant width makes the running max end
    ``prev + k``). Returns (span_starts, span_ends_exclusive). Shared
    by ExactSubstr span dedup (word windows) and audio silence runs
    (k = 1 window units); property-tested against a brute-force
    coverage model in tests/test_exact_substr.py."""
    import numpy as np

    if len(pos) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    brk = np.flatnonzero(pos[1:] > pos[:-1] + k)
    starts = pos[np.r_[0, brk + 1]]
    ends = pos[np.r_[brk, len(pos) - 1]] + k
    return starts, ends
