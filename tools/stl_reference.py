#!/usr/bin/env python3
"""Independent STL reference implementation (Cleveland, Cleveland, McRae &
Terpenning 1990, "STL: A Seasonal-Trend Decomposition Procedure Based on
Loess", J. Official Statistics 6(1):3-73) used to generate the component
golden at src/test/resources/goldens/stl.csv.

This is a SEPARATE implementation of the published algorithm (numpy,
normal-equation weighted fits, argsort nearest-neighbour windows) from the
Scala kernel (graft.series.Stl: streaming accumulator fits, analytic
window placement) — agreement between the two is differential evidence,
the same scheme as tools-generated goldens for ADF (StationaritySpec) and
rolling windows (WindowsSpec).

Parameters mirror statsmodels.tsa.seasonal.STL defaults as the reference
repo uses them (src/decomposition.py:33-73): seasonal smoother ns (odd,
degree 1), trend smoother nt = smallest odd >= ceil(1.5p/(1-1.5/ns)),
low-pass nl = smallest odd >= p, inner/outer = 2/0 non-robust, 1/15 robust
with bisquare weights.

Usage: python3 tools/stl_reference.py   # rewrites the golden csv
"""
import numpy as np


def loess_at(y, rho, x, q):
    """Weighted local linear fit at x over the q nearest integer positions,
    tricube neighbourhood weights times robustness weights."""
    n = len(y)
    qq = min(q, n)
    pos = np.arange(n)
    dist = np.abs(pos - x)
    idx = np.sort(np.argsort(dist, kind="stable")[:qq])
    lam = dist[idx].max()
    if q > n:  # span larger than series: inflate bandwidth (paper sec. 2)
        lam += (q - n) / 2.0
    lam = max(lam, 1e-9)
    t = np.clip(1.0 - (dist[idx] / lam) ** 3, 0.0, None)
    w = t ** 3 * rho[idx]
    sw = w.sum()
    if sw <= 0:
        return y[int(np.clip(round(x), 0, n - 1))]
    X = np.column_stack([np.ones(len(idx)), pos[idx].astype(float)])
    A = X.T @ (X * w[:, None])
    b = X.T @ (w * y[idx])
    # degenerate neighbourhood (zero x-variance): weighted mean
    if np.linalg.det(A) < 1e-12 * max(1.0, A[0, 0] * A[1, 1]):
        return float((w * y[idx]).sum() / sw)
    beta = np.linalg.solve(A, b)
    return float(beta[0] + beta[1] * x)


def loess(y, q, rho, lo=0, hi=None):
    hi = len(y) if hi is None else hi
    return np.array([loess_at(y, rho, float(i), q) for i in range(lo, hi)])


def ma(a, w):
    """Centered moving average, output length len(a)-w+1."""
    return np.convolve(a, np.ones(w) / w, mode="valid")


def next_odd(x):
    return x if x % 2 else x + 1


def stl(y, period, seasonal=7, robust=False):
    y = np.asarray(y, dtype=float)
    n = len(y)
    ns = next_odd(max(3, seasonal))
    nt = next_odd(int(np.ceil(1.5 * period / (1.0 - 1.5 / ns))))
    nl = next_odd(period)
    inner, outer = (1, 15) if robust else (2, 0)
    trend = np.zeros(n)
    seas = np.zeros(n)
    rho = np.ones(n)
    for o in range(outer + 1):
        for _ in range(inner):
            det = y - trend                           # step 1: detrend
            c = np.zeros(n + 2 * period)              # step 2: cycle-subseries
            for v in range(period):                   #   loess, extended +-1
                sub = det[v::period]
                w = rho[v::period]
                sm = np.array([loess_at(sub, w, float(j), ns)
                               for j in range(-1, len(sub) + 1)])
                c[v::period][: len(sub) + 2] = sm
            lp = ma(ma(ma(c, period), period), 3)     # step 3: low-pass
            l = loess(lp, nl, np.ones(len(lp)))
            seas = c[period: period + n] - l[:n]      # step 4: seasonal
            deseas = y - seas                         # step 5: trend loess
            trend = loess(deseas, nt, rho)
        if o < outer:                                 # bisquare robustness
            r = np.abs(y - trend - seas)
            h = 6.0 * np.median(r)
            u = r / h if h > 0 else np.zeros(n)
            rho = np.where(u >= 1.0, 0.0, (1.0 - u ** 2) ** 2)
    return trend, seas, y - trend - seas


def fixture(n=720, period=24):
    """Deterministic hourly-shaped series: trend + two harmonics +
    incommensurate quasi-noise + two spikes (no RNG — reproducible from
    the closed form alone, same scheme as StlSpec's fixtures)."""
    i = np.arange(n, dtype=float)
    y = (5.0 + 8.0 * i / n
         + 2.5 * np.sin(2 * np.pi * i / period)
         + 1.2 * np.cos(2 * np.pi * 2 * i / period + 0.7)
         + 0.4 * np.cos(2.3 * i)
         + 0.25 * np.sin(1.1 * i + 0.5))
    y[150] += 9.0
    y[450] -= 7.0
    return y


def main():
    period = 24
    y = fixture(period=period)
    t, s, r = stl(y, period, seasonal=7, robust=False)
    rt, rs, rr = stl(y, period, seasonal=7, robust=True)
    out = "src/test/resources/goldens/stl.csv"
    with open(out, "w") as f:
        f.write("i,y,trend,seasonal,resid,rtrend,rseasonal,rresid\n")
        for i in range(len(y)):
            f.write(f"{i},{y[i]!r},{t[i]!r},{s[i]!r},{r[i]!r},"
                    f"{rt[i]!r},{rs[i]!r},{rr[i]!r}\n")
    print(f"wrote {out}: n={len(y)} period={period}")


if __name__ == "__main__":
    main()
