#!/usr/bin/env python3
"""Independent Python/numpy reference implementations of the ml/ detector
family, used to generate the goldens at src/test/resources/goldens/
{lof,iforest,ocsvm}.csv — the same differential-evidence scheme as
tools/stl_reference.py -> goldens/stl.csv.

What each golden certifies:

 - lof.csv: EXACT Local Outlier Factor (Breunig et al. 2000) — k-distance
   neighbourhoods with ties, reachability distances, lrd, LOF — computed
   with a from-scratch numpy implementation. On this fixture all pairwise
   distances are distinct, so the with-ties neighbourhood equals the
   exactly-k neighbourhood and these values are also what sklearn's
   brute-force LocalOutlierFactor (negative_outlier_factor_ negated)
   produces. Agreement pins graft.ml.Neighborhood.lofKernel to the
   published definition to ~1e-9.

 - iforest.csv: Isolation Forest scores (Liu et al. 2008) from a SEPARATE
   implementation of the same deterministic procedure (xorshift64 PRNG,
   partial Fisher-Yates subsampling, uniform split trees, c(n) path-length
   normalization). Every PRNG draw, comparison, and IEEE operation is
   replayed in Python — agreement proves the Scala tree builder and scorer
   implement the algorithm they claim, bit-for-bit up to libm cos/log ulps.

 - ocsvm.csv: RFF nu-OCSVM decision values (Rahimi-Recht 2007 features,
   Schölkopf 2001 primal, Pegasos SGD) replayed the same way. SGD crosses
   data-dependent branches (margin violations), so last-ulp libm
   differences can flip a step and diffuse; the golden asserts agreement
   to a looser 1e-6-relative tolerance, which still rules out any
   algorithmic divergence.

Fixture: the 503-point "cloud" from MlSpec (closed-form u(i,salt) points,
500 inliers + 3 planted outliers) — no RNG over test data.

Usage: python3 tools/ml_reference.py   # rewrites the three golden csvs
"""
import math
import os

M64 = (1 << 64) - 1
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "goldens")


# ---- fixture (MlSpec.cloud) -------------------------------------------------

def u(i, salt):
    return ((i * 2654435761 + salt * 1013904223) & 0x7fffffff) / 2147483647.0


def cloud():
    pts = [[2.0 * u(i, 1) - 1.0, 2.0 * u(i, 2) - 1.0] for i in range(500)]
    pts += [[8.0, 8.0], [-9.0, 7.5], [7.0, -8.5]]
    return pts


# ---- shared xorshift64 (same update as the Scala engines) -------------------

class XorShift:
    def __init__(self, seed, zero_fallback):
        self.s = (seed if seed != 0 else zero_fallback) & M64

    def next_long(self):
        s = self.s
        s ^= (s << 13) & M64
        s ^= s >> 7
        s ^= (s << 17) & M64
        self.s = s & M64
        return self.s

    def next_int(self, bound):
        return (self.next_long() >> 1) % bound

    def next_double(self):
        return (self.next_long() >> 11) * 1.1102230246251565e-16


# ---- LOF (exact, with-ties; = sklearn brute on distinct distances) ----------

def lof(xs, k):
    n = len(xs)
    d = [[math.sqrt(sum((a - b) * (a - b) for a, b in zip(xs[i], xs[j])))
          for j in range(n)] for i in range(n)]
    kdist, neigh = [0.0] * n, [None] * n
    for i in range(n):
        others = sorted((j for j in range(n) if j != i), key=lambda j: d[i][j])
        kdist[i] = d[i][others[k - 1]]
        neigh[i] = [j for j in range(n) if j != i and d[i][j] <= kdist[i]]
    lrd = [0.0] * n
    for i in range(n):
        s = sum(max(kdist[j], d[i][j]) for j in neigh[i])
        lrd[i] = math.inf if s <= 0 else len(neigh[i]) / s
    out = []
    for p in range(n):
        if math.isinf(lrd[p]):
            out.append(1.0)
        else:
            s = sum(1e12 if math.isinf(lrd[o]) else lrd[o] for o in neigh[p])
            out.append((s / len(neigh[p])) / lrd[p])
    return out


# ---- Isolation Forest (replay of graft.ml.IsolationForest.fit) --------------

def avg_path_length(n):
    if n <= 1:
        return 0.0
    return 2.0 * (math.log(n - 1.0) + 0.5772156649015329) - 2.0 * (n - 1.0) / n


def iforest_fit(data, n_trees, sample_size, seed):
    rng = XorShift(seed, 0x9e3779b97f4a7c15)
    n, d = len(data), len(data[0])
    psi = min(sample_size, n)
    height_limit = math.ceil(math.log(psi) / math.log(2.0))
    trees = []
    for _ in range(n_trees):
        pool = list(range(n))
        for i in range(psi):
            j = i + rng.next_int(n - i)
            pool[i], pool[j] = pool[j], pool[i]
        idx = pool[:psi]
        feature, split, left, right, size = [], [], [], [], []

        def build(rows, depth):
            me = len(feature)
            feature.append(-1); split.append(0.0)
            left.append(-1); right.append(-1); size.append(len(rows))
            if len(rows) <= 1 or depth >= height_limit:
                return me
            tries, f, lo, hi = 0, -1, 0.0, 0.0
            while tries < d and f < 0:
                cand = rng.next_int(d)
                mn, mx = math.inf, -math.inf
                for r in rows:
                    v = data[r][cand]
                    if v < mn:
                        mn = v
                    if v > mx:
                        mx = v
                if mx > mn:
                    f, lo, hi = cand, mn, mx
                tries += 1
            if f < 0:
                return me
            s = lo + rng.next_double() * (hi - lo)
            l = [r for r in rows if data[r][f] < s]
            rr = [r for r in rows if not data[r][f] < s]
            if not l or not rr:
                return me
            li = build(l, depth + 1)
            ri = build(rr, depth + 1)
            feature[me], split[me], left[me], right[me] = f, s, li, ri
            return me

        build(idx, 0)
        trees.append((feature, split, left, right, size))
    return trees, psi


def iforest_score(trees, psi, x):
    total = 0.0
    for feature, split, left, right, size in trees:
        node, depth = 0, 0
        while feature[node] >= 0:
            node = left[node] if x[feature[node]] < split[node] else right[node]
            depth += 1
        total += depth + avg_path_length(size[node])
    return 2.0 ** (-(total / len(trees)) / avg_path_length(psi))


# ---- RFF nu-OCSVM (replay of graft.ml.OneClassSvm.fit) ----------------------

def ocsvm_fit(data, nu, n_features, epochs, seed):
    rng = XorShift(seed, 0x2545f4914f6cdd1d)
    n, d = len(data), len(data[0])
    flat = [v for row in data for v in row]
    mean = sum(flat) / len(flat)
    var = sum((x - mean) ** 2 for x in flat) / len(flat)
    g = 1.0 / (d * max(var, 1e-12))
    sd = math.sqrt(2.0 * g)

    def gaussian():
        u1 = rng.next_double()
        if u1 < 1e-300:
            u1 = 1e-300
        return math.sqrt(-2.0 * math.log(u1)) * math.cos(
            2.0 * math.pi * rng.next_double())

    freqs = [[gaussian() * sd for _ in range(d)] for _ in range(n_features)]
    phases = [rng.next_double() * 2.0 * math.pi for _ in range(n_features)]
    scale = math.sqrt(2.0 / n_features)

    def phi(x):
        return [scale * math.cos(phases[j] +
                sum(freqs[j][i] * x[i] for i in range(d)))
                for j in range(n_features)]

    phis = [phi(x) for x in data]
    w = [0.0] * n_features
    rho = 0.0
    w_avg = [0.0] * n_features
    rho_avg, n_avg, t = 0.0, 0, 0
    order = list(range(n))
    for ep in range(epochs):
        i = n - 1
        while i > 0:
            j = rng.next_int(i + 1)
            order[i], order[j] = order[j], order[i]
            i -= 1
        for idx in order:
            t += 1
            eta = 1.0 / t
            p = phis[idx]
            m = sum(w[k] * p[k] for k in range(n_features))
            violated = m < rho
            for k in range(n_features):
                w[k] -= eta * (w[k] - (p[k] / nu if violated else 0.0))
            rho -= eta * (-1.0 + (1.0 / nu if violated else 0.0))
            if ep == epochs - 1:
                for k in range(n_features):
                    w_avg[k] += w[k]
                rho_avg += rho
                n_avg += 1
    w_avg = [wk / n_avg for wk in w_avg]
    rho_avg /= n_avg
    return w_avg, rho_avg, freqs, phases, scale


def ocsvm_decision(model, x):
    w, rho, freqs, phases, scale = model
    d = len(x)
    return sum(w[j] * scale * math.cos(phases[j] +
               sum(freqs[j][i] * x[i] for i in range(d)))
               for j in range(len(w))) - rho


# ---- emit -------------------------------------------------------------------

def write_csv(name, values):
    path = os.path.join(OUT, name)
    with open(path, "w") as f:
        f.write("idx,value\n")
        for i, v in enumerate(values):
            f.write("%d,%.17g\n" % (i, v))
    print("wrote %s (%d rows)" % (path, len(values)))


def main():
    pts = cloud()
    write_csv("lof.csv", lof(pts, k=20))
    trees, psi = iforest_fit(pts, n_trees=100, sample_size=256, seed=42)
    write_csv("iforest.csv", [iforest_score(trees, psi, x) for x in pts])
    model = ocsvm_fit(pts, nu=0.1, n_features=64, epochs=30, seed=42)
    write_csv("ocsvm.csv", [ocsvm_decision(model, x) for x in pts])


if __name__ == "__main__":
    main()
