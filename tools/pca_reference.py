#!/usr/bin/env python3
"""Independent numpy reference for graft.ml.Pca (same two-leg golden
scheme as tools/stl_reference.py / ml_reference.py).

Regenerates src/test/resources/goldens/pca.csv: eigenvalues (MLE
covariance, descending) and eigenvectors (largest-|entry| positive) of
the deterministic 4-feature fixture that PcaSpec rebuilds in Scala.
"""
import csv
import os

import numpy as np


def u(i: int, salt: int) -> float:
    return ((i * 2654435761 + salt * 1013904223) & 0x7FFFFFFF) / 2147483647.0


def fixture(n: int = 600) -> np.ndarray:
    rows = []
    for i in range(n):
        f0 = 2.0 * u(i, 1) - 1.0
        f1 = 0.7 * f0 + 0.5 * (2.0 * u(i, 2) - 1.0)
        f2 = 2.0 * u(i, 3) - 1.0 - 0.3 * f1
        f3 = 0.2 * f0 + 0.1 * (2.0 * u(i, 4) - 1.0) + 0.5 * f2
        rows.append([f0, f1, f2, f3])
    return np.array(rows)


def main() -> None:
    x = fixture()
    cov = np.cov(x.T, bias=True)  # MLE, like the engine's moment pass
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    vals = vals[order]
    vecs = vecs[:, order]
    out = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "goldens", "pca.csv")
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["comp", "eigval", "v0", "v1", "v2", "v3"])
        for j in range(4):
            v = vecs[:, j]
            m = int(np.argmax(np.abs(v)))
            if v[m] < 0:
                v = -v
            w.writerow([j, repr(float(vals[j]))] +
                       [repr(float(c)) for c in v])
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
