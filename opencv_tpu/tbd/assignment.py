"""Linear assignment for tracking-by-detection.

The reference solves track<->detection association with an in-module
Munkres implementation (trackingbydetection/src/tbd.cpp:381-905, driven
by solveAssignmentProblem with a cost-of-non-assignment padded square
matrix). Here the exact solver is native C++ (opencv_tpu/native/
munkres.cpp, ctypes-loaded); a pure-NumPy fallback keeps the module
importable without a toolchain.
"""

from __future__ import annotations

import ctypes

import numpy as np


def _solve_native(cost: np.ndarray) -> np.ndarray | None:
    try:
        from opencv_tpu import native

        lib = native.load("munkres")
    except Exception:
        return None
    lib.munkres_solve.restype = ctypes.c_int
    lib.munkres_solve.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    n, m = cost.shape
    c = np.ascontiguousarray(cost, np.float64)
    out = np.full(n, -1, np.int32)
    rc = lib.munkres_solve(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        np.int32(n),
        np.int32(m),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return out


def _solve_numpy(cost: np.ndarray) -> np.ndarray:
    """Same shortest-augmenting-path algorithm in NumPy (fallback)."""
    n, m = cost.shape
    INF = np.inf
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    match_col = np.full(m + 1, -1, np.int64)
    way = np.zeros(m + 1, np.int64)
    for r in range(n):
        j0 = m
        match_col[j0] = r
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, bool)
        while True:
            used[j0] = True
            r0 = match_col[j0]
            cur = cost[r0, :m] - u[r0] - v[:m]
            upd = (~used[:m]) & (cur < minv[:m])
            minv[:m][upd] = cur[upd]
            way[:m][upd] = j0
            free = ~used[:m]
            if not free.any():
                break
            j1 = np.flatnonzero(free)[np.argmin(minv[:m][free])]
            delta = minv[j1]
            for j in range(m + 1):
                if used[j]:
                    if match_col[j] >= 0:
                        u[match_col[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if match_col[j0] == -1:
                break
        while j0 != m:
            j1 = way[j0]
            match_col[j0] = match_col[j1]
            j0 = j1
    out = np.full(n, -1, np.int32)
    for j in range(m):
        if match_col[j] >= 0:
            out[match_col[j]] = j
    return out


def linear_assignment(cost: np.ndarray) -> np.ndarray:
    """Min-cost assignment of rows to columns. cost [N, M] (finite).
    Returns assignment[r] = column index (all rows assigned when N <= M;
    transposed internally when N > M, leaving extra rows at -1)."""
    cost = np.asarray(cost, np.float64)
    n, m = cost.shape
    if n == 0 or m == 0:
        return np.full(n, -1, np.int32)
    if n > m:
        col_for_row = np.full(n, -1, np.int32)
        row_assign = linear_assignment(cost.T)  # [m] -> row index
        for c, r in enumerate(row_assign):
            if r >= 0:
                col_for_row[r] = c
        return col_for_row
    out = _solve_native(cost)
    if out is None:
        out = _solve_numpy(cost)
    return out


def assign_with_unassigned_cost(
    cost: np.ndarray, cost_unassigned: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The tracker's association step (tbd.cpp solveAssignmentProblem
    semantics): pad to allow any row/column to stay unassigned at
    `cost_unassigned` each.

    Returns (row_to_col [N] with -1, unassigned_rows idx, unassigned_cols
    idx)."""
    n, m = cost.shape
    if n == 0 or m == 0:
        return (
            np.full(n, -1, np.int32),
            np.arange(n),
            np.arange(m),
        )
    # square padding: [n+m, n+m]; top-right / bottom-left diagonals carry
    # the non-assignment cost, bottom-right zeros
    big = 1e9
    padded = np.full((n + m, n + m), 0.0)
    padded[:n, :m] = cost
    padded[:n, m:] = big
    padded[n:, :m] = big
    padded[:n, m:][np.arange(n), np.arange(n)] = cost_unassigned
    padded[n:, :m][np.arange(m), np.arange(m)] = cost_unassigned
    res = linear_assignment(padded)
    row_to_col = np.full(n, -1, np.int32)
    for r in range(n):
        c = res[r]
        if c < m:
            row_to_col[r] = c
    un_rows = np.flatnonzero(row_to_col < 0)
    assigned_cols = set(int(c) for c in row_to_col if c >= 0)
    un_cols = np.array([c for c in range(m) if c not in assigned_cols], np.int64)
    return row_to_col, un_rows, un_cols
