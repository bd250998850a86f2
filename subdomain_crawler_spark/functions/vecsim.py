"""Embedding-similarity numeric kernels (IVF argmax, pair cosine).

Import-light ON PURPOSE (numpy only, inside function bodies): these are
referenced from pandas UDFs, so every Python worker imports THIS module on
first use. When they lived in plans/driver_queries.py, the first
kernel-bearing query of a session dragged the whole query-plan module
(pandas + core + text + psl chain) into all 32 workers — measured ~1.0-1.4 s
added to whichever query ran first (round 11, cosine_topk in-suite).

Numeric contract (shared by every kernel here): BIT-EQUAL to the literal
Spark expression family `_cos4` in plans/driver_queries.py —
* products at FLOAT precision (Spark's ``zip_with(x, y -> x * y)`` on
  array<float> multiplies in f32),
* a SEQUENTIAL per-dimension left fold into f64 accumulators (Spark's
  ``aggregate(…, 0.0D, acc + x)``) — NOT ``np.sum`` / BLAS, whose pairwise
  or blocked reductions change the addition order,
* sqrt / divide in f64 (IEEE-identical on both sides),
* then ``round(double, 4)`` with Spark's semantics (RoundBase →
  ``BigDecimal.valueOf(d).setScale(4, HALF_UP)``, i.e. HALF_UP on the
  double's SHORTEST decimal repr) — `round4_half_up` below.

Parity pins: tests/test_plans.py::{test_ann_ivf_arrow_parity,
test_pair_cos4_parity} and the driver-green ``ann_ivf_arrow`` oracle row.
"""

from __future__ import annotations


def round4_half_up(a):
    """Vectorized twin of Spark's ``round(double, 4)``.  The fast path is
    the scale-floor trick; values whose scaled fraction sits within 1e-6
    of the .5 boundary (where ``d * 1e4`` itself may misrepresent the
    shortest repr) are fixed up through ``decimal.Decimal(repr(d))`` —
    exactly BigDecimal.valueOf's semantics.  The fixup set is empty on
    real dot products, so the kernel stays C-speed."""
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    scaled = a * 1e4
    out = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5) / 1e4
    near = np.nonzero(np.abs(np.abs(scaled) % 1.0 - 0.5) < 1e-6)
    if near[0].size:
        import decimal
        q = decimal.Decimal("0.0001")
        for idx in zip(*near):
            out[idx] = float(decimal.Decimal(repr(float(a[idx])))
                             .quantize(q, rounding=decimal.ROUND_HALF_UP))
    return out


def ivf_scores_np(M, C):
    """round-4 cosine matrix (n × k, float64) between row vectors ``M``
    (n × d float32) and centroids ``C`` (k × d float32) under the module
    contract above.  The fold is expressed as d per-dimension f32 OUTER
    products accumulated into an f64 (n × k) matrix — each
    ``M[:,j] ⊗ C[:,j]`` is exactly the j-th zip_with product for every
    (row, centroid) pair, and the ``+=`` sequence is exactly the left
    fold; nothing materializes the n × k × d tensor, so memory peaks at
    1.5 copies of the (n × k) plane.  A BLAS ``M @ C.T`` would be faster
    still but loses the bit-parity contract; this form stays C-speed
    numpy (tests/test_kernel_bench.py::test_ivf_argmax_throughput)."""
    import numpy as np

    M = np.asarray(M, dtype=np.float32)
    C = np.asarray(C, dtype=np.float32)
    n, d = M.shape
    k = C.shape[0]

    def _fold_sq(X):  # sequential f64 fold of f32 squares, per row
        sq = X * X  # f32
        acc = np.zeros(X.shape[0], dtype=np.float64)
        for j in range(X.shape[1]):
            acc += sq[:, j]
        return acc

    na = np.sqrt(_fold_sq(M))  # (n,)
    nb = np.sqrt(_fold_sq(C))  # (k,)
    # cache-blocked over centroids so the f64 accumulator slab stays
    # L2/L3-resident across the d-fold (measured 2.7× over the unblocked
    # form at k=4096); blocking is bit-neutral — each (row, centroid)
    # accumulator is independent, only the j-order matters.
    kc = 128
    cos = np.empty((n, k), dtype=np.float64)
    for c0 in range(0, k, kc):
        Cc = C[c0:c0 + kc]
        acc = np.zeros((n, Cc.shape[0]), dtype=np.float64)
        for j in range(d):
            acc += M[:, j, None] * Cc[None, :, j]  # f32 outer product
        cos[:, c0:c0 + Cc.shape[0]] = acc
    cos /= na[:, None] * nb[None, :]
    return round4_half_up(cos)


def pair_cos4_np(A, B):
    """round-4 cosine per ROW PAIR (A[i] vs B[i]) under the module
    contract above — the vectorized twin of the literal `_cos4(a, b)`
    expression, replacing the interpreted higher-order-function lambdas
    on every pair-scoring path (guide §4.2: zip_with/aggregate are not
    codegen'd — every element is a boxed JVM op, and each distinct
    expression tree also pays first-run janino codegen)."""
    import numpy as np

    A = np.asarray(A, dtype=np.float32)
    B = np.asarray(B, dtype=np.float32)
    prod = A * B          # f32 — zip_with(x, y -> x * y) parity
    sqa = A * A
    sqb = B * B
    n = A.shape[0]
    acc = np.zeros(n, dtype=np.float64)
    na = np.zeros(n, dtype=np.float64)
    nb = np.zeros(n, dtype=np.float64)
    for j in range(A.shape[1]):   # sequential f64 fold, dimension-major
        acc += prod[:, j]
        na += sqa[:, j]
        nb += sqb[:, j]
    cos = acc / (np.sqrt(na) * np.sqrt(nb))
    return round4_half_up(cos)
